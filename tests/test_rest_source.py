"""Live-HTTP integration gate for the REST source (reference S3).

The public endpoint the reference polls (``fakestoreapi.com``, reference
``etl/extract.py``) is unreachable from the build sandbox, so the
schema/flatten path was previously only unit-tested on inline records.
This test exercises the FULL ``fetch_rest_products`` path — a real HTTP
GET, status check, JSON decode, engine-side ``from_json`` parse, struct
flatten — against a loopback ``http.server`` fixture, no external
network required. Skips (not fails) only when the ``requests`` package
itself is absent.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from datafoundation_multi_source_retail_data_integration_hub_spark.sources.readers import (
    fetch_rest_products,
    flatten_structs,
)

PRODUCTS = [
    {
        "id": 1,
        "title": "Backpack",
        "price": 109.95,
        "description": "Fits 15in laptops",
        "category": "men's clothing",
        "image": "https://example.invalid/1.jpg",
        "rating": {"rate": 3.9, "count": 120},
    },
    {
        "id": 2,
        "title": "Slim Fit T-Shirt",
        "price": 22.3,
        "description": "Slim fitting",
        "category": "men's clothing",
        "image": "https://example.invalid/2.jpg",
        "rating": {"rate": 4.1, "count": 259},
    },
    {
        "id": 3,
        "title": "No-rating gadget",
        "price": 5.0,
        "description": None,
        "category": "electronics",
        "image": "https://example.invalid/3.jpg",
        "rating": None,  # absent struct must survive parse + flatten
    },
]


class _ProductsHandler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 — http.server API
        body = json.dumps(PRODUCTS).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence per-request stderr lines
        pass


@pytest.fixture()
def products_url():
    server = HTTPServer(("127.0.0.1", 0), _ProductsHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}/products"
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_fetch_rest_products_live_http(spark, products_url):
    pytest.importorskip("requests")
    df = fetch_rest_products(spark, url=products_url)
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["rating"]["count"] == 120
    assert rows[1]["source"] == "fakestore_api"
    assert rows[3]["rating"] is None

    flat = flatten_structs(df)
    assert "rating_rate" in flat.columns and "rating" not in flat.columns
    frows = {r["id"]: r for r in flat.collect()}
    assert frows[2]["rating_count"] == 259
    assert frows[3]["rating_rate"] is None


def test_fetch_rest_products_http_error_raises(spark):
    requests = pytest.importorskip("requests")
    server = HTTPServer(
        ("127.0.0.1", 0),
        type(
            "Err",
            (_ProductsHandler,),
            {
                "do_GET": lambda self: (
                    self.send_response(500),
                    self.end_headers(),
                )
            },
        ),
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}/products"
        with pytest.raises(requests.HTTPError):
            fetch_rest_products(spark, url=url)
    finally:
        server.shutdown()
        thread.join(timeout=5)
