"""Source readers: latin1 CSV, name normalization, REST-JSON flattening."""

from __future__ import annotations

from datafoundation_multi_source_retail_data_integration_hub_spark.functions.normalize import (
    normalize_name,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.sources.readers import (
    API_PRODUCT_SCHEMA,
    flatten_structs,
    from_json_records,
    read_csv,
)

SUPERSTORE_HEADER = "Row ID,Order ID,Order Date,Ship Mode,Customer ID,Customer Name,Sub-Category,Sales\n"


def _write_latin1_csv(tmp_path):
    p = tmp_path / "superstore.csv"
    rows = [
        SUPERSTORE_HEADER,
        "1,CA-2016-001,11/8/2016,Second Class,CG-12520,Claire Gut\xe9,Bookcases,261.96\n",
        "2,CA-2016-002,6/12/2017,Standard Class,DV-13045,Darrin Van Huff,Labels,14.62\n",
    ]
    p.write_bytes("".join(rows).encode("latin1"))
    return str(p)


def test_normalize_name():
    assert normalize_name("Order Date") == "order_date"
    assert normalize_name("Sub-Category") == "sub_category"
    assert normalize_name("Row ID") == "row_id"


def test_latin1_csv_roundtrip(spark, tmp_path):
    path = _write_latin1_csv(tmp_path)
    df = read_csv(spark, path, encoding="latin1", infer_schema=True, normalize=True)
    assert df.columns == [
        "row_id",
        "order_id",
        "order_date",
        "ship_mode",
        "customer_id",
        "customer_name",
        "sub_category",
        "sales",
    ]
    rows = df.orderBy("row_id").collect()
    assert rows[0]["customer_name"] == "Claire Gut\xe9"  # latin1 é survived
    assert rows[1]["sales"] == 14.62  # inferred double


def test_rest_json_flatten(spark):
    records = [
        {
            "id": 1,
            "title": "Backpack",
            "price": 109.95,
            "description": "d",
            "category": "men's clothing",
            "image": "https://x",
            "rating": {"rate": 3.9, "count": 120},
        },
        {
            "id": 2,
            "title": "Shirt",
            "price": 22.3,
            "description": "d2",
            "category": "men's clothing",
            "image": "https://y",
            "rating": {"rate": 4.1, "count": 259},
        },
    ]
    df = from_json_records(spark, records, API_PRODUCT_SCHEMA, source_tag="fakestore_api")
    flat = flatten_structs(df)
    assert "rating_rate" in flat.columns and "rating_count" in flat.columns
    got = {r["id"]: r for r in flat.collect()}
    assert got[1]["rating_rate"] == 3.9
    assert got[2]["rating_count"] == 259
    assert got[1]["source"] == "fakestore_api"
