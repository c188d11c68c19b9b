"""CLI entry points: the reference's runnable surface end-to-end."""

from __future__ import annotations

import json

from datafoundation_multi_source_retail_data_integration_hub_spark import cli

from .conftest import SF_SMOKE
from .test_retail_pipeline import HEADER, ROWS


def test_cli_etl(spark, tmp_path, capsys):
    p = tmp_path / "sales.csv"
    p.write_bytes((HEADER + "".join(ROWS)).encode("latin1"))
    rc = cli.main(
        ["etl", "--sales-csv", str(p), "--database", "cli_wh"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["database"] == "cli_wh"
    assert out["tables"]["fact_sales"] == 6
    assert spark.table("cli_wh.dim_customer").count() == out["tables"]["dim_customer"]
    # every written table got an audit row in etl_run_log under this run id
    log = spark.table("cli_wh.etl_run_log").collect()
    assert {r["table_name"] for r in log} == set(out["tables"])
    assert all(r["run_id"] == out["run_id"] and r["status"] == "success" for r in log)
    assert {r["table_name"]: r["n_rows"] for r in log} == out["tables"]


def test_cli_analytics(capsys):
    rc = cli.main(
        [
            "analytics",
            "--sf-dir",
            SF_SMOKE,
            "--query",
            "top_customers",
            "--limit",
            "5",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["query"] == "top_customers"
    assert len(out["rows"]) == 5
    assert {"c_custkey", "c_name", "revenue"} <= set(out["rows"][0])


def test_cli_analytics_unknown_query(capsys):
    rc = cli.main(["analytics", "--query", "nope"])
    assert rc == 2
    err = json.loads(capsys.readouterr().err.strip())
    assert "available" in err
