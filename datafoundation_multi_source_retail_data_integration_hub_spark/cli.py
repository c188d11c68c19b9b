"""Command-line entry points — the reference's runnable surface, Spark-first.

- ``etl``: the reference's ``python main.py`` flow (fixed: its import bug
  made the intended flow unrunnable): CSV -> normalize -> SCD2 star schema
  -> warehouse tables (``pipelines.retail.run_etl`` + ``sources.writers``).
- ``analytics``: the dashboard's query surface (``dashboard/app.py``)
  without the UI: run any registered query, print JSON rows.

Usage::

    python -m datafoundation_multi_source_retail_data_integration_hub_spark.cli \
        etl --sales-csv path/to/superstore.csv --database retail_warehouse
    python -m datafoundation_multi_source_retail_data_integration_hub_spark.cli \
        analytics --sf-dir /root/testdata/sf0.01 --query flagship_star_revenue
"""

from __future__ import annotations

import argparse
import json
import sys


def _json_default(v):
    return str(v)


def run_etl_cmd(args: argparse.Namespace) -> int:
    from datetime import datetime, timezone

    from .pipelines import retail
    from .pipelines.audit import logged_write
    from .session import get_spark

    spark = get_spark(app_name="etl")
    star = retail.run_etl(
        spark,
        args.sales_csv,
        effective_date=args.effective_date,
        encoding=args.encoding,
    )
    # one audit row per table per run (reference etl_run_log, README.md:74-79)
    run_id = args.run_id or datetime.now(timezone.utc).strftime(
        "run-%Y%m%dT%H%M%SZ"
    )
    summary: dict[str, int] = {}
    for name, dim in star.dimensions.items():
        t0 = datetime.now(timezone.utc)
        summary[name] = logged_write(
            dim, name, run_id, t0, datetime.now(timezone.utc),
            database=args.database,
        )
    t0 = datetime.now(timezone.utc)
    summary["fact_sales"] = logged_write(
        star.fact, "fact_sales", run_id, t0, datetime.now(timezone.utc),
        database=args.database,
    )
    print(json.dumps({"database": args.database, "run_id": run_id, "tables": summary}))
    return 0


def run_analytics_cmd(args: argparse.Namespace) -> int:
    import __spark_entry__ as entrymod

    from .session import get_spark

    spark = get_spark(app_name="analytics")
    qs = entrymod.queries()
    if args.query not in qs:
        print(
            json.dumps({"error": f"unknown query {args.query!r}", "available": sorted(qs)}),
            file=sys.stderr,
        )
        return 2
    df = qs[args.query](spark, args.sf_dir)
    rows = [r.asDict() for r in df.limit(args.limit).collect()]
    print(json.dumps({"query": args.query, "rows": rows}, default=_json_default))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="datafoundation-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    etl = sub.add_parser("etl", help="CSV -> SCD2 star schema -> warehouse")
    etl.add_argument("--sales-csv", required=True)
    etl.add_argument("--database", default="retail_warehouse")
    etl.add_argument("--effective-date", default="2026-01-01")
    etl.add_argument("--encoding", default="latin1")
    etl.add_argument("--run-id", default=None, help="audit run id (default: UTC timestamp)")
    etl.set_defaults(fn=run_etl_cmd)

    an = sub.add_parser("analytics", help="run a registered query, print JSON")
    an.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    an.add_argument("--query", required=True)
    an.add_argument("--limit", type=int, default=100)
    an.set_defaults(fn=run_analytics_cmd)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
