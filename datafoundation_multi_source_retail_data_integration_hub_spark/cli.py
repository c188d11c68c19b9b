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
    from .pipelines import retail
    from .session import get_spark
    from .sources import writers

    spark = get_spark(app_name="etl")
    star = retail.run_etl(
        spark,
        args.sales_csv,
        effective_date=args.effective_date,
        encoding=args.encoding,
    )
    summary: dict[str, int] = {}
    for name, dim in star.dimensions.items():
        writers.write_table(dim, name, database=args.database)
        summary[name] = dim.count()
    writers.write_table(star.fact, "fact_sales", database=args.database)
    summary["fact_sales"] = star.fact.count()
    print(json.dumps({"database": args.database, "tables": summary}))
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
