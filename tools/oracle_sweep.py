"""Full driver-style correctness sweep: run every declared query and its
DuckDB oracle at a given sf_dir (default the driver's sf0.01) and compare
with the same canonicalization the driver uses. The per-round driver run
only records ~50 budgeted rows; this sweep is the builder's own
full-surface gate before each round's rotation lands.

Usage: python tools/oracle_sweep.py [sf_dir] [name-substring ...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")

import __spark_entry__ as entry
from datafoundation_multi_source_retail_data_integration_hub_spark.session import get_spark
from tests.oracle import compare


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    spark = get_spark(app_name="oracle-sweep", shuffle_partitions=32)
    qs, osql = entry.queries(), entry.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    failures: list[str] = []
    for name, fn in qs.items():
        if only and not any(s in name for s in only):
            continue
        t0 = time.time()
        try:
            if name in osql:
                compare(spark, sf_dir, fn, osql[name], name=name)
                n_pass += 1
                tag = "PASS"
            else:
                fn(spark, sf_dir).collect()
                n_rowsonly += 1
                tag = "ROWS-ONLY"
        except Exception:
            n_fail += 1
            tag = "FAIL"
            failures.append(name)
            traceback.print_exc(limit=4)
        print(f"{tag:10s} {name} ({time.time() - t0:.1f}s)", flush=True)
    print(
        f"\n== {n_pass} pass / {n_rowsonly} rows-only / {n_fail} fail"
        + (f" — FAILURES: {failures}" if failures else "")
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
