"""sf0.1 -> sf1 scaling spot run (r12 verdict directive 4).

The tri-scale parity sweep validated correctness and plan shapes up to
sf0.1; this tool tests the CANDIDATE-GENERATION BOUNDS one order of
magnitude further, where a quadratic blowup would actually show: it
builds a 10x corpus at ``--out`` (default ``/tmp/sf1``) and measures
wall time, output rows, and shuffle read/write bytes for the heaviest
real-work queries at both scales.

Scale-up construction — 10 SHARDS, each statistically identical to the
original corpus, mutually decorrelated so per-shard result structure is
preserved and the clean linear expectation holds (output rows ~10x,
shuffle bytes ~10x, wall time <=~10x):

- ``documents``: shard s shifts doc_id by s*10M and suffixes every
  token with ``x{s}`` (shard 0 verbatim) — within-shard duplication
  structure is byte-identical to the original, cross-shard shingle /
  window-hash collisions are zero, and every shingle's document
  frequency is unchanged (the df-cap drop set scales with the corpus).
- ``embeddings``: shard s shifts vec_id by s*10M and multiplies each
  vector elementwise by a deterministic per-(shard, dim) +-1 sign
  pattern — dot(x*sgn, y*sgn) == dot(x, y), so within-shard cosines are
  EXACTLY preserved while cross-shard similarities decorrelate; the
  IVF stride picks 10x centroids because the shard offset is divisible
  by the stride.
- ``orders``/``lineitem``/``customer``: keys shifted per shard
  (orderkey +s*100M, custkey +s*10M, suppkey +s*1M, partkey +s*10M) —
  join fan-out per key and the purchase-graph degree distribution are
  unchanged; node and edge counts scale 10x.
- remaining tables are copied verbatim (no sweep query reads them).

A super-linear wall-time or shuffle-byte ratio (>> 10x) or an output
row ratio far from 10x flags a candidate-generation bound that does
not hold; ~10x-or-better confirms the banded/inverted-index/cell-probe
designs. Results: markdown table on stdout (paste into COVERAGE.md)
plus sf1_sweep.json beside this script.

Run: ``python tools/sf1_sweep.py [--out /tmp/sf1] [--skip-build]``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SHARDS = 10
OFF_DOC = 10_000_000
OFF_VEC = 10_000_000
OFF_ORD = 100_000_000
OFF_CUST = 10_000_000
OFF_SUPP = 1_000_000
OFF_PART = 10_000_000

# heaviest real-work queries (r12 verdict's list + the dedup family)
SWEEP = [
    "doc_ngram_jaccard_pairs",
    "doc_minhash_lsh_pairs",
    "doc_simhash_pairs",
    "doc_neardup_clusters",
    "doc_dedup_decisions",
    "doc_curation_manifest",
    "doc_segment_dedup",
    "embedding_semantic_dedup",
    "embedding_cosine_neardup",
    "ann_quality_report",
    "purchase_graph_pagerank",
]

COPY_TABLES = ["region", "nation", "supplier", "part", "events"]


def build(spark, src: str, out: str) -> None:
    from pyspark.sql import functions as F

    marker = os.path.join(out, "_BUILT")
    if os.path.exists(marker):
        print(f"# build: {out} already built, skipping", file=sys.stderr)
        return
    shards = spark.range(SHARDS).select(F.col("id").cast("int").alias("__s"))
    s_long = F.col("__s").cast("long")

    docs = spark.read.parquet(f"{src}/documents.parquet")
    (
        docs.crossJoin(F.broadcast(shards))
        .select(
            (F.col("doc_id") + s_long * OFF_DOC).alias("doc_id"),
            F.when(F.col("__s") == 0, F.col("text"))
            .otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda t: F.concat(
                            t, F.lit("x"), F.col("__s").cast("string")
                        ),
                    ),
                    " ",
                )
            )
            .alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    (
        emb.crossJoin(F.broadcast(shards))
        .select(
            (F.col("vec_id") + s_long * OFF_VEC).alias("vec_id"),
            F.when(F.col("__s") == 0, F.col("embedding"))
            .otherwise(
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x
                        * F.when(
                            F.pmod(F.xxhash64(F.col("__s"), i), F.lit(2))
                            == 0,
                            F.lit(1.0),
                        ).otherwise(F.lit(-1.0))
                    ).cast("float"),
                )
            )
            .alias("embedding"),
            "label",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )

    orders = spark.read.parquet(f"{src}/orders.parquet")
    (
        orders.crossJoin(F.broadcast(shards))
        .select(
            (F.col("o_orderkey") + s_long * OFF_ORD).alias("o_orderkey"),
            (F.col("o_custkey") + s_long * OFF_CUST).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/orders.parquet")
    )

    li = spark.read.parquet(f"{src}/lineitem.parquet")
    (
        li.crossJoin(F.broadcast(shards))
        .select(
            (F.col("l_orderkey") + s_long * OFF_ORD).alias("l_orderkey"),
            (F.col("l_partkey") + s_long * OFF_PART).alias("l_partkey"),
            (F.col("l_suppkey") + s_long * OFF_SUPP).alias("l_suppkey"),
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet")
    )

    cust = spark.read.parquet(f"{src}/customer.parquet")
    (
        cust.crossJoin(F.broadcast(shards))
        .select(
            (F.col("c_custkey") + s_long * OFF_CUST).alias("c_custkey"),
            "c_name",
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/customer.parquet")
    )

    for t in COPY_TABLES:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
    with open(marker, "w") as f:
        f.write("ok\n")
    print(f"# build: wrote 10x shards to {out}", file=sys.stderr)


def _stages(sc) -> list[dict]:
    url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages"
    return json.load(urllib.request.urlopen(url))


def stage_ids(sc) -> set[int]:
    return {s["stageId"] for s in _stages(sc)}


def shuffle_bytes_for(sc, new_ids: set[int]) -> tuple[int, int]:
    """(write, read) bytes summed over exactly ``new_ids`` stages.

    The AppStatusStore is fed asynchronously from the listener bus, so
    metrics for just-finished stages can arrive late; poll until two
    consecutive snapshots agree before trusting the numbers (a
    cumulative-total delta would otherwise smear one query's bytes into
    the next query's window — observed as a phantom 33x in the first
    run of this sweep)."""
    prev = None
    for _ in range(20):
        data = _stages(sc)
        cur = (
            sum(s.get("shuffleWriteBytes", 0) for s in data if s["stageId"] in new_ids),
            sum(s.get("shuffleReadBytes", 0) for s in data if s["stageId"] in new_ids),
        )
        if cur == prev:
            return cur
        prev = cur
        time.sleep(0.5)
    return prev


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--queries", default=None, help="comma list override")
    args = ap.parse_args()

    from datafoundation_multi_source_retail_data_integration_hub_spark.operators import (
        clustering,
        dedup,
    )
    from datafoundation_multi_source_retail_data_integration_hub_spark.session import (
        get_spark,
    )

    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="sf1-sweep",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    sc = spark.sparkContext
    if not args.skip_build:
        build(spark, SF01, args.out)

    def unpersist_all() -> None:
        dedup.unpersist_all()
        clustering.unpersist_all()

    qs = entrymod.queries()
    names = (args.queries.split(",") if args.queries else SWEEP)
    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        row: dict[str, dict] = {}
        for tag, d in (("sf0.1", SF01), ("sf1", args.out)):
            fn(spark, d).count()  # warm: AQE replan + codegen + IO cache
            unpersist_all()
            best, rows, sw, sr = float("inf"), 0, 0, 0
            for _ in range(2):
                ids0 = stage_ids(sc)
                t0 = time.perf_counter()
                rows = fn(spark, d).count()
                wall = time.perf_counter() - t0
                w, r = shuffle_bytes_for(sc, stage_ids(sc) - ids0)
                unpersist_all()
                if wall < best:
                    best, sw, sr = wall, w, r
            row[tag] = {
                "wall_s": round(best, 3),
                "rows": rows,
                "shuffle_write_mb": round(sw / 1e6, 2),
                "shuffle_read_mb": round(sr / 1e6, 2),
            }
            print(f"# {name} {tag}: {row[tag]}", file=sys.stderr)
        a, b = row["sf0.1"], row["sf1"]
        row["ratios"] = {
            "wall": round(b["wall_s"] / a["wall_s"], 2) if a["wall_s"] else None,
            "rows": round(b["rows"] / a["rows"], 2) if a["rows"] else None,
            "shuffle_write": (
                round(b["shuffle_write_mb"] / a["shuffle_write_mb"], 2)
                if a["shuffle_write_mb"]
                else None
            ),
        }
        results[name] = row

    out_json = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sf1_sweep.json")
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)

    print("| query | sf0.1 s | sf1 s | wall x | rows x | shuf W sf0.1 MB | shuf W sf1 MB | shuf x |")
    print("|---|---|---|---|---|---|---|---|")
    for name, row in results.items():
        a, b, r = row["sf0.1"], row["sf1"], row["ratios"]
        print(
            f"| `{name}` | {a['wall_s']} | {b['wall_s']} | {r['wall']} "
            f"| {r['rows']} | {a['shuffle_write_mb']} "
            f"| {b['shuffle_write_mb']} | {r['shuffle_write']} |"
        )


if __name__ == "__main__":
    main()
