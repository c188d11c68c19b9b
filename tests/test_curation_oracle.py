"""Corpus-curation queries (segment dedup, unigram familiarity,
cluster-representative selection, PII masking) match their DuckDB
oracles, plus semantic invariants and the redact_pii cross-engine
equivalence on synthetic PII strings."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.functions import text as TX
from datafoundation_multi_source_retail_data_integration_hub_spark.queries import curation

from .conftest import SF_SMOKE
from .oracle import compare


@pytest.mark.parametrize("name", sorted(curation.QUERIES))
def test_curation_query_matches_oracle(spark, name):
    compare(
        spark, SF_SMOKE, curation.QUERIES[name], curation.ORACLES[name], name
    )


def test_segment_dedup_keeps_first_and_conserves_segments(spark):
    out = curation.doc_segment_dedup(spark, SF_SMOKE).collect()
    # every doc is present, kept <= total, and doc 0 (lowest id) keeps all
    # its segments (nothing can precede it)
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 500
    for r in out:
        assert 0 <= r["n_kept_segments"] <= r["n_segments"]
    first = by_id[min(by_id)]
    assert first["n_kept_segments"] == first["n_segments"]
    # cleaned_text word count == kept segments' token total (joins with
    # single spaces, no stray separators)
    for r in out[:20]:
        if r["cleaned_text"]:
            assert len(r["cleaned_text"].split(" ")) <= (
                r["n_kept_segments"] * curation.SEG_LEN
            )


def test_familiarity_bounds(spark):
    out = curation.doc_unigram_familiarity(spark, SF_SMOKE).collect()
    for r in out:
        assert 0.0 <= r["oov_rate"] <= 1.0
        assert r["mean_token_freq"] >= 1.0  # every token occurs at least once


def test_cluster_best_picks_member_with_max_quality(spark):
    best = {
        r["cluster_rep"]: r
        for r in curation.doc_cluster_best(spark, SF_SMOKE).collect()
    }
    docs = (
        curation._docs(spark, SF_SMOKE)
        .select("doc_id", TX.quality_score(F.col("text")).alias("q"))
        .collect()
    )
    q = {r["doc_id"]: r["q"] for r in docs}
    for rep, r in best.items():
        assert r["best_quality"] == q[r["best_doc_id"]]
        assert r["n_members"] >= 1


def test_redact_pii_matches_duckdb_and_strikes_everything(spark):
    rows = [
        ("contact me at jane.doe+spam@example.co.uk today",),
        ("server 10.0.255.3 answered; backup at 192.168.1.1.",),
        ("call +1 415-555-2671 or 020 7946 0958 now",),
        ("no pii here, just text",),
        ("mixed: a@b.io at 8.8.8.8 tel 5551234567890",),
    ]
    df = spark.createDataFrame(rows, ["s"])
    got = [
        r["red"]
        for r in df.select(TX.redact_pii(F.col("s")).alias("red"))
        .orderBy("red")
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {TX.sql_redact_pii('s')} AS red FROM t ORDER BY red"
        ).fetchall()
    ]
    assert got == want
    joined = " ".join(got)
    assert "@" not in joined
    assert "555" not in joined
    assert "192" not in joined


def test_pii_scrub_recall_no_canary_survives(spark):
    """Every seeded canary is redacted: the scrubbed text contains no
    '@', no '+d-ddd-dddd' phone, no ddd-dd-dddd SSN — the recall
    property the canary-injection design exists to measure."""
    out = curation.doc_pii_scrub(spark, SF_SMOKE)
    survivors = out.where(
        F.col("scrubbed_text").rlike(curation.PII_EMAIL_RE)
        | F.col("scrubbed_text").rlike(curation.PII_PHONE_RE)
        | F.col("scrubbed_text").rlike(curation.PII_SSN_RE)
    ).count()
    assert survivors == 0
    rows = out.collect()
    assert all(r["n_emails"] >= 1 for r in rows)  # every doc got an email
    assert all(
        r["n_redactions"] == r["n_emails"] + r["n_phones"] + r["n_ssns"]
        for r in rows
    )
    # the placeholders actually appear
    one = next(r for r in rows if r["n_ssns"] > 0)
    assert "[EMAIL]" in one["scrubbed_text"] and "[SSN]" in one["scrubbed_text"]


def test_segment_dedup_conserves_distinct_segments(spark):
    """Global keep-first invariant: the number of kept segments across
    the corpus equals the number of DISTINCT segment strings — every
    distinct segment survives exactly once, at its first occurrence.
    (Guards the xxhash64-keyed window: a collision or a wrong window
    spec would break this count.)"""
    import duckdb

    out = curation.doc_segment_dedup(spark, SF_SMOKE)
    kept_total = out.agg(F.sum("n_kept_segments")).first()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    distinct_segs = con.execute(
        f"""
        WITH t AS (SELECT doc_id, {curation._SQL_NORM_TOKS} AS toks FROM documents),
        segs AS (
          SELECT array_to_string(
                   toks[(i*{curation.SEG_LEN}+1):(i*{curation.SEG_LEN}+{curation.SEG_LEN})], ' ') AS seg
          FROM t, LATERAL (
            SELECT unnest(range(0, CAST(ceil(len(toks) / CAST({curation.SEG_LEN} AS DOUBLE)) AS BIGINT))) AS i) u
        )
        SELECT count(DISTINCT seg) FROM segs
        """
    ).fetchone()[0]
    assert kept_total == distinct_segs
