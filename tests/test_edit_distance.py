"""Edit-distance near-dup operator: blocking bounds, threshold pruning,
and the ASCII parity domain (operators/dedup.edit_distance_pairs)."""

from __future__ import annotations

from datafoundation_multi_source_retail_data_integration_hub_spark.operators import dedup


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = dedup.edit_distance_pairs(df, "text", "doc_id", **kw)
    return {(r["id1"], r["id2"]): r["edit_distance"] for r in out.collect()}


def test_detects_small_edits_within_block(spark):
    base = "the quick brown fox jumps over the lazy dog " * 3
    rows = [
        (1, base),
        (2, base + " tail"),          # 5 appended chars
        (3, base.replace("lazy", "hazy")),  # 1 substitution per occurrence (3x)
        (4, "completely different prefix so a different block entirely"),
    ]
    got = _pairs(spark, rows, prefix_len=24, threshold=16, max_block=8)
    assert got[(1, 2)] == 5
    assert got[(1, 3)] == 3
    assert (1, 4) not in got and (2, 4) not in got  # different block


def test_threshold_prunes_and_length_filter_is_lossless(spark):
    base = "shared prefix shared prefix shared prefix"
    rows = [
        (1, base),
        (2, base + " " + "x" * 40),  # distance 41 > threshold 16
    ]
    got = _pairs(spark, rows, prefix_len=24, threshold=16, max_block=8)
    # |len1-len2| = 41 > 16: pruned by the length band before the DP runs,
    # and the DP itself would return -1 — either way the pair is absent.
    assert got == {}
    # raising the threshold past the distance admits the pair
    got = _pairs(spark, rows, prefix_len=24, threshold=64, max_block=8)
    assert got == {(1, 2): 41}


def test_block_cap_bounds_the_quadratic(spark):
    base = "boilerplate header boilerplate header boilerplate"
    rows = [(i, base + f" row {i}") for i in range(10)]
    # cap below the block size: the whole boilerplate cluster is skipped
    assert _pairs(spark, rows, prefix_len=24, threshold=16, max_block=4) == {}
    # cap at/above the block size: pairs appear
    got = _pairs(spark, rows, prefix_len=24, threshold=16, max_block=16)
    assert len(got) == 45  # C(10, 2)


def test_non_ascii_rows_are_outside_the_parity_domain(spark):
    base = "shared prefix shared prefix shared prefix"
    rows = [(1, base + " resume"), (2, base + " résumé")]
    # Spark (codepoints) and DuckDB (bytes) disagree on non-ASCII
    # levenshtein, so the operator excludes such rows entirely.
    assert _pairs(spark, rows, prefix_len=24, threshold=16, max_block=8) == {}
