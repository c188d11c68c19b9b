"""Layout clustering: Morton-key kernel + measured file skipping.

Verifies the claim sources/layout.py makes: a Z-order write bounds the
per-file envelope in BOTH dimensions (a secondary-dimension filter skips
most files), where a linear sort skips only on its leading column.
"""

from __future__ import annotations

import pytest

from datafoundation_multi_source_retail_data_integration_hub_spark.sources import layout

SF = "/root/testdata/sf0.01"


def test_morton_kernel_bit_exact(spark):
    # Identity domain (0..65535) makes the affine scale a no-op, so the
    # key must equal the textbook bit interleave: x gets even bits, y odd.
    dom = {"x": (0.0, 65535.0), "y": (0.0, 65535.0)}
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 3), (65535, 0), (0, 65535), (65535, 65535)],
        "x INT, y INT",
    )
    rows = df.select("x", "y", layout.zorder_key("x", "y", dom).alias("z")).collect()
    got = {(r["x"], r["y"]): r["z"] for r in rows}

    def interleave(x, y):
        z = 0
        for b in range(16):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    for (x, y), z in got.items():
        assert z == interleave(x, y), (x, y, z)


def test_scale_clamps_out_of_domain(spark):
    # Stale stats (domain narrower than the data) must clamp, not wrap.
    dom = {"x": (0.0, 10.0), "y": (0.0, 10.0)}
    df = spark.createDataFrame([(-5, 50)], "x INT, y INT")
    (z,) = df.select(layout.zorder_key("x", "y", dom).alias("z")).collect()[0]
    # x clamps to 0 (even bits all 0), y clamps to 65535 (all odd bits set)
    assert z == sum(1 << (2 * b + 1) for b in range(16))


@pytest.fixture(scope="module")
def clustered_paths(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    domains = layout.column_domains(li, ("l_partkey", "l_suppkey"))
    linear = str(base / "linear")
    zordered = str(base / "zorder")
    layout.write_range_clustered(li, linear, ("l_partkey",), n_files=16)
    layout.write_zordered(
        li, zordered, "l_partkey", "l_suppkey", n_files=16, domains=domains
    )
    return linear, zordered, domains


def test_zorder_skips_on_secondary_dimension(spark, clustered_paths):
    linear, zordered, domains = clustered_paths
    lo, hi = domains["l_suppkey"]
    span = hi - lo
    # ~5% band on the SECONDARY dimension (not the linear sort key)
    box = {"l_suppkey": (lo + 0.40 * span, lo + 0.45 * span)}
    lin_hit, lin_total = layout.file_skipping_report(spark, linear, box)
    z_hit, z_total = layout.file_skipping_report(spark, zordered, box)
    assert lin_total == 16 and z_total == 16
    # Linear layout is blind to the secondary dim: every file overlaps.
    assert lin_hit >= 14
    # Z-order bounds both dims: a stats-aware reader opens <= half the
    # files (16 morton range-slices ~ a 4x4 grid -> one y-band hits ~4).
    assert z_hit <= 8
    assert z_hit < lin_hit


def test_linear_still_wins_on_leading_dimension(spark, clustered_paths):
    linear, _, domains = clustered_paths
    lo, hi = domains["l_partkey"]
    span = hi - lo
    box = {"l_partkey": (lo + 0.50 * span, lo + 0.55 * span)}
    hit, total = layout.file_skipping_report(spark, linear, box)
    assert total == 16
    # Disjoint range slices: a 5% leading-dim band overlaps O(1) files.
    assert hit <= 3


def test_layouts_preserve_data(spark, clustered_paths):
    linear, zordered, _ = clustered_paths
    pred = "l_suppkey BETWEEN 40 AND 45 AND l_partkey BETWEEN 100 AND 400"
    a = spark.read.parquet(linear).where(pred)
    b = spark.read.parquet(zordered).where(pred)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b and len(rows_a) > 0


def test_morton_key_roundtrip_bijective(spark):
    # the interleave must be invertible: deinterleaving the key in Python
    # recovers the scaled coordinates exactly for arbitrary in-domain
    # points (identity domain -> scale is a no-op)
    import random

    rng = random.Random(42)
    pts = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(64)]
    dom = {"x": (0.0, 65535.0), "y": (0.0, 65535.0)}
    df = spark.createDataFrame(pts, "x INT, y INT")
    rows = df.select("x", "y", layout.zorder_key("x", "y", dom).alias("z")).collect()

    def deinterleave(z):
        x = y = 0
        for b in range(16):
            x |= ((z >> (2 * b)) & 1) << b
            y |= ((z >> (2 * b + 1)) & 1) << b
        return x, y

    for r in rows:
        assert deinterleave(r["z"]) == (r["x"], r["y"])
