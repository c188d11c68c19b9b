"""Randomized-corpus cross-check of the ingest substring-dedup family.

Builds seeded random corpora with planted cross-half and within-batch
duplications, then asserts three-way agreement per corpus:

  pure-Python reference  ==  two-frame operator  ==  fused one-scan form

The pure-Python reference implements the documented semantics directly
(normalize -> whitespace-tokenize -> W-token windows; store hits win
over within-batch keep-first; gaps-and-islands coverage), so a bug
shared by both Spark forms (which share ``_report_core``) still gets
caught. Complements the single-fixture precedence test and the
driver-side DuckDB oracle, which both exercise only one corpus shape.
"""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.operators import (
    spans as SP,
)

W = 4


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", text.lower()).strip()
    return t.split(" ") if t else [""]  # split("") semantics: [""]


def _windows(toks: list[str]) -> list[str]:
    return [" ".join(toks[i : i + W]) for i in range(len(toks) - W + 1)]


def _reference(store_docs, batch_docs):
    """dict: id -> (n_toks, n_store, n_batch, dup_tokens, fraction)."""
    store = set()
    for _, text in store_docs:
        store.update(_windows(_norm_tokens(text)))
    seen_in_batch: dict[str, tuple[int, int]] = {}
    per_doc: dict[int, list[tuple[int, bool, bool]]] = {}
    toks_by_doc = {}
    for did, text in sorted(batch_docs):
        toks = _norm_tokens(text)
        toks_by_doc[did] = toks
        for i, win in enumerate(_windows(toks), start=1):
            first = seen_in_batch.setdefault(win, (did, i))
            hit_store = win in store
            hit_batch = (not hit_store) and (first != (did, i))
            if hit_store or hit_batch:
                per_doc.setdefault(did, []).append((i, hit_store, hit_batch))
    # hit_batch above uses GLOBAL (id, pos) first occurrence, which is
    # what (id, i)-ordered insertion over sorted docs produces
    out = {}
    for did, flags in per_doc.items():
        flags.sort()
        # islands merge over window starts: starts p, q (p > q) join
        # iff p <= q + W
        merged = []
        for i, _hs, _hb in flags:
            if merged and i <= merged[-1][1] + W:
                merged[-1][1] = i
            else:
                merged.append([i, i])
        dup_tokens = sum(e - s + W for s, e in merged)
        out[did] = (
            len(toks_by_doc[did]),
            sum(1 for _, hs, _ in flags if hs),
            sum(1 for _, _, hb in flags if hb),
            dup_tokens,
            dup_tokens / len(toks_by_doc[did]),
        )
    return out


def _spark_result(df) -> dict:
    return {
        r["doc_id"]: (
            r["n_toks"],
            r["n_store_windows"],
            r["n_batch_windows"],
            r["dup_tokens"],
            r["dup_fraction"],
        )
        for r in df.collect()
    }


def _random_corpus(rng: random.Random):
    vocab = [f"w{k}" for k in range(30)]
    phrases = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(W, W + 4)))
        for _ in range(6)
    ]

    def doc() -> str:
        parts = []
        for _ in range(rng.randint(1, 4)):
            if rng.random() < 0.5:
                parts.append(rng.choice(phrases))  # plant duplication
            else:
                parts.append(
                    " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 9)))
                )
        return "  ".join(parts)  # multi-space: exercises normalization

    docs = [(i, doc()) for i in range(rng.randint(8, 16))]
    store = [(i, t) for i, t in docs if i % 2 == 0]
    batch = [(i, t) for i, t in docs if i % 2 == 1]
    return docs, store, batch


def test_three_way_agreement_on_random_corpora(spark):
    rng = random.Random(1234)
    for _ in range(5):
        docs, store, batch = _random_corpus(rng)
        ref = _reference(store, batch)
        all_df = spark.createDataFrame(docs, "doc_id long, text string")
        two = _spark_result(
            SP.incremental_substring_report(
                all_df.where(F.col("doc_id") % 2 == 1),
                all_df.where(F.col("doc_id") % 2 == 0),
                "text",
                "doc_id",
                W,
            )
        )
        fused = _spark_result(
            SP.fused_incremental_substring_report(
                all_df, F.col("doc_id") % 2 == 1, "text", "doc_id", W
            )
        )
        assert set(two) == set(ref) == set(fused)
        for did in ref:
            assert two[did] == fused[did]
            assert two[did][:4] == ref[did][:4], (did, two[did], ref[did])
            assert abs(two[did][4] - ref[did][4]) < 1e-12


def test_fused_report_null_predicate_raises(spark):
    """A batch predicate that evaluates to NULL must fail loudly at
    action time, not silently classify the row as store (ADVICE r12)."""
    import pytest

    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (None, "a b c d e f g h")],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="batch_pred evaluated to NULL"):
        SP.fused_incremental_substring_report(
            df, F.col("doc_id") % 2 == 1, "text", "doc_id", W
        ).collect()


def test_hot_window_skew_parity_and_plan(spark, tmp_path):
    """Adversarial skew at the DATA level (r12 verdict directive 6): one
    boilerplate phrase planted in >30% of docs makes its window hashes
    pathologically hot. Parity vs the pure-Python reference must hold,
    and the pinned skew-tolerant plan shape must survive: ONE parquet
    scan (fused form), the hv hash-partitioned exchange, no cross
    product, no Python stage."""
    rng = random.Random(42)
    vocab = [f"w{k}" for k in range(500)]
    boiler = "terms of service apply to all content here".split()  # 8 toks
    docs = []
    for did in range(200):
        toks = [vocab[rng.randrange(len(vocab))] for _ in range(rng.randint(10, 30))]
        if did % 3 == 0:  # ~33% of docs carry the identical hot windows
            cut = rng.randint(0, len(toks))
            toks = toks[:cut] + boiler + toks[cut:]
        docs.append((did, " ".join(toks)))
    src = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(src)
    out = SP.fused_incremental_substring_report(
        spark.read.parquet(src), F.col("doc_id") % 2 == 1, "text", "doc_id", W
    )
    got = _spark_result(out)
    ref = _reference(
        [(i, t) for i, t in docs if i % 2 == 0],
        [(i, t) for i, t in docs if i % 2 == 1],
    )
    assert set(got) == set(ref)
    # every odd boilerplate carrier must be flagged (its hot windows sit
    # in the even half's store) — the skew rows are the tested rows
    assert {d for d in ref if d % 6 == 3} <= set(got)
    for did in ref:
        assert got[did][:4] == ref[did][:4], (did, got[did], ref[did])
        assert abs(got[did][4] - ref[did][4]) < 1e-12
    # formatted mode (same basis as tools/explain_audit.py's pin):
    # AdaptiveSparkPlan.toString would double-count nodes by printing
    # both the Current and Initial plans
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)
    assert len(scans) == 1, plan
    assert "hashpartitioning(hv#" in plan, plan
    for bad in ("CartesianProduct", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, plan
