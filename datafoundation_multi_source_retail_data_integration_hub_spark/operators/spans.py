"""Substring-level exact dedup: duplicated token-window span detection.

Document-level dedup (``operators/dedup.py``) removes whole near-identical
documents; this operator finds *substring* duplication — runs of >= W
consecutive tokens that occur more than once anywhere in the corpus — the
ExactSubstr pass of Lee et al., "Deduplicating Training Data Makes
Language Models Better" (ACL 2022), re-expressed as relational algebra
instead of a suffix array:

1. every document emits its positional W-token window hashes
   (tokenize once per row, hash each window — a flat (doc, pos, hash)
   relation);
2. a window is *duplicated* iff its hash occurs at more than one
   (doc, pos) location corpus-wide — one count-over-hash-partition pass;
3. per document, overlapping/adjacent duplicated windows merge into
   maximal spans (gaps-and-islands over window start positions): window
   starts p and q (p > q) belong to one span iff p <= q + W, because the
   token intervals [p, p+W-1] and [q, q+W-1] then overlap or adjoin.

A suffix array finds duplicated runs of *any* length >= W in one global
sort; the windowed relational form finds exactly the same spans (every
duplicated run of length L >= W is covered by its L - W + 1 duplicated
windows, which merge back into the run in step 3) at the cost of W-gram
instead of suffix granularity — and in exchange every step is a plain
shuffle Catalyst/AQE can plan: no global order, no single-machine array.

Scale shape (the 100 TB plan):
- step 1 is a stateless per-row explode — scan-parallel, no shuffle;
- step 2 shuffles (doc, pos, hash) by hash — the one unavoidable
  all-to-all, balanced because md5 keys are uniform (no skew salt
  needed); the count runs as a window aggregate so positions ride the
  same shuffle instead of a second groupBy+join pass over the postings;
- step 3 shuffles only the *duplicated* windows by doc_id (a small
  fraction on a healthy corpus) and merges islands with two
  sort-within-partition window passes.
Hash collisions (60-bit keys): ~n_windows^2 / 2^61 false duplicate
windows — negligible below ~10^8 windows per collision; acceptable for
a dedup *report*, and a 128-bit key swap is one helper change.

Reference parity: the reference repo has no substring dedup (its dedup
surface is ``drop_duplicates``, reference ``etl/transform.py``); this is
part of the training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from .storage import persist_tracked


def window_hash_positions(
    df: DataFrame,
    text_col: str,
    id_col: str,
    w: int,
    staged: DataFrame | None = None,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, n_toks, i, hv) — one row per W-token window of every document;
    ``i`` is 1-based, ``hv`` the 60-bit window hash (``TX.md5_long`` of the
    space-joined gram, identical to the DuckDB twins' expression).

    The window index is EXPLODED FIRST and the gram + hash are top-level
    projections: a ``transform``-lambda body evaluates OUTSIDE whole-stage
    codegen (interpreted expression eval per element), measured 2.5x
    slower at sf0.1 (0.54 s vs 0.21 s for the corpus's 236k windows) than
    this generate-then-project form, where concat/md5/conv all stay inside
    one codegen stage. The exploded rows carry the token array only within
    the stage (pruned before any exchange), so nothing wider than
    (id, n_toks, i, hv) ever shuffles.

    ``staged``: an already-tokenized (id_col, __tl) frame — pass it when
    the caller also consumes the token arrays (e.g. the trim join), so
    one persisted tokenize pass feeds both subtrees.

    ``carry``: extra ``df``/``staged`` columns to ride along unchanged
    (e.g. a source tag for the fused ingest probe) — they stay inside
    the same codegen stage, so carrying them is free."""
    toks = staged if staged is not None else df.select(
        F.col(id_col).alias(id_col),
        # stage the token array once; a multi-referenced split alias is
        # NOT inlined by CollapseProject (functions/text.py note)
        TX.ws_tokens(TX.normalized_text(F.col(text_col))).alias("__tl"),
        *carry,
    )
    idx = TX._index_range(F.size("__tl") - (w - 1))
    return toks.select(
        id_col,
        F.size("__tl").alias("n_toks"),
        "__tl",
        F.explode(idx).alias("i"),  # 1-based, matches the SQL twin
        *carry,
    ).select(
        id_col,
        "n_toks",
        "i",
        TX.md5_long(F.concat_ws(" ", F.slice(F.col("__tl"), F.col("i"), w))).alias(
            "hv"
        ),
        *carry,
    )


def duplicated_window_positions(
    df: DataFrame, text_col: str, id_col: str, w: int
) -> DataFrame:
    """(id, n_toks, i, hv) rows for every W-token window whose hash occurs
    at more than one (doc, pos) location corpus-wide. ``i`` is 1-based.

    Skew posture: the duplicate test is a partial-agg'd
    ``groupBy(hv).count`` joined back to the PERSISTED postings — NOT a
    count-over-window. A window partitioned by ``hv`` concentrates every
    occurrence of a hot duplicated gram (exactly what a dup-heavy corpus
    contains) into ONE unsplittable task; the groupBy combines map-side
    and the semi-join is AQE-skew-splittable. The postings persist
    because both join sides consume them (one tokenize+hash pass;
    postings are narrow (id, n_toks, i, hv) rows, the same bytes the
    window form would have shuffled). Measured FASTER than the window
    form at sf0.1 (0.54 s vs 0.99 s min-of-3) on top of the skew
    robustness."""
    pos = persist_tracked(window_hash_positions(df, text_col, id_col, w))
    dup_keys = (
        pos.groupBy("hv")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .where(F.col("__cnt") > 1)
        .select("hv")
    )
    return pos.join(dup_keys, "hv", "left_semi")


def merge_spans(dpos: DataFrame, id_col: str, w: int) -> DataFrame:
    """Gaps-and-islands merge of duplicated window starts into maximal
    spans: one row per (id, span) with ``span_toks`` (merged token length)
    and ``n_wins`` (windows merged). Shuffles by document id only."""
    wdoc = Window.partitionBy(id_col).orderBy("i")
    # first row per doc: lag is NULL -> the WHEN predicate is NULL -> new
    # island (1), identical CASE semantics in Spark and DuckDB
    brk = F.when(F.col("i") <= F.lag("i").over(wdoc) + w, F.lit(0)).otherwise(
        F.lit(1)
    )
    grp = dpos.withColumn("__brk", brk).withColumn(
        "isl", F.sum("__brk").over(wdoc)
    )
    return grp.groupBy(id_col, "isl").agg(
        F.min("n_toks").alias("n_toks"),  # constant per doc
        F.min("i").alias("span_start"),
        (F.max("i") + w - 1).alias("span_end"),
        (F.max("i") - F.min("i") + w).alias("span_toks"),
        F.count(F.lit(1)).alias("n_wins"),
    )


def substring_dup_report(
    df: DataFrame, text_col: str, id_col: str, w: int
) -> DataFrame:
    """Per-document duplicated-substring report: documents carrying at
    least one duplicated W-token window, with merged-span counts and the
    duplicated-token fraction. Columns: (id, n_toks, n_dup_spans,
    n_dup_windows, dup_tokens, dup_fraction)."""
    dpos = duplicated_window_positions(df, text_col, id_col, w)
    spans = merge_spans(dpos, id_col, w)
    return spans.groupBy(id_col, "n_toks").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum("n_wins").alias("n_dup_windows"),
        F.sum("span_toks").alias("dup_tokens"),
        (F.sum("span_toks").cast("double") / F.col("n_toks")).alias(
            "dup_fraction"
        ),
    )


def trim_duplicated_spans(
    df: DataFrame, text_col: str, id_col: str, w: int
) -> DataFrame:
    """Keep-first substring dedup: every token covered by a NON-FIRST
    occurrence of a duplicated W-token window is removed; the globally
    first occurrence (lowest ``(id, position)``) keeps its copy. Returns
    one row per input document: (id, n_toks, kept_tokens, trimmed_text)
    — ``trimmed_text`` rebuilt from the normalized kept tokens (a doc
    fully covered by later-occurrence spans trims to '').

    Plan: the duplicate count AND the global-first occurrence come from
    ONE partial-agg'd ``groupBy(hv)`` (count + min(struct(id, i))),
    joined back to the postings — the skew posture of
    :func:`duplicated_window_positions` (a rank-over-window would pin a
    hot gram's every occurrence to one unsplittable task). Only the
    drop-set windows re-shuffle for the islands merge, collapse to
    per-doc span arrays (doc-grain), and join back to the documents on
    id. Token removal is then a map-side higher-order filter over the
    staged token array — the corpus token stream itself never shuffles
    (an exploded (doc, pos, token) anti-join formulation would move
    every token)."""
    # ONE persisted tokenize pass feeds both the window-hash subtree and
    # the final span join — unpersisted, the regexp lower/collapse/split
    # pipeline (the dominant scan cost) would run twice from source.
    # The postings persist too: the first-occurrence aggregate and the
    # drop-set join both consume them (0.91 s vs the old 1.30 s
    # window-form min-of-3 at sf0.1).
    toks = persist_tracked(
        df.select(
            F.col(id_col).alias(id_col),
            TX.ws_tokens(TX.normalized_text(F.col(text_col))).alias("__tl"),
        )
    )
    pos = persist_tracked(
        window_hash_positions(df, text_col, id_col, w, staged=toks)
    )
    # min(struct(id, i)) = the row row_number-over-(id, i) would rank 1:
    # struct comparison is lexicographic by field order
    firsts = (
        pos.groupBy("hv")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.min(F.struct(F.col(id_col), F.col("i"))).alias("__first"),
        )
        .where(F.col("__cnt") > 1)
        .select("hv", "__first")
    )
    drop = (
        pos.join(firsts, "hv")
        .where(
            ~(
                (F.col(id_col) == F.col("__first")[id_col])
                & (F.col("i") == F.col("__first")["i"])
            )
        )
        .select(id_col, "n_toks", "i", "hv")
    )
    spans = merge_spans(drop, id_col, w)
    span_arr = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("__spans")
    )
    joined = toks.join(span_arr, id_col, "left").select(
        id_col,
        "__tl",
        # no drops -> empty span set (NULL would null the exists() below
        # and silently drop every token)
        F.coalesce(
            F.col("__spans"), F.array().cast("array<struct<s:long,e:long>>")
        ).alias("__sp"),
    )
    kept = F.filter(
        F.col("__tl"),
        lambda tok, i0: ~F.exists(
            F.col("__sp"),
            lambda sp: (i0 + 1 >= sp["s"]) & (i0 + 1 <= sp["e"]),
        ),
    )
    return joined.select(
        id_col,
        F.size("__tl").alias("n_toks"),
        F.size(kept).alias("kept_tokens"),
        F.array_join(kept, " ").alias("trimmed_text"),
    )


def _window_hashes_raw(df: DataFrame, text_col: str, w: int) -> DataFrame:
    """All W-token window hashes of a corpus, WITH multiplicity — the
    pre-distinct form of :func:`window_hash_store`. One column: ``hv``."""
    toks = df.select(
        TX.ws_tokens(TX.normalized_text(F.col(text_col))).alias("__tl")
    )
    idx = TX._index_range(F.size("__tl") - (w - 1))
    # explode-first + top-level hash: see window_hash_positions
    return toks.select("__tl", F.explode(idx).alias("__i")).select(
        TX.md5_long(
            F.concat_ws(" ", F.slice(F.col("__tl"), F.col("__i"), w))
        ).alias("hv")
    )


def window_hash_store(df: DataFrame, text_col: str, w: int) -> DataFrame:
    """DISTINCT W-token window hashes of a corpus — 8 bytes per window,
    the artifact a pipeline PERSISTS between ingests (the substring-grade
    analogue of the 16-byte doc fingerprint store). One column: ``hv``."""
    return _window_hashes_raw(df, text_col, w).distinct()


def incremental_substring_report(
    new_batch: DataFrame,
    store_docs: DataFrame,
    text_col: str,
    id_col: str,
    w: int,
) -> DataFrame:
    """Ingest-time substring dedup against an established corpus given as
    DOCUMENTS; see :func:`report_against_store` for the store-based form
    and semantics.

    The inline store build deliberately SKIPS the distinct: the fused
    probe is multiplicity-insensitive (store rows contribute only through
    ``max(__src)`` over the hv partition; the within-batch count/rank are
    batch-conditional), so deduplicating first would pay a full extra
    exchange + hash aggregate of the store's windows for identical
    results. Only a pipeline that PERSISTS the store between ingests
    should pay the distinct (:func:`window_hash_store`) — once, at write
    time, for the 8-bytes-per-distinct-window artifact."""
    return report_against_store(
        new_batch, _window_hashes_raw(store_docs, text_col, w),
        text_col, id_col, w,
    )


def report_against_store(
    new_batch: DataFrame,
    store_hv: DataFrame,
    text_col: str,
    id_col: str,
    w: int,
    pos: DataFrame | None = None,
) -> DataFrame:
    """Ingest-time substring dedup: flag every W-token window of the
    incoming batch that (a) already exists in the persisted window-hash
    STORE (``hit_store`` — wins when both hold, mirroring
    ``incremental_dedup``'s dup_of_seen precedence) or (b) duplicates an
    earlier ``(id, position)`` within the batch itself (``hit_batch``,
    keep-first). Returns one row per incoming document that carries at
    least one flagged window: (id, n_toks, n_store_windows,
    n_batch_windows, dup_tokens, dup_fraction) with ``dup_tokens`` the
    gaps-and-islands merged coverage of all flagged windows.

    Scale shape — ONE hash shuffle, one doc shuffle, nothing computed
    twice (the r07 form cost 7.2x vs the oracle: it window-passed the
    batch, DISTINCT-shuffled the store, equi-joined them, then consumed
    ``flagged`` twice — once for per-doc flag counts, once for the
    islands merge — recomputing the whole upstream):

    - the store rows UNION into the batch's window pass with a source
      tag, so the store probe rides the SAME hv shuffle: ``seen`` is a
      max-over-partition of the tag, the within-batch count/rank are
      tag-conditional window aggregates (store rows contribute nothing),
      and no join or store-side distinct exists at all;
    - the per-doc flag counts ride the islands aggregation (carried
      through the (id, island) and (id) groupBys, which reuse the doc
      shuffle's partitioning) instead of a second consumer + join.
    Both passes are ingest-sized plus the store's 8-byte rows — the
    established corpus contributes only its hash store.

    Skew boundary: the fused window pass pins each hv's occurrences to
    one task — acceptable here because the window side is ONE INGEST
    BATCH (multiplicity bounded by batch size), unlike the corpus-wide
    batch operators (:func:`duplicated_window_positions`,
    :func:`trim_duplicated_spans`), which use the partial-agg groupBy +
    AQE-splittable join form for exactly that reason.

    ``pos``: an already-computed ``window_hash_positions(new_batch, ...)``
    frame — pass it (persisted) when the caller also folds the batch's
    windows into the store, so one tokenize+hash pass feeds both the
    report and the store merge (the streaming ingest handler re-derived
    the windows from the raw text for each consumer before r11: two full
    scans per micro-batch)."""
    if pos is None:
        pos = window_hash_positions(new_batch, text_col, id_col, w)
    pos = pos.withColumn("__src", F.lit(0))
    id_type, n_type, i_type = [f.dataType for f in pos.schema.fields[:3]]
    store_rows = store_hv.select(
        F.lit(None).cast(id_type).alias(id_col),
        F.lit(None).cast(n_type).alias("n_toks"),
        F.lit(None).cast(i_type).alias("i"),
        "hv",
        F.lit(1).alias("__src"),
    )
    return _report_core(pos.unionByName(store_rows), id_col, w)


def fused_incremental_substring_report(
    docs: DataFrame,
    batch_pred: Column,
    text_col: str,
    id_col: str,
    w: int,
) -> DataFrame:
    """One-scan form of :func:`incremental_substring_report` for the
    common case where the established corpus and the incoming batch are
    ROW SUBSETS OF ONE SOURCE (an ingest ledger with a batch flag, a
    parity split, ...). ``batch_pred`` marks the batch rows; every other
    row plays the store.

    The two-frame form scans the source TWICE — a row-level predicate
    like ``doc_id % 2 = 1`` cannot push into a parquet scan, so each
    half reads every row group and filters — and runs the
    tokenize+window-hash pipeline as two separate map subtrees. Here
    ONE scan + ONE tokenize/hash pass covers both halves; the source
    tag rides the same codegen stage (``carry``) into the shared hv
    shuffle, and everything downstream is :func:`_report_core`
    unchanged. Same result, half the scan bytes and map work
    (measured at sf0.1: see queries/pipelineops.py's ingest note).

    Store rows keep their real (id, n_toks, i) — the core's batch-row
    rank counts only batch rows, so store rows' sort position is
    irrelevant; ``batch_pred`` must be deterministic and non-NULL (a
    NULL evaluation raises at action time rather than silently
    classifying the row as store)."""
    src = F.when(batch_pred, F.lit(0)).when(~batch_pred, F.lit(1))
    tagged = docs.select(
        F.col(id_col).alias(id_col),
        F.col(text_col).alias(text_col),
        F.coalesce(
            src,
            F.raise_error(
                F.lit(
                    "fused_incremental_substring_report: batch_pred "
                    "evaluated to NULL; supply a non-NULL predicate"
                )
            ).cast("int"),
        ).alias("__src"),
    )
    pos = window_hash_positions(tagged, text_col, id_col, w, carry=("__src",))
    return _report_core(pos, id_col, w)


def _report_core(pos_tagged: DataFrame, id_col: str, w: int) -> DataFrame:
    """Shared tail of the ingest-time probes: flag store/batch duplicate
    windows over one hv-partitioned window pass, then islands-merge per
    document. ``pos_tagged`` is (id, n_toks, i, hv, __src) with __src=1
    marking store windows — store rows are never reported; their (id,
    n_toks, i) may be NULL (two-frame form) or real (fused form), and
    batch/store ids never collide within a hv partition's ordering
    because the halves are disjoint row sets."""
    whash = Window.partitionBy("hv")
    # cumulative batch-row count in (id, i) order == row_number among
    # batch rows; store rows contribute nothing wherever they sort
    wrank = (
        Window.partitionBy("hv")
        .orderBy(id_col, "i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_batch = F.col("__src") == 0
    marked = (
        pos_tagged
        .withColumn("__cnt", F.count(F.when(is_batch, 1)).over(whash))
        .withColumn("__rnk", F.count(F.when(is_batch, 1)).over(wrank))
        .withColumn("__seen", F.max("__src").over(whash) == 1)
    )
    flagged = (
        marked.where(is_batch)
        .select(
            id_col,
            "n_toks",
            "i",
            F.col("__seen").alias("hit_store"),
            (
                (F.col("__cnt") > 1) & (F.col("__rnk") > 1) & ~F.col("__seen")
            ).alias("hit_batch"),
        )
        .where(F.col("hit_store") | F.col("hit_batch"))
    )
    wdoc = Window.partitionBy(id_col).orderBy("i")
    brk = F.when(F.col("i") <= F.lag("i").over(wdoc) + w, F.lit(0)).otherwise(
        F.lit(1)
    )
    grp = flagged.withColumn("__brk", brk).withColumn(
        "isl", F.sum("__brk").over(wdoc)
    )
    # both groupBys reuse the doc shuffle: hash partitioning on id
    # satisfies the (id, isl) and (id, n_toks) clustering requirements
    spans = grp.groupBy(id_col, "n_toks", "isl").agg(
        (F.max("i") - F.min("i") + w).alias("span_toks"),
        F.sum(F.col("hit_store").cast("long")).alias("__st"),
        F.sum(F.col("hit_batch").cast("long")).alias("__bt"),
    )
    return spans.groupBy(id_col, "n_toks").agg(
        F.sum("__st").alias("n_store_windows"),
        F.sum("__bt").alias("n_batch_windows"),
        F.sum("span_toks").alias("dup_tokens"),
        (F.sum("span_toks").cast("double") / F.col("n_toks")).alias(
            "dup_fraction"
        ),
    ).select(
        id_col,
        "n_toks",
        "n_store_windows",
        "n_batch_windows",
        "dup_tokens",
        "dup_fraction",
    )


def sql_incremental_substring_report(
    w: int,
    store_where: str = "doc_id % 2 = 0",
    batch_where: str = "doc_id % 2 = 1",
    source: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`incremental_substring_report`: the
    established corpus = rows matching ``store_where``, the incoming
    batch = rows matching ``batch_where`` (pass ``'1 = 0'`` as
    ``store_where`` for an empty store — the first micro-batch of the
    streaming twin)."""
    hv = TX.sql_md5_long(f"array_to_string(tl[i:i+{w - 1}], ' ')")
    return f"""
WITH __sitoks AS MATERIALIZED (
  SELECT {id_col}, string_split_regex({TX.sql_normalized(text_col)}, '\\s+') AS tl
  FROM {source} WHERE {store_where}
),
__istore AS MATERIALIZED (
  SELECT DISTINCT {hv} AS hv
  FROM __sitoks,
       LATERAL unnest(generate_series(1, greatest(len(tl) - {w} + 1, 0))) AS u(i)
),
__iitoks AS MATERIALIZED (
  SELECT {id_col}, string_split_regex({TX.sql_normalized(text_col)}, '\\s+') AS tl
  FROM {source} WHERE {batch_where}
),
__ipos AS MATERIALIZED (
  SELECT {id_col}, len(tl) AS n_toks, i, {hv} AS hv
  FROM __iitoks,
       LATERAL unnest(generate_series(1, greatest(len(tl) - {w} + 1, 0))) AS u(i)
),
__imark AS (
  SELECT *,
         count(*) OVER (PARTITION BY hv) AS cnt,
         row_number() OVER (PARTITION BY hv ORDER BY {id_col}, i) AS rnk
  FROM __ipos
),
__iflag AS (
  SELECT m.{id_col}, m.n_toks, m.i,
         (s.hv IS NOT NULL) AS hit_store,
         (m.cnt > 1 AND m.rnk > 1 AND s.hv IS NULL) AS hit_batch
  FROM __imark m LEFT JOIN __istore s USING (hv)
  WHERE (s.hv IS NOT NULL) OR (m.cnt > 1 AND m.rnk > 1)
),
__icnt AS (
  SELECT {id_col},
         CAST(sum(CASE WHEN hit_store THEN 1 ELSE 0 END) AS BIGINT)
           AS n_store_windows,
         CAST(sum(CASE WHEN hit_batch THEN 1 ELSE 0 END) AS BIGINT)
           AS n_batch_windows
  FROM __iflag GROUP BY {id_col}
),
__iisl AS (
  SELECT {id_col}, n_toks, i,
         CASE WHEN i <= lag(i) OVER (PARTITION BY {id_col} ORDER BY i) + {w}
              THEN 0 ELSE 1 END AS __brk
  FROM __iflag
),
__igrp AS (
  SELECT {id_col}, n_toks, i,
         sum(__brk) OVER (PARTITION BY {id_col} ORDER BY i) AS isl
  FROM __iisl
),
__ispans AS (
  SELECT {id_col}, min(n_toks) AS n_toks, isl,
         max(i) - min(i) + {w} AS span_toks
  FROM __igrp GROUP BY {id_col}, isl
),
__icov AS (
  SELECT {id_col}, n_toks, CAST(sum(span_toks) AS BIGINT) AS dup_tokens
  FROM __ispans GROUP BY {id_col}, n_toks
)
SELECT c.{id_col}, c.n_toks, n.n_store_windows, n.n_batch_windows,
       c.dup_tokens,
       CAST(c.dup_tokens AS DOUBLE) / c.n_toks AS dup_fraction
FROM __icov c JOIN __icnt n USING ({id_col})
"""


def sql_trim_duplicated_spans(
    w: int, source: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`trim_duplicated_spans`. The token removal is
    expressed as unnest + NOT EXISTS + ordered string_agg (the oracle can
    afford the exploded form; the Spark side must not)."""
    hv = TX.sql_md5_long(f"array_to_string(tl[i:i+{w - 1}], ' ')")
    return f"""
WITH __ttoks AS MATERIALIZED (
  SELECT {id_col}, string_split_regex({TX.sql_normalized(text_col)}, '\\s+') AS tl
  FROM {source}
),
__tpos AS MATERIALIZED (
  SELECT {id_col}, i, {hv} AS hv
  FROM __ttoks,
       LATERAL unnest(generate_series(1, greatest(len(tl) - {w} + 1, 0))) AS u(i)
),
__tmark AS (
  SELECT {id_col}, i,
         count(*) OVER (PARTITION BY hv) AS cnt,
         row_number() OVER (PARTITION BY hv ORDER BY {id_col}, i) AS rnk
  FROM __tpos
),
__tdrop AS (SELECT {id_col}, i FROM __tmark WHERE cnt > 1 AND rnk > 1),
__tisl AS (
  SELECT {id_col}, i,
         CASE WHEN i <= lag(i) OVER (PARTITION BY {id_col} ORDER BY i) + {w}
              THEN 0 ELSE 1 END AS __brk
  FROM __tdrop
),
__tgrp AS (
  SELECT {id_col}, i,
         sum(__brk) OVER (PARTITION BY {id_col} ORDER BY i) AS isl
  FROM __tisl
),
__tspans AS (
  SELECT {id_col}, min(i) AS s, max(i) + {w} - 1 AS e
  FROM __tgrp GROUP BY {id_col}, isl
),
__ttok AS (
  SELECT {id_col}, i, tl[i] AS tok
  FROM __ttoks, LATERAL unnest(generate_series(1, len(tl))) AS u(i)
),
__tkept AS (
  SELECT t.{id_col}, count(*) AS kept_tokens,
         string_agg(t.tok, ' ' ORDER BY t.i) AS trimmed_text
  FROM __ttok t
  WHERE NOT EXISTS (
    SELECT 1 FROM __tspans s
    WHERE s.{id_col} = t.{id_col} AND t.i BETWEEN s.s AND s.e
  )
  GROUP BY t.{id_col}
)
SELECT d.{id_col},
       len(d.tl) AS n_toks,
       COALESCE(k.kept_tokens, 0) AS kept_tokens,
       COALESCE(k.trimmed_text, '') AS trimmed_text
FROM __ttoks d LEFT JOIN __tkept k USING ({id_col})
"""


def sql_substring_dup_report(
    w: int, source: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`substring_dup_report` — same tokenize /
    window-hash / count>1 / islands pipeline (positions staged through
    MATERIALIZED CTEs so the tokenizer runs once per row)."""
    hv = TX.sql_md5_long(f"array_to_string(tl[i:i+{w - 1}], ' ')")
    return f"""
WITH __toks AS MATERIALIZED (
  SELECT {id_col}, string_split_regex({TX.sql_normalized(text_col)}, '\\s+') AS tl
  FROM {source}
),
__pos AS MATERIALIZED (
  SELECT {id_col}, len(tl) AS n_toks, i, {hv} AS hv
  FROM __toks,
       LATERAL unnest(generate_series(1, greatest(len(tl) - {w} + 1, 0))) AS u(i)
),
__dpos AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY hv) AS __cnt FROM __pos
  ) WHERE __cnt > 1
),
__isl AS (
  SELECT {id_col}, n_toks, i,
         CASE WHEN i <= lag(i) OVER (PARTITION BY {id_col} ORDER BY i) + {w}
              THEN 0 ELSE 1 END AS __brk
  FROM __dpos
),
__grp AS (
  SELECT {id_col}, n_toks, i,
         sum(__brk) OVER (PARTITION BY {id_col} ORDER BY i) AS isl
  FROM __isl
),
__spans AS (
  SELECT {id_col}, min(n_toks) AS n_toks, isl,
         max(i) - min(i) + {w} AS span_toks, count(*) AS n_wins
  FROM __grp GROUP BY {id_col}, isl
)
SELECT {id_col}, n_toks,
       count(*) AS n_dup_spans,
       CAST(sum(n_wins) AS BIGINT) AS n_dup_windows,
       CAST(sum(span_toks) AS BIGINT) AS dup_tokens,
       CAST(sum(span_toks) AS DOUBLE) / n_toks AS dup_fraction
FROM __spans GROUP BY {id_col}, n_toks
"""
