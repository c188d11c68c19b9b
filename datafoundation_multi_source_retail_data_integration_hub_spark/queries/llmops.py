"""Training-data pipeline operators beyond dedup/similarity: deterministic
sampling & split assignment, vocabulary building, TF-IDF term extraction,
and sequence packing — each expressed as one declarative Spark plan with
an exact DuckDB oracle.

These are the ops a 100 TB corpus pipeline runs between "raw documents"
and "training shards":

- **hash sampling / splits**: NEVER ``rand()`` — a content- or id-keyed
  hash makes the sample/split a pure function of the row, so re-runs,
  backfills, and incremental loads agree. One narrow projection, no
  shuffle at all.
- **vocabulary**: explode -> hash-partitioned count -> top-k. Partial
  aggregation does the heavy lifting map-side; only (token, count) pairs
  shuffle.
- **TF-IDF**: two hash aggregations (term-frequency per doc, document
  frequency per term) joined back on the term — all equi-joins on the
  token. The idf is kept as the raw ratio (N+1)/(df+1) WITHOUT the log:
  log is monotone, so top-k term ranking is identical, and the ratio is
  a single IEEE division that matches bit-for-bit across engines
  (ln() rounding may differ in the last ulp between libm builds).
- **sequence packing**: greedy token-budget binning via a running-sum
  window. Packing is inherently sequential, so it runs per SHARD (a hash
  of the doc id) — shards pack in parallel, each shard's window is a
  bounded partition, and the (shard, bin) pair is the pack key. This is
  exactly how production packing shards 100 TB: no global order exists,
  only per-shard order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..sources.tables import load_table_spread, load_tables

SAMPLE_PCT = 10  # doc_hash_sample keeps h % 100 < SAMPLE_PCT
TRAIN_PCT = 80  # train/val/test = 80/10/10
VAL_PCT = 90
VOCAB_K = 100
TFIDF_TOP = 3
PACK_TARGET_TOKENS = 512  # context-window token budget per packed sequence
PACK_SHARDS = 8


def _docs(spark: SparkSession, sf_dir: str, spread: bool = True) -> DataFrame:
    # spread: see textops._docs — heavy per-row queries keep the
    # scan-fanout repartition barrier, light ones opt out (measured).
    if not spread:
        return load_tables(spark, sf_dir, "documents")["documents"]
    return load_table_spread(spark, sf_dir, "documents")


def _id_hash(col: str = "doc_id") -> F.Column:
    """60-bit deterministic hash of the document id (not the content:
    sample membership must survive text edits/recrawls)."""
    return TX.md5_long(F.col(col).cast("string"))


def _sql_id_hash(col: str = "doc_id") -> str:
    return TX.sql_md5_long(f"CAST({col} AS VARCHAR)")


# ---------------------------------------------------------------------------
# deterministic sampling + split assignment
# ---------------------------------------------------------------------------


def doc_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible SAMPLE_PCT% sample — a filter, not a rand(): the same
    doc is in the sample on every run, on every engine."""
    d = _docs(spark, sf_dir, spread=False)
    return d.filter(_id_hash() % 100 < SAMPLE_PCT).select(
        "doc_id", "lang", "source", "n_chars"
    )


DOC_HASH_SAMPLE_ORACLE = f"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE {_sql_id_hash()} % 100 < {SAMPLE_PCT}
"""


def doc_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10) keyed on the id
    hash — the canonical leakage-safe split: membership is a pure function
    of the row, disjoint by construction, stable under re-runs."""
    d = _docs(spark, sf_dir, spread=False)
    h = _id_hash() % 100
    split = (
        F.when(h < TRAIN_PCT, "train")
        .when(h < VAL_PCT, "val")
        .otherwise("test")
    )
    return d.select("doc_id", split.alias("split"))


DOC_TRAIN_SPLIT_ORACLE = f"""
SELECT doc_id,
       CASE WHEN {_sql_id_hash()} % 100 < {TRAIN_PCT} THEN 'train'
            WHEN {_sql_id_hash()} % 100 < {VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


# Per-language sampling rates (percent) — the data-mixture knob: upsample
# scarce languages, downsample the dominant one. Unlisted strata keep
# DEFAULT_STRATUM_PCT.
STRATA_PCT = {"en": 30, "de": 80, "fr": 80, "es": 60, "zh": 60}
DEFAULT_STRATUM_PCT = 10


def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language keep rates applied
    through the same id-hash gate as ``doc_hash_sample`` — the mixture is
    reproducible row-by-row, and the census (total vs kept per stratum)
    is the mixture report a pipeline logs. Pure narrow projection + one
    vocabulary-sized aggregation."""
    d = _docs(spark, sf_dir, spread=False)
    rate = F.lit(DEFAULT_STRATUM_PCT)
    for lg, pct in STRATA_PCT.items():
        rate = F.when(F.col("lang") == lg, F.lit(pct)).otherwise(rate)
    kept = (_id_hash() % 100 < rate).cast("long")
    return (
        d.select("lang", kept.alias("__kept"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("__kept").alias("n_kept"),
        )
    )


def _sql_rate() -> str:
    whens = " ".join(
        f"WHEN lang = '{lg}' THEN {pct}" for lg, pct in STRATA_PCT.items()
    )
    return f"CASE {whens} ELSE {DEFAULT_STRATUM_PCT} END"


DOC_STRATIFIED_SAMPLE_ORACLE = f"""
SELECT lang, count(*) AS n_total,
       CAST(sum(CASE WHEN {_sql_id_hash()} % 100 < {_sql_rate()}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents GROUP BY lang
"""


# ---------------------------------------------------------------------------
# vocabulary build
# ---------------------------------------------------------------------------


def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-``VOCAB_K`` whitespace tokens by frequency
    (count desc, token asc tiebreak). Map-side partial counts mean only
    distinct (token, partial_count) rows shuffle — at 100 TB the shuffle
    is vocabulary-sized, not corpus-sized."""
    d = _docs(spark, sf_dir, spread=False)
    toks = d.select(
        F.explode(TX.ws_tokens(TX.normalized_text(F.col("text")))).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("token"))
        .limit(VOCAB_K)
    )


VOCAB_TOP_TOKENS_ORACLE = f"""
SELECT token, count(*) AS n_occurrences
FROM (SELECT unnest(string_split_regex({TX.sql_normalized('text')}, '\\s+'))
        AS token FROM documents)
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT {VOCAB_K}
"""


# ---------------------------------------------------------------------------
# TF-IDF top terms per document
# ---------------------------------------------------------------------------


def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TFIDF_TOP`` terms per doc by tf * (N+1)/(df+1), rank ties
    broken by token order. Two hash aggregations + one equi-join on the
    token; the doc-frequency side is vocabulary-sized (broadcastable)."""
    from ..operators.storage import persist_tracked

    d = _docs(spark, sf_dir, spread=False)
    toks = d.select(
        "doc_id",
        F.explode(TX.ws_tokens(TX.normalized_text(F.col("text")))).alias("token"),
    )
    # tf is persisted and feeds BOTH consumers: the scored join and the
    # doc-frequency aggregate (df = count of (doc, token) rows per token
    # — tf already holds exactly one row per pair, so no second
    # tokenize+explode pass over the corpus and no separate distinct)
    tf = persist_tracked(
        toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = d.count()
    scored = tf.join(df_, "token").withColumn(
        "tfidf",
        F.col("tf")
        * (F.lit(float(n_docs + 1)) / (F.col("df") + F.lit(1)).cast("double")),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TFIDF_TOP)
        .select("doc_id", "token", "tf", "df", "tfidf", "rank")
    )


def _sql_tfidf_oracle() -> str:
    toks = f"""
SELECT doc_id,
       unnest(string_split_regex({TX.sql_normalized('text')}, '\\s+')) AS token
FROM documents
"""
    return f"""
WITH toks AS ({toks}),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT token, count(*) AS df
       FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         tf.tf * (CAST(n.n_docs + 1 AS DOUBLE) / CAST(df.df + 1 AS DOUBLE))
           AS tfidf
  FROM tf JOIN df USING (token) CROSS JOIN n
)
SELECT doc_id, token, tf, df, tfidf, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank
  FROM scored
) WHERE rank <= {TFIDF_TOP}
"""


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every doc to a (shard, bin) pack: docs are sharded by id
    hash, ordered by doc_id within the shard, and greedily binned so each
    bin holds ~``PACK_TARGET_TOKENS`` whitespace tokens (a doc starts a
    new bin when the running total before it crosses the budget —
    ``bin = floor(cum_before / target)``).

    Scale shape: the only window is per-shard (PACK_SHARDS-way parallel,
    each partition-bounded); production raises the shard count so shards
    stay executor-sized. No global order is needed — or meaningful — when
    packing a distributed corpus.
    """
    d = _docs(spark, sf_dir, spread=False)
    toks = d.select(
        "doc_id",
        (_id_hash() % PACK_SHARDS).alias("shard"),
        TX.ws_token_count(TX.normalized_text(F.col("text"))).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "bin_id",
            F.floor(
                (F.col("cum_tokens") - F.col("n_tokens"))
                / F.lit(PACK_TARGET_TOKENS)
            ).cast("long"),
        )
        .select("doc_id", "shard", "n_tokens", "cum_tokens", "bin_id")
    )


DOC_PACK_SEQUENCES_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         {_sql_id_hash()} % {PACK_SHARDS} AS shard,
         len(string_split_regex({TX.sql_normalized('text')}, '\\s+'))
           AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tokens,
         CAST(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_tokens
  FROM toks
)
SELECT doc_id, shard, n_tokens, cum_tokens,
       CAST(floor(CAST(cum_tokens - n_tokens AS DOUBLE)
                  / {PACK_TARGET_TOKENS}) AS BIGINT) AS bin_id
FROM c
"""


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

EVAL_STRIDE = 50  # docs with doc_id % EVAL_STRIDE == 0 act as the benchmark
CONTAM_N = 3
CONTAM_MIN_OVERLAP = 0.3


def doc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs leaking benchmark content: directional shingle
    overlap vs a held-out eval subset (see
    ``operators.dedup.contamination_pairs``)."""
    from ..operators.dedup import contamination_pairs

    d = _docs(spark, sf_dir)
    eval_set = d.filter(F.col("doc_id") % EVAL_STRIDE == 0)
    corpus = d.filter(F.col("doc_id") % EVAL_STRIDE != 0)
    return contamination_pairs(
        corpus,
        eval_set,
        "text",
        "doc_id",
        n=CONTAM_N,
        min_overlap=CONTAM_MIN_OVERLAP,
    )


DOC_CONTAMINATION_ORACLE = f"""
WITH cd AS (
  SELECT * FROM (
{TX.sql_hashed_shingle_table("text", CONTAM_N, where=f"doc_id % {EVAL_STRIDE} <> 0")}
  ) WHERE len(sh) > 0
),
ed AS (
  SELECT * FROM (
{TX.sql_hashed_shingle_table("text", CONTAM_N, where=f"doc_id % {EVAL_STRIDE} = 0")}
  ) WHERE len(sh) > 0
),
cex AS (SELECT doc_id, unnest(sh) AS s FROM cd),
eex AS (SELECT doc_id AS eval_id, unnest(sh) AS s FROM ed),
shared AS (
  SELECT doc_id, eval_id, count(*) AS n_shared
  FROM cex JOIN eex USING (s) GROUP BY 1, 2
),
sizes AS (SELECT doc_id, len(sh) AS sz FROM cd)
SELECT doc_id, eval_id, CAST(n_shared AS DOUBLE) / sz AS overlap_frac
FROM shared JOIN sizes USING (doc_id)
WHERE CAST(n_shared AS DOUBLE) / sz >= {CONTAM_MIN_OVERLAP}
"""


# ---------------------------------------------------------------------------
# sliding-window chunking (RAG / pretraining context windows)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 600  # chars per chunk
CHUNK_STRIDE = 480  # start-to-start distance; overlap = SIZE - STRIDE


def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into overlapping character windows — the
    chunking pass feeding RAG indexes and fixed-context pretraining.
    Chunk ``i`` covers ``[i*stride, i*stride + size)``; starts step by
    ``stride`` while inside the text, so consecutive chunks overlap by
    ``size - stride`` chars and the final chunk is short. One narrow
    projection + ``explode(sequence(...))`` — map-side only, no shuffle:
    at 100 TB this runs at scan speed and parallelizes per input split.

    Output keeps a fingerprint of the chunk text (not the text itself):
    downstream chunk-level dedup joins on exactly this hash, and the
    result stays narrow for the oracle compare.
    """
    d = _docs(spark, sf_dir, spread=False).filter(F.length("text") > 0)
    n_chunks = F.ceil(F.length("text") / F.lit(float(CHUNK_STRIDE))).cast("int")
    chunk = F.expr(f"substring(text, chunk_idx * {CHUNK_STRIDE} + 1, {CHUNK_SIZE})")
    return (
        d.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.length(chunk).alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )


DOC_CHUNK_WINDOWS_ORACLE = f"""
SELECT doc_id,
       i AS chunk_idx,
       length(substring(text, i * {CHUNK_STRIDE} + 1, {CHUNK_SIZE})) AS chunk_len,
       md5(substring(text, i * {CHUNK_STRIDE} + 1, {CHUNK_SIZE})) AS chunk_md5
FROM documents,
     LATERAL unnest(
       range(0, CAST(ceil(length(text) / {CHUNK_STRIDE}.0) AS BIGINT))
     ) AS t(i)
WHERE length(text) > 0
"""


# ---------------------------------------------------------------------------
# Mixture allocation (exact per-source quotas, largest-remainder rounding)
# ---------------------------------------------------------------------------

MIX_TOTAL = 400  # target corpus size of the mixed sample
# target mixture: weight source i proportionally to (i+1) — a deliberately
# non-uniform re-weighting of the uniform corpus (the data-mixing op:
# up/down-sample sources toward a target distribution, with EXACT counts,
# where doc_stratified_sample applies per-stratum RATES)
MIX_WEIGHTS = {f"src{i}": i + 1 for i in range(20)}


def mixture_quotas(
    weights: dict[str, int], total: int
) -> dict[str, int]:
    """Largest-remainder (Hamilton) apportionment of ``total`` slots to
    integer weights: floor the proportional share, then hand the leftover
    slots to the largest fractional remainders (ties to source name).
    Integer arithmetic throughout — no float apportionment drift.

    SAME algorithm, different idiom:
    ``pipelineops.doc_language_balanced_sample`` runs this apportionment
    as window expressions over the |languages|-row aggregate (its quotas
    must stay inside one distributed plan for the oracle hash). A
    semantic change here (tie-break, floor form) must be mirrored there
    and in both SQL oracles."""
    wsum = sum(weights.values())
    floors = {s: (total * w) // wsum for s, w in weights.items()}
    rema = {s: (total * w) % wsum for s, w in weights.items()}
    leftover = total - sum(floors.values())
    for s in sorted(weights, key=lambda s: (-rema[s], s))[:leftover]:
        floors[s] += 1
    return floors


def doc_mixture_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count data mixing: per source, take its quota of documents in
    deterministic id-hash order (reproducible, content-independent). The
    quota table is computed once (largest remainder over static weights)
    and baked into the predicate on BOTH engines; an under-populated
    source is capped automatically (row_number never exceeds the source
    size — the shortfall is reported by the summary columns downstream
    pipelines check).

    Scale shape: one window per source partition over (hash, id) — the
    rank order is a per-source shuffle+sort of just (ids, hashes), then a
    rank filter; the text never moves."""
    quotas = mixture_quotas(MIX_WEIGHTS, MIX_TOTAL)
    d = _docs(spark, sf_dir, spread=False)
    w = Window.partitionBy("source").orderBy(_id_hash(), "doc_id")
    quota = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(q))
            for s, q in sorted(quotas.items())
        ],
        F.lit(0),
    )
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("sample_rank"))
        .where(F.col("sample_rank") <= quota)
    )


def _sql_mixture_oracle() -> str:
    quotas = mixture_quotas(MIX_WEIGHTS, MIX_TOTAL)
    cases = " ".join(
        f"WHEN '{s}' THEN {q}" for s, q in sorted(quotas.items())
    )
    return f"""
SELECT doc_id, source, sample_rank FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {_sql_id_hash()}, doc_id) AS sample_rank
  FROM documents
)
WHERE sample_rank <= (CASE source {cases} ELSE 0 END)
"""


QUERIES = {
    "doc_mixture_allocation": doc_mixture_allocation,
    "doc_hash_sample": doc_hash_sample,
    "doc_chunk_windows": doc_chunk_windows,
    "doc_stratified_sample": doc_stratified_sample,
    "doc_train_split": doc_train_split,
    "vocab_top_tokens": vocab_top_tokens,
    "doc_tfidf_top_terms": doc_tfidf_top_terms,
    "doc_pack_sequences": doc_pack_sequences,
    "doc_contamination": doc_contamination,
}

ORACLES = {
    "doc_mixture_allocation": _sql_mixture_oracle(),
    "doc_hash_sample": DOC_HASH_SAMPLE_ORACLE,
    "doc_chunk_windows": DOC_CHUNK_WINDOWS_ORACLE,
    "doc_stratified_sample": DOC_STRATIFIED_SAMPLE_ORACLE,
    "doc_train_split": DOC_TRAIN_SPLIT_ORACLE,
    "vocab_top_tokens": VOCAB_TOP_TOKENS_ORACLE,
    "doc_tfidf_top_terms": _sql_tfidf_oracle(),
    "doc_pack_sequences": DOC_PACK_SEQUENCES_ORACLE,
    "doc_contamination": DOC_CONTAMINATION_ORACLE,
}
