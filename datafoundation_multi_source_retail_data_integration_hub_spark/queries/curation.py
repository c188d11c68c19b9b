"""Corpus-curation queries: span-level dedup, LM-familiarity scoring,
cluster-representative selection, and PII masking.

These extend the training-data-pipeline family (SURVEY §2 north-star
extensions) with the remaining curation steps a pretraining corpus
build runs between raw ingest and tokenization:

- ``doc_segment_dedup`` — C4-style span dedup. The corpus fixture has no
  newlines, so the "line" unit is a fixed-width token segment: every doc
  is chunked into ``SEG_LEN``-token segments, each segment is kept only
  at its globally-first occurrence (min ``(doc_id, seg_idx)``), and docs
  are reassembled from their surviving segments.
- ``doc_unigram_familiarity`` — cheap unigram-LM proxy for perplexity
  filtering: per-doc mean corpus frequency of its tokens plus the
  out-of-vocabulary rate against the top-``FAM_VOCAB_K`` vocabulary.
  Every measure is an exact integer sum with a single final division, so
  the doubles are bit-identical across engines (no order-dependent float
  accumulation).
- ``doc_cluster_best`` — representative selection: within each near-dup
  connected component, keep the highest-``quality_score`` member
  (doc_id tiebreak) — the "which duplicate survives" policy that follows
  clustering in a dedup pipeline.
- ``customer_pii_masked`` — deterministic PII-safe export of the
  customer dimension (reference stages raw customer PII into the
  warehouse, `/root/reference/etl/load_to_query.py:16-23`):
  pseudonymous name, digit redaction, balance generalization.
  Pure codegen'd string expressions; no shuffle.

Scale notes: segment dedup shuffles once on ``xxhash64(seg)`` (8-byte
keys — segment text never crosses an exchange) and once on doc_id for
the survivor-index join/reassembly. Familiarity shuffles the token
stream against the unigram count table (plain shuffled hash join — the
raw vocabulary of a 100 TB corpus is NOT broadcastable) and broadcasts
only the ``FAM_VOCAB_K``-bounded top-k. Cluster-best reuses the pair
graph + connected components and adds one window over cluster ids.
PII scrub is one codegen'd regex projection, shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as TX
from ..functions.parity import round_dp, sql_round_dp
from ..operators import dedup as DD
from ..sources.tables import load_table_spread, load_tables
from . import textops as TO

SEG_LEN = 10  # tokens per dedup segment
FAM_VOCAB_K = 100  # "known" vocabulary size for the OOV rate


def _docs(spark: SparkSession, sf_dir: str, spread: bool = True) -> DataFrame:
    # spread: see textops._docs — heavy per-row queries keep the
    # scan-fanout repartition barrier; shuffle-free map-only queries
    # (doc_pii_scrub's audited scan-bound shape) opt out.
    if not spread:
        return load_tables(spark, sf_dir, "documents")["documents"]
    return load_table_spread(spark, sf_dir, "documents")


def _customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, "customer")["customer"]


# ---------------------------------------------------------------------------
# segment-level (C4-style span) dedup
# ---------------------------------------------------------------------------


def doc_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global segment dedup + reassembly. One row per doc: segment
    counts and the cleaned text built from surviving segments.

    Plan shape (the 100 TB shape): the keep-first decision exchange
    carries only 8-byte keys. The window partitions by
    ``xxhash64(seg)`` so that shuffle moves (doc_id, seg_idx, hv)
    instead of raw segment text (~mean-segment-length fewer shuffle
    bytes; the same trick as ``operators/spans.py`` window hashes).
    Survivor indexes come back as a per-doc sorted int array; the
    doc-grain token arrays still shuffle ONCE on ``doc_id`` for the
    reassembly join, where the surviving text is regenerated locally
    from ``__toks``. Cost trade: the tokenize+segment
    projection is computed on both subtrees (scan-parallel CPU, no
    exchange) — recomputing a codegen'd split/slice is cheaper at scale
    than shuffling raw text twice. Hash collisions: two distinct
    segments sharing an xxhash64 would mis-drop one first occurrence;
    probability ~n_segments^2 / 2^65 — negligible below ~10^9 segments
    (same 60-bit-class bound ``operators/spans.py`` documents)."""
    d = _docs(spark, sf_dir)
    staged = d.select(
        "doc_id",
        TX.ws_tokens(TX.normalized_text(F.col("text"))).alias("__toks"),
    )
    n_segs = F.ceil(F.size("__toks") / F.lit(float(SEG_LEN))).cast("int")
    # hash branch: EXPLODE the segment index FIRST, then build gram +
    # hash as top-level projections — a transform-lambda body evaluates
    # interpreted per element, while this form keeps concat/slice/hash
    # inside one codegen stage (same rationale as spans.py window
    # hashes); no array of segment strings is ever materialized here
    hashes = staged.select(
        "doc_id",
        "__toks",
        F.explode(F.sequence(F.lit(0), n_segs - 1)).alias("seg_idx"),
    ).select(
        "doc_id",
        "seg_idx",
        F.xxhash64(
            F.concat_ws(
                " ", F.slice("__toks", F.col("seg_idx") * SEG_LEN + 1, SEG_LEN)
            )
        ).alias("hv"),
    )
    w = Window.partitionBy("hv").orderBy("doc_id", "seg_idx")
    flags = hashes.withColumn("keep", F.row_number().over(w) == 1)
    perdoc = flags.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_segments"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("int")
        .alias("n_kept_segments"),
        # collect_list drops the NULLs of non-kept rows; sort restores
        # document order regardless of arrival order
        F.sort_array(
            F.collect_list(F.when(F.col("keep"), F.col("seg_idx")))
        ).alias("__kept_idx"),
    )
    # reassembly: regenerate ONLY the surviving segments from the
    # doc-grain token array (the one per-element lambda left — it runs
    # once, at doc grain, after the narrow shuffle decided survival)
    return staged.join(perdoc, "doc_id").select(
        "doc_id",
        "n_segments",
        "n_kept_segments",
        F.array_join(
            F.transform(
                "__kept_idx",
                lambda i: F.concat_ws(
                    " ", F.slice("__toks", i * SEG_LEN + 1, SEG_LEN)
                ),
            ),
            " ",
        ).alias("cleaned_text"),
    )


_SQL_NORM_TOKS = f"string_split_regex({TX.sql_normalized('text')}, '\\s+')"

DOC_SEGMENT_DEDUP_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_SQL_NORM_TOKS} AS toks FROM documents
),
segs AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(toks[(i*{SEG_LEN}+1):(i*{SEG_LEN}+{SEG_LEN})], ' ')
           AS seg
  FROM t, LATERAL (
    SELECT unnest(range(0,
      CAST(ceil(len(toks) / CAST({SEG_LEN} AS DOUBLE)) AS BIGINT))) AS i
  ) u
),
k AS (
  SELECT *, row_number() OVER (
    PARTITION BY seg ORDER BY doc_id, seg_idx) = 1 AS keep
  FROM segs
)
SELECT doc_id,
       CAST(count(*) AS INTEGER) AS n_segments,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS INTEGER)
         AS n_kept_segments,
       coalesce(string_agg(CASE WHEN keep THEN seg END, ' '
                           ORDER BY seg_idx), '') AS cleaned_text
FROM k GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# unigram-LM familiarity (perplexity-filter proxy)
# ---------------------------------------------------------------------------


def doc_unigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc unigram familiarity: mean corpus frequency of the doc's
    tokens and the OOV rate against the top-``FAM_VOCAB_K`` vocabulary.

    Two hash aggregations (corpus unigram counts; per-doc rollup) and
    one equi-join of the token stream against the unigram count table.
    Only ``topk`` is broadcast — it is bounded at ``FAM_VOCAB_K`` rows
    by construction. The full ``counts`` table is NOT broadcast: a raw
    token vocabulary is heavy-tailed into the billions at 100 TB, so
    that join is a plain shuffled hash join (``shuffle_hash`` hint —
    token-keyed exchange, no sort; the hint also stops AQE from
    re-broadcasting an unbounded build side). All aggregates are BIGINT
    sums; the two doubles are single divisions of exact integers, so
    both engines produce bit-identical values."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id",
        F.explode(TX.ws_tokens(TX.normalized_text(F.col("text")))).alias(
            "token"
        ),
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    topk = (
        counts.orderBy(F.col("cnt").desc(), "token")
        .limit(FAM_VOCAB_K)
        .select("token", F.lit(True).alias("in_top"))
    )
    j = (
        toks.join(counts.hint("shuffle_hash"), "token")
        .join(F.broadcast(topk), "token", "left")
    )
    agg = j.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("cnt").alias("sum_freq"),
        F.sum(F.when(F.col("in_top").isNull(), 1).otherwise(0)).alias(
            "n_oov"
        ),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "sum_freq",
        "n_oov",
        (F.col("sum_freq").cast("double") / F.col("n_tokens")).alias(
            "mean_token_freq"
        ),
        (F.col("n_oov").cast("double") / F.col("n_tokens")).alias(
            "oov_rate"
        ),
    )


DOC_UNIGRAM_FAMILIARITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_NORM_TOKS}) AS token FROM documents
),
counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
topk AS (SELECT token FROM counts ORDER BY cnt DESC, token
         LIMIT {FAM_VOCAB_K}),
j AS (
  SELECT t.doc_id, c.cnt, tk.token IS NOT NULL AS in_top
  FROM toks t
  JOIN counts c USING (token)
  LEFT JOIN topk tk ON t.token = tk.token
),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(cnt) AS BIGINT) AS sum_freq,
         CAST(sum(CASE WHEN in_top THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
  FROM j GROUP BY doc_id
)
SELECT doc_id, n_tokens, sum_freq, n_oov,
       CAST(sum_freq AS DOUBLE) / n_tokens AS mean_token_freq,
       CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate
FROM agg
"""


# ---------------------------------------------------------------------------
# cluster-representative selection
# ---------------------------------------------------------------------------


def doc_cluster_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within each near-dup cluster (connected components over the
    n-gram Jaccard pair graph), keep the member with the highest
    ``quality_score`` (doc_id tiebreak). One window over the cluster
    label — clusters are tiny relative to the corpus, so the extra
    shuffle is pair-graph-sized, not corpus-sized."""
    from ..operators.graph import connected_components

    pairs = TO.doc_ngram_jaccard_pairs(spark, sf_dir)
    clusters = connected_components(pairs).withColumnRenamed("node", "doc_id")
    scored = clusters.join(
        _docs(spark, sf_dir).select(
            "doc_id", TX.quality_score(F.col("text")).alias("quality_score")
        ),
        "doc_id",
    )
    w = Window.partitionBy("cluster_rep")
    wo = w.orderBy(F.col("quality_score").desc(), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(wo))
        .withColumn("n_members", F.count("*").over(w).cast("int"))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_rep",
            F.col("doc_id").alias("best_doc_id"),
            F.col("quality_score").alias("best_quality"),
            "n_members",
        )
    )


# ONE definition each: the quality score and the connected-components
# CTE chain come from textops (re-deriving them here let the copies
# drift from the gate they claim to compose)
_SQL_QUALITY = TO._SQL_QSCORE
_CC_CTES = TO.SQL_CC_CTE_PREFIX

DOC_CLUSTER_BEST_ORACLE = f"""
{_CC_CTES},
clusters AS (
  SELECT src AS doc_id, min(dst) AS cluster_rep FROM reach GROUP BY src
),
scored AS (
  SELECT c.cluster_rep, c.doc_id, {_SQL_QUALITY} AS quality_score
  FROM clusters c JOIN documents USING (doc_id)
)
SELECT cluster_rep, doc_id AS best_doc_id, quality_score AS best_quality,
       CAST(n_members AS INTEGER) AS n_members
FROM (
  SELECT *, row_number() OVER (
           PARTITION BY cluster_rep
           ORDER BY quality_score DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY cluster_rep) AS n_members
  FROM scored
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# PII masking over the customer dimension
# ---------------------------------------------------------------------------


def customer_pii_masked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PII-safe export of the customer dimension:

    - pseudonymization: md5-derived token for the name — stable across
      runs (joinable) but unlinkable to the raw value,
    - redaction: digit runs struck from the raw name, with a masked-digit
      audit count,
    - generalization: account balance coarsened to a 1000-unit band
      (k-anonymity-style quasi-identifier suppression).

    Single codegen'd projection; no shuffle, no UDFs. The regexes use
    only character classes, which behave identically in Java regex
    (Spark) and RE2 (DuckDB)."""
    c = _customer(spark, sf_dir)
    return c.select(
        "c_custkey",
        F.concat(F.lit("cust-"), F.substring(F.md5("c_name"), 1, 8)).alias(
            "name_pseudo"
        ),
        F.regexp_replace(F.col("c_name"), "[0-9]+", "#").alias(
            "name_redacted"
        ),
        (
            F.length("c_name")
            - F.length(F.regexp_replace(F.col("c_name"), "[0-9]", ""))
        ).cast("int").alias("n_digits_masked"),
        (F.floor(F.col("c_acctbal") / 1000) * 1000)
        .cast("long")
        .alias("acctbal_band"),
        "c_mktsegment",
    )


CUSTOMER_PII_MASKED_ORACLE = """
SELECT c_custkey,
       'cust-' || substr(md5(c_name), 1, 8) AS name_pseudo,
       regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_redacted,
       CAST(length(c_name)
            - length(regexp_replace(c_name, '[0-9]', '', 'g'))
            AS INTEGER) AS n_digits_masked,
       CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_band,
       c_mktsegment
FROM customer
"""


# ---------------------------------------------------------------------------
# document-level PII scrub (emails / phones / SSNs in the text column)
# ---------------------------------------------------------------------------

# Character-class-only patterns: Java regex (Spark) and RE2 (DuckDB)
# agree on leftmost matching and greedy class runs; no alternation, no
# backreferences, no lookaround — the same discipline as
# ``customer_pii_masked``.
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PII_PHONE_RE = "[+][0-9]{1,2}-[0-9]{3}-[0-9]{4}"
PII_SSN_RE = "[0-9]{3}-[0-9]{2}-[0-9]{4}"


def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level PII scrub: mask emails/phones/SSNs in ``text``
    with typed placeholders and report per-doc redaction counts — the
    curation step every pretraining corpus runs before tokenization.

    The synthetic corpus carries no organic PII, so the gate seeds
    deterministic CANARIES derived from ``doc_id`` (every doc an email,
    2/3 a phone, 1/5 an SSN — identical construction in the DuckDB
    oracle). That is also how real pipelines measure scrubber recall:
    inject known PII, assert it never survives. The three patterns are
    non-overlapping by construction, so counting each on the seeded
    text and chaining the replaces is order-independent.

    Scale shape: one codegen'd projection (concat + regexp_count +
    regexp_replace), shuffle-free — scrubbing is scan-bound at 100 TB.
    """
    d = _docs(spark, sf_dir, spread=False)
    did = F.col("doc_id")
    email = F.concat(
        F.lit(" contact user"), did.cast("string"), F.lit("@example.com")
    )
    phone = F.when(
        did % 3 != 0,
        F.concat(
            F.lit(" tel +1-555-"),
            F.lpad((did % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ssn = F.when(
        did % 5 == 0,
        F.concat(
            F.lit(" ssn "),
            F.lpad((did % 900).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((did % 90).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad((did % 9000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    staged = d.select(
        "doc_id", F.concat(F.col("text"), email, phone, ssn).alias("__s")
    )
    s = F.col("__s")
    n_e = F.regexp_count(s, F.lit(PII_EMAIL_RE)).cast("int")
    n_p = F.regexp_count(s, F.lit(PII_PHONE_RE)).cast("int")
    n_s = F.regexp_count(s, F.lit(PII_SSN_RE)).cast("int")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(s, PII_EMAIL_RE, "[EMAIL]"),
            PII_PHONE_RE,
            "[PHONE]",
        ),
        PII_SSN_RE,
        "[SSN]",
    )
    return staged.select(
        "doc_id",
        n_e.alias("n_emails"),
        n_p.alias("n_phones"),
        n_s.alias("n_ssns"),
        (n_e + n_p + n_s).alias("n_redactions"),
        scrubbed.alias("scrubbed_text"),
    )


_SQL_PII_SEEDED = """
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
              || CASE WHEN doc_id % 3 <> 0
                      THEN ' tel +1-555-'
                           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      ELSE '' END
              || CASE WHEN doc_id % 5 = 0
                      THEN ' ssn '
                           || lpad(CAST(doc_id % 900 AS VARCHAR), 3, '0')
                           || '-'
                           || lpad(CAST(doc_id % 90 AS VARCHAR), 2, '0')
                           || '-'
                           || lpad(CAST(doc_id % 9000 AS VARCHAR), 4, '0')
                      ELSE '' END AS s
  FROM documents
"""

DOC_PII_SCRUB_ORACLE = f"""
WITH seeded AS ({_SQL_PII_SEEDED})
SELECT doc_id,
       CAST(len(regexp_extract_all(s, '{PII_EMAIL_RE}')) AS INTEGER)
         AS n_emails,
       CAST(len(regexp_extract_all(s, '{PII_PHONE_RE}')) AS INTEGER)
         AS n_phones,
       CAST(len(regexp_extract_all(s, '{PII_SSN_RE}')) AS INTEGER)
         AS n_ssns,
       CAST(len(regexp_extract_all(s, '{PII_EMAIL_RE}'))
            + len(regexp_extract_all(s, '{PII_PHONE_RE}'))
            + len(regexp_extract_all(s, '{PII_SSN_RE}')) AS INTEGER)
         AS n_redactions,
       regexp_replace(
         regexp_replace(
           regexp_replace(s, '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
           '{PII_PHONE_RE}', '[PHONE]', 'g'),
         '{PII_SSN_RE}', '[SSN]', 'g') AS scrubbed_text
FROM seeded
"""


# ---------------------------------------------------------------------------
# End-to-end curation manifest (quality gate -> dedup over survivors ->
# per-document verdict)
# ---------------------------------------------------------------------------


def doc_curation_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curated-corpus MANIFEST: one row per input document with the
    final pipeline verdict and why — ``drop_quality`` (failed the
    Gopher-style rule gate), ``drop_duplicate`` (near-dup-clustered
    among the quality survivors and not the cluster's keeper), or
    ``kept``. This is the artifact a pretraining build actually applies
    and audits: the composition of the rule gate
    (``textops.doc_quality_filter``), candidate generation + clustering
    over the SURVIVORS ONLY (``dedup.jaccard_pairs`` ->
    ``graph.connected_components`` — stage order matters: deduping
    pre-gate wastes pair work on documents the gate drops anyway), and
    the keeper policy (argmax composite quality score, ties to the
    lowest id — the same policy as ``doc_dedup_decisions``).

    Scale shape: the rule gate and both scores are one codegen'd
    projection over the corpus (computed once, staged); the pair graph
    inherits the Jaccard join's inverted-index bounds (df cap +
    postings-count verification — the measured low-τ regime choice),
    shrunk further by the gate's selectivity; clustering
    takes the bounded driver union-find below 1M edges and the
    distributed fixpoint above; the verdict assembly joins only
    doc-grain frames. ``cluster_rep`` is -1 for unclustered documents —
    a sentinel instead of NULL so the integral column survives the
    driver's pandas canonicalization as int64 on both engines."""
    d = _docs(spark, sf_dir)
    t = F.col("text")
    staged = d.select("doc_id", t.alias("text"), TX.ws_tokens(t).alias("__toks"))
    n = F.size("__toks")
    wl = F.aggregate(
        F.transform(F.col("__toks"), lambda x: F.length(x)),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("double") / n
    # the SHARED six-rule gate (textops) — the manifest composes the
    # same verdict doc_quality_filter emits, from one builder
    keep_rules = TO.quality_keep_rules(n, wl, t)
    scored = staged.select(
        "doc_id",
        "text",
        n.alias("n_words"),
        TX.quality_score(t).alias("__q"),
        keep_rules.alias("__keepq"),
    )
    survivors = scored.where(F.col("__keepq"))
    # prefix_filter=False: same measured low-τ choice as
    # doc_ngram_jaccard_pairs (queries/textops.py) — at τ=0.2 the
    # postings-count verify is ~50x lighter per candidate
    pairs = DD.jaccard_pairs(
        survivors,
        "text",
        "doc_id",
        n=TO.N_SHINGLE,
        threshold=TO.JACCARD_TAU,
        max_doc_freq=TO.MAX_DOC_FREQ,
        prefix_filter=False,
    )
    from ..operators.graph import connected_components

    clusters = connected_components(pairs).withColumnRenamed("node", "doc_id")
    cj = clusters.join(survivors.select("doc_id", "__q"), "doc_id")
    keepers = cj.groupBy("cluster_rep").agg(
        F.max_by(
            F.col("doc_id"), F.struct(F.col("__q"), (-F.col("doc_id")).alias("n"))
        ).alias("__keep_id")
    )
    labeled = clusters.join(keepers, "cluster_rep")
    out = scored.join(labeled, "doc_id", "left")
    verdict = (
        F.when(~F.col("__keepq"), F.lit("drop_quality"))
        .when(
            F.col("cluster_rep").isNotNull()
            & (F.col("doc_id") != F.col("__keep_id")),
            F.lit("drop_duplicate"),
        )
        .otherwise(F.lit("kept"))
    )
    return out.select(
        "doc_id",
        "n_words",
        round_dp(F.col("__q")).alias("quality_score"),
        F.coalesce(F.col("cluster_rep"), F.lit(-1)).alias("cluster_rep"),
        verdict.alias("verdict"),
    )


def _sql_curation_manifest() -> str:
    # survivors-only shingle table: the WHERE repeats the rule gate over
    # raw documents (oracle-side recompute is fine; the Spark side stages
    # the flags once)
    wl_expr = (
        f"CAST(list_sum(list_transform({TO._SQL_TOKS}, t -> len(t))) AS DOUBLE)"
        f" / len({TO._SQL_TOKS})"
    )
    rules_where = TO.sql_quality_keep(
        f"len({TO._SQL_TOKS})", wl_expr, TO._SQL_STOPR, TO._SQL_PUNCT
    )
    shingles = TX.sql_hashed_shingle_table(
        "text", TO.N_SHINGLE, where=rules_where
    )
    return f"""
WITH RECURSIVE cq AS (
  SELECT doc_id,
         len({TO._SQL_TOKS}) AS n_words,
         {TO._SQL_QSCORE} AS qs,
         {rules_where} AS keepq
  FROM documents
),
d0 AS MATERIALIZED ({shingles}),
dd AS (SELECT * FROM d0 WHERE len(sh) > 0),
sizes AS (SELECT doc_id, len(sh) AS sz FROM dd),
ex AS (SELECT doc_id, unnest(sh) AS s FROM dd),
rare AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= {TO.MAX_DOC_FREQ}),
exr AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
inter AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
  FROM exr a JOIN exr b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
cpairs AS (
  SELECT id1, id2
  FROM inter
  JOIN sizes s1 ON id1 = s1.doc_id
  JOIN sizes s2 ON id2 = s2.doc_id
  WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= {TO.JACCARD_TAU}
),
cedges AS (
  SELECT id1 AS a, id2 AS b FROM cpairs
  UNION
  SELECT id2 AS a, id1 AS b FROM cpairs
),
creach (src, dst) AS (
  SELECT a, a FROM cedges
  UNION
  SELECT r.src, e.b FROM creach r JOIN cedges e ON r.dst = e.a
),
ccomp AS (SELECT src AS doc_id, min(dst) AS cluster_rep FROM creach GROUP BY src),
ckeep AS (
  SELECT c.doc_id, c.cluster_rep,
         row_number() OVER (
           PARTITION BY c.cluster_rep ORDER BY q.qs DESC, c.doc_id) AS rn
  FROM ccomp c JOIN cq q USING (doc_id)
)
SELECT q.doc_id,
       q.n_words,
       {sql_round_dp("q.qs")} AS quality_score,
       COALESCE(k.cluster_rep, -1) AS cluster_rep,
       CASE WHEN NOT q.keepq THEN 'drop_quality'
            WHEN COALESCE(k.rn, 1) > 1 THEN 'drop_duplicate'
            ELSE 'kept' END AS verdict
FROM cq q LEFT JOIN ckeep k USING (doc_id)
"""


DOC_CURATION_MANIFEST_ORACLE = _sql_curation_manifest()


QUERIES = {
    "doc_segment_dedup": doc_segment_dedup,
    "doc_unigram_familiarity": doc_unigram_familiarity,
    "doc_cluster_best": doc_cluster_best,
    "customer_pii_masked": customer_pii_masked,
    "doc_pii_scrub": doc_pii_scrub,
    "doc_curation_manifest": doc_curation_manifest,
}

ORACLES = {
    "doc_segment_dedup": DOC_SEGMENT_DEDUP_ORACLE,
    "doc_unigram_familiarity": DOC_UNIGRAM_FAMILIARITY_ORACLE,
    "doc_cluster_best": DOC_CLUSTER_BEST_ORACLE,
    "customer_pii_masked": CUSTOMER_PII_MASKED_ORACLE,
    "doc_pii_scrub": DOC_PII_SCRUB_ORACLE,
    "doc_curation_manifest": DOC_CURATION_MANIFEST_ORACLE,
}
