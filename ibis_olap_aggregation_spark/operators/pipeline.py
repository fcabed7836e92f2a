"""Training-data pipeline compositions (SURVEY.md §7.4 extensions).

The stages a large-scale LLM-corpus build runs between raw scrape and
tokenizer: repetition-based quality filters (Gopher-style), document
chunking, PII/pattern redaction, cross-document n-gram contamination,
semantic (embedding-space) dedup over IVF clusters, and deterministic
split/mixing samplers. No reference counterpart — the reference stops at
OLAP aggregation; these reuse its building blocks (hash bucketing,
IVF centroids, shingles) as pipeline stages.

Everything is JVM-side (array/lambda/regex expressions — zero Python
UDFs) and every query has a bit-exact DuckDB oracle.

Scale notes (100 TB):
- repetition / chunking / redaction / split-assign are MAP-ONLY: they
  pipeline over the parquet scan with no shuffle at all.
- shared-ngram contamination is the inverted-index shape: one shuffle on
  an 8-byte md5-derived shingle key (map-side combined), one join back.
  Cost ~ corpus shingle count, never pairs.
- semantic dedup pairs only WITHIN an IVF cluster: cost ~ Σ cluster²,
  the SemDeDup design (Abbas et al. 2023, arXiv:2303.09540) — cluster
  count scales with corpus size so cluster cardinality stays bounded.
- domain-weighted sampling derives each domain's keep-fraction from a
  hash of the domain name itself: no driver-side weights table to ship,
  trivially recomputable on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.functions.idioms import (
    DUCK_MD5INT as _DUCK_MD5INT,
    SPARK_MD5INT as _SPARK_MD5INT,
    tokens_col,
)
from ibis_olap_aggregation_spark.functions.minhash_sql import (
    DUCK_NEAR_DUP_COMP as _DUCK_NEAR_DUP_COMP,
)
from ibis_olap_aggregation_spark.queries import register, sum_wide, sum_wide_product
from ibis_olap_aggregation_spark.session import load_table, query_cache

# sibling operator modules (shingles_col, tokens_col, IVF assignment)
# are imported INSIDE the query functions: at import time this module is
# loaded from the bottom of queries.py, which sibling modules themselves
# import — a module-level import here would re-enter a partially
# initialized sibling whenever that sibling is the interpreter's entry
# point (e.g. `import ...operators.dedup` in a test).

# Gopher-style repetition thresholds (applied to ROUNDED fractions so
# the boolean flag cannot diverge between engines at the boundary)
TOP_TOKEN_MAX = 0.2
DUP_BIGRAM_MAX = 0.3

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks

SHARED_NGRAM_K = 5

SEMDEDUP_TAU = 0.25  # cosine threshold, calibrated to the synthetic corpus

_DUCK_TOK = """
tok AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# Repetition signals (quality filter)
# ---------------------------------------------------------------------------


@register(
    "text_repetition_signals",
    f"""
WITH {_DUCK_TOK},
m AS (
  SELECT doc_id, len(t) AS n_tokens,
         list_max(list_transform(list_distinct(t),
                  x -> len(list_filter(t, y -> y = x)))) AS top_cnt,
         CASE WHEN len(t) < 2 THEN CAST([] AS VARCHAR[])
              ELSE list_transform(generate_series(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i + 1])
         END AS big
  FROM tok
),
fr AS (
  SELECT doc_id, n_tokens,
         ROUND(top_cnt / n_tokens, 6) AS top_token_fraction,
         ROUND(CASE WHEN len(big) = 0 THEN 0.0
                    ELSE (len(big) - len(list_distinct(big))) / len(big)
               END, 6) AS dup_bigram_fraction
  FROM m
)
SELECT doc_id, n_tokens, top_token_fraction, dup_bigram_fraction,
       (top_token_fraction > {TOP_TOKEN_MAX}
        OR dup_bigram_fraction > {DUP_BIGRAM_MAX}) AS is_repetitive
FROM fr
""",
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: the fraction
    of tokens taken by the single most frequent token, and the fraction
    of duplicated bigrams. Documents over either threshold are flagged
    repetitive (the boilerplate/template filter of a corpus build).
    Map-only — no shuffle; pipelines over the scan."""
    from ibis_olap_aggregation_spark.operators.text import tokens_col

    d = _docs(spark, sf_dir).withColumn("t", tokens_col())
    top_cnt = F.expr(
        "array_max(transform(array_distinct(t), x -> size(filter(t, y -> y = x))))"
    )
    # size(t) < 2 guard: Spark's sequence(1, 0) DESCENDS (ADVICE round 1)
    big = F.expr(
        "if(size(t) < 2, cast(array() as array<string>),"
        " transform(sequence(1, size(t) - 1),"
        " i -> concat(element_at(t, i), ' ', element_at(t, i + 1))))"
    )
    m = d.select(
        "doc_id",
        F.size("t").cast("bigint").alias("n_tokens"),
        top_cnt.alias("top_cnt"),
        big.alias("big"),
    )
    fr = m.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("top_cnt") / F.col("n_tokens"), 6).alias("top_token_fraction"),
        F.round(
            F.when(F.size("big") == 0, F.lit(0.0)).otherwise(
                (F.size("big") - F.size(F.array_distinct("big"))) / F.size("big")
            ),
            6,
        ).alias("dup_bigram_fraction"),
    )
    return fr.withColumn(
        "is_repetitive",
        (F.col("top_token_fraction") > TOP_TOKEN_MAX)
        | (F.col("dup_bigram_fraction") > DUP_BIGRAM_MAX),
    )


# ---------------------------------------------------------------------------
# Document chunking (context-window preparation)
# ---------------------------------------------------------------------------


@register(
    "text_chunk_documents",
    f"""
WITH {_DUCK_TOK},
c AS (
  SELECT doc_id, u.s AS s,
         t[u.s : least(u.s + {CHUNK_TOKENS - 1}, len(t))] AS chunk
  FROM tok, UNNEST(generate_series(1, len(t), {CHUNK_STRIDE})) AS u(s)
)
SELECT doc_id,
       (s - 1) // {CHUNK_STRIDE} AS chunk_index,
       len(chunk) AS n_chunk_tokens,
       array_to_string(chunk, ' ') AS chunk_text
FROM c
""",
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap ({CHUNK_TOKENS}-token
    chunks, stride {CHUNK_STRIDE}): the context-window packing stage that
    turns documents into training sequences. One explode per document —
    map-only, no shuffle; output rows ≈ corpus_tokens / stride."""
    from ibis_olap_aggregation_spark.operators.text import tokens_col

    d = _docs(spark, sf_dir).withColumn("t", tokens_col())
    c = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t), {CHUNK_STRIDE}),"
                f" s -> struct(s as start, slice(t, s, {CHUNK_TOKENS}) as chunk))"
            )
        ).alias("c"),
    )
    return c.select(
        "doc_id",
        F.expr(f"cast((c.start - 1) div {CHUNK_STRIDE} as bigint)").alias(
            "chunk_index"
        ),
        F.size("c.chunk").cast("bigint").alias("n_chunk_tokens"),
        F.concat_ws(" ", "c.chunk").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# Pattern redaction (PII scrubbing shape)
# ---------------------------------------------------------------------------

# Classic PII shape (no hits in the synthetic corpus — the count column
# proves the scan ran) + a term denylist (vocabulary words, nonzero).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
TERM_RE = r"\b(key|hash|secret)\b"


@register(
    "text_redact_patterns",
    f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '{TERM_RE}')) AS BIGINT) AS n_term,
       substr(md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                                 '{TERM_RE}', '<TERM>', 'g')), 1, 16) AS redacted_hash
FROM documents
""",
)
def text_redact_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style pattern redaction: count + replace email-shaped spans
    and a term denylist, returning match counts and a hash of the
    redacted text (so the oracle proves the rewritten STRING is
    identical, not just the counts). Map-only regex — no shuffle, stays
    in whole-stage codegen."""
    d = _docs(spark, sf_dir)
    red = F.regexp_replace(
        F.regexp_replace(F.col("text"), F.lit(EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(TERM_RE),
        F.lit("<TERM>"),
    )
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(EMAIL_RE)).cast("bigint").alias("n_email"),
        F.regexp_count(F.col("text"), F.lit(TERM_RE)).cast("bigint").alias("n_term"),
        F.substring(F.md5(red), 1, 16).alias("redacted_hash"),
    )


# ---------------------------------------------------------------------------
# Cross-document n-gram contamination (line/spans-shared dedup signal)
# ---------------------------------------------------------------------------


@register(
    "dedup_shared_ngram_fraction",
    f"""
WITH {_DUCK_TOK},
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, len(t) - {SHARED_NGRAM_K - 1}),
           i -> array_to_string(t[i:i+{SHARED_NGRAM_K - 1}], ' '))) AS shingles
  FROM tok
),
p AS (
  SELECT doc_id, {_DUCK_MD5INT.format(x="u.s")} AS k
  FROM sh, UNNEST(shingles) AS u(s)
),
c AS (SELECT k, COUNT(*) AS nd FROM p GROUP BY 1)
SELECT doc_id,
       COUNT(*) AS n_shingles,
       ROUND(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) / COUNT(*), 6)
         AS shared_fraction
FROM p JOIN c USING (k)
GROUP BY 1
""",
)
def dedup_shared_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document contamination signal: the fraction of a document's
    distinct {SHARED_NGRAM_K}-token shingles that also occur in at least
    one OTHER document (shingles are distinct per doc, so a shingle's
    occurrence count IS its document frequency). The CCNet-style shared-
    span filter, at n-gram granularity (the corpus has no newlines to
    make line-level meaningful). Docs shorter than k tokens have no
    shingles and drop out — same on both engines.

    Scale shape: inverted index via ONE window count over the 8-byte
    60-bit-md5 shingle key — shuffle on the key, count per frame,
    shuffle back to doc_id. Compared to the textbook
    groupBy-then-join-back, the window form evaluates the
    shingle-explode chain ONCE (Catalyst re-executes the whole
    tokenize→shingle→explode subtree for each reference; measured
    12.5s → ~3s at sf0.1) and moves one fewer shuffle. The ORACLE keys
    on the SAME md5 idiom — a (astronomically unlikely) 60-bit
    collision would merge the same shingles on both engines, so parity
    stays bit-exact rather than depending on collision-freedom. At
    100 TB the same plan holds — cost ~ total shingle count, never
    document pairs.

    explode_OUTER, not explode: a plain explode makes Catalyst infer a
    size(sh) > 0 pre-filter that embeds TWO copies of the whole shingle
    expression and pushes them to the scan — evaluated per input row
    before the real projection computes it a third time (measured 4.7s
    of the 5.7s total at sf0.1; same pathology dedup's LSH banding hit).
    Outer explode infers nothing; empty docs surface one null shingle
    dropped by a cheap IS NOT NULL afterwards."""
    from ibis_olap_aggregation_spark.operators.dedup import shingles_col
    from ibis_olap_aggregation_spark.operators.text import tokens_col

    d = (
        _docs(spark, sf_dir)
        .withColumn("t", tokens_col())
        .withColumn("sh", shingles_col(SHARED_NGRAM_K))
    )
    pairs = (
        d.select("doc_id", F.explode_outer("sh").alias("s"))
        .filter(F.col("s").isNotNull())
        .select("doc_id", F.expr(_SPARK_MD5INT.format(x="s")).alias("k"))
    )
    w = Window.partitionBy("k")
    return (
        pairs.withColumn("nd", F.count(F.lit(1)).over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.round(
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("shared_fraction"),
        )
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (train-vs-eval n-gram overlap)
# ---------------------------------------------------------------------------

# stand-in benchmark: one source plays the eval set; the GPT-3/PaLM
# decontamination method checks every TRAIN document's n-grams against
# the benchmark's n-gram set and drops (or flags) docs above a
# threshold. 0.5 = "half this training doc's shingles appear verbatim
# in the benchmark" — the near-copy tier; any-overlap is reported too
# (n_overlap > 0) for the stricter GPT-3-style policy.
BENCHMARK_SOURCE = "src0"
CONTAM_FRACTION = 0.5


@register(
    "dedup_benchmark_contamination",
    f"""
WITH tok AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
),
sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(
           generate_series(1, len(t) - {SHARED_NGRAM_K - 1}),
           i -> array_to_string(t[i:i+{SHARED_NGRAM_K - 1}], ' '))) AS shingles
  FROM tok
),
p AS (
  SELECT doc_id, source, {_DUCK_MD5INT.format(x="u.s")} AS k
  FROM sh, UNNEST(shingles) AS u(s)
),
ev AS (SELECT DISTINCT k FROM p WHERE source = '{BENCHMARK_SOURCE}')
SELECT p.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN ev.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overlap,
       ROUND(SUM(CASE WHEN ev.k IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 6)
         AS overlap_fraction,
       SUM(CASE WHEN ev.k IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*)
         >= {CONTAM_FRACTION} AS is_contaminated
FROM p LEFT JOIN ev ON ev.k = p.k
WHERE p.source <> '{BENCHMARK_SOURCE}'
GROUP BY 1
""",
)
def dedup_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark DECONTAMINATION: for every training document (all
    sources but {BENCHMARK_SOURCE}, which plays the held-out benchmark),
    the count and fraction of its distinct {SHARED_NGRAM_K}-token
    shingles that appear verbatim anywhere in the benchmark — the
    GPT-3/PaLM eval-leakage check a corpus build runs before training.
    `is_contaminated` flags the near-copy tier (>= {CONTAM_FRACTION} of
    shingles shared); `n_overlap > 0` is the stricter any-collision
    policy. Docs shorter than the shingle width drop out (same both
    engines, as in dedup_shared_ngram_fraction).

    Scale shape: the benchmark's distinct shingle-key set is SMALL by
    nature (eval suites, not corpora) -> broadcast; the train side is
    one explode + one broadcast left join + one groupBy on doc_id.
    Cost ~ train shingle count; the corpus is never self-joined and the
    benchmark is never rescanned per doc. Keys are the shared 60-bit
    md5 idiom, so a collision merges identically on both engines."""
    from ibis_olap_aggregation_spark.operators.dedup import shingles_col

    d = (
        _docs(spark, sf_dir)
        .withColumn("t", tokens_col())
        .withColumn("sh", shingles_col(SHARED_NGRAM_K))
    )
    keys = (
        d.select("doc_id", "source", F.explode_outer("sh").alias("s"))
        .filter(F.col("s").isNotNull())
        .select("doc_id", "source", F.expr(_SPARK_MD5INT.format(x="s")).alias("k"))
    )
    ev = (
        keys.filter(F.col("source") == BENCHMARK_SOURCE)
        .select("k")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    hit = F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0))
    return (
        keys.filter(F.col("source") != BENCHMARK_SOURCE)
        .join(F.broadcast(ev), "k", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            hit.cast("bigint").alias("n_overlap"),
            F.round(hit / F.count(F.lit(1)), 6).alias("overlap_fraction"),
            (hit / F.count(F.lit(1)) >= CONTAM_FRACTION).alias(
                "is_contaminated"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Semantic dedup over IVF clusters (SemDeDup shape)
# ---------------------------------------------------------------------------

# assignment CTEs: identical construction to sim_ivf_centroid_assign's
# oracle — the shared idioms.DUCK_IVF_SCORED prelude (exact-decimal
# centroid MEANS, float array-fold SCORING) so both engines assign every
# vector to the SAME cluster.
from ibis_olap_aggregation_spark.functions.idioms import (  # noqa: E402
    DUCK_IVF_SCORED as _DUCK_IVF_SCORED,
)

_DUCK_IVF_ASSIGN = (
    _DUCK_IVF_SCORED
    + """,
asg AS (SELECT vec_id, c_label AS cluster FROM ranked WHERE rk = 1)
"""
)


@register(
    "dedup_semantic_ivf",
    f"""
WITH {_DUCK_IVF_ASSIGN},
vv AS (
  SELECT e.vec_id, a.cluster,
         list_transform(e.v,
           x -> x / sqrt(list_sum(list_transform(e.v, y -> y * y)))) AS vn
  FROM e JOIN asg a USING (vec_id)
),
pr AS (
  SELECT x.cluster, y.vec_id AS vb,
         ROUND(list_sum(list_transform(generate_series(1, 64),
                                       i -> x.vn[i] * y.vn[i])), 6) AS cos
  FROM vv x JOIN vv y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
),
drp AS (SELECT DISTINCT cluster, vb FROM pr WHERE cos >= {SEMDEDUP_TAU})
SELECT vv.cluster,
       COUNT(*) AS n_vectors,
       COALESCE(MAX(d.n_dropped), 0) AS n_dropped,
       COUNT(*) - COALESCE(MAX(d.n_dropped), 0) AS n_kept
FROM vv
LEFT JOIN (SELECT cluster, COUNT(*) AS n_dropped FROM drp GROUP BY 1) d
       ON vv.cluster = d.cluster
GROUP BY 1
""",
)
def dedup_semantic_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup, SemDeDup shape (Abbas et al. 2023): assign every
    embedding to its nearest IVF centroid (reusing the exact-decimal
    centroid construction that sim_ivf_centroid_assign hash-verifies),
    then find near-duplicate pairs ONLY within a cluster (cosine ≥ τ on
    the 6-round value) and drop every vector that duplicates a lower-id
    clustermate. Returns the per-cluster keep/drop summary.

    Scale shape: the pair join is equi on cluster id — cost ~ Σ
    cluster², never all-pairs; cluster count grows with the corpus so
    cluster cardinality stays bounded (the SemDeDup design point).
    Two plan decisions matter as much as the join shape (together
    21s → ~2s at sf0.1): vectors are L2-NORMALIZED once in the
    assignment table, so each pair costs a single 64-element dot fold
    (per-pair norm recomputation tripled the work), and the assignment
    is CACHED — it is referenced five times (both self-join sides, the
    cluster sizes, and through the pair/drop chain), and Catalyst
    re-executes the whole explode+centroid+rank subtree for every
    reference of an uncached plan. At 100 TB that cache is the
    materialized assignment table any IVF deployment persists anyway.
    τ={SEMDEDUP_TAU} is corpus-calibrated (synthetic embeddings are
    near-orthogonal; p99 pairwise cosine ≈ 0.29)."""
    from ibis_olap_aggregation_spark.operators.similarity import (
        _emb,
        _ivf_centroids,
        _ivf_exploded,
        _ivf_ranked_structs,
    )

    e = _emb(spark, sf_dir)
    # assignment rides each vector's own row (r14): element 1 of the
    # per-row ranked structs IS the window path's rk=1 c_label (same
    # comparator), so the old e ⋈ assign re-attach join — two
    # corpus-sized exchanges on vec_id — vanishes and the vv build is a
    # pure map over the embeddings scan
    cent = _ivf_centroids(_ivf_exploded(e))
    nrm = "sqrt(aggregate(transform(v, y -> y * y), 0d, (acc, y) -> acc + y))"
    vv = _ivf_ranked_structs(e, cent).select(
        "vec_id",
        F.element_at("_ranked", 1)["c_label"].alias("cluster"),
        F.expr(f"transform(v, x -> x / {nrm})").alias("vn"),
    )
    vv = query_cache(vv)  # 5 references; query-scoped (no CacheManager leak)
    x = vv.select(
        F.col("cluster"),
        F.col("vec_id").alias("va"),
        F.col("vn").alias("xvn"),
    )
    y = vv.select(
        F.col("cluster").alias("cluster_y"),
        F.col("vec_id").alias("vb"),
        F.col("vn").alias("yvn"),
    )
    dot = (
        "aggregate(zip_with(xvn, yvn, (p, q) -> p * q), 0d, (acc, p) -> acc + p)"
    )
    pairs = (
        x.join(y, (x["cluster"] == y["cluster_y"]) & (x["va"] < y["vb"]))
        .withColumn("cos", F.round(F.expr(dot), 6))
        .filter(F.col("cos") >= SEMDEDUP_TAU)
    )
    dropped = (
        pairs.select("cluster", "vb")
        .distinct()
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    per_cluster = vv.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vectors"))
    return (
        per_cluster.join(dropped, "cluster", "left")
        .select(
            "cluster",
            "n_vectors",
            F.coalesce(F.col("n_dropped"), F.lit(0)).cast("bigint").alias("n_dropped"),
            (F.col("n_vectors") - F.coalesce(F.col("n_dropped"), F.lit(0)))
            .cast("bigint")
            .alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic split + domain-weighted mixing
# ---------------------------------------------------------------------------

_BK = _SPARK_MD5INT.format(x="cast(doc_id as string)") + " % 10000"
_DUCK_BK = _DUCK_MD5INT.format(x="doc_id::VARCHAR") + " % 10000"


@register(
    "sample_split_assign",
    f"""
WITH b AS (SELECT *, {_DUCK_BK} AS bk FROM documents)
SELECT CASE WHEN bk < 8000 THEN 'train'
            WHEN bk < 9000 THEN 'validation'
            ELSE 'test' END AS split,
       lang,
       COUNT(*) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM b
GROUP BY 1, 2
""",
)
def sample_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/validation/test assignment from the
    md5 bucket of the document key — the same document lands in the same
    split on every run, engine, and cluster layout (unlike rand()-seeded
    df.randomSplit, which reshuffles under retries). Map-only + one
    map-side-combined groupBy."""
    d = _docs(spark, sf_dir).withColumn("bk", F.expr(_BK))
    split = (
        F.when(F.col("bk") < 8000, "train")
        .when(F.col("bk") < 9000, "validation")
        .otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


_SRC_BK = _SPARK_MD5INT.format(x="source") + " % 50"
_DUCK_SRC_BK = _DUCK_MD5INT.format(x="source") + " % 50"


@register(
    "sample_domain_weighted",
    f"""
WITH w AS (
  SELECT *, {_DUCK_BK} AS bk, (25 + {_DUCK_SRC_BK}) * 100 AS keep_below
  FROM documents
)
SELECT source,
       ROUND(keep_below / 10000.0, 2) AS target_fraction,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN bk < keep_below THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sampled
FROM w
GROUP BY 1, 2
""",
)
def sample_domain_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-weighted corpus mixing: each source (domain) gets a
    deterministic keep-fraction in [0.25, 0.74] derived from the md5 of
    the domain name itself, and documents are kept by comparing their
    own md5 bucket against it — pure integer math end-to-end, so the mix
    reproduces bit-identically anywhere with NO weights table to
    distribute. Map-only + one groupBy."""
    d = (
        _docs(spark, sf_dir)
        .withColumn("bk", F.expr(_BK))
        .withColumn("keep_below", (F.lit(25) + F.expr(_SRC_BK)) * F.lit(100))
    )
    return d.groupBy(
        "source",
        F.round(F.col("keep_below") / 10000.0, 2).alias("target_fraction"),
    ).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("bk") < F.col("keep_below"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_sampled"),
    )


@register(
    "dedup_survivor_stats",
    """
WITH h AS (
  SELECT doc_id, source, n_chars, md5(lower(trim(text))) AS ch FROM documents
),
k AS (
  SELECT *, MIN(doc_id) OVER (PARTITION BY ch) AS canon FROM h
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN doc_id = canon THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN doc_id <> canon THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN doc_id <> canon THEN n_chars ELSE 0 END) AS BIGINT)
         AS chars_dropped
FROM k
GROUP BY 1
""",
)
def dedup_survivor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the dedup decision — the stage after candidate generation:
    exact-content clusters elect the min-doc_id survivor and every other
    copy is dropped, reported per source (the accounting a corpus build
    publishes: how much each provider shrank under dedup).

    Plan shape: one window MIN over the content hash (no groupBy +
    join-back, which would re-evaluate the normalize→md5 chain on both
    sides), then one per-source aggregation — two shuffles total, both
    map-side combined, at any corpus size. The same survivor-election
    idiom applies unchanged to near-dup cluster ids
    (dedup_duplicate_clusters.cluster_id) in place of the content hash."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.lower(F.trim("text"))))
    k = d.withColumn("canon", F.min("doc_id").over(w))
    kept = F.col("doc_id") == F.col("canon")
    return k.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(~kept, 1).otherwise(0)).cast("bigint").alias("n_dropped"),
        F.sum(F.when(~kept, F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("chars_dropped"),
    )


@register(
    "dedup_crosslingual_contamination",
    # the near-dup component construction is shared from the LEAF module
    # functions/minhash_sql.py so both engines see identical clusters
    # (and so this module never imports a sibling at decoration time)
    _DUCK_NEAR_DUP_COMP
    + """
SELECT CAST(c.component AS BIGINT) AS cluster_id,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT d.lang) AS n_langs,
       array_to_string(list_sort(list_distinct(list(d.lang))), ',') AS langs
FROM comp c JOIN documents d ON d.doc_id = c.node
GROUP BY 1
HAVING COUNT(DISTINCT d.lang) > 1
""",
)
def dedup_crosslingual_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-LINGUAL contamination: near-dup clusters whose members carry
    DIFFERENT language labels — translated boilerplate, mislabeled
    copies, or wire content republished across language sites. These
    break language-stratified sampling (the same content lands in two
    strata) and leak evaluation translations into training splits, so a
    corpus build surfaces them before the per-language mixers run.

    Shape: the verified near-dup components (corpus-tiny) broadcast-join
    the documents table; one aggregation per cluster. The language list
    is emitted as a sorted comma-joined STRING — set-typed cells are
    unsortable by the external comparator."""
    from ibis_olap_aggregation_spark.operators.dedup import _near_dup_components

    comp = _near_dup_components(spark, sf_dir)
    d = _docs(spark, sf_dir).select(F.col("doc_id").alias("node"), "lang")
    # corpus-sized worst case (everything near-duplicated): un-hinted,
    # AQE sizes the actual component-label table at runtime
    j = d.join(comp, "node")
    return (
        j.groupBy(F.col("component").cast("bigint").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.concat_ws(",", F.sort_array(F.collect_set("lang"))).alias("langs"),
        )
        .filter(F.col("n_langs") > 1)
    )


@register(
    "dedup_exact_substring_spans",
    f"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
),
seg AS (
  SELECT doc_id, g,
         {_DUCK_MD5INT.format(x="array_to_string(t[(g*8+1):(g*8+8)], ' ')")} AS k,
         least(8, len(t) - g*8) AS seg_len
  FROM tok, (SELECT unnest(generate_series(0, 511)) AS g) gs
  WHERE g*8 < len(t)
),
cnt AS (
  SELECT doc_id, seg_len,
         COUNT(*) OVER (PARTITION BY k) AS k_count
  FROM seg
)
SELECT doc_id,
       COUNT(*) AS n_segments,
       COUNT(*) FILTER (WHERE k_count > 1) AS n_dup_segments,
       ROUND(SUM(CASE WHEN k_count > 1 THEN seg_len ELSE 0 END) * 1.0
             / SUM(seg_len), 6) AS dup_token_fraction
FROM cnt
GROUP BY 1
""",
)
def dedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level dedup accounting (the fixed-stride form of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499): each document is cut into NON-OVERLAPPING
    8-token spans; a span whose text occurs anywhere else in the corpus
    (any doc, or twice in the same doc) is duplicated. Output per doc:
    span count, duplicated-span count, and the fraction of tokens
    sitting inside duplicated spans — the signal that drives span-level
    cut-out (vs whole-doc drop) in a production dedup stage.

    Scale shape: spans are keyed by the shared 60-bit md5 idiom (same
    expression both engines — collision-proof parity); one shuffle on
    the span key (window count, map-side combinable via the count form)
    + one shuffle back to doc grain. Cost ~ corpus token count / 8,
    never pairs. The suffix-array generality of the paper (arbitrary
    50-token matches at any offset) trades to fixed strides, which is
    what keeps this a two-shuffle relational plan at 100 TB; the DuckDB
    twin generates stride indices from a bounded series (512 spans =
    4096 tokens, comfortably above this corpus' max; the Spark side's
    sequence() is unbounded).
    """
    d = load_table(spark, sf_dir, "documents")
    from ibis_olap_aggregation_spark.functions.idioms import tokens_col

    seg = (
        d.withColumn("t", tokens_col())
        .withColumn(
            "g",
            F.explode(
                F.sequence(
                    F.lit(0), F.expr("cast(ceil(size(t) / 8.0) as bigint) - 1")
                )
            ),
        )
        .select(
            "doc_id",
            F.expr(
                _SPARK_MD5INT.format(x="concat_ws(' ', slice(t, g*8+1, 8))")
            ).alias("k"),
            F.least(F.lit(8), F.size("t") - F.col("g") * 8).alias("seg_len"),
        )
    )
    cnt = seg.withColumn("k_count", F.count(F.lit(1)).over(Window.partitionBy("k")))
    return cnt.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.count(F.when(F.col("k_count") > 1, 1)).alias("n_dup_segments"),
        F.round(
            F.sum(F.when(F.col("k_count") > 1, F.col("seg_len")).otherwise(0))
            * 1.0
            / F.sum("seg_len"),
            6,
        ).alias("dup_token_fraction"),
    )


PACK_LEN = 512  # tokens per training example (concat-and-cut packing)


@register(
    "sample_pack_sequences",
    f"""
WITH tok AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM tok
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(CEIL(SUM(n_tokens) / {PACK_LEN}.0) AS BIGINT) AS n_examples,
       COUNT(*) FILTER (WHERE (cum - n_tokens) // {PACK_LEN} != (cum - 1) // {PACK_LEN})
         AS n_boundary_docs,
       ROUND((SUM(n_tokens) - (CEIL(SUM(n_tokens) / {PACK_LEN}.0) - 1) * {PACK_LEN})
             / {PACK_LEN}.0, 6) AS last_fill_fraction
FROM c
GROUP BY 1
""",
)
def sample_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-cut sequence-packing accounting (the GPT-style packing
    stage: concatenate a source's docs in deterministic doc_id order,
    cut every {PACK_LEN} tokens): per source, how many training
    examples result, how many documents straddle an example boundary
    (candidates for attention-mask resets / document-boundary tokens),
    and how full the final example is — the report that decides pack
    length and whether boundary-aware packing is worth it. Companion:
    pipeline_pack_sequences (below) emits the per-window pack MANIFEST
    on a shard-parallel layout.

    One source-partitioned cumulative-sum window (running token offset)
    + one groupBy: two shuffles on source, both map-side combinable
    after the window. The offset arithmetic is pure integers — the
    boundary-crossing predicate and fill fraction are engine-exact."""
    d = load_table(spark, sf_dir, "documents")
    from ibis_olap_aggregation_spark.functions.idioms import tokens_col

    tok = d.select(
        "doc_id", "source", F.size(tokens_col()).cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = tok.withColumn("cum", F.sum("n_tokens").over(w))
    crosses = F.expr(
        f"(cum - n_tokens) div {PACK_LEN} != (cum - 1) div {PACK_LEN}"
    )
    return c.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.ceil(F.sum("n_tokens") / float(PACK_LEN)).cast("bigint").alias("n_examples"),
        F.count(F.when(crosses, 1)).alias("n_boundary_docs"),
        F.round(
            (
                F.sum("n_tokens")
                - (F.ceil(F.sum("n_tokens") / float(PACK_LEN)) - 1) * PACK_LEN
            )
            / float(PACK_LEN),
            6,
        ).alias("last_fill_fraction"),
    )


@register(
    "sample_temperature_mixing",
    """
WITH tok AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY 1
),
tot AS (SELECT SUM(n_tokens) AS t FROM tok),
p AS (
  SELECT source, n_docs, n_tokens,
         n_tokens * 1.0 / (SELECT t FROM tot) AS p_raw,
         CAST(ROUND(sqrt(n_tokens * 1.0 / (SELECT t FROM tot)), 6)
              AS DECIMAL(18,6)) AS sp
  FROM tok
),
z AS (SELECT SUM(sp) AS denom FROM p)
SELECT source, n_docs, n_tokens,
       ROUND(p_raw, 6) AS p_raw,
       ROUND(CAST(sp AS DOUBLE) / CAST((SELECT denom FROM z) AS DOUBLE), 6)
         AS p_temp,
       ROUND(ROUND(CAST(sp AS DOUBLE) / CAST((SELECT denom FROM z) AS DOUBLE), 6)
             / p_raw, 6) AS boost
FROM p
""",
)
def sample_temperature_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing — the multilingual-corpus
    sampling rule (mC4 / XLM-R): sampling probability q_i ∝ p_i^alpha
    flattens the raw token share p_i so low-resource domains are
    up-sampled (boost > 1) and dominant ones down-sampled. alpha = 0.5
    DELIBERATELY: sqrt is IEEE-correctly-rounded in both engines, so
    the mix reproduces bit-identically (an arbitrary pow(x, 0.7) is
    libm-dependent); the normalization denominator sums 6dp-rounded
    DECIMALs, so it is summation-order-proof too.

    Scale: one groupBy over the corpus (map-side combined) + two
    broadcast scalars; the per-source table is dims-sized."""
    tok = (
        _docs(spark, sf_dir)
        .withColumn("t", tokens_col())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("t")).cast("bigint").alias("n_tokens"),
        )
    )
    tot = tok.agg(F.sum("n_tokens").alias("t"))
    p = tok.join(F.broadcast(tot)).withColumn(
        "p_raw", F.col("n_tokens") * 1.0 / F.col("t")
    ).withColumn(
        "sp", F.round(F.sqrt("p_raw"), 6).cast("decimal(18,6)")
    )
    z = p.agg(F.sum("sp").alias("denom"))
    p_temp = F.round(
        F.col("sp").cast("double") / F.col("denom").cast("double"), 6
    )
    return (
        p.join(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round("p_raw", 6).alias("p_raw"),
            p_temp.alias("p_temp"),
            F.round(p_temp / F.col("p_raw"), 6).alias("boost"),
        )
    )


# -- weighted sampling without replacement (Efraimidis-Spirakis) ------------

_ES_M = 1 << 20  # hash -> uniform grid resolution
_ES_K = 50


@register(
    "sample_weighted_without_replacement",
    f"""
WITH keyed AS (
  SELECT doc_id, source, lang, n_chars,
         pow(((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
               % {_ES_M}) + 0.5) / {_ES_M}.0,
             1.0 / n_chars) AS es_key
  FROM documents
),
ranked AS (
  SELECT doc_id, source, lang, n_chars,
         row_number() OVER (ORDER BY es_key DESC, doc_id) AS sample_rank
  FROM keyed
)
SELECT doc_id, source, lang, n_chars, CAST(sample_rank AS BIGINT) AS sample_rank
FROM ranked WHERE sample_rank <= {_ES_K}
""",
)
def sample_weighted_without_replacement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weighted sample WITHOUT replacement (k=50, weight=n_chars)
    via Efraimidis-Spirakis keys: key = u^(1/w) with u a deterministic
    md5-derived uniform in (0,1); the k largest keys ARE a weighted
    without-replacement sample (Efraimidis & Spirakis 2006, the
    one-pass distributed algorithm). Unlike the per-domain Bernoulli
    keep-fractions of sample_domain_weighted, this draws an EXACT-size
    sample with per-ROW weights — the "oversample long documents, but
    cap the budget at k" epoch-construction primitive.

    Determinism: u comes from the md5 grid (same idiom as every split/
    sample here), so the same rows win on every engine, run, and
    cluster layout — rand()-seeded sampling changes under retries. The
    pow/log libm calls may differ by 1 ulp across engines, which can
    only flip the order of keys within ~1e-15 of each other —
    continuous keys over distinct docs, vanishing-measure; the key
    itself is never emitted.

    Scale: map-only key computation, distributed TakeOrdered top-k
    (per-partition heaps, no corpus-wide single-partition window),
    then a rank over the k survivors."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        (F.expr(_SPARK_MD5INT.format(x="cast(doc_id as string)")) % _ES_M) + F.lit(0.5)
    ) / F.lit(float(_ES_M))
    keyed = d.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.pow(u, F.lit(1.0) / F.col("n_chars")).alias("es_key"),
    )
    top = keyed.orderBy(F.desc("es_key"), "doc_id").limit(_ES_K)
    w = Window.orderBy(F.desc("es_key"), "doc_id")
    return top.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.row_number().over(w).cast("bigint").alias("sample_rank"),
    )


@register(
    "sample_neyman_allocation",
    """
WITH s AS (
  SELECT source, lang,
         COUNT(*) AS nh,
         SUM(n_chars) AS s1,
         SUM(n_chars * n_chars) AS s2
  FROM documents
  GROUP BY 1, 2
),
w AS (
  SELECT source, lang, nh,
         CAST(s1 AS DOUBLE) / nh AS mean_chars,
         sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nh)
              / (nh - 1)) AS std_chars,
         CAST(ROUND(nh * sqrt((CAST(s2 AS DOUBLE)
                               - CAST(s1 AS DOUBLE) * s1 / nh)
                              / (nh - 1)) * 1000) AS BIGINT) AS wq
  FROM s WHERE nh > 1
),
t AS (SELECT SUM(wq) AS tot FROM w)
SELECT w.source, w.lang, CAST(w.nh AS BIGINT) AS n_docs,
       ROUND(w.mean_chars, 6) AS mean_chars,
       ROUND(w.std_chars, 6) AS std_chars,
       CAST(ROUND(1000.0 * w.wq / t.tot) AS BIGINT) AS neyman_alloc
FROM w, t
ORDER BY 1, 2
""",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman (optimal) stratified-sampling allocation: for a budget of
    1000 documents, each (source, lang) stratum receives n_h
    proportional to N_h * S_h — more budget where strata are BIG or
    internally VARIABLE (here: document length). The design that
    minimizes the variance of the stratified mean at fixed budget
    (Neyman 1934); uniform or proportional allocation oversamples
    homogeneous strata.

    Determinism: per-stratum std comes from exact integer sums
    (n_chars is a bigint); the CROSS-STRATUM normalizer would be an
    order-dependent double sum, so each stratum weight N_h*S_h is
    quantized to bigint millis first and the normalizer sums exact
    ints (the PageRank contribution idiom). Single-member strata are
    excluded (std undefined).

    Scale: one map-side-combined aggregate to stratum grain; all later
    arithmetic is stratum-table-sized."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("nh"),
        # wide sums (oracle hugeint): sum(n_chars^2) ~ 1e12 x 1e9 docs
        # passes 2^63; s1 widened for the same tree shape
        sum_wide(F.col("n_chars")).alias("s1"),
        sum_wide_product(F.col("n_chars"), F.col("n_chars"), check_in=d).alias("s2"),
    ).filter(F.col("nh") > 1)
    mean = F.col("s1").cast("double") / F.col("nh")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("nh")
    ) / (F.col("nh") - 1)
    w = s.select(
        "source",
        "lang",
        F.col("nh").cast("bigint").alias("n_docs"),
        F.round(mean, 6).alias("mean_chars"),
        F.round(F.sqrt(var), 6).alias("std_chars"),
        F.round(F.col("nh") * F.sqrt(var) * 1000)
        .cast("bigint")
        .alias("wq"),
    )
    tot = w.agg(sum_wide(F.col("wq")).alias("tot"))
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "lang",
            "n_docs",
            "mean_chars",
            "std_chars",
            F.round(1000.0 * F.col("wq") / F.col("tot"))
            .cast("bigint")
            .alias("neyman_alloc"),
        )
        .orderBy("source", "lang")
    )


@register(
    "sample_importance_reweighting",
    """
WITH s AS (
  SELECT source,
         COUNT(*) AS nh,
         COUNT(*) FILTER (WHERE lang = 'en') AS nh_en
  FROM documents GROUP BY 1
),
tot AS (
  SELECT SUM(nh) AS n, SUM(nh_en) AS n_en FROM s
),
w AS (
  SELECT source, nh, nh_en,
         CAST(ROUND((CAST(nh_en AS DOUBLE) / t.n_en)
                    / (CAST(nh AS DOUBLE) / t.n) * 1e9) AS BIGINT) AS wq
  FROM s, tot t
  WHERE nh_en > 0
),
ess AS (
  SELECT SUM(CAST(nh * wq AS HUGEINT)) AS s1,
         SUM(CAST(nh AS HUGEINT) * wq * wq) AS s2
  FROM w
)
SELECT w.source, CAST(w.nh AS BIGINT) AS n_docs,
       CAST(w.nh_en AS BIGINT) AS n_docs_en,
       ROUND(CAST(w.wq AS DOUBLE) / 1e9, 6) AS weight,
       ROUND(CAST(e.s1 AS DOUBLE) * e.s1 / e.s2, 3)
         AS effective_sample_size
FROM w, ess e
ORDER BY 1
""",
)
def sample_importance_reweighting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance weights for domain shift: reweight the corpus so each
    source contributes with the share it has WITHIN the English subset
    (target) rather than its overall share (source distribution) —
    w_h = p_target(h) / p_source(h), the standard covariate-shift
    correction for training-mixture rebalancing. Also reports Kish's
    effective sample size (sum(n*w))^2 / sum(n*w^2): how many
    equivalent unweighted samples the reweighted corpus is worth —
    ESS << N flags a weighting too aggressive to train on.

    Weights are per-stratum rationals of exact counts, quantized to
    1e-9 units before the CROSS-stratum ESS sums (order-free exact
    hugeint/decimal arithmetic — the Neyman normalizer idiom; n*wq^2
    reaches ~1e27 at corpus scale, past bigint). Strata absent from
    the target (no English docs) get weight 0 and are excluded.

    Scale: one map-side-combined aggregate to source grain; everything
    after is strata-table-sized."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("nh"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("nh_en"),
    )
    tot = s.agg(
        F.sum("nh").alias("n"), F.sum("nh_en").alias("n_en")
    )
    w = (
        s.crossJoin(F.broadcast(tot))
        .filter(F.col("nh_en") > 0)
        .select(
            "source",
            "nh",
            "nh_en",
            F.round(
                (F.col("nh_en").cast("double") / F.col("n_en"))
                / (F.col("nh").cast("double") / F.col("n"))
                * 1e9
            )
            .cast("bigint")
            .alias("wq"),
        )
    )
    ess = w.agg(
        F.sum((F.col("nh") * F.col("wq")).cast("decimal(38,0)")).alias("s1"),
        F.sum(
            F.col("nh").cast("decimal(38,0)") * F.col("wq") * F.col("wq")
        ).alias("s2"),
    )
    return (
        w.crossJoin(F.broadcast(ess))
        .select(
            "source",
            F.col("nh").cast("bigint").alias("n_docs"),
            F.col("nh_en").cast("bigint").alias("n_docs_en"),
            F.round(F.col("wq").cast("double") / 1e9, 6).alias("weight"),
            # ESS = (sum n*w)^2 / sum n*w^2; the 1e9 quanta cancel:
            # (s1/1e9)^2 / (s2/1e18) == s1^2/s2
            F.round(
                F.col("s1").cast("double")
                * F.col("s1").cast("double")
                / F.col("s2").cast("double"),
                3,
            ).alias("effective_sample_size"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Sequence packing: the concat-and-chunk plan a tokenizer shard runs
# ---------------------------------------------------------------------------

# Context window length (tokens) and shard fan-out for the packing plan.
# PACK_SHARDS is the parallelism knob: each shard packs independently, so
# a production run sets it near the cluster's task count (e.g. 2^16 at
# 100 TB — each shard then sorts only corpus/2^16 docs). Fixed at 16 here
# so the plan is deterministic and oracle-comparable at test scale.
PACK_CTX = 2048
PACK_SHARDS = 16


@register(
    "pipeline_pack_sequences",
    f"""
WITH tok AS (
  SELECT doc_id,
         doc_id % {PACK_SHARDS} AS shard,
         GREATEST(1, (n_chars + 3) // 4) AS n_tok
  FROM documents
),
packed AS (
  SELECT shard, n_tok,
         SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM tok
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST((cum - n_tok) // {PACK_CTX} AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
       CAST(SUM(CASE WHEN (cum - 1) // {PACK_CTX} > (cum - n_tok) // {PACK_CTX}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers,
       ROUND(SUM(n_tok) / {PACK_CTX}.0, 6) AS fill_ratio
FROM packed
GROUP BY 1, 2
""",
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing plan: the concat-and-chunk layout a
    training-data tokenizer shard produces. Docs are sharded by
    doc_id % PACK_SHARDS, concatenated in doc_id order within the
    shard, and each doc is assigned to the PACK_CTX-token window its
    FIRST token lands in; the plan reports per-window doc count, token
    mass, boundary-straddler count, and fill ratio (can exceed 1 where
    a straddler spills into the next window). Companion to
    sample_pack_sequences (above): that op is the per-SOURCE sizing
    report (how many examples a source yields, is boundary-aware packing
    worth it); this one emits the per-WINDOW pack manifest itself, and
    its unit of parallelism is the hash shard, not the (skew-prone,
    low-cardinality) source key.

    Scale shape: token estimate ((n_chars+3)/4, the BPE-ish chars/4
    rule) is MAP-ONLY off the parquet footer columns (text is never
    read — ReadSchema carries doc_id/n_chars only); the only shuffle is
    the window partitioned by shard. Parallelism == PACK_SHARDS by
    construction, so the production knob is shard count (see constant
    note above): packing is embarrassingly parallel across shards and
    strictly sequential within one, which is exactly the contract a
    deterministic pack layout needs.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        # floor at 1 token (a zero-length doc still costs an EOS slot).
        # Also a determinism guard: n_tok = 0 could park `cum - 1` at -1,
        # where Spark's floor-division (-1) and DuckDB's truncating //
        # (0) disagree — with n_tok >= 1 every cum/offset is >= 0
        F.greatest(
            F.lit(1), F.floor((F.col("n_chars") + 3) / 4).cast("bigint")
        ).alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d.withColumn("cum", F.sum("n_tok").over(w))
    start_win = F.floor((F.col("cum") - F.col("n_tok")) / PACK_CTX)
    end_win = F.floor((F.col("cum") - 1) / PACK_CTX)
    return (
        packed.groupBy(
            F.col("shard").cast("bigint").alias("shard"),
            start_win.cast("bigint").alias("pack_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("sum_tokens"),
            F.sum((end_win > start_win).cast("int"))
            .cast("bigint")
            .alias("n_straddlers"),
            F.round(F.sum("n_tok") / float(PACK_CTX), 6).alias("fill_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Curriculum mixture schedule (stage-weighted language mixing)
# ---------------------------------------------------------------------------

# Training-curriculum stages: each stage gets a share of the total token
# budget and its own sampling temperature (alpha=1 -> proportional to
# corpus share, alpha->0 -> flatter / low-resource up-sampled). The
# warmup stage trains on the natural distribution, the anneal stage
# flattens hardest — the standard multi-stage data schedule.
CURRICULUM_STAGES = [
    (1, "warmup", 1.0, 0.20),
    (2, "core", 0.5, 0.60),
    (3, "anneal", 0.2, 0.20),
]

_STAGES_VALUES = ", ".join(
    f"({sid}, '{name}', {alpha}, {frac})"
    for sid, name, alpha, frac in CURRICULUM_STAGES
)


@register(
    "pipeline_curriculum_mixture_schedule",
    f"""
WITH h AS (
  SELECT doc_id, lang, n_chars,
         MIN(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS canon
  FROM documents
),
lt AS (
  SELECT lang,
         COUNT(*) AS n_docs,
         CAST(SUM((n_chars + 3) // 4) AS BIGINT) AS tok
  FROM h WHERE doc_id = canon
  GROUP BY 1
),
p AS (
  SELECT lang, n_docs, tok,
         CAST(tok AS DOUBLE) / CAST(SUM(tok) OVER () AS DOUBLE) AS p,
         SUM(tok) OVER () AS total_tok
  FROM lt
),
q AS (
  SELECT s.stage_id, s.stage, p.lang, p.n_docs, p.tok, p.p, p.total_tok,
         s.budget_frac,
         CAST(ROUND(POWER(p.p, s.alpha) * 1e15, 0) AS BIGINT) AS qw
  FROM p CROSS JOIN
       (SELECT * FROM (VALUES {_STAGES_VALUES})
          AS t(stage_id, stage, alpha, budget_frac)) s
),
n AS (
  SELECT *,
         CAST(SUM(qw) OVER (PARTITION BY stage_id) AS DOUBLE) AS sum_qw,
         ROUND(budget_frac * CAST(total_tok AS DOUBLE), 0) AS budget_tok
  FROM q
)
SELECT stage_id, stage, lang,
       n_docs AS n_surviving_docs,
       tok AS n_tokens,
       ROUND(p, 6) AS p_raw,
       ROUND(CAST(qw AS DOUBLE) / sum_qw, 6) AS weight,
       CAST(ROUND(CAST(qw AS DOUBLE) / sum_qw * budget_tok, 0) AS BIGINT)
         AS alloc_tokens,
       ROUND(CAST(qw AS DOUBLE) / sum_qw * budget_tok
             / CAST(tok AS DOUBLE), 6) AS epochs
FROM n
""",
)
def pipeline_curriculum_mixture_schedule(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stage-weighted curriculum mixture over DEDUP-SURVIVING documents:
    composes the exact-content survivor election (the
    [dedup_survivor_stats] window idiom — duplicates never inflate a
    language's share) with per-stage temperature sampling (the
    [text_mixture_temperature_weights] quantized p^alpha machinery).
    For each of the CURRICULUM_STAGES (warmup/core/anneal with their
    own alpha and token-budget share), emits each language's resampled
    weight, its absolute token allocation out of the stage budget, and
    the implied epochs over that language's surviving tokens (>1 =
    up-sampled/repeated — the anneal stage repeats low-resource
    languages hardest).

    Scale shape: one window MIN over the content hash (survivor
    election, the only corpus-sized shuffle), one map-side-combined
    groupBy on lang, then everything operates on |langs| x 3 stage rows
    — the cross join is against a 3-row literal and the per-stage
    windows are bounded-enum by construction. Determinism: p^alpha is
    quantized to 1e-15 integer units, per-stage normalizers are exact
    integer window sums, and each float output is a fixed chain of
    IEEE ops identical in both engines (ln/pow parity pinned, SURVEY
    §7.5.2)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.lower(F.trim("text"))))
    surv = (
        d.withColumn("canon", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("canon"))
    )
    lt = surv.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.floor((F.col("n_chars") + 3) / 4)).cast("bigint").alias("tok"),
    )
    wall = Window.partitionBy()
    p = lt.select(
        "lang",
        "n_docs",
        "tok",
        (F.col("tok").cast("double") / F.sum("tok").over(wall).cast("double")).alias("p"),
        F.sum("tok").over(wall).alias("total_tok"),
    )
    stages = F.broadcast(
        spark.createDataFrame(
            CURRICULUM_STAGES,
            "stage_id int, stage string, alpha double, budget_frac double",
        )
    )
    q = p.crossJoin(stages).withColumn(
        "qw",
        F.round(F.pow(F.col("p"), F.col("alpha")) * 1e15, 0).cast("bigint"),
    )
    wstage = Window.partitionBy("stage_id")
    n = q.withColumn(
        "sum_qw", F.sum("qw").over(wstage).cast("double")
    ).withColumn(
        "budget_tok",
        F.round(F.col("budget_frac") * F.col("total_tok").cast("double"), 0),
    )
    wt = F.col("qw").cast("double") / F.col("sum_qw")
    return n.select(
        "stage_id",
        "stage",
        "lang",
        F.col("n_docs").alias("n_surviving_docs"),
        F.col("tok").alias("n_tokens"),
        F.round("p", 6).alias("p_raw"),
        F.round(wt, 6).alias("weight"),
        F.round(wt * F.col("budget_tok"), 0).cast("bigint").alias("alloc_tokens"),
        F.round(wt * F.col("budget_tok") / F.col("tok").cast("double"), 6).alias(
            "epochs"
        ),
    )


# -- round 14c: epoch/shard planning ----------------------------------------

_N_SHARDS = 8
_EPOCHS = (0, 1, 2)
_SHARD_SPARK = (
    _SPARK_MD5INT.format(
        x="concat(cast(doc_id as string), ':', cast(epoch as string))"
    )
    + f" % {_N_SHARDS}"
)
_SHARD_DUCK = (
    _DUCK_MD5INT.format(x="doc_id::VARCHAR || ':' || epoch::VARCHAR")
    + f" % {_N_SHARDS}"
)


@register(
    "pipeline_epoch_shard_plan",
    f"""
WITH e AS (SELECT UNNEST([{", ".join(map(str, _EPOCHS))}]) AS epoch),
a AS (
  SELECT e.epoch, {_SHARD_DUCK} AS shard, n_chars
  FROM documents CROSS JOIN e
),
g AS (
  SELECT epoch, shard, COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars
  FROM a GROUP BY 1, 2
),
tot AS (SELECT SUM(n_chars) AS total_chars FROM documents)
SELECT CAST(epoch AS INT) AS epoch,
       CAST(shard AS BIGINT) AS shard,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(sum_chars AS BIGINT) AS sum_chars,
       CAST(ROUND(sum_chars * 1e6 / total_chars) AS BIGINT) AS share_ppm,
       ABS(sum_chars * {_N_SHARDS} - total_chars) * 4 <= total_chars
         AS within_25pct
FROM g CROSS JOIN tot
ORDER BY 1, 2
""",
)
def pipeline_epoch_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch training-shard plan: every document is assigned to
    one of 8 shards PER EPOCH by the md5 of (doc_id, epoch) — a fresh
    deterministic permutation each epoch (the standard reshuffle-
    between-epochs a dataloader wants) with zero stored state: any
    worker on any engine recomputes its own shard membership from the
    id alone, the property that matters when the plan must be
    re-derivable on a 1000-executor cluster without shipping an
    assignment table. Per (epoch, shard): document count, char mass,
    share of the corpus in ppm, and an exact-integer balance verdict
    (|shard mass - ideal| within 25% of ideal, checked as
    |S*n_shards - total| * 4 <= total — no float epsilon).

    Scale shape: map-only explode (x|epochs|) into ONE map-side-
    combined aggregate at (epoch, shard) grain — 24 output rows; the
    corpus total is a 1-row aggregate broadcast-crossed in. The only
    float op is the ppm division, on operands both engines share
    bit-identically."""
    d = _docs(spark, sf_dir)
    epochs = F.array(*[F.lit(e) for e in _EPOCHS])
    a = d.select(
        "doc_id", "n_chars", F.explode(epochs).alias("epoch")
    ).withColumn("shard", F.expr(_SHARD_SPARK))
    g = a.groupBy("epoch", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
    tot = d.agg(F.sum("n_chars").alias("total_chars"))
    sc = F.col("sum_chars")
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            F.col("epoch").cast("int").alias("epoch"),
            F.col("shard").cast("bigint").alias("shard"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            sc.cast("bigint").alias("sum_chars"),
            F.round(sc * F.lit(1e6) / F.col("total_chars"))
            .cast("bigint")
            .alias("share_ppm"),
            (
                F.abs(sc * _N_SHARDS - F.col("total_chars")) * 4
                <= F.col("total_chars")
            ).alias("within_25pct"),
        )
        .orderBy("epoch", "shard")
    )
