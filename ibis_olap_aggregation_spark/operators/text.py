"""Text-analysis operators over the `documents` table.

Training-data-pipeline surface (no reference counterpart — SURVEY.md
§7.4): token statistics, quality scoring, corpus-trained language ID,
document fingerprinting, n-gram profiling. Everything stays JVM-side
(built-in array/string/lambda expressions — zero Python UDFs), so the
whole family runs inside whole-stage codegen.

Scale notes (100 TB):
- per-document stats are map-only (no shuffle at all): they pipeline
  directly over the parquet scan.
- the language-ID profile is a tiny (n_langs x top_k) table → broadcast
  join back onto the token stream; the only big shuffle is the token
  GROUP BY, which benefits from map-side partial aggregation.
- corpus n-gram top-k is groupBy + a single top-k (rank over a global
  window is avoided: count-ordered take via orderBy+limit lets Spark use
  TakeOrderedAndProject, no single-partition window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.queries import register
from ibis_olap_aggregation_spark.session import load_table, query_cache

# tiny function-word list present in the synthetic vocabulary
STOPWORDS = ("a", "the")

_STOP_SQL = "('a', 'the')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# shared with dedup/pipeline via the leaf module (no operator→operator
# import edge); re-exported here for the public API surface
from ibis_olap_aggregation_spark.functions.idioms import tokens_col  # noqa: E402


@register(
    "text_token_stats",
    """
WITH tok AS (
  SELECT doc_id, n_chars, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
)
SELECT doc_id,
       n_chars,
       len(t) AS n_tokens,
       len(list_distinct(t)) AS n_distinct_tokens,
       CAST(COALESCE(list_sum(list_transform(t, x -> len(x))), 0) AS BIGINT)
         AS total_token_chars,
       CAST(COALESCE(list_sum(list_transform(t, x -> (len(x) + 3) // 4)), 0) AS BIGINT)
         AS n_subtokens,
       ROUND(list_sum(list_transform(t, x -> len(x))) / len(t), 6)
         AS avg_token_len
FROM tok
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting: whitespace tokens, distinct tokens,
    a BPE-ish subtoken estimate (ceil(len/4) pieces per word), avg token
    length. Map-only — no shuffle."""
    d = _docs(spark, sf_dir).withColumn("t", tokens_col())
    tl = "transform(t, x -> length(x))"
    return d.select(
        "doc_id",
        "n_chars",
        F.size("t").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("t")).cast("bigint").alias("n_distinct_tokens"),
        F.expr(f"coalesce(aggregate({tl}, 0L, (a, x) -> a + x), 0L)").alias(
            "total_token_chars"
        ),
        F.expr(
            "coalesce(aggregate(transform(t, x -> (length(x) + 3) div 4),"
            " 0L, (a, x) -> a + x), 0L)"
        ).alias("n_subtokens"),
        F.round(
            F.expr(f"aggregate({tl}, 0L, (a, x) -> a + x)") / F.size("t"), 6
        ).alias("avg_token_len"),
    )


@register(
    "text_quality_score",
    f"""
WITH tok AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
),
m AS (
  SELECT doc_id, lang,
         len(t) AS n_tokens,
         len(list_distinct(t)) / len(t) AS type_token_ratio,
         len(list_filter(t, x -> x IN {_STOP_SQL})) / len(t) AS stopword_ratio
  FROM tok
)
SELECT doc_id, lang, n_tokens,
       ROUND(type_token_ratio, 6) AS type_token_ratio,
       ROUND(stopword_ratio, 6) AS stopword_ratio,
       ROUND(0.4 * type_token_ratio
           + 0.4 * (1 - stopword_ratio)
           + 0.2 * LEAST(n_tokens / 100.0, 1.0), 6) AS quality_score
FROM m
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring: type/token ratio (lexical diversity),
    stopword ratio, length credit — composed into one [0,1] score.
    The classic cheap pre-filter stage of a training-data pipeline."""
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    d = _docs(spark, sf_dir).withColumn("t", tokens_col())
    m = d.select(
        "doc_id",
        "lang",
        F.size("t").cast("bigint").alias("n_tokens"),
        (F.size(F.array_distinct("t")) / F.size("t")).alias("type_token_ratio"),
        (
            F.expr(f"size(filter(t, x -> x IN ({stop})))") / F.size("t")
        ).alias("stopword_ratio"),
    )
    return m.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.round("type_token_ratio", 6).alias("type_token_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round(
            0.4 * F.col("type_token_ratio")
            + 0.4 * (1 - F.col("stopword_ratio"))
            + 0.2 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0)),
            6,
        ).alias("quality_score"),
    )


@register(
    "text_lang_id_confusion",
    f"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents
),
profile_counts AS (
  SELECT lang, token, COUNT(*) AS c
  FROM tok GROUP BY 1, 2
),
profile AS (
  SELECT lang, token, c,
         row_number() OVER (PARTITION BY lang ORDER BY c DESC, token) AS rk
  FROM profile_counts
),
doc_tokens AS (
  SELECT DISTINCT doc_id, lang AS actual_lang, token FROM tok
),
scores AS (
  SELECT d.doc_id, d.actual_lang, p.lang AS candidate_lang,
         CAST(SUM(p.c) AS BIGINT) AS score
  FROM doc_tokens d
  JOIN (SELECT * FROM profile WHERE rk <= 20) p USING (token)
  GROUP BY 1, 2, 3
),
best AS (
  SELECT *, row_number()
            OVER (PARTITION BY doc_id ORDER BY score DESC, candidate_lang) AS rk
  FROM scores
)
SELECT actual_lang, candidate_lang AS predicted_lang, COUNT(*) AS n_docs
FROM best WHERE rk = 1
GROUP BY 1, 2
""",
)
def text_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained n-gram(1) language ID: build per-language top-20
    token profiles, score each document by overlap weight, predict the
    argmax language; return the confusion matrix.

    The profile is tiny (langs x 20) → broadcast back onto the token
    stream; only the token GROUP BYs shuffle (map-side combined)."""
    d = _docs(spark, sf_dir).withColumn("t", tokens_col())
    tok = d.select("doc_id", "lang", F.explode("t").alias("token"))
    profile_counts = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), "token")
    profile = (
        profile_counts.withColumn("rk", F.row_number().over(w)).filter("rk <= 20")
    )
    doc_tokens = tok.select(
        "doc_id", F.col("lang").alias("actual_lang"), "token"
    ).distinct()
    scores = (
        doc_tokens.join(F.broadcast(profile.withColumnRenamed("lang", "candidate_lang")), "token")
        .groupBy("doc_id", "actual_lang", "candidate_lang")
        .agg(F.sum("c").cast("bigint").alias("score"))
    )
    wb = Window.partitionBy("doc_id").orderBy(F.desc("score"), "candidate_lang")
    best = scores.withColumn("rk", F.row_number().over(wb)).filter("rk = 1")
    return best.groupBy(
        "actual_lang", F.col("candidate_lang").alias("predicted_lang")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "text_fingerprint",
    """
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t, trim(text) AS norm
  FROM documents
),
sh AS (
  SELECT doc_id, norm,
         list_transform(generate_series(1, len(t) - 2),
                        i -> array_to_string(t[i:i+2], ' ')) AS shingles
  FROM tok
)
SELECT doc_id,
       md5(norm) AS content_md5,
       ('0x' || substr(md5(norm), 1, 15))::BIGINT AS fp64,
       CAST(list_min(list_transform(shingles,
              s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)) AS BIGINT)
         AS min_shingle_hash
FROM sh
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full-content md5, a 60-bit integer
    fingerprint, and a min-hash over 3-token shingles (the rolling-hash
    fingerprint a dedup pipeline keys on). Map-only."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.trim("text").alias("norm"), tokens_col().alias("t")
    )
    # short-doc guard: sequence(1, 0) descends in Spark (slice index 0
    # errors) while DuckDB's generate_series returns empty — branch so
    # sub-3-token docs yield an empty shingle list (min_shingle_hash NULL)
    # in both engines
    sh = d.withColumn(
        "shingles",
        F.expr(
            "if(size(t) < 3, cast(array() as array<string>),"
            " transform(sequence(1, size(t) - 2), i -> concat_ws(' ', slice(t, i, 3))))"
        ),
    )
    return sh.select(
        "doc_id",
        F.md5("norm").alias("content_md5"),
        F.expr("cast(conv(substr(md5(norm), 1, 15), 16, 10) as bigint)").alias("fp64"),
        F.expr(
            "array_min(transform(shingles,"
            " s -> cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)))"
        ).alias("min_shingle_hash"),
    )


@register(
    "text_ngram_topk",
    """
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
bg AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> array_to_string(t[i:i+1], ' '))) AS bigram
  FROM tok
)
SELECT bigram, COUNT(*) AS n
FROM bg
GROUP BY 1
ORDER BY n DESC, bigram
LIMIT 20
""",
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-20 word bigrams with a deterministic tie-break.
    orderBy+limit compiles to TakeOrderedAndProject (per-partition top-k
    then a tiny driver merge) — never a global sort of all n-grams."""
    d = _docs(spark, sf_dir).withColumn("t", tokens_col())
    # short-doc guard: 1-token docs produce no bigrams, matching
    # DuckDB's empty generate_series. explode_OUTER + null-filter, not
    # explode: the inferred size>0 pre-filter of a plain explode embeds
    # two extra copies of the bigram chain into the scan (see
    # dedup_shared_ngram_fraction)
    bg = d.select(
        F.explode_outer(
            F.expr(
                "if(size(t) < 2, cast(array() as array<string>),"
                " transform(sequence(1, size(t) - 1), i -> concat_ws(' ', slice(t, i, 2))))"
            )
        ).alias("bigram")
    ).filter(F.col("bigram").isNotNull())
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


@register(
    "text_tfidf_top_terms",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number()
            OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
  FROM scored
)
SELECT doc_id, term, tfidf, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 3
""",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: term frequency per doc x inverse document frequency over
    the corpus; top-3 terms per document.

    Plan shape: one groupBy for TF (map-side combined), one for DF; the
    DF table is vocabulary-sized — unbounded on an open-vocab 100 TB
    corpus, so the join back onto the TF stream is UN-hinted and AQE
    picks broadcast vs shuffle from the aggregate's actual runtime
    size; ranking windows partition by doc_id."""
    d = _docs(spark, sf_dir).withColumn("t", tokens_col())
    tok = d.select("doc_id", F.explode("t").alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = _docs(spark, sf_dir).count()
    # the DF table is vocabulary-sized — unbounded on an open-vocab
    # corpus, so no broadcast hint: AQE sizes the actual aggregate at
    # runtime (broadcast when small, shuffle join past the threshold)
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter("rk <= 3")
        .select("doc_id", "term", "tfidf", F.col("rk").cast("bigint").alias("rk"))
    )


@register(
    "text_unigram_logprob",
    """
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
ex AS (SELECT doc_id, unnest(t) AS w FROM tok),
cnt AS (SELECT w, COUNT(*) AS c FROM ex GROUP BY 1),
tot AS (SELECT SUM(c) AS n FROM cnt),
sc AS (
  SELECT e.doc_id,
         CAST(ROUND(-ln(c.c / t.n), 12) AS DECIMAL(20,12)) AS nl
  FROM ex e JOIN cnt c USING (w) CROSS JOIN tot t
)
SELECT doc_id, COUNT(*) AS n_tokens,
       ROUND(CAST(SUM(nl) AS DOUBLE) / COUNT(*), 6) AS avg_neg_logprob
FROM sc
GROUP BY 1
""",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram LM scoring — the perplexity-proxy quality
    filter (the CCNet stage, with a unigram model standing in for the
    external KenLM): train token probabilities on the corpus itself in
    one aggregation pass, then score every document by its average
    negative log-probability. High scorers are lexically atypical.

    Scale shape: two passes over the token stream — one map-side-
    combined groupBy for the model (vocabulary-sized output), one
    broadcast join of the model back onto the stream + per-doc
    aggregate. The model table is the only state and it is
    vocabulary-sized, not corpus-sized.

    Determinism: each token's -ln p is rounded to 12 decimals and summed
    in DECIMAL (exact, associative) — partial-aggregation order cannot
    move the per-doc average, which is rounded to 6 like every derived
    double in the registry."""
    d = _docs(spark, sf_dir).withColumn("t", tokens_col())
    ex = d.select(
        "doc_id", F.explode_outer("t").alias("w")
    ).filter(F.col("w").isNotNull())
    cnt = ex.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"))
    sc = (
        # cnt is vocabulary-sized: un-hinted, AQE sizes it at runtime
        ex.join(cnt, "w")
        .join(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(-F.log(F.col("c") / F.col("n")), 12)
            .cast("decimal(20,12)")
            .alias("nl"),
        )
    )
    return sc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.round(F.sum("nl").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_neg_logprob"
        ),
    )


@register(
    "text_gopher_rules_funnel",
    f"""
WITH tok AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
),
m AS (
  SELECT doc_id, source,
         len(t) AS n_tokens,
         list_sum(list_transform(t, x -> len(x))) * 1.0 / len(t) AS avg_len,
         len(list_distinct(t)) * 1.0 / len(t) AS ttr,
         len(list_filter(t, x -> x IN {_STOP_SQL})) > 0 AS has_stop
  FROM tok
),
flags AS (
  SELECT source,
         (n_tokens < 20 OR n_tokens > 1000) AS f_len,
         (avg_len < 2 OR avg_len > 8) AS f_avg,
         (NOT has_stop) AS f_stop,
         (ttr < 0.3) AS f_rep
  FROM m
)
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(*) FILTER (WHERE f_len) AS n_fail_length,
       COUNT(*) FILTER (WHERE f_avg) AS n_fail_avg_token_len,
       COUNT(*) FILTER (WHERE f_stop) AS n_fail_stopword,
       COUNT(*) FILTER (WHERE f_rep) AS n_fail_repetition,
       COUNT(*) FILTER (WHERE NOT (f_len OR f_avg OR f_stop OR f_rep))
         AS n_pass,
       ROUND(COUNT(*) FILTER (WHERE NOT (f_len OR f_avg OR f_stop OR f_rep))
             * 1.0 / COUNT(*), 6) AS pass_rate
FROM flags
GROUP BY 1
""",
)
def text_gopher_rules_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard rule-gate funnel (Gopher/MassiveText-style quality rules,
    Rae et al. 2021 appendix A): token-count bounds, mean-word-length
    bounds, must-contain-a-stopword, repetition (type/token ratio)
    floor — with per-source pass/fail accounting, the report a pipeline
    owner reads before deciding which source to drop. Complements
    text_quality_score (continuous score) with the production gate form.

    Map-only per-doc flags (whole-stage codegen over the scan) + one
    tiny groupBy(source): no shuffle of document text, ever. Thresholds
    are tuned to this corpus' synthetic vocabulary; each rule fires on
    a nonempty, non-universal subset so the funnel is informative."""
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    d = _docs(spark, sf_dir).withColumn("t", tokens_col())
    m = d.select(
        "source",
        F.size("t").cast("bigint").alias("n_tokens"),
        (
            F.expr("aggregate(transform(t, x -> length(x)), 0L, (a, x) -> a + x)")
            * 1.0
            / F.size("t")
        ).alias("avg_len"),
        (F.size(F.array_distinct("t")) * 1.0 / F.size("t")).alias("ttr"),
        F.expr(f"size(filter(t, x -> x IN ({stop}))) > 0").alias("has_stop"),
    )
    flags = m.select(
        "source",
        ((F.col("n_tokens") < 20) | (F.col("n_tokens") > 1000)).alias("f_len"),
        ((F.col("avg_len") < 2) | (F.col("avg_len") > 8)).alias("f_avg"),
        (~F.col("has_stop")).alias("f_stop"),
        (F.col("ttr") < 0.3).alias("f_rep"),
    )
    n_pass = F.count(
        F.when(
            ~(F.col("f_len") | F.col("f_avg") | F.col("f_stop") | F.col("f_rep")), 1
        )
    )
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("f_len"), 1)).alias("n_fail_length"),
        F.count(F.when(F.col("f_avg"), 1)).alias("n_fail_avg_token_len"),
        F.count(F.when(F.col("f_stop"), 1)).alias("n_fail_stopword"),
        F.count(F.when(F.col("f_rep"), 1)).alias("n_fail_repetition"),
        n_pass.alias("n_pass"),
        F.round(n_pass * 1.0 / F.count(F.lit(1)), 6).alias("pass_rate"),
    )


@register(
    "text_token_histogram",
    """
WITH tok AS (
  SELECT lang, n_chars, len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents
)
SELECT lang,
       n_tokens // 20 AS token_bucket,
       (n_tokens // 20) * 20 AS bucket_lo,
       COUNT(*) AS n_docs,
       CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
       ROUND(SUM(n_chars) * 1.0 / COUNT(*), 6) AS avg_chars
FROM tok
GROUP BY 1, 2
""",
)
def text_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram by language: fixed-width 20-token buckets
    with per-bucket doc counts and char stats — the length-distribution
    report used to pick truncation/packing lengths for training. Integer
    floor-division bucketing (identical semantics both engines; no
    width_bucket dependency). Map-only + one tiny groupBy."""
    d = _docs(spark, sf_dir).withColumn("t", tokens_col())
    m = d.select(
        "lang",
        "n_chars",
        F.size("t").cast("bigint").alias("n_tokens"),
    )
    return (
        m.withColumn("token_bucket", F.expr("n_tokens div 20"))
        .groupBy("lang", "token_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").cast("bigint").alias("min_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
            F.round(F.sum("n_chars") * 1.0 / F.count(F.lit(1)), 6).alias("avg_chars"),
        )
        .withColumn("bucket_lo", F.col("token_bucket") * 20)
        .select(
            "lang", "token_bucket", "bucket_lo", "n_docs",
            "min_tokens", "max_tokens", "avg_chars",
        )
    )


# -- regex pretokenizer (BPE-style) ------------------------------------------

# GPT-2-style pretokenizer, restricted to the lookahead-free common
# subset of Java regex (Spark) and RE2 (DuckDB): contraction suffixes,
# space-prefixed letter runs, 1-3 digit groups (BPE tokenizers split
# long numbers), space-prefixed punctuation runs. Whitespace between
# matches is absorbed by the following token's optional leading space —
# the property that makes BPE vocabularies encode " word" tokens.
PRETOKEN_PATTERN = (
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]{1,3}| ?[^ A-Za-z0-9]+"
)


# single source of truth: the SQL oracle interpolates the same
# constant (single quotes doubled for the SQL literal)
_PRETOKEN_SQL = PRETOKEN_PATTERN.replace("'", "''")


@register(
    "text_pretoken_count",
    f"""
WITH p AS (
  SELECT doc_id, lang,
         regexp_extract_all(text, '{_PRETOKEN_SQL}') AS toks
  FROM documents
)
SELECT doc_id, lang,
       len(toks) AS n_pretokens,
       len(list_distinct(toks)) AS n_distinct_pretokens,
       CAST(COALESCE(list_sum(list_transform(toks, x -> len(x))), 0) AS BIGINT)
         AS sum_pretoken_chars,
       ROUND(n_chars * 1.0 / len(toks), 6) AS chars_per_pretoken
FROM p JOIN documents USING (doc_id, lang)
""",
)
def text_pretoken_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style token counting via the regex PRETOKENIZER (the stage
    before merges in a real BPE tokenizer): pretoken count, distinct
    pretokens, and chars-per-pretoken — the compression proxy used to
    budget training tokens from raw bytes. Both engines run the
    IDENTICAL lookahead-free pattern, so counts match exactly (unlike
    the length/4 estimate in text_token_stats, this is a real
    tokenization). Map-only: one regex pass per document inside
    whole-stage codegen, no shuffle."""
    d = _docs(spark, sf_dir)
    toks = F.regexp_extract_all("text", F.lit(PRETOKEN_PATTERN), F.lit(0))
    tl = "transform(toks, x -> cast(length(x) as bigint))"
    return (
        d.withColumn("toks", toks)
        .select(
            "doc_id",
            "lang",
            F.size("toks").cast("bigint").alias("n_pretokens"),
            F.size(F.array_distinct("toks")).cast("bigint").alias(
                "n_distinct_pretokens"
            ),
            F.expr(f"coalesce(aggregate({tl}, 0L, (a, x) -> a + x), 0L)").alias(
                "sum_pretoken_chars"
            ),
            F.round(F.col("n_chars") * 1.0 / F.size("toks"), 6).alias(
                "chars_per_pretoken"
            ),
        )
    )


@register(
    "text_zipf_slope",
    """
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t FROM documents
),
c AS (SELECT t, COUNT(*) AS freq FROM tok GROUP BY 1),
r AS (
  SELECT ln(row_number() OVER (ORDER BY freq DESC, t)) AS x,
         ln(freq) AS y
  FROM c
),
s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(28,14))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(28,14))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(28,14))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(28,14))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y * y AS DECIMAL(28,14))) AS DOUBLE) AS syy
  FROM r
)
SELECT CAST(n AS BIGINT) AS vocab_size,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS zipf_intercept,
       ROUND(POW(n * sxy - sx * sy, 2)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r_squared
FROM s
""",
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus token frequencies: OLS slope of
    ln(freq) against ln(rank) (natural text ~ -1; synthetic/generated
    text drifts toward 0) plus intercept and R² — the corpus-level
    "does this look like language" diagnostic a data-quality dashboard
    tracks per source/snapshot. All five regression sums accumulate in
    exact DECIMAL (each double term cast before summation), so the fit
    is bit-identical across engines and partitionings; the rank window
    runs over the VOCABULARY (bounded), never the corpus."""
    d = _docs(spark, sf_dir).withColumn("t", tokens_col())
    c = (
        d.select(F.explode_outer("t").alias("tok"))
        .filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # vocabulary-sized window (31 tokens here; bounded by vocab at any
    # corpus size) — a single partition is correct and documented
    w = Window.orderBy(F.desc("freq"), "tok")
    r = c.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )

    def dsum14(e):
        return F.sum(e.cast("decimal(28,14)")).cast("double")

    s = r.agg(
        F.count(F.lit(1)).alias("n"),
        dsum14(F.col("x")).alias("sx"),
        dsum14(F.col("y")).alias("sy"),
        dsum14(F.col("x") * F.col("y")).alias("sxy"),
        dsum14(F.col("x") * F.col("x")).alias("sxx"),
        dsum14(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.cast("bigint").alias("vocab_size"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("zipf_intercept"),
        F.round(
            F.pow(n * sxy - sx * sy, 2)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r_squared"),
    )


# BM25 parameters (Robertson-Sparck Jones / Okapi): the standard
# retrieval defaults.
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("join", "vector", "stream")


@register(
    "text_bm25_topk",
    f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents
),
lens AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM lens
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN {_BM25_TERMS!r}
  GROUP BY 1, 2
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, tf.term,
         ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (tf.tf * ({_BM25_K1} + 1.0))
           / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
              + {_BM25_B} * l.dl / s.avgdl)) AS sc
  FROM tf
  JOIN dfreq d ON d.term = tf.term
  JOIN lens l ON l.doc_id = tf.doc_id
  CROSS JOIN stats s
),
per_doc AS (
  SELECT doc_id,
         COALESCE(SUM(CASE WHEN term = '{_BM25_TERMS[0]}' THEN sc END), 0.0)
         + COALESCE(SUM(CASE WHEN term = '{_BM25_TERMS[1]}' THEN sc END), 0.0)
         + COALESCE(SUM(CASE WHEN term = '{_BM25_TERMS[2]}' THEN sc END), 0.0)
           AS score
  FROM scored GROUP BY 1
)
SELECT doc_id, ROUND(score, 6) AS bm25_score
FROM per_doc
ORDER BY ROUND(score, 6) DESC, doc_id
LIMIT 10
""",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval scoring (Robertson et al., TREC-3) for a
    fixed query against the document corpus — the length-normalized,
    saturating upgrade of the TF-IDF scorer that real retrieval stacks
    (and RAG data pipelines) actually rank with. k1=1.2, b=0.75.

    Determinism: the per-(doc, term) score is one fixed double
    expression (ln parity with DuckDB is established by the tfidf
    family); the per-DOC total is NOT an ordered float sum — it's a
    fixed-order addition of per-term components, each of which
    aggregates at most one row (term pivot), so no
    nondeterministically-ordered float accumulation exists anywhere.

    Scale: the term filter lands before the TF aggregate (the scan
    stream drops to query-term hits immediately); doc lengths are one
    map-side-combined aggregate; df and the corpus stats are
    scalar/vocabulary-sized broadcasts."""
    d = _docs(spark, sf_dir).withColumn("t", tokens_col())
    tok = d.select("doc_id", F.explode("t").alias("term"))
    lens = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    # corpus scalars via one bounded probe (the tfidf n_docs precedent);
    # python float division == the oracle's in-SQL division bit-exactly
    # (both are one correctly-rounded IEEE op on identical operands)
    n_docs, total_dl = lens.agg(
        F.count(F.lit(1)), F.sum("dl")
    ).first()
    avgdl = float(total_dl) / float(n_docs)
    tf = (
        tok.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    norm = F.col("tf") + F.lit(_BM25_K1) * (
        F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / F.lit(avgdl)
    )
    scored = (
        # dfreq is vocabulary-sized: un-hinted, AQE sizes it at runtime
        tf.join(dfreq, "term")
        .join(lens, "doc_id")
        .select(
            "doc_id",
            "term",
            (idf * (F.col("tf") * F.lit(_BM25_K1 + 1.0)) / norm).alias("sc"),
        )
    )
    parts = [
        F.coalesce(
            F.sum(F.when(F.col("term") == t, F.col("sc"))), F.lit(0.0)
        )
        for t in _BM25_TERMS
    ]
    per_doc = scored.groupBy("doc_id").agg(
        (parts[0] + parts[1] + parts[2]).alias("score")
    )
    out = per_doc.select(
        "doc_id", F.round("score", 6).alias("bm25_score")
    )
    return out.orderBy(F.col("bm25_score").desc(), "doc_id").limit(10)


# Winnowing parameters: k-gram size and window width (Schleimer,
# Wilkerson, Aiken — SIGMOD'03 "local algorithms for document
# fingerprinting"). Key packing: 40-bit hash | 20-bit position, so the
# (hash, leftmost-position) argmin of a window is a plain integer MIN.
_WINNOW_K = 3
_WINNOW_W = 4
_H40 = 1099511627776  # 2^40
_P20 = 1048576  # 2^20


@register(
    "text_winnow_fingerprints",
    f"""
WITH toks AS (
  SELECT doc_id, unnest(arr) AS tok,
         CAST(generate_subscripts(arr, 1) AS BIGINT) AS pos
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS arr
        FROM documents)
),
grams AS (
  SELECT doc_id, pos AS gpos,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w
           AS gram
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY LEAD(tok, 2) OVER w IS NOT NULL
),
keyed AS (
  SELECT doc_id, gpos,
         (('0x' || substr(md5(gram), 1, 15))::BIGINT % {_H40}) * {_P20}
           + gpos AS key
  FROM grams
),
wins AS (
  SELECT doc_id,
         MIN(key) OVER (PARTITION BY doc_id ORDER BY gpos
                        ROWS BETWEEN {_WINNOW_W - 1} PRECEDING
                        AND CURRENT ROW) AS fp
  FROM keyed
  QUALIFY gpos >= {_WINNOW_W}
),
sel AS (SELECT DISTINCT doc_id, fp FROM wins),
per_doc AS (
  SELECT k.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(MAX(gpos) AS BIGINT) - {_WINNOW_W} + 1 AS n_windows
  FROM keyed k GROUP BY 1
)
SELECT p.doc_id, p.n_grams,
       CAST(COUNT(s.fp) AS BIGINT) AS n_fingerprints,
       CAST(MIN(s.fp) AS BIGINT) AS min_fp,
       CAST(MAX(s.fp) AS BIGINT) AS max_fp,
       ROUND(COUNT(s.fp) / CAST(p.n_windows AS DOUBLE), 6) AS density
FROM per_doc p JOIN sel s ON s.doc_id = p.doc_id
WHERE p.n_windows >= 1
GROUP BY p.doc_id, p.n_grams, p.n_windows
""",
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer-Wilkerson-Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-gram, slide a
    w-window over the hash sequence, select each window's minimum
    (leftmost on ties), dedupe. The selection guarantee — any match of
    length >= w+k-1 between two documents shares at least one
    fingerprint — is what makes the SELECTED subset (density ~ 2/(w+1))
    a sufficient index for plagiarism/near-dup detection, where the
    plain rolling-hash fingerprint (text_fingerprint) keeps everything.

    Engine shape: one shuffle on doc_id serves the k-gram lead()
    windows, the winnow min() frame, and the per-doc aggregate. The
    (hash, leftmost-pos) argmin is ONE integer MIN over a packed
    40-bit-hash | 20-bit-position key — no struct-ordering semantics to
    match across engines (pos < 2^20 tokens/doc; enforced by the
    packing, violated loudly by key collisions in the property test)."""
    from ibis_olap_aggregation_spark.functions.idioms import SPARK_MD5INT

    d = _docs(spark, sf_dir).withColumn("t", tokens_col())
    toks = d.select(
        "doc_id", F.posexplode("t").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "tok")
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = (
        toks.select(
            "doc_id",
            F.col("pos").alias("gpos"),
            F.concat_ws(
                " ", "tok", F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
            ).alias("gram"),
            F.lead("tok", 2).over(w).alias("_t2"),
        )
        .filter(F.col("_t2").isNotNull())
        .drop("_t2")
    )
    keyed = grams.select(
        "doc_id",
        "gpos",
        (
            (F.expr(SPARK_MD5INT.format(x="gram")) % F.lit(_H40)) * F.lit(_P20)
            + F.col("gpos")
        ).alias("key"),
    )
    wf = Window.partitionBy("doc_id").orderBy("gpos").rowsBetween(
        -(_WINNOW_W - 1), Window.currentRow
    )
    wins = (
        keyed.select("doc_id", "gpos", F.min("key").over(wf).alias("fp"))
        .filter(F.col("gpos") >= _WINNOW_W)
    )
    sel = wins.select("doc_id", "fp").distinct()
    per_doc = keyed.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        (F.max("gpos") - _WINNOW_W + 1).cast("bigint").alias("n_windows"),
    )
    return (
        per_doc.filter(F.col("n_windows") >= 1)
        .join(sel, "doc_id")
        .groupBy("doc_id", "n_grams", "n_windows")
        .agg(
            F.count("fp").cast("bigint").alias("n_fingerprints"),
            F.min("fp").cast("bigint").alias("min_fp"),
            F.max("fp").cast("bigint").alias("max_fp"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_fingerprints",
            "min_fp",
            "max_fp",
            F.round(
                F.col("n_fingerprints") / F.col("n_windows").cast("double"), 6
            ).alias("density"),
        )
    )


@register(
    "text_loglikelihood_keywords",
    """
WITH tok AS (
  SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents
),
tf AS (SELECT source, term, COUNT(*) AS a FROM tok GROUP BY 1, 2),
totals AS (SELECT source, COUNT(*) AS c FROM tok GROUP BY 1),
grand AS (SELECT term, COUNT(*) AS ab FROM tok GROUP BY 1),
n AS (SELECT COUNT(*) AS nd FROM tok),
scored AS (
  SELECT tf.source, tf.term, tf.a,
         g.ab - tf.a AS b, t.c, n.nd - t.c AS d,
         2.0 * (tf.a * ln(tf.a / (CAST(t.c AS DOUBLE) * g.ab / n.nd))
                + CASE WHEN g.ab - tf.a = 0 THEN 0.0
                  ELSE (g.ab - tf.a)
                       * ln((g.ab - tf.a)
                            / (CAST(n.nd - t.c AS DOUBLE) * g.ab / n.nd))
                  END) AS g2
  FROM tf
  JOIN totals t ON t.source = tf.source
  JOIN grand g ON g.term = tf.term
  CROSS JOIN n
  WHERE tf.a >= 5
),
ranked AS (
  SELECT source, term, a AS n_in_source, CAST(b AS BIGINT) AS n_elsewhere,
         ROUND(g2, 6) AS g2,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY ROUND(g2, 6) DESC, term) AS rk
  FROM scored
)
SELECT source, term, n_in_source, n_elsewhere, g2, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 5
""",
)
def text_loglikelihood_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive-keyword extraction per source via Dunning's
    log-likelihood ratio (G², CL'93) — 'which terms does THIS source
    over-use relative to the rest of the corpus', the
    corpus-comparison statistic that raw TF-IDF (per-document) cannot
    provide and that a data-mixing pipeline uses to characterize
    sources. Two-cell G² with the standard zero-count limit
    (b·ln(b/E)->0 as b->0).

    Per-row double arithmetic (ln parity per SURVEY §7.5.2) on exact
    integer counts from three grouped aggregates — vocabulary- and
    source-grain tables only after the token explode; no cross-row
    float sums. Top 5 per source by a keyed window."""
    d = _docs(spark, sf_dir).withColumn("t", tokens_col())
    tok = d.select("source", F.explode("t").alias("term"))
    tf = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("a"))
    totals = tok.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    grand = tok.groupBy("term").agg(F.count(F.lit(1)).alias("ab"))
    nd = tok.agg(F.count(F.lit(1)).alias("nd"))
    j = (
        tf.filter(F.col("a") >= 5)
        .join(F.broadcast(totals), "source")
        # grand is vocabulary-sized: un-hinted, AQE sizes it at runtime
        .join(grand, "term")
        .crossJoin(F.broadcast(nd))
    )
    b = F.col("ab") - F.col("a")
    e1 = F.col("c").cast("double") * F.col("ab") / F.col("nd")
    e2 = (F.col("nd") - F.col("c")).cast("double") * F.col("ab") / F.col("nd")
    g2 = F.lit(2.0) * (
        F.col("a") * F.log(F.col("a") / e1)
        + F.when(b == 0, F.lit(0.0)).otherwise(b * F.log(b / e2))
    )
    wr = Window.partitionBy("source").orderBy(
        F.round(g2, 6).desc(), F.col("term")
    )
    return (
        j.select(
            "source",
            "term",
            F.col("a").alias("n_in_source"),
            b.cast("bigint").alias("n_elsewhere"),
            F.round(g2, 6).alias("g2"),
            F.row_number().over(wr).cast("bigint").alias("rk"),
        )
        .filter(F.col("rk") <= 5)
    )


@register(
    "text_pmi_cooccurrence",
    """
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents
),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tok),
df AS (
  SELECT term, COUNT(*) AS df FROM tok GROUP BY 1
),
vocab AS (
  SELECT term, df FROM df ORDER BY df DESC, term LIMIT 50
),
ft AS (
  SELECT t.doc_id, t.term FROM tok t JOIN vocab v ON v.term = t.term
),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, COUNT(*) AS n_xy
  FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2
)
SELECT p.term_a, p.term_b, CAST(p.n_xy AS BIGINT) AS n_xy,
       ROUND(ln(CAST(p.n_xy AS DOUBLE) * n.n_docs / (va.df * vb.df)), 6)
         AS pmi
FROM pairs p
JOIN vocab va ON va.term = p.term_a
JOIN vocab vb ON vb.term = p.term_b
CROSS JOIN n
WHERE p.n_xy >= 5
ORDER BY pmi DESC, term_a, term_b
LIMIT 20
""",
)
def text_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token pairs at DOCUMENT grain
    (Church & Hanks 1990): PMI = ln(p(x,y) / (p(x)p(y))) over document
    presence — the collocation / topical-association measure behind
    phrase mining and embedding objectives (word2vec's SGNS factorizes
    a shifted PMI matrix). Top-20 pairs with support >= 5.

    Scale: the pair space is bounded by restricting to the top-50
    vocabulary BEFORE pairing (vocabulary is corpus-bounded -> the
    filter broadcasts; per-doc pair fan-out is <= C(50,2) regardless of
    document or corpus size). ln parity between engines is established
    (tfidf/BM25/entropy all hash-exact); the log's operand is one
    rational of exact integers."""
    tok = (
        _docs(spark, sf_dir)
        .withColumn("t", tokens_col())
        .select("doc_id", F.explode("t").alias("term"))
        .distinct()
    )
    tok = query_cache(tok)
    n_docs = tok.select("doc_id").distinct().count()
    df = tok.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    vocab = df.orderBy(F.desc("df"), "term").limit(50)
    va = vocab.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    vb = vocab.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    ft = tok.join(
        F.broadcast(vocab.select("term")), "term"
    )
    a = ft.select("doc_id", F.col("term").alias("term_a"))
    b = ft.select("doc_id", F.col("term").alias("term_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .filter(F.col("n_xy") >= 5)
    )
    pmi = F.log(
        F.col("n_xy").cast("double")
        * F.lit(float(n_docs))
        / (F.col("df_a") * F.col("df_b"))
    )
    return (
        pairs.join(F.broadcast(va), "term_a")
        .join(F.broadcast(vb), "term_b")
        .select(
            "term_a",
            "term_b",
            F.col("n_xy").cast("bigint").alias("n_xy"),
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "term_a", "term_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Training-mixture temperature weights (multilingual sampling)
# ---------------------------------------------------------------------------

# Temperature exponent for language-balanced sampling: weight_i ∝ p_i^α
# (α=1 → proportional/no rebalance, α=0 → uniform). 0.3 is the
# multilingual-LM convention (mBERT/XLM-R exponentiated sampling).
MIX_ALPHA = 0.3


@register(
    "text_mixture_temperature_weights",
    f"""
WITH lt AS (
  SELECT lang,
         COUNT(*) AS n_docs,
         CAST(SUM((n_chars + 3) // 4) AS BIGINT) AS tok
  FROM documents GROUP BY 1
),
p AS (
  SELECT lang, n_docs, tok,
         CAST(tok AS DOUBLE) / CAST(SUM(tok) OVER () AS DOUBLE) AS p
  FROM lt
),
q AS (
  SELECT lang, n_docs, tok, p,
         CAST(ROUND(POWER(p, {MIX_ALPHA}) * 1e15, 0) AS BIGINT) AS qw
  FROM p
)
SELECT lang, n_docs, tok AS n_tokens,
       ROUND(p, 6) AS p_raw,
       ROUND(CAST(qw AS DOUBLE) / CAST(SUM(qw) OVER () AS DOUBLE), 6)
         AS weight,
       ROUND(CAST(qw AS DOUBLE) / CAST(SUM(qw) OVER () AS DOUBLE)
             / NULLIF(p, 0), 6) AS epochs
FROM q
""",
)
def text_mixture_temperature_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-scaled language mixture for a training run: per
    language, raw token share p, resampled weight p^α / Σ p^α
    (α=MIX_ALPHA), and the implied epochs over that language's data
    when the token budget equals the corpus size (weight/p — >1 means
    the low-resource language is up-sampled/repeated).

    Scale shape: ONE map-side-combined groupBy on lang off the parquet
    footer columns (text never read); everything after operates on the
    ≤|langs| aggregate rows, so the global (unpartitioned) windows are
    bounded-enum by construction — never a data-sized single partition.
    Determinism: the p^α values are quantized to 1e-15 units and the
    normalizer is the exact integer window sum (order-free), with one
    double division + round at the end per output column.
    """
    d = load_table(spark, sf_dir, "documents")
    lt = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.floor((F.col("n_chars") + 3) / 4))
        .cast("bigint")
        .alias("tok"),
    )
    wall = Window.partitionBy()
    p = lt.select(
        "lang",
        "n_docs",
        "tok",
        (
            F.col("tok").cast("double")
            / F.sum("tok").over(wall).cast("double")
        ).alias("p"),
    )
    q = p.withColumn(
        "qw",
        F.round(F.pow(F.col("p"), F.lit(MIX_ALPHA)) * 1e15, 0).cast("bigint"),
    )
    w = F.col("qw").cast("double") / F.sum("qw").over(wall).cast("double")
    return q.select(
        "lang",
        "n_docs",
        F.col("tok").alias("n_tokens"),
        F.round("p", 6).alias("p_raw"),
        F.round(w, 6).alias("weight"),
        # NULLIF twin: an all-empty-docs language has p = 0 -> epochs is
        # NULL on both engines (Spark 0/0 is NULL, DuckDB's is NaN — the
        # guard keeps the engines aligned instead of leaning on either)
        F.round(w / F.nullif(F.col("p"), F.lit(0.0)), 6).alias("epochs"),
    )
