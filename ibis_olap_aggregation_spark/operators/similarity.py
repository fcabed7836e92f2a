"""Similarity search over the `embeddings` table (array<float>, 64-dim).

Training-data-pipeline ANN surface (no reference counterpart —
SURVEY.md §7.4):
- brute-force cosine top-k — the exact baseline;
- sign-LSH bucketed top-k — the scale path: candidates only meet inside
  their hyperplane-sign bucket, so the join is bucket-equi, never n^2;
- IVF-style coarse quantization: centroid build + nearest-centroid
  assignment (the partition-pruning step of an IVF index).

All vector math is JVM-side (zip_with / aggregate lambdas over
array<double>) — no Python UDF in any hot path.

Scale notes (100 TB): brute-force is O(n_q x n) — usable when the query
set is small and broadcast; LSH buckets the corpus once (map-only
signature) and turns search into a per-bucket local top-k; IVF assignment
is a broadcast join against the (tiny) centroid table. Top-k per query
uses a window PARTITIONED by the query id — never a global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.queries import register
from ibis_olap_aggregation_spark.session import load_table, query_cache

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
LSH_BITS = 8  # sign bits of the first 8 dimensions

# shared cross-engine idioms (functions/idioms.py)
from ibis_olap_aggregation_spark.functions.idioms import (  # noqa: E402
    DUCK_COS as _DUCK_COS,
    DUCK_IVF_SCORED as _IVF_SCORED,
    SPARK_DOT as _DOT,
    SPARK_NORM as _NORM,
    spark_cosine as _cosine,
)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT spread (cf. dedup._docs_spread): measured in an interleaved
    # A/B at sf0.1, session.spread_scan here made every consumer SLOWER
    # (pq_adc 4.15s -> 5.06s, rrf 2.36s -> 2.75s, kmeans 1.69s -> 2.07s)
    # — the family's heavy math runs post-shuffle or against broadcast
    # codebooks, so the extra exchange of raw vectors buys nothing.
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )


@register(
    "sim_bruteforce_topk",
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
         ROUND({_DUCK_COS.format(a="q.v", b="e.v")}, 6) AS cosine
  FROM q JOIN e ON q.vec_id <> e.vec_id
),
ranked AS (
  SELECT *, row_number()
            OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, neighbor_label, cosine, rk
FROM ranked WHERE rk <= {TOP_K}
""",
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: brute-force cosine top-5 for each query vector
    (vec_id < 10). The broadcast side is the QUERY set — the big corpus
    streams past it; ranking windows partition by query_id."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .withColumn("cosine", F.round(F.expr(_cosine("qv", "v")), 6))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            "cosine",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "neighbor_label", "cosine", F.col("rk").cast("bigint").alias("rk"))
    )


@register(
    "sim_lsh_bucket_topk",
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
b AS (
  SELECT *, list_sum(list_transform(generate_series(1, {LSH_BITS}),
              i -> CASE WHEN v[i] > 0 THEN 1 << (i - 1) ELSE 0 END)) AS bucket
  FROM e
),
q AS (SELECT * FROM b WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket AS bucket,
         ROUND({_DUCK_COS.format(a="q.v", b="c.v")}, 6) AS cosine
  FROM q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT *, row_number()
            OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, CAST(bucket AS BIGINT) AS bucket, cosine, rk
FROM ranked WHERE rk <= {TOP_K}
""",
)
def sim_lsh_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: hyperplane-sign signature (sign bits of the
    first 8 dims ≙ 8 fixed axis-aligned hyperplanes) → candidates meet
    only inside their bucket → exact cosine + top-5 within bucket.
    The bucket join is equi on the signature: cost ~ sum(bucket^2)."""
    e = _emb(spark, sf_dir)
    bucket = F.expr(
        f"aggregate(transform(sequence(1, {LSH_BITS}),"
        " i -> CASE WHEN element_at(v, i) > 0d THEN shiftleft(1, i - 1) ELSE 0 END),"
        " 0, (acc, x) -> acc + x)"
    )
    b = e.withColumn("bucket", bucket)
    q = b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        b.join(
            F.broadcast(q),
            (F.col("qbucket") == F.col("bucket"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .withColumn("cosine", F.round(F.expr(_cosine("qv", "v")), 6))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("bucket").cast("bigint").alias("bucket"),
            "cosine",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "bucket", "cosine", F.col("rk").cast("bigint").alias("rk"))
    )


@register(
    "sim_ivf_centroid_assign",
    f"""
WITH {_IVF_SCORED}
SELECT label AS true_label, c_label AS assigned_label, COUNT(*) AS n_vectors
FROM ranked WHERE rk = 1
GROUP BY 1, 2
""",
)
def sim_ivf_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: build per-label centroids (exact decimal
    mean per dimension — summation-order-proof), assign every vector to
    its nearest centroid by cosine, return the label-vs-assignment
    matrix. Centroids are tiny → broadcast; the explode/groupBy paths
    are map-side combined. Scoring runs on the FLOAT array-fold path
    (see `_ivf_score_rank_array` — order-fixed, so cross-engine
    bit-identical without decimal).
    """
    ranked = _ivf_centroid_ranked(_emb(spark, sf_dir))
    return (
        ranked.filter("rk = 1")
        .groupBy(
            F.col("label").alias("true_label"),
            F.col("c_label").alias("assigned_label"),
        )
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def _ivf_exploded(e: DataFrame) -> DataFrame:
    """(vec_id, label, dim 1-based, val) rows — the shared explode.

    Hash-repartition BEFORE the 64x explode: a small embeddings file
    scans as ONE partition, and a narrow single-file scan keeps the
    explode + decimal centroid aggregations in a single task (~9s of
    the query's cold cost measured at sf0.1). Hash (not round-robin)
    partitioning: Catalyst pushes projections/generators below
    round-robin exchanges, which would put the work right back in the
    scan partition. Values are unaffected — the centroid aggregation is
    summation-order-proof decimal."""
    parts = int(e.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return (
        e.repartition(parts, "vec_id")
        .select("vec_id", "label", F.posexplode("v").alias("dim0", "val"))
        .select("vec_id", "label", (F.col("dim0") + 1).alias("dim"), "val")
    )


def _ivf_centroids(ex: DataFrame, cluster_col: str = "label") -> DataFrame:
    """Per-cluster per-dimension mean in exact decimal (summation-order
    -proof, so both engines produce bit-identical centroid doubles).

    Stays on the EXPLODED table by measurement: map-side combine means
    the (cluster, dim) groupBy only shuffles k x 64 partials per map
    task — the explode is local row inflation inside codegen — and an
    A/B against a 64-decimal-buffer aggregate over the array table
    showed the buffer form 2x SLOWER at sf0.1 (wide decimal aggregation
    buffers defeat the hash-agg fast path), so the explode+combine IS
    the scale shape here."""
    return ex.groupBy(F.col(cluster_col).alias("c_label"), "dim").agg(
        (
            F.sum(F.col("val").cast("decimal(28,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cval")
    )


def _ivf_centroid_ranked(e: DataFrame) -> DataFrame:
    """Per-(vector, centroid) cosine with a dense per-vector rank.

    Centroids are the per-label per-dimension means, exact-decimal so
    the MEAN is summation-order-proof — the ranks must agree
    bit-for-bit with the DuckDB oracle or the two engines would probe
    different inverted lists. Centroids are tiny (labels x 64 dims) ->
    broadcast; explode/groupBy is map-side combined. Scoring runs on
    the ARRAY path (`_ivf_score_rank_array`) — float folds with fixed
    per-row order, IEEE-identical across engines, no |vectors| x 64 x k
    explode-join intermediate and no per-term decimal arithmetic.

    The centroid table is TRACKED-CACHED (k x 64 rows — bounded by the
    centroid count at any corpus size): consumers such as sim_ivf_topk
    reference the ranked frame twice, and each un-materialized reference
    would re-run the explode + centroid aggregation — the only
    corpus-sized exchange left on this path since the scorer went
    map-side (r14).
    """
    cent = query_cache(_ivf_centroids(_ivf_exploded(e)))
    return _ivf_score_rank_array(e, cent)


def _ivf_score_rank(ex: DataFrame, cent: DataFrame) -> DataFrame:
    """Score every vector against every centroid (exact-decimal dot and
    norms) and rank centroids per vector: rk=1 is the assignment."""
    scored = (
        ex.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "c_label")
        .agg(
            F.sum((F.col("val") * F.col("cval")).cast("decimal(28,14)"))
            .cast("double")
            .alias("dot"),
            (
                F.sqrt(
                    F.sum((F.col("val") * F.col("val")).cast("decimal(28,14)")).cast(
                        "double"
                    )
                )
                * F.sqrt(
                    F.sum((F.col("cval") * F.col("cval")).cast("decimal(28,14)")).cast(
                        "double"
                    )
                )
            ).alias("norms"),
        )
    )
    cos = F.round(F.col("dot") / F.col("norms"), 6)
    w = Window.partitionBy("vec_id").orderBy(cos.desc(), "c_label")
    return scored.withColumn("cosine", cos).withColumn("rk", F.row_number().over(w))


# Decimal-exact dot product as a SEQUENTIAL ARRAY FOLD: each pairwise
# product is cast to the same DECIMAL(28,14) the exploded form sums, and
# decimal addition is exact/associative — so the fold equals the
# exploded SUM bit-for-bit, in any order, on any engine.
#
# STATUS: not on any product hot path since the float-path migration
# (the library default scores with _DOT/_NORM doubles; the exploded
# witness `_ivf_score_rank` sums decimals itself). Retained as the
# exact-scoring idiom for callers that need decimal-fold parity with an
# exploded SUM, with its overflow contract tested in
# tests/test_new_ops_properties.py::test_dec_dot_overflow_raises_loudly.
#
# MAGNITUDE BOUND: each term must satisfy |x*y| < 1e14 (DECIMAL(28,14)
# integral headroom) and the running sum |Σ| < 1e23 (DECIMAL(37,14)).
# Under non-ANSI mode a cast overflow yields NULL, which would silently
# null the cosine and corrupt downstream ranks (VERDICT r4/r5 finding
# #4) — so the fold is wrapped: NULL out of non-NULL inputs raises
# loudly instead. A NULL *element* inside a vector (data corruption)
# also raises; NULL whole-vector inputs stay NULL (legitimate missing
# data, caller's concern).
_DEC_DOT_FOLD = (
    "cast(aggregate(zip_with({a}, {b}, (x, y) -> cast(x * y as decimal(28,14))),"
    " cast(0 as decimal(37,14)),"
    # accumulate at (37,14) and re-cast each step: (37,14)+(28,14)
    # widens to exactly (38,14) — same scale, so the cast back is a
    # lossless precision check, never a rounding (at (38,14) Spark
    # would instead DROP a scale digit to honor the precision cap)
    " (acc, x) -> cast(acc + x as decimal(37,14))) as double)"
)
_DEC_DOT = (
    "if(({a}) IS NULL OR ({b}) IS NULL, cast(null as double),"
    " ifnull(" + _DEC_DOT_FOLD + ","
    " raise_error('decimal overflow or NULL element in exact dot product:"
    " per-term |x*y| must stay below 1e14 and the running sum below 1e23"
    " (DECIMAL(28,14)/(37,14) headroom) — rescale the vectors or use the"
    " float-path scorer')))"
)


def centroid_arrays(cent: DataFrame) -> DataFrame:
    """Collapse a (c_label, dim, cval) centroid table to one ARRAY row
    per centroid: (c_label, cvec ordered by dim). k x 64 rows in, k rows
    out — always broadcastable."""
    return cent.groupBy("c_label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cval"))),
            lambda s: s["cval"],
        ).alias("cvec")
    )


# Per-row centroid ranking comparator: (cosine DESC, c_label ASC) with
# Spark's SQL ordering semantics spelled out — NULL cosines last (the
# window was desc_nulls_last), NaN greater than every non-NaN double and
# equal to itself (Spark's total order for doubles). c_label is unique
# per centroid, so the comparator is a total order and array_sort is
# deterministic regardless of collect_list's input order.
_RANK_CMP = (
    "(l, r) -> CASE"
    " WHEN l.cosine IS NULL AND r.cosine IS NULL THEN"
    "   CASE WHEN l.c_label < r.c_label THEN -1"
    "        WHEN l.c_label > r.c_label THEN 1 ELSE 0 END"
    " WHEN l.cosine IS NULL THEN 1"
    " WHEN r.cosine IS NULL THEN -1"
    " WHEN l.cosine = r.cosine OR (isnan(l.cosine) AND isnan(r.cosine)) THEN"
    "   CASE WHEN l.c_label < r.c_label THEN -1"
    "        WHEN l.c_label > r.c_label THEN 1 ELSE 0 END"
    " WHEN isnan(l.cosine) THEN -1"
    " WHEN isnan(r.cosine) THEN 1"
    " WHEN l.cosine > r.cosine THEN -1 ELSE 1 END"
)


def _ivf_ranked_structs(e: DataFrame, cent: DataFrame) -> DataFrame:
    """`e` plus a `_ranked` column: the k (cosine, c_label) structs of
    every centroid, sorted by (cosine DESC, c_label ASC) — element 1 is
    the assignment, element rk the rk-th nearest centroid. Pure MAP over
    the vectors against ONE broadcast row holding all k centroid arrays:
    no per-vector exchange anywhere (the r13 shape windowed |vectors| x k
    rows over `vec_id` — a corpus-sized shuffle that exists nowhere at
    100 TB, where the ranked lists are a per-row derivation of the
    stored vectors). Callers that keep extra per-vector columns (e.g.
    kmeans' re-estimate keeping `v`) read the assignment off their own
    row instead of joining the ranked table back on vec_id."""
    # k x 64 rows -> ONE row in a single aggregation (not
    # centroid_arrays + a second groupBy: each groupBy is an exchange,
    # and these serialize inside the broadcast build): collect the flat
    # (c_label, dim, cval) structs, sort once — struct order is
    # (c_label, dim)-lexicographic, so each label's slice comes out
    # dim-ascending, exactly centroid_arrays' array_sort contract — and
    # reshape per label on the single row (k^2 x 64 element scans over
    # fixed-k data). The build stays bounded by the centroid count.
    flat = "array_sort(collect_list(struct(c_label, dim, cval)))"
    regroup = (
        "transform("
        "  transform("
        "    array_sort(array_distinct(transform(_flat, x -> x.c_label))),"
        "    lbl -> struct(lbl AS c_label,"
        "                  transform(filter(_flat, x -> x.c_label = lbl),"
        "                            x -> x.cval) AS cvec)),"
        f"  c -> struct(c.c_label, c.cvec, {_NORM.format(a='c.cvec')} AS _cnorm))"
    )
    cents_row = cent.groupBy().agg(F.expr(f"{flat} AS _flat")).select(
        F.expr(regroup).alias("_cents")
    )
    # spread a narrow scan BEFORE the fold chain (the spread_scan /
    # _ivf_exploded idiom): map-side ranking puts ALL the per-row fold +
    # sort work — and every downstream broadcast-join probe that keeps
    # riding the same partitioning — into the scan's partitions, and a
    # single-file scan would serialize it onto one core (measured: the
    # semantic-dedup pair probe over a 1-partition cached assignment ran
    # 2.7-4x slower than over a spread one). HASH partitioning, not
    # round-robin: Catalyst pushes projections below round-robin
    # exchanges, which would put the folds right back in the scan task.
    # No-op at real scale where the scan already meets the width.
    width = int(e.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if e.rdd.getNumPartitions() < width:
        e = e.repartition(width, "vec_id")
    dot = _DOT.format(a="v", b="c.cvec")
    ranked_arr = (
        "array_sort(transform(_cents, c -> struct("
        f"round(({dot}) / (_vnorm * c._cnorm), 6) AS cosine,"
        " c.c_label AS c_label)),"
        f" {_RANK_CMP})"
    )
    return (
        e.withColumn("_vnorm", F.expr(_NORM.format(a="v")))
        .crossJoin(F.broadcast(cents_row))
        .withColumn("_ranked", F.expr(ranked_arr))
        .drop("_vnorm", "_cents")
    )


def _ivf_score_rank_array(e: DataFrame, cent: DataFrame) -> DataFrame:
    """Array-native scorer — the library default and the 100 TB shape
    (VERDICT r3 item 5): broadcast the k centroid ARRAYS and compute
    each (vector, centroid) cosine as a zip_with/aggregate fold.

    r14: the per-vector RANK is also per-row now. Every vector scores
    against ALL k centroids, so its rank order is a pure function of
    its own row — sort the k (cosine, c_label) structs with a
    comparator identical to the old window's (cosine DESC, c_label ASC)
    ordering and posexplode; rk = position + 1. This drops the
    `Exchange hashpartitioning(vec_id)` + sort of |vectors| x k rows
    that `row_number() OVER (PARTITION BY vec_id ...)` forced — the
    plan is now map-only end to end (scan -> broadcast fold -> explode).

    FLOAT scoring path (VERDICT r5 task #6): the folds run in plain
    DOUBLE — a sequential per-row fold has FIXED evaluation order, so
    the result is IEEE-deterministic and bit-identical to the DuckDB
    oracle's list-fold (the same proven contract as
    idioms.SPARK_DOT/DUCK_COS, green since round 2 on the brute-force
    family). Decimal stays only where order-independence genuinely
    needs it: the cross-row centroid MEANS (`_ivf_centroids`). The
    exploded DECIMAL scorer `_ivf_score_rank` survives as the family's
    exact-parity witness — its 6-rounded cosines and ranks must agree
    with this path (pinned in tests/test_new_ops_properties.py::
    test_ivf_array_scorer_equals_exploded)."""
    return (
        _ivf_ranked_structs(e, cent)
        .select("vec_id", "label", F.posexplode("_ranked").alias("_pos", "_s"))
        .select(
            "vec_id",
            "label",
            F.col("_s.c_label").alias("c_label"),
            F.col("_s.cosine").alias("cosine"),
            (F.col("_pos") + 1).alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH, banded (multi-table): md5-derived hyperplanes
# ---------------------------------------------------------------------------

RP_TABLES = 4  # hash tables (bands)
RP_BITS = 4  # sign bits per table; bucket space per table = 2^4
RP_PLANES = RP_TABLES * RP_BITS

# machinery lives in the leaf module functions/rp_lsh.py (shared with
# operators/dedup.py without an operator→operator import edge);
# re-exported here for the public API surface
from ibis_olap_aggregation_spark.functions.rp_lsh import (  # noqa: E402
    duck_rp_planes_sql,
    rp_planes_df,
    rp_sigs,
)


@register(
    "sim_rp_lsh_topk",
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
planes AS (
  SELECT p.p AS plane_id, p.p // {RP_BITS} AS table_id,
         list_transform(generate_series(1, 64),
           i -> ((('0x' || substr(md5(p.p::VARCHAR || '|' || i::VARCHAR), 1, 15))::BIGINT
                  % 2001) - 1000) / 1000.0) AS w
  FROM (SELECT unnest(generate_series(0, {RP_PLANES - 1})) AS p) p
),
sigs AS (
  SELECT e.vec_id, pl.table_id,
         SUM(CASE WHEN list_sum(list_transform(generate_series(1, 64),
                    i -> e.v[i] * pl.w[i])) > 0
                  THEN 1 << (pl.plane_id % {RP_BITS}) ELSE 0 END) AS bucket
  FROM e CROSS JOIN planes pl
  GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM sigs q JOIN sigs c
    ON q.table_id = c.table_id AND q.bucket = c.bucket
   AND q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         ROUND({_DUCK_COS.format(a="eq.v", b="ec.v")}, 6) AS cosine
  FROM cand
  JOIN e eq ON eq.vec_id = cand.query_id
  JOIN e ec ON ec.vec_id = cand.neighbor_id
),
ranked AS (
  SELECT *, row_number()
            OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {TOP_K}
""",
)
def sim_rp_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded random-hyperplane LSH ANN: 16 deterministic md5-derived
    planes grouped into 4 hash tables of 4 sign bits. A pair is a
    candidate if it collides in ANY table (recall 1-(1-p^4)^4 for
    bit-agreement p = 1 - theta/pi); exact cosine + top-5 re-rank on the
    deduped candidate set.

    Scale shape: planes are a 16-row broadcast table; signatures are one
    broadcast crossJoin + groupBy per vector (map-side combined); the
    candidate join is equi on (table_id, bucket) — per-table bucket size
    ~ n/2^bits, so cost ~ tables * n^2 / 2^bits, tunable via RP_BITS;
    re-rank touches only candidates. Raising RP_BITS tightens buckets,
    adding tables restores recall — the standard LSH dial.
    """
    e = _emb(spark, sf_dir)
    sigs = rp_sigs(e, rp_planes_df(spark, RP_PLANES, RP_BITS), RP_BITS)
    qs = sigs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("table_id").alias("q_table"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = (
        sigs.join(
            F.broadcast(qs),
            (F.col("q_table") == F.col("table_id"))
            & (F.col("q_bucket") == F.col("bucket"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    # explicit N_QUERIES bound before the broadcast (ADVICE r11 item 1:
    # don't ride on Catalyst constraint propagation for a broadcast bound)
    eq = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    ec = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"))
    scored = (
        cand.join(F.broadcast(eq), "query_id")
        .join(ec, "neighbor_id")
        .withColumn("cosine", F.round(F.expr(_cosine("qv", "nv")), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


@register(
    "sim_rp_lsh_multiprobe_topk",
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
planes AS (
  SELECT p.p AS plane_id, p.p // {RP_BITS} AS table_id,
         list_transform(generate_series(1, 64),
           i -> ((('0x' || substr(md5(p.p::VARCHAR || '|' || i::VARCHAR), 1, 15))::BIGINT
                  % 2001) - 1000) / 1000.0) AS w
  FROM (SELECT unnest(generate_series(0, {RP_PLANES - 1})) AS p) p
),
sigs AS (
  SELECT e.vec_id, pl.table_id,
         SUM(CASE WHEN list_sum(list_transform(generate_series(1, 64),
                    i -> e.v[i] * pl.w[i])) > 0
                  THEN 1 << (pl.plane_id % {RP_BITS}) ELSE 0 END) AS bucket
  FROM e CROSS JOIN planes pl
  GROUP BY 1, 2
),
probes AS (
  SELECT vec_id, table_id,
         unnest(list_prepend(bucket,
           list_transform(generate_series(0, {RP_BITS - 1}),
                          j -> xor(bucket, 1 << j)))) AS probe
  FROM sigs WHERE vec_id < {N_QUERIES}
),
cand AS (
  SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM probes p JOIN sigs c
    ON p.table_id = c.table_id AND p.probe = c.bucket
   AND p.vec_id <> c.vec_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         ROUND({_DUCK_COS.format(a="eq.v", b="ec.v")}, 6) AS cosine
  FROM cand
  JOIN e eq ON eq.vec_id = cand.query_id
  JOIN e ec ON ec.vec_id = cand.neighbor_id
),
ranked AS (
  SELECT *, row_number()
            OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {TOP_K}
""",
)
def sim_rp_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe banded RP-LSH: each query probes its own bucket PLUS
    every hamming-1 neighbor (flip each of the 4 sign bits) in each
    table — 5x the probes recovers most of the recall a near-miss on one
    hyperplane costs, WITHOUT growing the index or re-hashing the corpus
    (only the tiny query-probe set fans out). Corpus-side plan is
    unchanged from sim_rp_lsh_topk."""
    e = _emb(spark, sf_dir)
    sigs = rp_sigs(e, rp_planes_df(spark, RP_PLANES, RP_BITS), RP_BITS)
    probes = (
        sigs.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("table_id").alias("q_table"),
            F.explode(
                F.expr(
                    f"array_prepend(transform(sequence(0, {RP_BITS - 1}),"
                    " j -> bucket ^ shiftleft(1L, j)), bucket)"
                )
            ).alias("probe"),
        )
    )
    cand = (
        sigs.join(
            F.broadcast(probes),
            (F.col("q_table") == F.col("table_id"))
            & (F.col("probe") == F.col("bucket"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    # explicit N_QUERIES bound before the broadcast (ADVICE r11 item 1:
    # don't ride on Catalyst constraint propagation for a broadcast bound)
    eq = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    ec = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"))
    scored = (
        cand.join(F.broadcast(eq), "query_id")
        .join(ec, "neighbor_id")
        .withColumn("cosine", F.round(F.expr(_cosine("qv", "nv")), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


NPROBE = 3  # inverted lists probed per query


@register(
    "sim_ivf_topk",
    f"""
WITH {_IVF_SCORED},
assign AS (SELECT vec_id, c_label FROM ranked WHERE rk = 1),
probes AS (
  SELECT vec_id AS query_id, c_label
  FROM ranked WHERE rk <= {{nprobe}} AND vec_id < {N_QUERIES}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON a.c_label = p.c_label
  WHERE a.vec_id <> p.query_id
),
rescored AS (
  SELECT c.query_id, c.neighbor_id, ce.label AS neighbor_label,
         ROUND({{cos}}, 6) AS cosine
  FROM cand c
  JOIN e qe ON qe.vec_id = c.query_id
  JOIN e ce ON ce.vec_id = c.neighbor_id
),
final AS (
  SELECT *, row_number()
            OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM rescored
)
SELECT query_id, neighbor_id, neighbor_label, cosine, rk
FROM final WHERE rk <= {TOP_K}
""".format(nprobe=3, cos=_DUCK_COS.format(a="qe.v", b="ce.v")),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF ANN search, the scale path past brute force:

    1. coarse quantizer = per-label centroids (deterministic, exact
       decimal means — no iterative k-means, so both engines agree);
    2. every corpus vector lands in ONE inverted list (its nearest
       centroid — `_ivf_centroid_ranked` rk=1);
    3. each query probes its NPROBE nearest centroids;
    4. exact cosine re-rank over the probed lists only -> top-5.

    At 100 TB the corpus-side work is one map-side-combined centroid
    pass + one broadcast-join assignment, and each query touches
    ~NPROBE/K of the corpus instead of all of it; the probe join is an
    equi-join on the centroid id. The brute-force twin
    (`sim_bruteforce_topk`) stays as the exact baseline/recall yardstick.
    """
    e = _emb(spark, sf_dir)
    ranked = _ivf_centroid_ranked(e).select("vec_id", "c_label", "rk")
    assign = ranked.filter("rk = 1").select(
        F.col("vec_id").alias("neighbor_id"), "c_label"
    )
    probes = ranked.filter(
        (F.col("rk") <= NPROBE) & (F.col("vec_id") < N_QUERIES)
    ).select(F.col("vec_id").alias("query_id"), "c_label")
    # broadcast the PROBE side (N_QUERIES x NPROBE rows — fixed-size),
    # never the corpus-sized assignment table: the old hint shipped one
    # row per vector to every executor, an SF-linear broadcast
    cand = assign.join(F.broadcast(probes), "c_label").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    # explicit bound BEFORE the broadcast: without the filter, qe only
    # shrinks to N_QUERIES rows if Catalyst propagates the probes-side
    # constraint across the join — at scale that would be an SF-linear
    # broadcast riding on an optimizer behavior (ADVICE r11 item 1)
    qe = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    ce = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("label").alias("neighbor_label"),
    )
    rescored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .withColumn("cosine", F.round(F.expr(_cosine("qv", "nv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        rescored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            "cosine",
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# ANN quality evaluation: recall of the approximate index vs exact truth
# ---------------------------------------------------------------------------

_RECALL_ORACLE = f"""
WITH truth AS ({{truth_sql}}),
approx AS ({{approx_sql}})
SELECT t.query_id,
       COUNT(*) AS n_truth,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit,
       ROUND(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             / COUNT(*), 6) AS recall_at_{TOP_K}
FROM truth t
LEFT JOIN approx a
       ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
GROUP BY 1
"""


def _register_recall_eval() -> None:
    """Registered via a function so the oracle can SPLICE the two member
    queries' oracle texts (registered above in this module) — the eval
    is definitionally 'whatever those queries return', never a drifting
    re-statement."""
    from ibis_olap_aggregation_spark.queries import ORACLES

    oracle = _RECALL_ORACLE.format(
        truth_sql=ORACLES["sim_bruteforce_topk"].strip(),
        approx_sql=ORACLES["sim_rp_lsh_multiprobe_topk"].strip(),
    )

    @register("sim_ann_recall_eval", oracle)
    def sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
        """ANN evaluation harness as a query: per-query recall@k of the
        banded multiprobe RP-LSH index against the exact brute-force
        top-k. The measurement every index tuning loop needs — run it at
        a sampled SF, turn RP_TABLES/RP_BITS/probes, re-run.

        Scale shape: truth is the expensive side (exact top-k over a
        broadcast query set); the eval join is per-(query, neighbor)
        equi — negligible against the inputs it measures."""
        from ibis_olap_aggregation_spark.queries import QUERIES

        truth = QUERIES["sim_bruteforce_topk"](spark, sf_dir).select(
            "query_id", "neighbor_id"
        )
        approx = QUERIES["sim_rp_lsh_multiprobe_topk"](spark, sf_dir).select(
            F.col("query_id").alias("_aq"), F.col("neighbor_id").alias("_an")
        )
        j = truth.join(
            approx,
            (truth["query_id"] == approx["_aq"])
            & (truth["neighbor_id"] == approx["_an"]),
            "left",
        )
        hit = F.sum(F.when(F.col("_an").isNotNull(), 1).otherwise(0))
        return j.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n_truth"),
            hit.cast("bigint").alias("n_hit"),
            F.round(hit / F.count(F.lit(1)), 6).alias(f"recall_at_{TOP_K}"),
        )


_register_recall_eval()


@register(
    "emb_int8_quantize_error",
    """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM e
),
q AS (
  SELECT vec_id, scale,
         list_transform(v, x -> x - round(x / scale) * scale) AS err
  FROM s
  WHERE scale > 0
)
SELECT vec_id,
       ROUND(scale, 6) AS scale_r,
       ROUND(list_sum(list_transform(err, x -> x * x)) / 64.0, 6) AS mse,
       ROUND(list_max(list_transform(err, x -> abs(x))), 6) AS max_abs_err
FROM q
""",
)
def emb_int8_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector INT8 quantization error analysis — the
    compression step an ANN index applies before storing 100 TB of
    embeddings (4x smaller, dot products in int arithmetic): scale =
    max|v|/127, q = round(v/scale), and the reconstruction error
    v - q*scale reported as per-vector MSE and max absolute error.
    Map-only (array lambdas inside codegen, no shuffle, no UDF); at
    scale this pipelines over the embedding scan and writes the
    quantized column alongside. All-zero vectors (scale 0) are excluded
    on both engines."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    s = e.withColumn(
        "scale",
        F.expr("array_max(transform(v, x -> abs(x))) / 127.0D"),
    ).filter(F.col("scale") > 0)
    q = s.withColumn(
        "err", F.expr("transform(v, x -> x - round(x / scale) * scale)")
    )
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale_r"),
        F.round(
            F.expr("aggregate(transform(err, x -> x * x), 0d, (a, x) -> a + x)")
            / F.lit(64.0),
            6,
        ).alias("mse"),
        F.round(F.expr("array_max(transform(err, x -> abs(x)))"), 6).alias(
            "max_abs_err"
        ),
    )


@register(
    "sim_ivf_cluster_stats",
    f"""
WITH {_IVF_SCORED}
SELECT c_label AS cluster_label,
       COUNT(*) AS n_vectors,
       COUNT(DISTINCT label) AS n_true_labels,
       ROUND(CAST(SUM(CAST(cosine AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS avg_cosine,
       MIN(cosine) AS min_cosine
FROM ranked WHERE rk = 1
GROUP BY 1
""",
)
def sim_ivf_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-quality report: per coarse cluster, member count, how
    many TRUE labels landed in it (purity), mean cosine to the centroid
    (tightness) and the worst member (radius in cosine terms). This is
    the health check run after building an IVF index — skewed cluster
    sizes mean probe-cost skew, low min_cosine means a cluster whose
    tail will miss at query time.

    Same centroid/assignment skeleton as sim_ivf_centroid_assign
    (exact-decimal MEANS, float array-fold scoring — both engines
    assign identically); the stats aggregate sums the ROUNDED cosine
    through DECIMAL(18,6), making the mean immune to double addition
    order — the one cross-row float sum in the query. Cost: one
    |vectors| x |centroids| broadcast score pass + two tiny
    aggregations — no pair joins."""
    ranked = _ivf_centroid_ranked(_emb(spark, sf_dir))
    return (
        ranked.filter("rk = 1")
        .groupBy(F.col("c_label").alias("cluster_label"))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.countDistinct("label").alias("n_true_labels"),
            F.round(
                F.sum(F.col("cosine").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_cosine"),
            F.min("cosine").alias("min_cosine"),
        )
    )


@register(
    "sim_kmeans_refine",
    f"""
WITH {_IVF_SCORED},
assign AS (SELECT vec_id, c_label FROM ranked WHERE rk = 1),
cent2 AS (
  SELECT a.c_label, x.dim,
         CAST(SUM(CAST(x.val AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS cval2
  FROM ex x JOIN assign a ON x.vec_id = a.vec_id
  GROUP BY 1, 2
),
shift AS (
  SELECT c.c_label,
         ROUND(CAST(SUM(CAST(ABS(c2.cval2 - c.cval) AS DECIMAL(28,14))) AS DOUBLE), 6)
           AS centroid_shift_l1
  FROM cent c JOIN cent2 c2 ON c.c_label = c2.c_label AND c.dim = c2.dim
  GROUP BY 1
),
n_init AS (SELECT label AS c_label, COUNT(*) AS n_init FROM e GROUP BY 1),
n_asgn AS (SELECT c_label, COUNT(*) AS n_assigned FROM assign GROUP BY 1)
SELECT i.c_label AS cluster_label,
       i.n_init,
       COALESCE(a.n_assigned, 0) AS n_assigned,
       s.centroid_shift_l1
FROM n_init i
LEFT JOIN n_asgn a ON a.c_label = i.c_label
LEFT JOIN shift s ON s.c_label = i.c_label
""",
)
def sim_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed Lloyd (k-means) refinement step on the IVF coarse
    centroids: init centroids = per-label means, assign every vector to
    its nearest centroid by cosine, recompute centroids over the
    ASSIGNED clusters, and report per cluster the membership change
    (n_init vs n_assigned) and the L1 centroid movement — the
    convergence signal a full Lloyd loop would iterate on.

    Cross-ROW accumulations (both centroid means, the L1-shift sum)
    stay exact DECIMAL — summation-order-proof — while per-row scoring
    runs float array folds (order-fixed, IEEE-identical across
    engines), so assignments and the movement metric still match the
    oracle bit-for-bit — the property that lets a Spark-built IVF index
    be verified against (or refined by) any other engine. Cost per step:
    ONE |vectors| x |centroids| broadcast score pass feeding one
    map-side combined (cluster, dim) aggregation — the assignment
    counts fall out of that same aggregate's dim-1 partials (ADVICE
    r14: the first cut folded the corpus twice, once for n_assigned
    and once for the re-estimate); the loop is rounds x that, no pair
    joins. Clusters that lose every member report n_assigned=0 and a
    NULL shift (their centroid is retired, the standard k-means edge
    case).
    """
    e = _emb(spark, sf_dir)
    ex = _ivf_exploded(e)
    # cent is referenced twice (scorer + shift join) and each
    # un-materialized reference re-executes the whole explode+centroid
    # aggregation; the cached table is k x 64 rows — bounded by centroid
    # count at ANY corpus size (measured ~1s off the sf0.1 query).
    # Tracked via session.query_cache so the registry releases it at
    # the next query — no CacheManager accumulation across a sweep
    cent = query_cache(_ivf_centroids(ex))
    # the new assignment rides each vector's own row (r14): element 1 of
    # the per-row ranked structs IS the scorer's rk=1 c_label (same
    # comparator as _ivf_score_rank_array), so the re-estimate keeps `v`
    # on the assigned row and explodes AFTER assigning — the old
    # ex ⋈ assign join shuffled the 64x-exploded table on vec_id to
    # re-attach a value derivable per row (guide §3.3: join on the
    # un-exploded key, explode after — here the join disappears outright)
    av = _ivf_ranked_structs(e, cent).select(
        "vec_id", "v", F.element_at("_ranked", 1)["c_label"].alias("nl")
    )
    # ONE corpus fold pass (ADVICE r14): n_assigned and the re-estimate
    # previously each consumed `av` — two full per-row k-centroid score
    # passes. posexplode_OUTER keeps one row even for a NULL/empty
    # vector (dim NULL), so counting each vector's dim-1-or-NULL row
    # reproduces the old per-vector assignment count exactly, for every
    # input; NULL-dim groups never match the shift join's dim equality,
    # so cval2 semantics are unchanged. The 64x explode + decimal
    # re-estimate inherits _ivf_ranked_structs' spread partitioning —
    # parallel without the old join's exchange.
    grains = av.select("nl", F.posexplode_outer("v").alias("dim0", "val")).select(
        "nl", (F.col("dim0") + 1).alias("dim"), "val"
    )
    # g is referenced twice (shift + n_assigned) and is bounded at
    # k x (64+1) rows at any corpus size — tracked-cache it so the
    # corpus fold behind it runs exactly once
    g = query_cache(
        grains.groupBy(F.col("nl").alias("c_label"), "dim").agg(
            (
                F.sum(F.col("val").cast("decimal(28,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("cval2"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    cent2 = g.select("c_label", "dim", "cval2")
    shift = (
        cent.join(cent2, ["c_label", "dim"])
        .groupBy("c_label")
        .agg(
            F.round(
                F.sum(
                    F.abs(F.col("cval2") - F.col("cval")).cast("decimal(28,14)")
                ).cast("double"),
                6,
            ).alias("centroid_shift_l1")
        )
    )
    n_init = e.groupBy(F.col("label").alias("c_label")).agg(
        F.count(F.lit(1)).alias("n_init")
    )
    # every vector contributes exactly one dim=1 row (or one NULL-dim
    # row when its vector is NULL/empty), so these partials ARE the
    # per-cluster assignment counts
    n_asgn = (
        g.filter(F.col("dim").eqNullSafe(1) | F.col("dim").isNull())
        .groupBy("c_label")
        .agg(F.sum("_n").alias("n_assigned"))
    )
    return (
        n_init.join(n_asgn, "c_label", "left")
        .join(shift, "c_label", "left")
        .select(
            F.col("c_label").alias("cluster_label"),
            "n_init",
            F.coalesce("n_assigned", F.lit(0)).alias("n_assigned"),
            "centroid_shift_l1",
        )
    )


# ---------------------------------------------------------------------------
# Sparse (TF-IDF) similarity join — the inverted-index complement to the
# dense-embedding ANN above
# ---------------------------------------------------------------------------

from ibis_olap_aggregation_spark.functions.idioms import tokens_col  # noqa: E402
from ibis_olap_aggregation_spark.functions.minhash_sql import (  # noqa: E402
    DUCK_HASHED_SHINGLES as _DUCK_HS,
)

SPARSE_DF_MIN = 2     # df=1 terms can never contribute to a pair
SPARSE_DF_FRAC = 0.25  # drop terms in more than 25% of docs (stop-terms)
SPARSE_TOP_K = 3


@register(
    "sim_tfidf_sparse_topk",
    f"""
WITH {_DUCK_HS},
p AS (SELECT doc_id, unnest(hs) AS k FROM sh),
n AS (SELECT COUNT(*) AS nd FROM documents),
dfq AS (SELECT k, COUNT(*) AS df FROM p GROUP BY 1),
terms AS (
  SELECT p.doc_id, p.k, ln((SELECT nd FROM n) * 1.0 / df) AS idf
  FROM p JOIN dfq USING (k)
  WHERE df >= {SPARSE_DF_MIN}
    AND df <= (SELECT nd FROM n) * {SPARSE_DF_FRAC}
),
norms AS (
  SELECT doc_id,
         sqrt(CAST(SUM(CAST(idf * idf AS DECIMAL(28,14))) AS DOUBLE)) AS nrm
  FROM terms GROUP BY 1
),
pairsc AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(CAST(a.idf * b.idf AS DECIMAL(28,14))) AS DOUBLE) AS dot
  FROM terms a JOIN terms b ON a.k = b.k AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
cosd AS (
  SELECT doc_a, doc_b, ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
  FROM pairsc
  JOIN norms na ON na.doc_id = doc_a
  JOIN norms nb ON nb.doc_id = doc_b
),
bidir AS (
  SELECT doc_a AS doc_id, doc_b AS neighbor_id, cosine FROM cosd
  UNION ALL
  SELECT doc_b, doc_a, cosine FROM cosd
),
ranked AS (
  SELECT *, row_number()
            OVER (PARTITION BY doc_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM bidir
)
SELECT doc_id, neighbor_id, cosine, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {SPARSE_TOP_K}
""",
)
def sim_tfidf_sparse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARSE similarity join: per-document TF-IDF vectors over hashed
    shingle terms, cosine via the inverted index (docs only meet on
    shared terms), top-{SPARSE_TOP_K} neighbors per document. The
    lexical complement of the dense-embedding ANN family above — a
    retrieval/dedup stack runs both, because embeddings miss verbatim
    overlap and TF-IDF misses paraphrase.

    Scale shape: cost ~ sum(df^2) over KEPT terms, bounded by the two
    df gates (df >= {SPARSE_DF_MIN}: singleton terms pair with nothing;
    df <= {int(SPARSE_DF_FRAC * 100)}% of docs: stop-terms would
    otherwise quadratically dominate — the standard sparse-join
    prefilter). At 100 TB the surviving posting lists route through
    the same salted bucket_pairs machinery as LSH; the exact per-pair
    idf products accumulate in DECIMAL (order-proof), so the ranking
    is bit-identical to the oracle. Top-k windows partition by doc_id,
    never globally. The doc count is one bounded driver action."""
    docs = load_table(spark, sf_dir, "documents")
    nd = docs.count()
    from ibis_olap_aggregation_spark.operators.dedup import hashed_shingles_col

    sh = docs.withColumn("t", tokens_col()).select(
        "doc_id", hashed_shingles_col().alias("hs")
    )
    p = sh.select("doc_id", F.explode_outer("hs").alias("k")).filter(
        F.col("k").isNotNull()
    )
    dfq = p.groupBy("k").agg(F.count(F.lit(1)).alias("df"))
    terms = (
        p.join(
            dfq.filter(
                (F.col("df") >= SPARSE_DF_MIN)
                & (F.col("df") <= nd * SPARSE_DF_FRAC)
            ),
            "k",
        )
        .withColumn("idf", F.log(F.lit(float(nd)) / F.col("df")))
        .select("doc_id", "k", "idf")
    )
    dsum14 = lambda e: F.sum(e.cast("decimal(28,14)")).cast("double")  # noqa: E731
    norms = terms.groupBy("doc_id").agg(
        F.sqrt(dsum14(F.col("idf") * F.col("idf"))).alias("nrm")
    )
    a = terms.select(
        F.col("doc_id").alias("doc_a"), "k", F.col("idf").alias("idf_a")
    )
    b = terms.select(
        F.col("doc_id").alias("doc_b"), "k", F.col("idf").alias("idf_b")
    )
    pairs = (
        a.join(b, "k")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(dsum14(F.col("idf_a") * F.col("idf_b")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    cosd = (
        # norms are doc-count-sized (SF-linear): un-hinted, AQE sizes
        # the actual aggregate at runtime
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
                "cosine"
            ),
        )
    )
    bidir = cosd.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("neighbor_id"),
        "cosine",
    ).unionByName(
        cosd.select(
            F.col("doc_b").alias("doc_id"),
            F.col("doc_a").alias("neighbor_id"),
            "cosine",
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        bidir.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SPARSE_TOP_K)
        .select("doc_id", "neighbor_id", "cosine", F.col("rk").cast("bigint").alias("rk"))
    )

# -- product quantization (PQ) with asymmetric distance (ADC) ---------------

_PQ_M, _PQ_KSUB, _PQ_DSUB = 8, 16, 8  # 64 dims -> 8 subspaces x 8 dims, 16 codes

_PQ_SEED_J = (
    "cast(conv(substr(md5(cast(vec_id as string)), 1, 15), 16, 10) as bigint)"
    f" % {_PQ_KSUB}"
)

# shared oracle prelude: codebook -> codes -> query LUT -> per-vector ADC
# and true squared distances (both excluding the query vector)
_PQ_ORACLE_CTES = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
seed AS (
  SELECT vec_id, v,
         ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT % {_PQ_KSUB} AS cj
  FROM e
),
ex AS (
  SELECT s.vec_id, s.cj, i.i AS dim, s.v[i.i] AS val
  FROM seed s CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) i
),
cent AS (
  SELECT (dim - 1) // {_PQ_DSUB} AS m, cj, ((dim - 1) % {_PQ_DSUB}) + 1 AS sd,
         CAST(SUM(CAST(val AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS cval
  FROM ex GROUP BY 1, 2, 3
),
cb AS (SELECT m, cj, list(cval ORDER BY sd) AS cvec FROM cent GROUP BY 1, 2),
subdist AS (
  SELECT e.vec_id, cb.m, cb.cj,
         list_sum(list_transform(generate_series(1, {_PQ_DSUB}),
           i -> (e.v[cb.m * {_PQ_DSUB} + i] - cb.cvec[i])
              * (e.v[cb.m * {_PQ_DSUB} + i] - cb.cvec[i]))) AS d2
  FROM e CROSS JOIN cb
),
codes AS (
  SELECT vec_id, m, cj,
         row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cj) AS rn
  FROM subdist
),
cent2 AS (
  SELECT x.m, c.cj, ((x.dim - 1) % {_PQ_DSUB}) + 1 AS sd,
         CAST(SUM(CAST(x.val AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS cval
  FROM (SELECT vec_id, (dim - 1) // {_PQ_DSUB} AS m, dim, val FROM ex) x
  JOIN codes c ON c.vec_id = x.vec_id AND c.m = x.m AND c.rn = 1
  GROUP BY 1, 2, 3
),
cb2 AS (SELECT m, cj, list(cval ORDER BY sd) AS cvec FROM cent2 GROUP BY 1, 2),
subdist2 AS (
  SELECT e.vec_id, cb2.m, cb2.cj,
         list_sum(list_transform(generate_series(1, {_PQ_DSUB}),
           i -> (e.v[cb2.m * {_PQ_DSUB} + i] - cb2.cvec[i])
              * (e.v[cb2.m * {_PQ_DSUB} + i] - cb2.cvec[i]))) AS d2
  FROM e CROSS JOIN cb2
),
codes2 AS (
  SELECT vec_id, m, cj,
         row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cj) AS rn
  FROM subdist2
),
q AS (SELECT v AS qv FROM e WHERE vec_id = (SELECT MIN(vec_id) FROM e)),
lut AS (
  SELECT cb2.m, cb2.cj,
         list_sum(list_transform(generate_series(1, {_PQ_DSUB}),
           i -> (q.qv[cb2.m * {_PQ_DSUB} + i] - cb2.cvec[i])
              * (q.qv[cb2.m * {_PQ_DSUB} + i] - cb2.cvec[i]))) AS adc_m
  FROM cb2 CROSS JOIN q
),
adc AS (
  SELECT c.vec_id, list_sum(list(l.adc_m ORDER BY c.m)) AS adc_d2
  FROM codes2 c JOIN lut l ON l.m = c.m AND l.cj = c.cj
  WHERE c.rn = 1 AND c.vec_id <> (SELECT MIN(vec_id) FROM e)
  GROUP BY 1
),
truth AS (
  SELECT e.vec_id,
         list_sum(list_transform(generate_series(1, 64),
           i -> (e.v[i] - q.qv[i]) * (e.v[i] - q.qv[i]))) AS true_d2
  FROM e CROSS JOIN q
  WHERE e.vec_id <> (SELECT MIN(vec_id) FROM e)
)
"""


def _pq_adc_truth(spark: SparkSession, sf_dir: str):
    """Shared PQ pipeline: returns (adc, truth) frames — per-vector ADC
    distance through the codebook/LUT path, and the exact squared
    distance to the min-vec_id query (query vector excluded from both).

    Codebook: per subspace m (8 dims each), 16 centroids as
    decimal-exact means over an md5-deterministic seed partition of the
    vectors (cross-ROW sums stay DECIMAL; the rule from the IVF
    family). Encoding: per (vector, m) argmin over the 16 sub-centroids
    by a per-row float fold against the COLLECTED broadcast codebook
    array (order-fixed -> cross-engine bit-identical, so raw-double
    argmin ordering is safe; DuckDB's list_sum is a sequential left
    fold, probe-verified). ADC: the query's 8x16 lookup table of
    sub-distances collects to one broadcast row; each vector sums its
    8 code lookups with an m-ordered fold.

    Scale: the codebook (128 rows) and LUT (128 rows) collect to
    single broadcast rows; encode and ADC are pure maps over the
    vectors. The only data-sized exchanges are the two tiny centroid
    aggregations' partial-combine shuffles (1024 groups) — never a
    corpus-sized expansion or per-vector join. At 100 TB the encoded
    table is what you STORE (8 bytes/vector); scans read codes, not
    vectors."""
    e = query_cache(_emb(spark, sf_dir))
    seed = e.select("vec_id", "v", F.expr(_PQ_SEED_J).alias("cj"))
    ex = seed.select(
        "vec_id", "cj", F.posexplode("v").alias("dim0", "val")
    ).select(
        "vec_id",
        "cj",
        (F.col("dim0") / _PQ_DSUB).cast("int").alias("m"),
        (F.col("dim0") % _PQ_DSUB + 1).alias("sd"),
        "val",
    )
    cent = ex.groupBy("m", "cj", "sd").agg(
        (
            F.sum(F.col("val").cast("decimal(28,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cval")
    )
    # 128-row codebooks are TRACKED-CACHED: cb2 has two consumers (the
    # pass-2 encode and the query LUT), and while ReuseExchange dedupes
    # identical exchange subtrees within one plan, the cache keeps the
    # guarantee independent of that rule firing (and covers the
    # recall-eval twin's adc/truth double-consumption)
    cb = query_cache(cent.groupBy("m", "cj").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(sd, cval))), s -> s.cval)"
        ).alias("cvec")
    ))
    # --- map-side encode (guide §2.2, §3-fixed-k): the codebook is
    # fixed-k (8x16 = 128 rows), so encoding is a PURE MAP — collect it
    # into ONE (m, cj)-sorted struct array, broadcast that single row,
    # and take each vector's per-subspace argmin with array_min over
    # the SAME left-fold distance expression. array_min's struct
    # ordering is min_by's (d2, cj) lexicographic minimum, so every
    # code (and every downstream double) is bit-identical to the
    # crossJoin + hash-argmin shape this replaces. That shape expanded
    # the corpus x128 and hash-aggregated it back to n x 8 (twice, once
    # per Lloyd pass) and joined the n x 64 exploded values on
    # (vec_id, m) for the re-estimate — three corpus-sized exchanges
    # that exist nowhere at 100 TB, where the stored artifact IS the
    # codes.
    def _cb_row(cb_df: DataFrame) -> DataFrame:
        # single-row collect of a fixed-k codebook (<= 128 structs);
        # array_sort orders struct-lexicographically by (m, cj)
        return cb_df.groupBy().agg(
            F.expr("array_sort(collect_list(struct(m, cj, cvec))) AS cbs")
        )

    # filter-by-m, never slice-by-position: a Lloyd pass can empty a
    # (m, cj) cell, so positional indexing into the sorted array would
    # silently misalign; the filtered argmin matches the join shape's
    # semantics for any cell occupancy
    _d2_of = (
        f"aggregate(zip_with(slice(v, s.m * {_PQ_DSUB} + 1, {_PQ_DSUB}), s.cvec,"
        " (x, y) -> (x - y) * (x - y)), 0d, (acc, x) -> acc + x)"
    )
    _codes_expr = F.expr(
        f"transform(sequence(0, {_PQ_M - 1}), m ->"
        f" array_min(transform(filter(cbs, s -> s.m = m),"
        f" s -> struct({_d2_of} AS d2, s.cj AS cj))).cj)"
    )
    codes1 = e.crossJoin(F.broadcast(_cb_row(cb))).select(
        "vec_id", "v", _codes_expr.alias("codes")
    )
    # one Lloyd refinement (PQ training IS k-means per subspace): the
    # hash seed only initializes; re-estimating centroids from the
    # first-pass codes and re-encoding roughly doubles recall@10. The
    # codes ride the explode row (a value copy, not a re-evaluation),
    # so the re-estimate needs no (vec_id, m) join at all.
    _m_of = (F.col("dim0") / _PQ_DSUB).cast("int")
    ex2 = codes1.select(
        "codes", F.posexplode("v").alias("dim0", "val")
    ).select(
        _m_of.alias("m"),
        F.col("codes")[_m_of].alias("cj"),
        (F.col("dim0") % _PQ_DSUB + 1).alias("sd"),
        "val",
    )
    cent2 = ex2.groupBy("m", "cj", "sd").agg(
        (
            F.sum(F.col("val").cast("decimal(28,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cval")
    )
    cb2 = query_cache(cent2.groupBy("m", "cj").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(sd, cval))), s -> s.cval)"
        ).alias("cvec")
    ))
    codes2 = e.crossJoin(F.broadcast(_cb_row(cb2))).select(
        "vec_id", _codes_expr.alias("codes")
    )
    # ONE aggregate row carries both the query id and its vector
    # (min_by on the unique vec_id ≡ the min-qid row's v), and qid rides
    # the LUT row too: the old shape serialized THREE broadcast-build
    # jobs (qmin; a corpus scan joined against it to fish out qv; the
    # LUT) and attached each consumer with an anti-join PLUS a
    # crossJoin. One broadcast row per consumer now — the anti-join
    # becomes the equivalent `vec_id != qid` filter on the same
    # single-row attach (qid is never NULL, so anti-equality ≡ the
    # filter row-for-row). r14, guide §1.2: at bench scale these fixed
    # job latencies are the query's floor.
    qrow = e.agg(
        F.min("vec_id").alias("qid"), F.min_by("v", "vec_id").alias("qv")
    )
    lut_m = F.expr(
        f"aggregate(zip_with(slice(qv, m * {_PQ_DSUB} + 1, {_PQ_DSUB}), cvec,"
        " (x, y) -> (x - y) * (x - y)), 0d, (acc, x) -> acc + x)"
    )
    lut = cb2.crossJoin(F.broadcast(qrow)).select(
        "qid", "m", "cj", lut_m.alias("adc_m")
    )
    # the LUT (<= 128 rows) also collects to one broadcast row; each
    # vector's ADC distance is a per-row m-ascending fold over its own
    # code array — the same summation order as the collect_list +
    # array_sort(struct(m, adc_m)) fold it replaces, so the double is
    # bit-identical — with no per-vector (m, cj) join or corpus-sized
    # collect_list aggregation
    lut_row = lut.groupBy().agg(
        F.min("qid").alias("qid"),  # constant across the 128 rows
        F.expr("array_sort(collect_list(struct(m, cj, adc_m))) AS luts"),
    )
    adc_sum = F.expr(
        f"aggregate(zip_with(codes, sequence(0, {_PQ_M - 1}),"
        " (c, m) -> filter(luts, s -> s.m = m AND s.cj = c)[0].adc_m),"
        " 0d, (acc, x) -> acc + x)"
    )
    adc = (
        codes2.crossJoin(F.broadcast(lut_row))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("vec_id", adc_sum.alias("adc_d2"))
    )
    true_d2 = F.expr(
        "aggregate(zip_with(v, qv, (x, y) -> (x - y) * (x - y)),"
        " 0d, (acc, x) -> acc + x)"
    )
    truth = (
        e.crossJoin(F.broadcast(qrow))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("vec_id", true_d2.alias("true_d2"))
    )
    return adc, truth


@register(
    "sim_pq_adc_topk",
    _PQ_ORACLE_CTES
    + """
, ranked AS (
  SELECT a.vec_id, ROUND(a.adc_d2, 6) AS adc_dist, ROUND(t.true_d2, 6) AS true_dist,
         row_number() OVER (ORDER BY ROUND(a.adc_d2, 6), a.vec_id) AS adc_rank
  FROM adc a JOIN truth t USING (vec_id)
)
SELECT vec_id, adc_dist, true_dist, CAST(adc_rank AS BIGINT) AS adc_rank
FROM ranked WHERE adc_rank <= 10
""",
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization ANN: top-10 neighbors of the min-vec_id
    query by ASYMMETRIC distance (ADC) — the memory-compression member
    of the ANN family (IVF = partition pruning, RP-LSH = candidate
    pruning, int8 = uniform scalar quantization; PQ compresses a
    64x8-byte vector to 8 one-byte codes, ~64x, while queries keep full
    precision via a per-query lookup table). Pipeline and scale notes:
    `_pq_adc_truth`."""
    adc, truth = _pq_adc_truth(spark, sf_dir)
    ranked = adc.join(truth, "vec_id").select(
        "vec_id",
        F.round("adc_d2", 6).alias("adc_dist"),
        F.round("true_d2", 6).alias("true_dist"),
    )
    # TakeOrdered top-10 FIRST (distributed per-partition heads, no
    # corpus-sized single-partition window), then rank the 10 survivors
    # — identical to ranking globally and filtering, since row_number
    # over (adc_dist, vec_id) is a total order
    top = ranked.orderBy("adc_dist", "vec_id").limit(10)
    w_top = Window.orderBy("adc_dist", "vec_id")
    return top.withColumn(
        "adc_rank", F.row_number().over(w_top).cast("bigint")
    )


@register(
    "sim_pq_recall_eval",
    _PQ_ORACLE_CTES
    + """
, adc_top AS (
  SELECT vec_id FROM (
    SELECT vec_id, row_number() OVER (ORDER BY ROUND(adc_d2, 6), vec_id) AS rk
    FROM adc
  ) WHERE rk <= 10
),
true_top AS (
  SELECT vec_id FROM (
    SELECT vec_id, row_number() OVER (ORDER BY ROUND(true_d2, 6), vec_id) AS rk
    FROM truth
  ) WHERE rk <= 10
)
SELECT COUNT(*) AS n_truth,
       CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hit,
       ROUND(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS recall_at_10
FROM true_top t LEFT JOIN adc_top a USING (vec_id)
""",
)
def sim_pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the PQ/ADC index against the exact neighbor set —
    the compression-loss measurement (symmetric to sim_ann_recall_eval
    for RP-LSH): how many of the query's TRUE 10 nearest survive 64x
    vector compression. The tuning loop for (M, KSUB) reads this number.

    Shape: both top-10s are distributed TakeOrdereds over the shared
    `_pq_adc_truth` frames; the overlap join is 10x10."""
    adc, truth = _pq_adc_truth(spark, sf_dir)
    adc_top = (
        adc.select("vec_id", F.round("adc_d2", 6).alias("k"))
        .orderBy("k", "vec_id")
        .limit(10)
        .select("vec_id")
    )
    true_top = (
        truth.select("vec_id", F.round("true_d2", 6).alias("k"))
        .orderBy("k", "vec_id")
        .limit(10)
        .select(F.col("vec_id").alias("t_vec"))
    )
    j = true_top.join(
        F.broadcast(adc_top), true_top.t_vec == adc_top.vec_id, "left"
    )
    hit = F.sum(F.when(F.col("vec_id").isNotNull(), 1).otherwise(0))
    return j.agg(
        F.count(F.lit(1)).alias("n_truth"),
        hit.cast("bigint").alias("n_hit"),
        F.round(hit * F.lit(1.0) / F.count(F.lit(1)), 6).alias("recall_at_10"),
    )


def _cov_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle pairwise-complete covariance moments (i <= j,
    cov double) of the embedding dimensions — the quantized-sum
    second-moment shared by [emb_covariance_top_pairs] and
    [emb_pca_power_iteration]. See the covariance query's docstring
    for the determinism (1e12/1e6 quantization) and scale notes."""
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .repartition(parts, "vec_id")
    )
    pairs = e.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, size(v)), a ->"
                " transform(sequence(a, size(v)), b ->"
                " named_struct('i', a, 'j', b,"
                "  'q', cast(round(element_at(v, a) * element_at(v, b) * 1e12)"
                "       as decimal(38,0)),"
                "  'xa', cast(round(element_at(v, a) * 1e6) as bigint),"
                "  'xb', cast(round(element_at(v, b) * 1e6) as bigint)))))"
            )
        ).alias("s")
    ).select("s.i", "s.j", "s.q", "s.xa", "s.xb")
    # pairwise-complete moments: n and the single-dim sums ride the
    # SAME per-pair aggregate (restricted to vectors carrying both
    # dims), so ragged-length embeddings get a coherent covariance and
    # fixed-length corpora get bit-identical values to the per-dim
    # formulation — with one fewer shuffle (no separate singles agg).
    px = pairs.groupBy("i", "j").agg(
        F.sum("q").alias("sq"),
        F.sum("xa").alias("sxa"),
        F.sum("xb").alias("sxb"),
        F.count(F.lit(1)).alias("n"),
    )
    return px.select(
        "i",
        "j",
        "n",
        (
            F.col("sq").cast("double") / F.lit(1e12) / F.col("n")
            - (F.col("sxa").cast("double") / F.lit(1e6) / F.col("n"))
            * (F.col("sxb").cast("double") / F.lit(1e6) / F.col("n"))
        ).alias("cov"),
    )


@register(
    "emb_covariance_top_pairs",
    """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
idx AS (
  SELECT unnest(generate_series(1, (SELECT MAX(len(v)) FROM e))) AS i
),
px AS (
  SELECT ia.i AS i, ib.i AS j,
         SUM(CAST(ROUND(v[ia.i] * v[ib.i] * 1e12) AS HUGEINT)) AS sq,
         SUM(CAST(ROUND(v[ia.i] * 1e6) AS BIGINT)) AS sxa,
         SUM(CAST(ROUND(v[ib.i] * 1e6) AS BIGINT)) AS sxb,
         COUNT(*) AS n
  FROM e CROSS JOIN idx ia CROSS JOIN idx ib
  WHERE ib.i >= ia.i AND ia.i <= len(v) AND ib.i <= len(v)
  GROUP BY 1, 2
),
mom AS (
  SELECT i, j,
         CAST(sq AS DOUBLE) / 1e12 / n
           - (CAST(sxa AS DOUBLE) / 1e6 / n)
             * (CAST(sxb AS DOUBLE) / 1e6 / n) AS cov,
         n
  FROM px
),
var AS (SELECT i, cov AS v FROM mom WHERE i = j)
SELECT CAST(m.i AS INTEGER) AS dim_i, CAST(m.j AS INTEGER) AS dim_j,
       CAST(m.n AS BIGINT) AS n_vectors,
       ROUND(m.cov, 8) AS cov,
       ROUND(m.cov / sqrt(va.v * vb.v), 6) AS corr
FROM mom m
JOIN var va ON va.i = m.i
JOIN var vb ON vb.i = m.j
WHERE m.i < m.j
-- order on the ROUNDED value (the emitted column) like the Spark
-- side: ordering on raw cov could disagree with Spark's post-select
-- alias binding at ties past the 8th decimal, flipping the LIMIT edge
ORDER BY abs(ROUND(m.cov, 8)) DESC, m.i, m.j
LIMIT 20
""",
)
def emb_covariance_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment structure of the embedding space: the top-20
    most-correlated dimension pairs by |covariance| — the diagnostic
    behind whitening / PCA decisions (strongly correlated dimensions
    mean the space wastes capacity and ANN distance is dominated by a
    few directions; a whitened space has this table ~empty).

    Determinism: cross-row sums of float products are order-dependent,
    so each product is QUANTIZED (round(x_i*x_j * 1e12) -> exact int,
    the PageRank idiom) and summed as decimal(38,0)/HUGEINT; means come
    from 1e6-quantized first-order sums. Both engines then evaluate the
    identical fixed double tree over identical exact integers.

    Ragged-length embeddings (ADVICE r9): both sides compute
    PAIRWISE-COMPLETE moments — n and the single-dim sums ride the same
    per-(i,j) aggregate, restricted to vectors carrying both dims (the
    Spark explode by construction; the oracle via i <= len(v) guards on
    its dimension-grid cross joins) — so n_vectors counts the vectors
    that actually carry the pair and parity does not rest on a
    fixed-dim assumption (pinned on a ragged corpus in
    tests/test_round9_properties.py). On fixed-length corpora the
    values are bit-identical to the per-dim formulation.

    Scale: the explode produces dims*(dims+1)/2 rows per vector (2080
    for 64 dims), immediately collapsed by a map-side-combined
    aggregate into a 2080-group table — the standard distributed
    second-moment (covariance matrix) computation; everything after is
    dims^2-sized. The input is repartitioned on vec_id first: a single
    parquet file is ONE input partition, and a 2080x explode in one
    task is the round-7 single-task cliff."""
    # the moment table is consumed THREE times (the va/vb broadcast
    # builds and the i<j probe) and each un-materialized reference
    # re-runs the corpus-wide 2080x explode + aggregate; the cache is
    # dims^2-bounded (2080 rows at 64 dims) at ANY corpus size (r14,
    # same fix as pca's cv cache)
    mom = query_cache(_cov_moments(spark, sf_dir))
    var = mom.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("vi"), F.col("cov").alias("v")
    )
    va = var.select(F.col("vi").alias("i"), F.col("v").alias("var_a"))
    vb = var.select(F.col("vi").alias("j"), F.col("v").alias("var_b"))
    return (
        mom.filter(F.col("i") < F.col("j"))
        .join(F.broadcast(va), "i")
        .join(F.broadcast(vb), "j")
        .select(
            F.col("i").cast("int").alias("dim_i"),
            F.col("j").cast("int").alias("dim_j"),
            F.col("n").cast("bigint").alias("n_vectors"),
            F.round("cov", 8).alias("cov"),
            F.round(
                F.col("cov") / F.sqrt(F.col("var_a") * F.col("var_b")), 6
            ).alias("corr"),
        )
        .orderBy(F.abs(F.col("cov")).desc(), "dim_i", "dim_j")
        .limit(20)
    )


# -- matryoshka truncation eval ---------------------------------------------
# Prefix widths evaluated against the full-width (64) ground truth; the
# recall cutoff matches the embedding-compression evals (int8 / PQ):
# "what does keeping only the first d dimensions cost in retrieval?"
_MRL_DIMS = (8, 16, 32)
_MRL_K = 10


def _mrl_duck_cos(d: int, a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {d}), i -> {a}[i] * {b}[i]))"
        f" / (sqrt(list_sum(list_transform(generate_series(1, {d}), i -> {a}[i] * {a}[i])))"
        f" * sqrt(list_sum(list_transform(generate_series(1, {d}), i -> {b}[i] * {b}[i]))))"
    )


def _mrl_duck_block(d: int) -> str:
    return f"""
  SELECT CAST({d} AS BIGINT) AS dims, query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY ROUND({_mrl_duck_cos(d, "q.v", "e.v")}, 6) DESC, e.vec_id
           ) AS rk
    FROM q JOIN e ON q.vec_id <> e.vec_id
  ) WHERE rk <= {_MRL_K}"""


@register(
    "emb_truncation_recall",
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
gt AS ({_mrl_duck_block(64)}),
tr AS ({" UNION ALL ".join(_mrl_duck_block(d) for d in _MRL_DIMS)})
SELECT t.query_id, t.dims,
       CAST(COUNT(g.neighbor_id) AS BIGINT) AS n_overlap,
       ROUND(COUNT(g.neighbor_id) / {_MRL_K}.0, 6) AS recall_at_{_MRL_K}
FROM tr t
LEFT JOIN gt g ON g.query_id = t.query_id AND g.neighbor_id = t.neighbor_id
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def emb_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation eval (Kusupati et al., NeurIPS'22):
    retrieval recall@10 of PREFIX-truncated embeddings (first 8/16/32
    dims) against the full-width (64) brute-force ground truth, per
    query vector — the eval a pipeline runs before storing truncated
    vectors to cut the ANN index 2-8x. Complements the int8 and PQ
    compression evals (value-quantization vs dimension-truncation).

    Plan shape: ONE corpus scan per width (4 total), each a broadcast
    of the fixed 10-query set against the streaming corpus (the
    bruteforce-witness shape — bounded by N_QUERIES, never corpus x
    corpus), ranking windows partitioned by query. Cosines are
    sequential per-row folds over prefix slices — bit-identical across
    engines (idioms contract), rounded to 6 before ranking so the
    top-k boundary cannot flip."""
    e = _emb(spark, sf_dir).select("vec_id", "v")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")

    def topk(d: int) -> DataFrame:
        cos = _cosine(f"slice(qv, 1, {d})", f"slice(v, 1, {d})")
        return (
            e.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                F.round(F.expr(cos), 6).alias("cosine"),
            )
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _MRL_K)
            .select(
                F.lit(d).cast("bigint").alias("dims"),
                "query_id",
                "neighbor_id",
            )
        )

    gt = topk(64).select("query_id", "neighbor_id").withColumn("_g", F.lit(1))
    tr = topk(_MRL_DIMS[0])
    for d in _MRL_DIMS[1:]:
        tr = tr.unionByName(topk(d))
    return (
        tr.join(F.broadcast(gt), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id", "dims")
        .agg(
            F.count("_g").alias("n_overlap"),
            F.round(F.count("_g") / F.lit(float(_MRL_K)), 6).alias(
                f"recall_at_{_MRL_K}"
            ),
        )
        .orderBy("query_id", "dims")
    )


# ---------------------------------------------------------------------------
# round 12: radius (range) search + graded ranking-quality evaluation
# ---------------------------------------------------------------------------

RANGE_TAU = 0.25  # cosine radius: in-range = cosine >= RANGE_TAU


@register(
    "sim_range_search",
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
{duck_rp_planes_sql(RP_PLANES, RP_BITS).strip()},
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM sigs q JOIN sigs c
    ON q.table_id = c.table_id AND q.bucket = c.bucket
   AND q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, ec.label AS neighbor_label,
         ROUND({{cos}}, 6) AS cosine
  FROM cand
  JOIN e eq ON eq.vec_id = cand.query_id
  JOIN e ec ON ec.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, neighbor_label, cosine
FROM scored WHERE cosine >= {RANGE_TAU}
ORDER BY query_id, neighbor_id
""".format(cos=_DUCK_COS.format(a="eq.v", b="ec.v")),
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) query, the top-k family's missing complement
    (VERDICT r11 item 6): ALL corpus vectors within a fixed cosine
    radius (cosine >= RANGE_TAU) of each query vector, found through
    the banded RP-LSH buckets — candidates are bucket collisions in any
    of the 4 hash tables, then an exact-cosine filter keeps the
    in-range ones. Unlike top-k, the result size follows the data (a
    dedup/recall use case: "everything this similar", not "the 5 most
    similar"). Both engines derive identical md5 hyperplanes, so the
    candidate sets — and therefore the radius results — match exactly.

    Scale shape: identical to sim_rp_lsh_topk (the scale path of the
    family) — map-only signatures, equi-join on (table, bucket) against
    a broadcast query-signature set, exact re-score touches candidates
    only; no window needed at all (the filter replaces the rank)."""
    e = _emb(spark, sf_dir)
    sigs = rp_sigs(e, rp_planes_df(spark, RP_PLANES, RP_BITS), RP_BITS)
    qs = sigs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("table_id").alias("q_table"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = (
        sigs.join(
            F.broadcast(qs),
            (F.col("q_table") == F.col("table_id"))
            & (F.col("q_bucket") == F.col("bucket"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    eq = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    ec = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("label").alias("neighbor_label"),
    )
    return (
        cand.join(F.broadcast(eq), "query_id")
        .join(ec, "neighbor_id")
        .withColumn("cosine", F.round(F.expr(_cosine("qv", "nv")), 6))
        .filter(F.col("cosine") >= RANGE_TAU)
        .select("query_id", "neighbor_id", "neighbor_label", "cosine")
        .orderBy("query_id", "neighbor_id")
    )


def _register_ndcg_eval() -> None:
    """NDCG@k of the RP-LSH ranking against the exact ideal — declared
    in a closure (like _register_recall_eval) so the oracle composes the
    two already-registered oracle strings."""
    from ibis_olap_aggregation_spark.queries import ORACLES

    # ordered-fold DCG: both engines build the rank-ordered term list
    # and fold it sequentially (list_sum == aggregate seeded 0d), so the
    # float sum is bit-identical cross-engine (PARITY r7: fixed-order
    # array folds in plain double match; ln parity measured). log2 is
    # spelled ln(rk+1)/ln(2) on BOTH sides — same libm calls, same
    # operation order — rather than trusting two log2 implementations.
    duck_dcg = (
        "list_sum(list(cosine / (ln(rk + 1.0) / ln(2.0)) ORDER BY rk))"
    )
    oracle = f"""
WITH truth AS ({ORACLES["sim_bruteforce_topk"].strip()}),
approx AS ({ORACLES["sim_rp_lsh_topk"].strip()}),
td AS (SELECT query_id, {duck_dcg} AS idcg FROM truth GROUP BY 1),
ad AS (SELECT query_id, {duck_dcg} AS dcg FROM approx GROUP BY 1)
SELECT t.query_id,
       ROUND(COALESCE(a.dcg, 0), 6) AS dcg_at_{TOP_K},
       ROUND(t.idcg, 6) AS idcg_at_{TOP_K},
       ROUND(COALESCE(a.dcg, 0) / t.idcg, 6) AS ndcg_at_{TOP_K}
FROM td t LEFT JOIN ad a USING (query_id)
ORDER BY 1
"""

    @register("sim_ndcg_eval", oracle)
    def sim_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Graded ranking-quality evaluation (VERDICT r11 item 6 —
        retrieval-eval family): NDCG@5 of the banded RP-LSH ranking
        against the exact brute-force ideal, with the exact cosine as
        the graded gain. Complements sim_ann_recall_eval's SET overlap:
        recall@k treats a hit at rank 1 and rank 5 the same, NDCG
        penalizes the index for returning the right neighbors in the
        wrong order (the metric reranker tuning optimizes).

        Scale shape: both inputs are the family's own top-k results
        (query-count x k rows); the eval itself is a per-query fold —
        negligible against the indexes it measures."""
        from ibis_olap_aggregation_spark.queries import QUERIES

        fold = (
            "aggregate(sort_array(collect_terms), cast(0 as double),"
            " (acc, t) -> acc + t.cosine / (ln(t.rk + 1.0) / ln(2.0)))"
        )

        def dcg(df: DataFrame, alias: str) -> DataFrame:
            return (
                df.groupBy("query_id")
                .agg(
                    F.sort_array(
                        F.collect_list(F.struct("rk", "cosine"))
                    ).alias("collect_terms")
                )
                .select("query_id", F.expr(fold).alias(alias))
            )

        truth = dcg(
            QUERIES["sim_bruteforce_topk"](spark, sf_dir).select(
                "query_id", "rk", "cosine"
            ),
            "idcg",
        )
        approx = dcg(
            QUERIES["sim_rp_lsh_topk"](spark, sf_dir).select(
                "query_id", "rk", "cosine"
            ),
            "dcg",
        )
        return (
            truth.join(approx, "query_id", "left")
            .select(
                "query_id",
                F.round(F.coalesce(F.col("dcg"), F.lit(0.0)), 6).alias(
                    f"dcg_at_{TOP_K}"
                ),
                F.round(F.col("idcg"), 6).alias(f"idcg_at_{TOP_K}"),
                F.round(
                    F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"), 6
                ).alias(f"ndcg_at_{TOP_K}"),
            )
            .orderBy("query_id")
        )


_register_ndcg_eval()


_RRF_K = 60  # standard reciprocal-rank-fusion constant (Cormack '09)


def _register_rrf_fusion() -> None:
    """Reciprocal rank fusion of two ANN retrievers — declared in a
    closure (the sim_ndcg_eval pattern) so the oracle composes the two
    already-registered oracle strings."""
    from ibis_olap_aggregation_spark.queries import ORACLES

    oracle = f"""
WITH lsh AS ({ORACLES["sim_rp_lsh_topk"].strip()}),
ivf AS ({ORACLES["sim_ivf_topk"].strip()}),
pooled AS (
  SELECT query_id, neighbor_id, rk FROM lsh
  UNION ALL
  SELECT query_id, neighbor_id, rk FROM ivf
),
fused AS (
  SELECT query_id, neighbor_id,
         CAST(COUNT(*) AS BIGINT) AS n_lists,
         SUM(1.0 / ({_RRF_K} + rk)) AS rrf
  FROM pooled GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number()
            OVER (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS rk
  FROM fused
)
SELECT query_id, neighbor_id, n_lists, ROUND(rrf, 6) AS rrf_score,
       CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {TOP_K}
"""

    @register("sim_rrf_fusion", oracle)
    def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Reciprocal rank fusion (RRF, Cormack et al. '09) of the two
        approximate retrievers — banded RP-LSH and IVF — into one
        ranking: score(q, n) = sum over lists of 1/(60 + rank). The
        standard way production retrieval stacks combine heterogeneous
        indexes (keyword + vector, or two vector indexes with different
        recall profiles) without score calibration: only RANKS are
        consumed, so the fusion is scale-free. Ties in the fused score
        (same rank pattern) break on neighbor_id — and the score sums
        at most two exact small-integer reciprocals, so equal patterns
        are bit-equal and distinct patterns differ by >= ~2.5e-4: the
        fused ORDER is engine-stable, no rounding hazard.

        Scale shape: inputs are the retrievers' own top-k results
        (query-count x k rows each); the fusion is a (query, neighbor)
        group-by over <= 2k rows per query — negligible against the
        indexes it combines."""
        from ibis_olap_aggregation_spark.queries import QUERIES

        lsh = QUERIES["sim_rp_lsh_topk"](spark, sf_dir).select(
            "query_id", "neighbor_id", "rk"
        )
        ivf = QUERIES["sim_ivf_topk"](spark, sf_dir).select(
            "query_id", "neighbor_id", "rk"
        )
        fused = (
            lsh.unionByName(ivf)
            .groupBy("query_id", "neighbor_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_lists"),
                F.sum(F.lit(1.0) / (F.lit(_RRF_K) + F.col("rk"))).alias("rrf"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), "neighbor_id")
        return (
            fused.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select(
                "query_id",
                "neighbor_id",
                "n_lists",
                F.round("rrf", 6).alias("rrf_score"),
                F.col("rk").cast("bigint").alias("rk"),
            )
        )


_register_rrf_fusion()


_PCA_SQL = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
idx AS (
  SELECT unnest(generate_series(1, (SELECT MAX(len(v)) FROM e))) AS i
),
px AS (
  SELECT ia.i AS i, ib.i AS j,
         SUM(CAST(ROUND(v[ia.i] * v[ib.i] * 1e12) AS HUGEINT)) AS sq,
         SUM(CAST(ROUND(v[ia.i] * 1e6) AS BIGINT)) AS sxa,
         SUM(CAST(ROUND(v[ib.i] * 1e6) AS BIGINT)) AS sxb,
         COUNT(*) AS n
  FROM e CROSS JOIN idx ia CROSS JOIN idx ib
  WHERE ib.i >= ia.i AND ia.i <= len(v) AND ib.i <= len(v)
  GROUP BY 1, 2
),
mom AS (
  SELECT i, j,
         CAST(sq AS DOUBLE) / 1e12 / n
           - (CAST(sxa AS DOUBLE) / 1e6 / n)
             * (CAST(sxb AS DOUBLE) / 1e6 / n) AS cov
  FROM px
),
cv AS (
  SELECT i, j, cov FROM mom
  UNION ALL
  SELECT j AS i, i AS j, cov FROM mom WHERE i <> j
),
dims AS (SELECT DISTINCT i AS j FROM cv),
x0 AS (
  SELECT j, ROUND(1.0 / sqrt((SELECT COUNT(*) FROM dims)), 9) AS xj
  FROM dims
),
y1 AS (
  SELECT c.i,
         CAST(SUM(CAST(ROUND(c.cov * x.xj * 1e12) AS HUGEINT)) AS DOUBLE)
           / 1e12 AS y
  FROM cv c JOIN x0 x ON x.j = c.j GROUP BY 1
),
n1 AS (
  SELECT sqrt(CAST(SUM(CAST(ROUND(y * y * 1e12) AS HUGEINT)) AS DOUBLE)
              / 1e12) AS nrm
  FROM y1
),
x1 AS (SELECT i AS j, ROUND(y / (SELECT nrm FROM n1), 9) AS xj FROM y1),
y2 AS (
  SELECT c.i,
         CAST(SUM(CAST(ROUND(c.cov * x.xj * 1e12) AS HUGEINT)) AS DOUBLE)
           / 1e12 AS y
  FROM cv c JOIN x1 x ON x.j = c.j GROUP BY 1
),
n2 AS (
  SELECT sqrt(CAST(SUM(CAST(ROUND(y * y * 1e12) AS HUGEINT)) AS DOUBLE)
              / 1e12) AS nrm
  FROM y2
)
-- the final loading is rounded ONCE from the raw quotient: an
-- intermediate 9-decimal rounding would park values exactly on 1e-6
-- halves, where Spark's shortest-repr double rounding and DuckDB's
-- binary-value rounding disagree (observed: dim 15 at sf0.001)
SELECT CAST(i AS INTEGER) AS dim,
       ROUND(y / (SELECT nrm FROM n2), 6) AS loading,
       ROUND((SELECT nrm FROM n2), 6) AS eigenvalue_est
FROM y2
ORDER BY 1
"""


@register("emb_pca_power_iteration", _PCA_SQL)
def emb_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal component by TWO unrolled power-iteration
    steps over the dimension covariance matrix: x_{k+1} =
    normalize(C x_k) from the uniform unit start, reporting each
    dimension's loading and the Rayleigh/norm eigenvalue estimate
    ||C x_1||. The whitening/PCA decision input next to
    [emb_covariance_top_pairs]'s pairwise diagnostic — and the repo's
    exemplar of an ITERATIVE linear-algebra dataflow kept
    engine-invariant: the covariance is the shared quantized-sum
    moment (`_cov_moments`), every matrix-vector product quantizes
    per-term to 1e-12 units and sums exactly (order-free on both
    engines), each iterate is re-rounded to 9 decimals before the
    next step, and the norm squares are quantized the same way — so
    the float tree is fixed and the DuckDB oracle reproduces every
    bit.

    Scale shape: C is dims²-sized (4096 rows at 64 dims) — the ONLY
    corpus-sized work is the one moment pass; each iteration is a
    broadcast join of the 64-row iterate against C plus a 64-row
    aggregate. More iterations = more tiny stages, never another
    corpus scan (at 100 TB you materialize C once and iterate to
    convergence for pennies)."""
    import math

    mom = _cov_moments(spark, sf_dir).select("i", "j", "cov")
    cv = query_cache(
        mom.unionAll(
            mom.filter(F.col("i") != F.col("j")).select(
                F.col("j").alias("i"), F.col("i").alias("j"), "cov"
            )
        )
    )
    dims = cv.select(F.col("i").alias("j")).distinct()
    d = dims.count()
    x0 = dims.select(
        "j", F.round(F.lit(1.0 / math.sqrt(d)), 9).alias("xj")
    )

    def _matvec(x: DataFrame) -> DataFrame:
        return (
            cv.join(x, "j")
            .groupBy("i")
            .agg(
                (
                    F.sum(
                        F.expr("cast(round(cov * xj * 1e12) as decimal(38,0))")
                    ).cast("double")
                    / F.lit(1e12)
                ).alias("y")
            )
        )

    def _norm(y: DataFrame) -> DataFrame:
        return y.agg(
            F.sqrt(
                F.sum(
                    F.expr("cast(round(y * y * 1e12) as decimal(38,0))")
                ).cast("double")
                / F.lit(1e12)
            ).alias("nrm")
        )

    y1 = _matvec(F.broadcast(x0))
    nrm1 = _norm(y1)
    x1 = y1.crossJoin(F.broadcast(nrm1)).select(
        F.col("i").alias("j"), F.round(F.col("y") / F.col("nrm"), 9).alias("xj")
    )
    y2 = _matvec(F.broadcast(x1))
    nrm2 = _norm(y2)
    # single rounding from the raw quotient (see oracle comment): a
    # 9-then-6 double-round constructs exact 1e-6 half-ties where the
    # two engines' double-rounding rules diverge
    return (
        y2.crossJoin(F.broadcast(nrm2))
        .select(
            F.col("i").cast("int").alias("dim"),
            F.round(F.col("y") / F.col("nrm"), 6).alias("loading"),
            F.round("nrm", 6).alias("eigenvalue_est"),
        )
        .orderBy("dim")
    )
