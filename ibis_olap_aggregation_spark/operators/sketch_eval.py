"""Driver-gated evaluation queries for the mergeable-sketch layer.

The sketch layer (functions/sketches.py — Spark's native Datasketches
HLL/theta integration plus approx_top_k / approx_percentile) has
merge-losslessness and error-bound pins in tests/test_sketches.py, but
estimates themselves are engine-specific: DuckDB cannot reproduce them,
so a raw estimate can never hash-match an oracle. These queries use the
TOLERANCE-VERDICT pattern (VERDICT r3 items 4/7): emit the EXACT answer
(oracle-computable) plus a deterministic `within_bounds` boolean that a
broken sketch flips — putting the approximate layer behind the same
cross-engine driver gate as everything else.

No reference counterpart (the reference is a 468-line closure-table SQL
generator — SURVEY.md §2.10); this is §7.4 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.queries import register
from ibis_olap_aggregation_spark.session import load_table

# theta sketches at lgk=12: ~1.6% rsd on the union; intersection /
# difference errors scale with the UNION size, so every bound is
# union-relative. 10% is >6 sigma — deterministic-in-practice, but a
# wrong merge or a parameter drift flips it.
_THETA_EPS = 0.10
_THETA_LGK = 12


@register(
    "sketch_theta_segment_overlap",
    f"""
WITH seg AS (
  SELECT DISTINCT event_type AS t, user_id FROM events
),
types AS (SELECT DISTINCT event_type AS t FROM events),
u AS (
  SELECT l.t AS seg_a, r.t AS seg_b, COUNT(DISTINCT e.user_id) AS exact_union
  FROM types l JOIN types r ON l.t < r.t
  JOIN events e ON e.event_type IN (l.t, r.t)
  GROUP BY 1, 2
),
i AS (
  SELECT s1.t AS seg_a, s2.t AS seg_b, COUNT(*) AS exact_intersection
  FROM seg s1 JOIN seg s2 ON s1.user_id = s2.user_id AND s1.t < s2.t
  GROUP BY 1, 2
),
a AS (SELECT t, COUNT(*) AS n_a FROM seg GROUP BY 1)
SELECT u.seg_a, u.seg_b,
       u.exact_union,
       COALESCE(i.exact_intersection, 0) AS exact_intersection,
       a.n_a - COALESCE(i.exact_intersection, 0) AS exact_difference,
       TRUE AS union_within_bounds,
       TRUE AS intersection_within_bounds,
       TRUE AS difference_within_bounds
FROM u
LEFT JOIN i ON i.seg_a = u.seg_a AND i.seg_b = u.seg_b
JOIN a ON a.t = u.seg_a
""",
)
def sketch_theta_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra across event-type segments — the
    "how many users did BOTH/EITHER/ONLY-A" question that exact
    distinct AGGREGATES cannot answer from stored rollups at all (the
    reason theta partials, not counts, are what a 100 TB segment store
    keeps). One theta sketch per segment (map-side combined), then
    union/intersection/difference estimates for every segment pair,
    verdict-checked against the exact answers (all bounds relative to
    the union size, the theta error model). Exact branch: one distinct
    (segment, user) table, one self-join on user — oracle-mirrored."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("t"), "user_id"
    )
    sk = ev.groupBy("t").agg(
        F.expr(f"theta_sketch_agg(user_id, {_THETA_LGK})").alias("s"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    l = sk.select(
        F.col("t").alias("seg_a"), F.col("s").alias("sa"),
        F.col("n_exact").alias("n_a"),
    )
    r = sk.select(F.col("t").alias("seg_b"), F.col("s").alias("sb"))
    pairs = l.join(F.broadcast(r), F.col("seg_a") < F.col("seg_b")).withColumns(
        {
            "est_union": F.expr("theta_sketch_estimate(theta_union(sa, sb))"),
            "est_inter": F.expr(
                "theta_sketch_estimate(theta_intersection(sa, sb))"
            ),
            "est_diff": F.expr(
                "theta_sketch_estimate(theta_difference(sa, sb))"
            ),
        }
    )
    seg = ev.distinct()
    s1 = seg.select(F.col("t").alias("seg_a"), "user_id")
    s2 = seg.select(F.col("t").alias("seg_b"), "user_id")
    exact_i = (
        s1.join(s2, "user_id")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    exact_u = (
        seg.alias("types")
        .select("t")
        .distinct()
        .alias("l")
        .join(
            seg.select("t").distinct().alias("r"),
            F.col("l.t") < F.col("r.t"),
        )
        .select(F.col("l.t").alias("seg_a"), F.col("r.t").alias("seg_b"))
        .join(
            ev.select(F.col("t").alias("et"), "user_id"),
            (F.col("et") == F.col("seg_a")) | (F.col("et") == F.col("seg_b")),
        )
        .groupBy("seg_a", "seg_b")
        .agg(F.countDistinct("user_id").alias("exact_union"))
    )
    out = (
        pairs.join(exact_u, ["seg_a", "seg_b"])
        .join(exact_i, ["seg_a", "seg_b"], "left")
        .withColumn(
            "exact_intersection",
            F.coalesce("exact_intersection", F.lit(0)).cast("bigint"),
        )
        .withColumn(
            "exact_difference",
            (F.col("n_a") - F.col("exact_intersection")).cast("bigint"),
        )
    )
    tol = _THETA_EPS * F.col("exact_union")
    return out.select(
        "seg_a",
        "seg_b",
        F.col("exact_union").cast("bigint").alias("exact_union"),
        "exact_intersection",
        "exact_difference",
        (F.abs(F.col("est_union") - F.col("exact_union")) <= tol).alias(
            "union_within_bounds"
        ),
        (F.abs(F.col("est_inter") - F.col("exact_intersection")) <= tol).alias(
            "intersection_within_bounds"
        ),
        (F.abs(F.col("est_diff") - F.col("exact_difference")) <= tol).alias(
            "difference_within_bounds"
        ),
    )


# Frequent-items (approx_top_k) verdict: with max_items above the key
# cardinality the sketch tracks every item exactly, so the returned
# top-k must (a) be k items, (b) all sit at-or-above the k-th largest
# exact count (the tie-safe membership test — ties at the boundary make
# "the" top-k set ambiguous, a count threshold does not), and (c) carry
# exact counts. Bigrams (~900 distinct here) keep the item space real
# while the 4096-slot sketch stays in its exact regime; shrinking
# max_items below the cardinality moves it to the Misra-Gries
# approximate regime, whose error bound is pinned locally in
# tests/test_sketches.py.
_TOPK_K = 10
_TOPK_MAX_ITEMS = 4096


@register(
    "sketch_topk_heavy_hitters_verdict",
    f"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
bg AS (
  SELECT array_to_string(t[i:i+1], ' ') AS item
  FROM tok, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
),
c AS (SELECT item, COUNT(*) AS n FROM bg GROUP BY 1),
k AS (SELECT LEAST({_TOPK_K}, COUNT(*)) AS k_eff FROM c)
SELECT CAST(k_eff AS BIGINT) AS n_returned,
       CAST(k_eff AS BIGINT) AS n_at_or_above_threshold,
       TRUE AS all_counts_exact
FROM k
""",
)
def sketch_topk_heavy_hitters_verdict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """approx_top_k heavy hitters over document BIGRAMS, verdict-checked
    against the exact bigram counts: k items returned, every one at or
    above the exact k-th-largest count (tie-safe membership), every
    estimate equal to its exact count. One constant-state aggregation
    instead of groupBy+orderBy+limit — the scale form when the item
    space is too wide to group exactly; the exact branch here exists to
    drive the sketch through the cross-engine gate."""
    from ibis_olap_aggregation_spark.operators.text import tokens_col

    d = load_table(spark, sf_dir, "documents").withColumn("t", tokens_col())
    bg = (
        d.select(
            F.explode_outer(
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                    " (x, i) -> concat(x, ' ', element_at(t, i + 2)))"
                )
            ).alias("item")
        )
        .filter(F.col("item").isNotNull())
    )
    exact = bg.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    # tie-safe threshold: the exact count of the k_eff-th ranked item,
    # where k_eff = least(K, vocab) — with FEWER than K distinct bigrams
    # the old rk == K filter matched nothing, the crossJoin emptied the
    # result, and a small-fixture shape read as a broken sketch
    # (0/null/null vs the oracle). min(n) over the top-<=K ranks is the
    # k_eff-th count and is non-empty whenever any bigram exists.
    thresh = (
        exact.select(
            F.col("n"),
            F.row_number()
            .over(Window.orderBy(F.desc("n"), "item"))
            .alias("rk"),
        )
        .filter(F.col("rk") <= _TOPK_K)
        .agg(F.min("n").alias("thresh"))
    )
    approx = (
        bg.agg(
            F.expr(
                f"approx_top_k(item, {_TOPK_K}, {_TOPK_MAX_ITEMS})"
            ).alias("tk")
        )
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").alias("est_n"),
        )
    )
    # exact counts are item-vocabulary-sized (unbounded): un-hinted —
    # AQE sizes it; the k-row approx side bounds the output either way
    joined = approx.join(exact, "item", "left").crossJoin(
        F.broadcast(thresh)
    )
    # coalesce: a zero-bigram corpus (all-empty docs) leaves joined empty
    # and the un-grouped agg would emit 0/NULL/NULL; the oracle's k_eff=0
    # row is 0/0/TRUE
    return joined.agg(
        F.count(F.lit(1)).alias("n_returned"),
        F.coalesce(
            F.sum(F.when(F.col("n") >= F.col("thresh"), 1).otherwise(0)),
            F.lit(0).cast("bigint"),
        ).alias("n_at_or_above_threshold"),
        F.coalesce(
            F.every(F.col("est_n") == F.col("n")), F.lit(True)
        ).alias("all_counts_exact"),
    )


# Greenwald-Khanna approx_percentile at accuracy=A guarantees the
# returned element's RANK is within n/A of the target rank. A=1000 on
# the per-type event groups (~2k rows at sf0.01) keeps the slack tight
# (2-3 ranks) while real at any scale.
_GK_ACCURACY = 1000
_GK_PROBS = (0.5, 0.9, 0.99)


@register(
    "sketch_quantile_rank_verdict",
    f"""
SELECT e.event_type,
       p.probability,
       COUNT(*) AS n_rows,
       TRUE AS within_bounds
FROM events e
CROSS JOIN (VALUES (0.5), (0.9), (0.99)) p(probability)
GROUP BY 1, 2
""",
)
def sketch_quantile_rank_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna quantile sketch, verdict-checked by its own
    GUARANTEE: for each (event_type, p) the element approx_percentile
    returns must have rank within n/accuracy of ceil(p*n). The rank of
    the returned element is measured exactly (count of values strictly
    below / at-or-below it — the tie-safe interval form), so the
    boolean is deterministic and a broken sketch flips it. Output
    carries (n_rows, within_bounds); the oracle computes n_rows and
    asserts TRUE.

    Scale shape: approx_percentile is the one-pass no-global-sort
    mergeable quantile (the exact twin, agg_percentiles, needs a sort
    or a full value-histogram shuffle); the rank check is one broadcast
    join of 3 rows per group back onto the facts."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    probs_sql = ", ".join(f"{p}D" for p in _GK_PROBS)
    ap = ev.groupBy("event_type").agg(
        F.expr(
            f"approx_percentile(value, array({probs_sql}), {_GK_ACCURACY})"
        ).alias("q"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    long = ap.select(
        "event_type",
        "n_rows",
        F.posexplode("q").alias("_i", "qv"),
    ).withColumn(
        "probability",
        F.element_at(F.array(*[F.lit(p) for p in _GK_PROBS]), F.col("_i") + 1),
    )
    ranks = (
        ev.join(F.broadcast(long), "event_type")
        .groupBy("event_type", "probability", "n_rows", "qv")
        .agg(
            F.sum(F.when(F.col("value") < F.col("qv"), 1).otherwise(0)).alias(
                "n_lt"
            ),
            F.sum(F.when(F.col("value") <= F.col("qv"), 1).otherwise(0)).alias(
                "n_le"
            ),
        )
    )
    # GK bound is n/accuracy ranks; +1 absorbs the rank-convention
    # off-by-one (ceil vs floor(p*n)+1 target definitions) — observed
    # exactly at the boundary on real data (n_le = target - n/acc - 0.02)
    slack = F.col("n_rows") / F.lit(_GK_ACCURACY) + 1
    target = F.ceil(F.col("probability") * F.col("n_rows"))
    within = (F.col("n_lt") + 1 <= target + slack) & (
        F.col("n_le") >= target - slack
    )
    return ranks.select(
        "event_type",
        "probability",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        within.alias("within_bounds"),
    )


# portable HLL: nonlinearly mixed LCG hash mod the Mersenne prime 2^31-1,
# m=256 buckets
# (8 bucket bits, 23-bit register payload). Unlike the native-sketch
# verdict ops above, EVERY column here — registers included — is
# cross-engine exact, so the driver hash-verifies the sketch itself.
_HLL_P = 2147483647
_HLL_A = 1103515245
_HLL_B = 12345
_HLL_M = 256
# alpha_m for m=256, written as the same literal expression both
# engines evaluate in doubles: 0.7213 / (1 + 1.079 / m)
_HLL_ALPHA_SQL = "(0.7213 / (1.0 + 1.079 / 256.0))"
# 3 sigma at rsd = 1.04/sqrt(256)
_HLL_BOUND = 0.195


@register(
    "sketch_hll_portable_registers",
    f"""
WITH d AS (
  SELECT DISTINCT o_orderpriority AS grp, o_custkey AS key FROM orders
),
h0 AS (
  SELECT grp,
         ({_HLL_A} * (key % {_HLL_P}) + {_HLL_B}) % {_HLL_P} AS x
  FROM d
),
h1 AS (SELECT grp, xor((x * x) % {_HLL_P}, ((x * x) % {_HLL_P}) >> 15) AS x FROM h0),
h2 AS (SELECT grp, (({_HLL_A} * x + {_HLL_B}) % {_HLL_P} * (({_HLL_A} * x + {_HLL_B}) % {_HLL_P})) % {_HLL_P} AS x FROM h1),
h AS (SELECT grp, xor(x, x >> 13) AS hv FROM h2),
hb AS (
  SELECT grp, hv % {_HLL_M} AS bucket,
         CAST(floor(hv / {_HLL_M}.0) AS BIGINT) AS w
  FROM h
),
rho AS (
  SELECT grp, bucket, 24 - LENGTH(LTRIM(BIN(w), '0')) AS r FROM hb
),
regs_g AS (SELECT grp, bucket, MAX(r) AS reg FROM rho GROUP BY 1, 2),
regs AS (
  SELECT grp, bucket, reg FROM regs_g
  UNION ALL
  SELECT 'ALL' AS grp, bucket, MAX(reg) AS reg FROM regs_g GROUP BY 2
),
spine AS (
  SELECT g.grp, b.bucket
  FROM (SELECT DISTINCT grp FROM regs) g
  CROSS JOIN (SELECT range AS bucket FROM range(0, {_HLL_M})) b
),
dense AS (
  SELECT s.grp, COALESCE(r.reg, 0) AS reg
  FROM spine s
  LEFT JOIN regs r ON r.grp = s.grp AND r.bucket = s.bucket
),
est AS (
  SELECT grp,
         SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS v_zero,
         SUM(CAST(1.0 AS DOUBLE) / CAST(1::BIGINT << reg AS DOUBLE))
           AS sum_inv
  FROM dense GROUP BY 1
),
ex AS (
  SELECT grp, COUNT(*) AS exact_distinct FROM d GROUP BY 1
  UNION ALL
  SELECT 'ALL' AS grp, COUNT(DISTINCT key) AS exact_distinct FROM d
),
fin AS (
  SELECT e.grp, x.exact_distinct, e.v_zero,
         CASE WHEN {_HLL_ALPHA_SQL} * 65536.0 / e.sum_inv
                   <= 2.5 * {_HLL_M}.0 AND e.v_zero > 0
              THEN {_HLL_M}.0 * LN({_HLL_M}.0 / e.v_zero)
              ELSE {_HLL_ALPHA_SQL} * 65536.0 / e.sum_inv
         END AS est
  FROM est e JOIN ex x ON x.grp = e.grp
)
SELECT grp,
       CAST(exact_distinct AS BIGINT) AS exact_distinct,
       CAST(v_zero AS BIGINT) AS n_zero_registers,
       ROUND(est, 4) AS hll_estimate,
       ROUND((est - exact_distinct) / exact_distinct, 4) AS rel_error,
       ABS((est - exact_distinct) / exact_distinct) <= {_HLL_BOUND}
         AS within_3sigma
FROM fin
ORDER BY grp
""",
)
def sketch_hll_portable_registers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """From-scratch HyperLogLog (Flajolet et al. 2007) whose REGISTERS —
    not just a tolerance verdict — are cross-engine exact: a
    nonlinearly mixed hash mod the Mersenne prime 2^31-1 (affine LCG
    step -> modular squaring -> xor-shift, two rounds; a bare affine
    hash is a LATTICE over contiguous keys and biased the estimate
    +35%) splits into 8 bucket bits + a 23-bit payload whose
    leading-zero rank is computed with the
    integer-exact ``24 - length(ltrim(bin(w),'0'))`` identity, so
    Spark and DuckDB derive bit-identical registers, estimates, and
    error columns. One register set per order priority, plus an 'ALL'
    row built by ELEMENTWISE MAX over the per-group registers — the
    mergeability property that makes HLL partials a thing a 100 TB
    rollup store keeps instead of raw keys (union = max, verified
    cross-engine here, associativity pinned in properties). The
    per-group rows land in the linear-counting regime (est <= 2.5m
    with empty buckets) and the ALL row in the raw-harmonic-mean
    regime, so BOTH estimator branches are driver-gated. (The
    within_3sigma bound uses the raw-regime rsd 1.04/sqrt(m) = 0.065
    everywhere; linear counting's own error is strictly TIGHTER at
    the occupancies where the branch engages, so the shared bound is
    conservative there, never permissive.)

    Determinism notes: all hash/bucket/register arithmetic is exact
    int64 (the key is reduced mod p BEFORE the multiply, so a*key
    stays under 2^62 at any SF); sum(2^-reg) adds 256 dyadic doubles
    with exponents >= -24 — every partial sum is exactly representable,
    so the sum is order-independent; ln() only enters the
    linear-counting branch and is rounded at 4 dp.

    Scale shape: ONE exchange (the distinct on (grp, key) — at 100 TB
    this is the same dedup shuffle an exact count-distinct needs; a
    pure-sketch deployment drops it and max-combines registers
    map-side, trading the exact_distinct comparison column away), then
    map-side-combined max into at most |grps| x 256 register rows;
    spine, register, and estimate joins are all constant-size
    broadcasts."""
    from ibis_olap_aggregation_spark.session import query_cache

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_custkey").cast("bigint").alias("key"),
    )
    d = query_cache(o.distinct())
    # 2-round nonlinear mix (affine -> square -> xor-shift, twice): a
    # bare affine LCG is a lattice over contiguous keys and biased the
    # estimate +35%; squaring mod p + xor-shift breaks the affinity.
    # Every step is exact int64 in BOTH engines (operands stay < 2^31,
    # products < 2^62).
    x0 = (F.lit(_HLL_A) * (F.col("key") % _HLL_P) + _HLL_B) % _HLL_P
    sq0 = (x0 * x0) % _HLL_P
    x1 = sq0.bitwiseXOR(F.shiftright(sq0, 15))
    af1 = (F.lit(_HLL_A) * x1 + _HLL_B) % _HLL_P
    sq1 = (af1 * af1) % _HLL_P
    hv = sq1.bitwiseXOR(F.shiftright(sq1, 13))
    hb = d.select(
        "grp",
        (hv % _HLL_M).alias("bucket"),
        F.floor(hv / float(_HLL_M)).cast("bigint").alias("w"),
    )
    rho = hb.select(
        "grp",
        "bucket",
        (
            F.lit(24)
            - F.length(F.expr("trim(LEADING '0' FROM bin(w))"))
        ).alias("r"),
    )
    # Tracked query-scoped cache on the register table: it is BOUNDED
    # (<= |grps| x 256 rows at any corpus size — registers, not keys)
    # and has FOUR downstream evaluations without it (the regs union
    # reads it twice, the spine's grp-distinct and the dense broadcast
    # build re-derive it), each re-running the mix/bin/ltrim chain over
    # the distinct keys plus its (grp, bucket) exchange — measured 4x
    # 32-task stage chains per run at sf0.1.
    regs_g = query_cache(
        rho.groupBy("grp", "bucket").agg(F.max("r").alias("reg"))
    )
    regs = regs_g.unionByName(
        regs_g.groupBy("bucket")
        .agg(F.max("reg").alias("reg"))
        .select(F.lit("ALL").alias("grp"), "bucket", "reg")
    )
    spine = (
        regs.select("grp")
        .distinct()
        .crossJoin(spark.range(_HLL_M).select(F.col("id").alias("bucket")))
    )
    dense = spine.join(
        F.broadcast(regs), ["grp", "bucket"], "left"
    ).withColumn("reg", F.coalesce(F.col("reg"), F.lit(0)))
    est = dense.groupBy("grp").agg(
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0)).alias("v_zero"),
        F.sum(
            F.lit(1.0)
            / F.expr("cast(shiftleft(cast(1 as bigint), cast(reg as int)) as double)")
        ).alias("sum_inv"),
    )
    ex = (
        d.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("exact_distinct"))
        .unionByName(
            d.agg(
                F.countDistinct("key").alias("exact_distinct")
            ).select(F.lit("ALL").alias("grp"), "exact_distinct")
        )
    )
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    raw = F.lit(alpha) * 65536.0 / F.col("sum_inv")
    est_v = F.when(
        (raw <= 2.5 * float(_HLL_M)) & (F.col("v_zero") > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / F.col("v_zero")),
    ).otherwise(raw)
    rel = (est_v - F.col("exact_distinct")) / F.col("exact_distinct")
    return (
        est.join(F.broadcast(ex), "grp")
        .select(
            "grp",
            F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
            F.col("v_zero").cast("bigint").alias("n_zero_registers"),
            F.round(est_v, 4).alias("hll_estimate"),
            F.round(rel, 4).alias("rel_error"),
            (F.abs(rel) <= _HLL_BOUND).alias("within_3sigma"),
        )
        .orderBy("grp")
    )


# -- round 14c: portable count-min sketch ------------------------------------

# d=4 independent hash rows x w=512 counters. Per-row affine constants
# (distinct odd multipliers; each a_i * (P-1) < 2^63, so the products
# are exact int64 in both engines), then the HLL module's square +
# xor-shift nonlinearity to break the affine lattice.
_CMS_W = 512
_CMS_ROWS = ((0, 1103515245, 12345), (1, 1588635695, 54321),
             (2, 1117695901, 98765), (3, 1727346581, 24680))
_CMS_TOPK = 10
_CMS_PARAMS_SQL = ", ".join(f"({i}, {a}, {b})" for i, a, b in _CMS_ROWS)


@register(
    "sketch_cms_heavy_hitters",
    f"""
WITH f AS (SELECT l_partkey AS key FROM lineitem),
params AS (SELECT * FROM (VALUES {_CMS_PARAMS_SQL}) p(i, a, b)),
h0 AS (
  SELECT p.i, f.key, (p.a * (f.key % {_HLL_P}) + p.b) % {_HLL_P} AS x
  FROM f CROSS JOIN params p
),
h1 AS (
  SELECT i, key,
         xor((x * x) % {_HLL_P}, ((x * x) % {_HLL_P}) >> 15) % {_CMS_W}
           AS bucket
  FROM h0
),
counters AS (SELECT i, bucket, COUNT(*) AS c FROM h1 GROUP BY 1, 2),
exact AS (SELECT key, COUNT(*) AS exact_count FROM f GROUP BY 1),
top AS (
  SELECT key, exact_count FROM exact
  ORDER BY exact_count DESC, key LIMIT {_CMS_TOPK}
),
t0 AS (
  SELECT t.key, t.exact_count, p.i,
         (p.a * (t.key % {_HLL_P}) + p.b) % {_HLL_P} AS x
  FROM top t CROSS JOIN params p
),
t1 AS (
  SELECT key, exact_count, i,
         xor((x * x) % {_HLL_P}, ((x * x) % {_HLL_P}) >> 15) % {_CMS_W}
           AS bucket
  FROM t0
),
est AS (
  SELECT t.key, t.exact_count, MIN(c.c) AS cms_estimate
  FROM t1 t JOIN counters c ON c.i = t.i AND c.bucket = t.bucket
  GROUP BY 1, 2
),
tot AS (SELECT COUNT(*) AS n FROM f)
SELECT CAST(row_number() OVER (ORDER BY exact_count DESC, key) AS BIGINT)
         AS rank,
       CAST(key AS BIGINT) AS l_partkey,
       CAST(exact_count AS BIGINT) AS exact_count,
       CAST(cms_estimate AS BIGINT) AS cms_estimate,
       CAST(cms_estimate - exact_count AS BIGINT) AS overcount,
       cms_estimate >= exact_count AS never_underestimates,
       (cms_estimate - exact_count) * {_CMS_W} <= 3 * n AS within_eps_bound
FROM est CROSS JOIN tot
ORDER BY 1
""",
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch count-min sketch (Cormode & Muthukrishnan 2005)
    whose COUNTERS are cross-engine exact, the frequency-domain sibling
    of [sketch_hll_portable_registers]: d=4 portable hash rows (per-row
    affine constants -> modular squaring -> xor-shift, all exact int64
    in both engines) x w=512 counters over part-key frequency in
    lineitem, then the point-query estimate (elementwise MIN across
    rows) for the exact top-10 heavy hitters. Emits the two properties
    that define CMS: never_underestimates (structural — every counter
    sums a superset of the key's rows; a TRUE invariant both engines
    must agree on) and the Markov error bound overcount <= 3N/w,
    checked in EXACT integers (overcount * w <= 3 * N — no float
    epsilon anywhere in the query).

    Scale shape: TWO fact scans total — the counter build (ONE
    map-side-combined aggregate over the x4-exploded scan into <= d*w
    = 2048 cached rows; the fixed-size partial a 100 TB frequency
    store keeps and merges by elementwise ADD — linearity pinned in
    tests) and the exact top-10 (orderBy+limit =
    TakeOrderedAndProject: per-partition heaps + a 10-row driver
    merge, never a global sort). The estimate join broadcasts 40
    (key, row) probes against the cached counter table; the stream
    total N is recovered from the counters themselves (any hash row
    sums to N), so the eps bound costs no third scan and no
    construction-time driver action. The rank window runs on the
    10-row result — constant-size, not a data-scale single-partition
    sort."""
    f = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("key")
    )
    params = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), F.lit(a).alias("a"), F.lit(b).alias("b")
            )
            for i, a, b in _CMS_ROWS
        ]
    )

    def _bucket(df):
        x = (F.col("a") * (F.col("key") % _HLL_P) + F.col("b")) % _HLL_P
        sq = (x * x) % _HLL_P
        return df.withColumn(
            "bucket", sq.bitwiseXOR(F.shiftright(sq, 15)) % _CMS_W
        )

    hashed = _bucket(
        f.select("key", F.explode(params).alias("p")).select(
            "key", F.col("p.i").alias("i"), F.col("p.a").alias("a"),
            F.col("p.b").alias("b"),
        )
    )
    from ibis_olap_aggregation_spark.session import query_cache

    counters = query_cache(
        hashed.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("c"))
    )
    exact = f.groupBy("key").agg(F.count(F.lit(1)).alias("exact_count"))
    top = exact.orderBy(F.col("exact_count").desc(), "key").limit(_CMS_TOPK)
    probes = _bucket(
        top.select("key", "exact_count", F.explode(params).alias("p")).select(
            "key", "exact_count", F.col("p.i").alias("i"),
            F.col("p.a").alias("a"), F.col("p.b").alias("b"),
        )
    )
    probe_tbl = probes.select("key", "exact_count", "i", "bucket")
    est = (
        F.broadcast(probe_tbl)
        .join(counters, ["i", "bucket"])
        .groupBy("key", "exact_count")
        .agg(F.min("c").alias("cms_estimate"))
    )
    # stream total WITHOUT another fact scan (or a construction-time
    # driver action): every hash row's counters sum to exactly N, so
    # N falls out of the cached counter table for free
    tot = counters.filter(F.col("i") == 0).agg(
        F.sum("c").alias("n_total")
    )
    w = Window.orderBy(F.col("exact_count").desc(), "key")
    over = F.col("cms_estimate") - F.col("exact_count")
    return (
        est.crossJoin(F.broadcast(tot))
        .select(
            F.row_number().over(w).cast("bigint").alias("rank"),
            F.col("key").cast("bigint").alias("l_partkey"),
            F.col("exact_count").cast("bigint").alias("exact_count"),
            F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
            over.cast("bigint").alias("overcount"),
            (F.col("cms_estimate") >= F.col("exact_count")).alias(
                "never_underestimates"
            ),
            (over * _CMS_W <= 3 * F.col("n_total")).alias("within_eps_bound"),
        )
        .orderBy("rank")
    )


# -- round 14c: portable HDR-histogram quantile sketch -----------------------

# log2 bucket + 4 linear sub-bucket bits: relative bucket width <= 1/16.
# code(v) = v for v < 16, else (floor(log2 v) - 4) * 16 + (v >> (log2v-4))
# — monotone in v, contiguous across exponent boundaries, pure integer
# shifts in both engines (floor(log2) is length(bin(v)) - 1, the HLL
# module's bit-length identity).
_HDR_QS = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))
_HDR_Q_SQL = ", ".join(f"('{l}', {n}, {d})" for l, n, d in _HDR_QS)


@register(
    "sketch_hdr_quantiles",
    f"""
WITH f AS (
  SELECT o_orderpriority AS grp,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
),
coded AS (
  SELECT grp,
         CASE WHEN v < 16 THEN v
              ELSE (length(bin(v)) - 1 - 4) * 16
                   + (v >> (length(bin(v)) - 1 - 4))
         END AS code
  FROM f
),
regs_g AS (SELECT grp, code, COUNT(*) AS c FROM coded GROUP BY 1, 2),
regs AS (
  SELECT grp, code, c FROM regs_g
  UNION ALL
  SELECT 'ALL' AS grp, code, SUM(c) AS c FROM regs_g GROUP BY 2
),
cum AS (
  SELECT grp, code, c,
         SUM(c) OVER (PARTITION BY grp ORDER BY code
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_c,
         SUM(c) OVER (PARTITION BY grp) AS n
  FROM regs
),
qs AS (SELECT * FROM (VALUES {_HDR_Q_SQL}) q(label, qn, qd)),
hit AS (
  SELECT c.grp, q.label,
         MIN(c.code) AS est_code,
         MIN(c.n) AS n_rows,
         MIN((c.n * q.qn + q.qd - 1) // q.qd) AS target_rank
  FROM cum c CROSS JOIN qs q
  WHERE c.cum_c >= (c.n * q.qn + q.qd - 1) // q.qd
  GROUP BY 1, 2
),
dec AS (
  SELECT grp, label, n_rows, target_rank, est_code,
         CASE WHEN est_code < 16 THEN est_code
              ELSE ((est_code % 16) + 16) << ((est_code // 16) + 3 - 4)
         END AS est_lo,
         CASE WHEN est_code < 16 THEN 1
              ELSE 1 << ((est_code // 16) + 3 - 4)
         END AS bucket_width
  FROM hit
),
ex_g AS (
  SELECT grp,
         CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY v) AS BIGINT) AS p50,
         CAST(percentile_disc(0.90) WITHIN GROUP (ORDER BY v) AS BIGINT) AS p90,
         CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY v) AS BIGINT) AS p99
  FROM f GROUP BY 1
  UNION ALL
  SELECT 'ALL',
         CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY v) AS BIGINT),
         CAST(percentile_disc(0.90) WITHIN GROUP (ORDER BY v) AS BIGINT),
         CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY v) AS BIGINT)
  FROM f
),
ex AS (
  SELECT grp, 'p50' AS label, p50 AS exact_cents FROM ex_g
  UNION ALL SELECT grp, 'p90', p90 FROM ex_g
  UNION ALL SELECT grp, 'p99', p99 FROM ex_g
)
SELECT d.grp, d.label,
       CAST(d.n_rows AS BIGINT) AS n_rows,
       CAST(d.target_rank AS BIGINT) AS target_rank,
       CAST(d.est_code AS BIGINT) AS est_code,
       CAST(d.est_lo AS BIGINT) AS est_lo_cents,
       CAST(d.bucket_width AS BIGINT) AS bucket_width,
       CAST(e.exact_cents AS BIGINT) AS exact_cents,
       (e.exact_cents >= d.est_lo
        AND e.exact_cents - d.est_lo < d.bucket_width) AS within_bucket,
       CAST(ROUND(ABS(d.est_lo - e.exact_cents) * 1e6
                  / e.exact_cents) AS BIGINT) AS rel_err_ppm
FROM dec d JOIN ex e ON e.grp = d.grp AND e.label = d.label
ORDER BY 1, 2
""",
)
def sketch_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch HDR-histogram quantile sketch (Gil Tene's
    HdrHistogram bucketing; Ben-Haim/Tom-Tov lineage) whose REGISTERS
    are cross-engine exact — completing the portable-sketch triad:
    cardinality ([sketch_hll_portable_registers]), frequency
    ([sketch_cms_heavy_hitters]), and now QUANTILES. Order totals in
    exact cents are coded into log2-major/4-bit-linear-minor buckets
    (pure integer bit arithmetic both engines — floor(log2) is the
    bit-length identity, sub-buckets are shifts), one register set per
    order priority plus an 'ALL' row built by ELEMENTWISE ADD over the
    per-group registers — the mergeability that lets a 100 TB store
    keep ~400-row histogram partials per shard and answer any quantile
    later without re-scanning. p50/p90/p99 are read off the cumulative
    register sums at integer target ranks (ceil(q*N) computed as
    (N*qn + qd - 1) div qd — no float rank anywhere) and decoded to
    the bucket's lower bound; the verdict columns pin the structural
    guarantee exact ∈ [est_lo, est_lo + width) with width/est <= 1/16.

    Determinism: coding, registers, cumulative sums, target ranks, and
    decode are ALL exact integer ops; the exact comparison column uses
    ANSI percentile_disc (no interpolation arithmetic — it selects an
    actual data value, so both engines return the identical cent
    amount); the only float op is the rel_err ppm division on shared
    operands.

    Scale shape: ONE fact scan into a map-side-combined (grp, code)
    aggregate bounded by |grps| x ~400 codes; everything downstream
    (merge, cumsum window partitioned by grp, quantile pick, decode)
    runs on that constant-size register table. The exact branch is a
    second scan through percentile_disc — the same cost class as the
    HLL's exact column, kept only for the driver gate; a pure-sketch
    deployment drops it and keeps registers alone."""
    f = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    )
    blen = F.length(F.expr("bin(v)")) - 1
    code = F.when(F.col("v") < 16, F.col("v")).otherwise(
        (blen - 4) * 16 + F.expr("shiftright(v, length(bin(v)) - 1 - 4)")
    )
    coded = f.select("grp", code.cast("bigint").alias("code"))
    regs_g = coded.groupBy("grp", "code").agg(F.count(F.lit(1)).alias("c"))
    regs = regs_g.unionByName(
        regs_g.groupBy("code")
        .agg(F.sum("c").alias("c"))
        .select(F.lit("ALL").alias("grp"), "code", "c")
    )
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("code")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = regs.select(
        "grp",
        "code",
        F.sum("c").over(w_cum).alias("cum_c"),
        F.sum("c").over(Window.partitionBy("grp")).alias("n"),
    )
    qs = F.array(
        *[
            F.struct(
                F.lit(l).alias("label"),
                F.lit(n).alias("qn"),
                F.lit(d).alias("qd"),
            )
            for l, n, d in _HDR_QS
        ]
    )
    hit = (
        cum.select("*", F.explode(qs).alias("q"))
        .select(
            "grp", "code", "cum_c", "n",
            F.col("q.label").alias("label"),
            F.col("q.qn").alias("qn"),
            F.col("q.qd").alias("qd"),
        )
        .select(
            "grp", "code", "cum_c", "n", "label",
            F.expr("(n * qn + qd - 1) div qd").alias("target_rank"),
        )
        .filter(F.col("cum_c") >= F.col("target_rank"))
        .groupBy("grp", "label")
        .agg(
            F.min("code").alias("est_code"),
            F.min("n").alias("n_rows"),
            F.min("target_rank").alias("target_rank"),
        )
    )
    ec = F.col("est_code")
    est_lo = F.when(ec < 16, ec).otherwise(
        F.expr("shiftleft((est_code % 16) + 16, "
               "cast(est_code div 16 as int) + 3 - 4)")
    )
    width = F.when(ec < 16, F.lit(1)).otherwise(
        F.expr("shiftleft(cast(1 as bigint), "
               "cast(est_code div 16 as int) + 3 - 4)")
    )
    dec = hit.select(
        "grp", "label", "n_rows", "target_rank", "est_code",
        est_lo.cast("bigint").alias("est_lo"),
        width.cast("bigint").alias("bucket_width"),
    )
    pd_exprs = [
        F.expr(
            f"cast(percentile_disc({n / d}) within group (order by v) "
            f"as bigint)"
        ).alias(l)
        for l, n, d in _HDR_QS
    ]
    ex_g = f.groupBy("grp").agg(*pd_exprs).unionByName(
        f.agg(*pd_exprs).select(F.lit("ALL").alias("grp"), *[
            F.col(l) for l, _, _ in _HDR_QS
        ])
    )
    ex = None
    for l, _, _ in _HDR_QS:
        part = ex_g.select(
            "grp", F.lit(l).alias("label"), F.col(l).alias("exact_cents")
        )
        ex = part if ex is None else ex.unionByName(part)
    err = F.abs(F.col("est_lo") - F.col("exact_cents"))
    return (
        dec.join(F.broadcast(ex), ["grp", "label"])
        .select(
            "grp", "label",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("target_rank").cast("bigint").alias("target_rank"),
            F.col("est_code").cast("bigint").alias("est_code"),
            F.col("est_lo").cast("bigint").alias("est_lo_cents"),
            F.col("bucket_width").cast("bigint").alias("bucket_width"),
            F.col("exact_cents").cast("bigint").alias("exact_cents"),
            (
                (F.col("exact_cents") >= F.col("est_lo"))
                & (F.col("exact_cents") - F.col("est_lo")
                   < F.col("bucket_width"))
            ).alias("within_bucket"),
            F.round(err * F.lit(1e6) / F.col("exact_cents"))
            .cast("bigint")
            .alias("rel_err_ppm"),
        )
        .orderBy("grp", "label")
    )
