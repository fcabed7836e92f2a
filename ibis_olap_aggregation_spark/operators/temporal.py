"""Temporal-modeling operators: SCD Type-2 dimension build, point-in-
time (interval) join, time-weighted average, Markov transitions.

The reference's dimensions are static snapshots (ref
classes/hierarchy_dimension_table.py builds one CTAS per load); a
warehouse migrating off it at 100 TB needs the temporal counterparts:
an SCD2 dimension derived from a change stream, and the
point-in-time join that reconstructs "which version was true when the
fact happened". These fill SURVEY.md §2's temporal gap with the
standard warehouse formulations.

Determinism: event ordering is (ts, event_id) — event_id is the
fixtures' unique PK (pinned in tests/test_new_ops_properties.py), so
both engines sort identically. Timestamps are emitted as epoch
MICROSECONDS (Spark's load path truncates parquet nanos to µs —
session.load_table — and DuckDB's epoch_us truncates the same way), so
interval bounds hash-compare as exact integers, never as formatted
timestamps.

Scale notes (100 TB):
- every window here partitions by user_id (high-cardinality, even) —
  no single-partition windows anywhere.
- the SCD2 build is two window passes + one aggregate over the change
  stream: one shuffle on user_id, reused by all three stages (the
  run-id pass, the run aggregate, and the lead() for valid_to all
  share the user_id partitioning).
- the point-in-time join is an EQUI-join on user_id with the interval
  predicate as a residual filter: the shuffle key carries the join;
  row amplification is bounded by versions-per-user (run-length
  compressed, << events-per-user).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.queries import dsum, register
from ibis_olap_aggregation_spark.session import load_table

# value-range tiering: the synthetic event values span ~[0, 200);
# thresholds chosen so every tier is populated at sf0.001
_TIER = "CASE WHEN value < 60 THEN 'low' WHEN value < 140 THEN 'mid' ELSE 'high' END"

# Shared oracle prelude: the SCD2 dimension as a CTE chain (tier ->
# change flag -> run id -> run aggregate -> lead() for valid_to).
_SCD2_DIM_SQL = f"""
tiered AS (
  SELECT user_id, ts, event_id, {_TIER} AS tier
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id, tier,
         CASE WHEN LAG(tier) OVER w IS NULL
                OR LAG(tier) OVER w <> tier THEN 1 ELSE 0 END AS chg
  FROM tiered
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, ts, event_id, tier,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM flagged
),
grouped AS (
  SELECT user_id, CAST(run_id AS BIGINT) AS version, tier,
         MIN(ts) AS valid_from_ts, COUNT(*) AS n_events
  FROM runs
  GROUP BY 1, 2, 3
),
scd2 AS (
  SELECT user_id, version, tier,
         epoch_us(valid_from_ts) AS valid_from_us,
         epoch_us(LEAD(valid_from_ts) OVER
           (PARTITION BY user_id ORDER BY version)) AS valid_to_us,
         CAST(n_events AS BIGINT) AS n_events
  FROM grouped
)
"""


def scd2_dim_from(events: DataFrame, with_last: bool = False) -> DataFrame:
    """SCD2 build over an arbitrary events DataFrame: run-length
    compress the per-user tier sequence into [valid_from, valid_to)
    versions (open versions have NULL valid_to). Shared by the batch
    operator below and the streaming maintenance sink
    (streaming/scd2_stream.py) — their equivalence test only means
    something while both run THIS one construction.

    ``with_last=True`` additionally emits ``valid_last_us`` — the
    timestamp of the LAST event counted into each version. The
    streaming sink needs it as a per-user ordering watermark: the open
    version's onset alone cannot detect a late event that interleaves
    AFTER the onset but BEFORE events already counted (ADVICE r7). The
    batch query surface keeps the historical 6-column schema."""
    ev = events.select(
        "user_id", "ts", "event_id", F.expr(_TIER).alias("tier")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "chg",
        F.when(
            F.lag("tier").over(w).isNull() | (F.lag("tier").over(w) != F.col("tier")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    grouped = runs.groupBy(
        "user_id", F.col("run_id").cast("bigint").alias("version"), "tier"
    ).agg(
        F.min("ts").alias("valid_from_ts"),
        F.max("ts").alias("valid_last_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("version")
    cols = [
        F.col("user_id"),
        F.col("version"),
        F.col("tier"),
        F.unix_micros(F.col("valid_from_ts").cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(
            F.lead("valid_from_ts").over(w2).cast("timestamp")
        ).alias("valid_to_us"),
    ]
    if with_last:
        cols.append(
            F.unix_micros(F.col("valid_last_ts").cast("timestamp")).alias(
                "valid_last_us"
            )
        )
    cols.append(F.col("n_events").cast("bigint").alias("n_events"))
    return grouped.select(*cols)


def _scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2_dim_from(load_table(spark, sf_dir, "events"))


@register(
    "scd2_user_tier_dim",
    f"WITH {_SCD2_DIM_SQL} SELECT * FROM scd2",
)
def scd2_user_tier_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build from a change stream: the
    per-user value-tier sequence is run-length compressed into versioned
    [valid_from, valid_to) intervals (half-open; NULL valid_to = current
    version). The classic lag()->change-flag->running-sum run-id
    construction: one shuffle on user_id serves both window passes and
    the run aggregate. Versions are 1-based and contiguous per user;
    intervals tile the user's event span with no gaps or overlaps
    (pinned in tests/test_new_ops_properties.py)."""
    return _scd2_dim(spark, sf_dir)


@register(
    "scd2_point_in_time_join",
    f"""
WITH {_SCD2_DIM_SQL}
SELECT s.tier,
       COUNT(*) AS n_purchases,
       COUNT(DISTINCT p.user_id) AS n_users,
       CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM (SELECT user_id, epoch_us(ts) AS ts_us, value
      FROM events WHERE event_type = 'purchase') p
JOIN scd2 s
  ON s.user_id = p.user_id
 AND p.ts_us >= s.valid_from_us
 AND (s.valid_to_us IS NULL OR p.ts_us < s.valid_to_us)
GROUP BY 1
""",
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: attribute each purchase to the dimension
    version that was TRUE at the purchase's timestamp — the query that
    makes SCD2 worth building. EQUI-join on user_id (the shuffle key);
    the interval predicate is a residual filter, so Catalyst plans a
    hash/sort-merge join, never a nested loop (pinned in
    tests/test_plans.py). Every purchase matches exactly ONE version by
    construction (the intervals tile the event span and purchases ARE
    events), asserted in tests."""
    dim = _scd2_dim(spark, sf_dir)
    p = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "value",
        )
    )
    joined = p.join(
        dim,
        (p.user_id == dim.user_id)
        & (p.ts_us >= dim.valid_from_us)
        & (dim.valid_to_us.isNull() | (p.ts_us < dim.valid_to_us)),
    )
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.countDistinct(p.user_id).alias("n_users"),
        dsum("value", "sum_value"),
    )


@register(
    "events_time_weighted_avg",
    """
WITH stepped AS (
  SELECT user_id, value,
         epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS dt_us
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(dt_us) AS BIGINT) AS span_us,
       ROUND(CAST(SUM(CAST(value * dt_us AS DECIMAL(30,6))) AS DOUBLE)
             / CAST(SUM(dt_us) AS DOUBLE), 6) AS twap
FROM stepped
GROUP BY 1
HAVING SUM(dt_us) > 0
""",
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average over IRREGULARLY sampled values (step-
    function integral / span): each observation holds until the next
    one, so its weight is the µs gap to the successor — the standard
    TWAP over tick-style data that a plain AVG gets wrong whenever
    sampling is bursty.

    Engine shape: one window (lead) partitioned by user_id, then the
    aggregate reuses that partitioning — a single shuffle. The per-row
    product value*dt_us is plain double (deterministic: one IEEE op,
    same operands both engines); only the CROSS-ROW sum routes through
    an exact decimal, because partial-agg ordering is nondeterministic
    (the module-docstring rule in queries.py). Users with a single
    event (zero span) are dropped by the HAVING on both sides."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    stepped = ev.select(
        "user_id",
        "value",
        (
            F.unix_micros(F.lead("ts").over(w).cast("timestamp")) - ts_us
        ).alias("dt_us"),
    )
    return (
        stepped.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("dt_us").cast("bigint").alias("span_us"),
            F.round(
                F.sum((F.col("value") * F.col("dt_us")).cast("decimal(30,6)"))
                .cast("double")
                / F.sum("dt_us").cast("double"),
                6,
            ).alias("twap"),
        )
        .filter(F.col("span_us") > 0)
    )


# Deterministic "late delivery" slice for the merge operator below:
# event_id is the fixtures' unique PK, so the modulus picks a stable
# ~5% of rows on both engines with no randomness surface.
_LATE_MOD, _LATE_REM = 20, 7


@register(
    "scd2_late_arriving_update_merge",
    f"""
WITH {_SCD2_DIM_SQL},
late_users AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_id % {_LATE_MOD} = {_LATE_REM}
)
SELECT s.user_id, s.version, s.tier, s.valid_from_us, s.valid_to_us,
       s.n_events, lu.user_id IS NOT NULL AS rebuilt
FROM scd2 s LEFT JOIN late_users lu ON lu.user_id = s.user_id
""",
)
def scd2_late_arriving_update_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving CDC merge into an SCD2 dimension — the family's
    hardest real case: a batch of events DELIVERED late (here the
    deterministic event_id % 20 == 7 slice, ~5% of rows) was
    missing from the initial dimension build, and their timestamps
    interleave ANYWHERE in history — splitting versions, merging
    adjacent runs, shifting valid_from/valid_to of neighbors. A
    forward-only upsert cannot fix that; the correct maintenance is a
    scoped rebuild.

    Engine shape (the 100 TB pattern): identify AFFECTED users (the
    late batch's distinct user_ids — batch-sized, probed via dim_side),
    keep every untouched user's rows from the EXISTING dimension
    verbatim (left_anti), and re-run the SCD2 construction only over
    the affected users' corrected full history (left_semi on the fact
    stream). In production the base dimension is a STORED table, so
    the incremental cost is the anti-join plus a rebuild scoped to the
    affected users' history — never a full-dimension rebuild; here the
    base dim is reconstructed from the pre-late event slice only
    because the registry query must be self-contained (both the anti-
    and semi-join still ride the user_id key, and the scoped rebuild's
    window shuffle touches only affected users' partitions).

    Correctness contract (the oracle): the merged output must equal the
    dimension REBUILT FROM THE FULL CORRECTED HISTORY, row for row —
    version numbering, interval bounds, and event counts — plus a
    ``rebuilt`` flag marking which users took the incremental path.
    The oracle computes exactly that: the corrected-history SCD2 with
    the affected-user flag joined on (no incremental machinery), so a
    hash match proves merge == rebuild. Interval tiling/contiguity
    invariants are pinned in tests/test_round14_properties.py.
    """
    from ibis_olap_aggregation_spark.session import dim_side

    ev = load_table(spark, sf_dir, "events")
    is_late = (F.col("event_id") % _LATE_MOD) == F.lit(_LATE_REM)
    base_dim = scd2_dim_from(ev.filter(~is_late))
    affected = ev.filter(is_late).select("user_id").distinct()
    side = dim_side(affected, cache_if_probing=True)
    untouched = base_dim.join(side, "user_id", "left_anti").withColumn(
        "rebuilt", F.lit(False)
    )
    corrected = ev.join(side, "user_id", "left_semi")
    merged = scd2_dim_from(corrected).withColumn("rebuilt", F.lit(True))
    return untouched.unionByName(merged)


@register(
    "events_markov_transitions",
    """
WITH seq AS (
  SELECT event_type AS src_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst_type
  FROM events
),
counts AS (
  SELECT src_type, dst_type, COUNT(*) AS n_transitions
  FROM seq WHERE dst_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT src_type, dst_type, n_transitions,
       ROUND(n_transitions / CAST(SUM(n_transitions) OVER
         (PARTITION BY src_type) AS DOUBLE), 6) AS p_transition
FROM counts
""",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: P(next=dst | current=src), the building block of user-
    journey models and synthetic-session generators.

    Engine shape: lead() partitioned by user_id (sequences never cross
    users), COUNT per (src, dst) pair, then the row-normalization
    window partitions by src_type — event-type cardinality is tiny, but
    each partition is already one aggregated row per dst, so the window
    input is |types|^2 rows, not the fact stream."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src_type"),
        F.lead("event_type").over(w).alias("dst_type"),
    )
    counts = (
        seq.filter(F.col("dst_type").isNotNull())
        .groupBy("src_type", "dst_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wnorm = Window.partitionBy("src_type")
    return counts.select(
        "src_type",
        "dst_type",
        "n_transitions",
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(wnorm).cast("double"),
            6,
        ).alias("p_transition"),
    )


@register(
    "events_recency_weighted_value",
    """
WITH anchored AS (
  SELECT user_id, value,
         (epoch_us(MAX(ts) OVER (PARTITION BY user_id)) - epoch_us(ts))
           / 86400000000.0 AS age_days
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value / (1.0 + age_days) AS DECIMAL(28,12)))
                  AS DOUBLE)
             / CAST(SUM(CAST(1.0 / (1.0 + age_days) AS DECIMAL(28,12)))
                    AS DOUBLE), 6) AS recency_weighted_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS plain_avg
FROM anchored
GROUP BY 1
""",
)
def events_recency_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted mean per user: each observation weighted by the
    HYPERBOLIC decay 1/(1 + age_days) relative to the user's latest
    event — the time-decay signal behind churn scores and freshness-
    weighted features. The rational decay is chosen deliberately over
    exp(-lambda*t): division is an exact IEEE op with cross-engine
    bit-parity, where libm exp() may differ by an ulp between engines
    (the float-determinism rule from SURVEY §7.5.2); a 1-ulp weight
    difference inside a nondeterministically-ordered SUM would poison
    the hash compare.

    Engine shape: one shuffle on user_id shared by the anchor window
    (MAX ts per user) and the final aggregate; per-row weights are plain
    double arithmetic, cross-row sums route through DECIMAL. The
    plain_avg column sits alongside as the contrast (weighting must
    move the estimate; asserted in tests)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    anchor_us = F.unix_micros(F.max("ts").over(w).cast("timestamp"))
    anchored = ev.select(
        "user_id",
        "value",
        ((anchor_us - ts_us) / F.lit(86400000000.0)).alias("age_days"),
    )
    decay = F.lit(1.0) / (F.lit(1.0) + F.col("age_days"))
    return anchored.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum((F.col("value") / (F.lit(1.0) + F.col("age_days"))).cast(
                "decimal(28,12)"
            )).cast("double")
            / F.sum(decay.cast("decimal(28,12)")).cast("double"),
            6,
        ).alias("recency_weighted_value"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("plain_avg"),
    )


@register(
    "events_path_trigrams",
    """
WITH seq AS (
  SELECT event_type AS t1,
         LEAD(event_type, 1) OVER w AS t2,
         LEAD(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tri AS (
  SELECT t1, t2, t3, COUNT(*) AS n
  FROM seq WHERE t3 IS NOT NULL
  GROUP BY 1, 2, 3
)
SELECT t1, t2, t3, n,
       ROUND(n / CAST(SUM(n) OVER () AS DOUBLE), 6) AS share
FROM tri
ORDER BY n DESC, t1, t2, t3
LIMIT 15
""",
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining lite: the top 15 three-step event-type
    paths across user journeys, with each path's share of all observed
    trigrams — the n-gram extension of the 1-step Markov matrix (what
    journey templates actually look like, not just pairwise hops).

    Two stacked lead() offsets share ONE user-partitioned window (one
    shuffle); the share normalization windows over the |types|^3-bounded
    aggregate, so its single partition holds at most cubed-cardinality
    rows, never the event stream."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    tri = (
        seq.filter(F.col("t3").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wall = Window.partitionBy()
    out = tri.select(
        "t1",
        "t2",
        "t3",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(wall).cast("double"), 6
        ).alias("share"),
    )
    return out.orderBy(F.col("n").desc(), "t1", "t2", "t3").limit(15)


@register(
    "events_funnel_latency",
    """
WITH first_view AS (
  SELECT user_id, MIN(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY 1
),
conv AS (
  SELECT e.user_id,
         (epoch_us(MIN(e.ts)) - epoch_us(f.v_ts)) / 1e6 AS latency_s
  FROM events e
  JOIN first_view f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > f.v_ts
  GROUP BY e.user_id, f.v_ts
)
SELECT COUNT(*) AS n_converted,
       ROUND(quantile_cont(latency_s, 0.5), 6) AS p50_latency_s,
       ROUND(quantile_cont(latency_s, 0.9), 6) AS p90_latency_s,
       ROUND(CAST(SUM(CAST(latency_s AS DECIMAL(24,6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_latency_s
FROM conv
""",
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion LATENCY distribution: time from a user's first view
    to their first subsequent purchase — the funnel family reports
    conversion RATES (events_funnel_click_purchase); the latency
    percentiles are what capacity and attribution models consume.

    Both 'first event' reductions are min-aggregates keyed on user_id
    (one shuffle each, map-side combined); the strictly-after condition
    rides the join as a residual filter on the user_id equi-join. The
    final percentile is one global aggregate over the converted-user
    set (user-bounded)."""
    ev = load_table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    pur = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    conv = (
        pur.join(fv, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id", "v_ts")
        .agg(F.min("ts").alias("p_ts"))
        .select(
            (
                (
                    F.unix_micros(F.col("p_ts").cast("timestamp"))
                    - F.unix_micros(F.col("v_ts").cast("timestamp"))
                )
                / F.lit(1e6)
            ).alias("latency_s")
        )
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(latency_s, 0.5)"), 6).alias("p50_latency_s"),
        F.round(F.expr("percentile(latency_s, 0.9)"), 6).alias("p90_latency_s"),
        F.round(
            F.sum(F.col("latency_s").cast("decimal(24,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_latency_s"),
    )


@register(
    "events_user_entropy",
    """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
packed AS (
  SELECT user_id,
         CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         list(CAST(c AS DOUBLE) ORDER BY event_type) AS cs
  FROM counts GROUP BY 1
)
SELECT user_id, n_events, n_types,
       ROUND(list_reduce(
               list_transform(cs, c -> -(c / n_events) * ln(c / n_events)),
               (acc, x) -> acc + x), 6) AS type_entropy
FROM packed
""",
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity feature (0 = single-type bot-like streams,
    ln(|types|) = uniform usage) that mixing and anomaly models consume.

    Determinism: entropy is a sum of per-type float terms, and a plain
    SUM would accumulate them in partial-agg order. Instead the per-user
    type counts are packed into an array SORTED BY TYPE NAME and folded
    sequentially — Spark's aggregate() and DuckDB's list_reduce are both
    acc-first left folds (the probe-verified round-6 rule), so the
    addition order is FIXED and identical cross-engine. Per-user arrays
    are |types|-bounded (tiny); one shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    packed = counts.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.expr(
            "transform(array_sort(collect_list(struct(event_type, "
            "cast(c as double) as cd))), s -> s.cd)"
        ).alias("cs"),
    )
    return packed.select(
        "user_id",
        "n_events",
        "n_types",
        F.round(
            F.expr(
                "aggregate(slice(cs, 2, size(cs) - 1), "
                "-(element_at(cs, 1) / n_events) * ln(element_at(cs, 1) / n_events), "
                "(acc, x) -> acc + (-(x / n_events) * ln(x / n_events)))"
            ),
            6,
        ).alias("type_entropy"),
    )


@register(
    "events_attribution_last_touch",
    """
WITH tagged AS (
  SELECT user_id, event_type, value, ts, event_id,
         LAG(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS last_touch
  FROM events
)
SELECT COALESCE(last_touch, '(none)') AS channel,
       COUNT(*) AS n_purchases,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value,
       ROUND(COUNT(*) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6) AS share
FROM tagged
WHERE event_type = 'purchase'
GROUP BY 1
""",
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH attribution: every purchase is credited to the most
    recent preceding NON-purchase event type in the user's stream — the
    marketing-analytics workhorse, and the IGNORE NULLS lag pattern
    (carry the last interesting row forward past uninteresting ones)
    that plain lag() cannot express.

    One user-partitioned window over the event stream; the attribution
    aggregate and its share normalization run over channel-cardinality
    rows. Purchases with no preceding touch credit '(none)' on both
    engines (COALESCE, not a dropped row — conservation is tested)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Spark spells "previous non-null" as last(..., ignorenulls) over a
    # preceding-rows frame; DuckDB as LAG(... IGNORE NULLS) — identical
    # semantics over the identical (ts, event_id) order
    tagged = ev.withColumn(
        "last_touch",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w.rowsBetween(Window.unboundedPreceding, -1)),
    )
    pur = tagged.filter(F.col("event_type") == "purchase")
    wall = Window.partitionBy()
    out = pur.groupBy(
        F.coalesce(F.col("last_touch"), F.lit("(none)")).alias("channel")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        dsum("value", "attributed_value"),
    )
    return out.select(
        "channel",
        "n_purchases",
        "attributed_value",
        F.round(
            F.col("n_purchases") / F.sum("n_purchases").over(wall).cast("double"),
            6,
        ).alias("share"),
    )


@register(
    "events_max_drawdown",
    """
WITH r AS (
  SELECT user_id, value,
         MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run_max
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       ROUND(MAX(value), 6) AS peak_value,
       ROUND(MAX(run_max - value), 6) AS max_drawdown,
       ROUND(MAX((run_max - value) / run_max), 6) AS max_drawdown_frac
FROM r
GROUP BY 1
""",
)
def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user over the time-ordered value series —
    the canonical peak-to-trough risk metric (largest drop from a
    running maximum), which no plain aggregate expresses because the
    peak must PRECEDE the trough.

    Fully order-statistic: a running MAX window, a per-row subtraction/
    division, and MAX aggregates — no floating-point summation anywhere,
    so cross-engine parity needs no decimal routing at all (max/min are
    order-free). One shuffle on user_id shared by the window and the
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = ev.select(
        "user_id", "value", F.max("value").over(w).alias("run_max")
    )
    dd = F.col("run_max") - F.col("value")
    return r.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.max("value"), 6).alias("peak_value"),
        F.round(F.max(dd), 6).alias("max_drawdown"),
        F.round(F.max(dd / F.col("run_max")), 6).alias("max_drawdown_frac"),
    )


# ---------------------------------------------------------------------------
# Interval analytics: overlap (range) join + concurrency sweep
# ---------------------------------------------------------------------------
#
# Shipping windows [l_shipdate, l_shipdate + 7 days) per supplier — the
# interval workload the brief's "range join" operator family names.
# Two complementary primitives:
# - the OVERLAP JOIN enumerates intersecting interval pairs. Spark has
#   no interval-join operator, and the naive non-equi join is a
#   per-supplier cross product; the scalable decomposition assigns each
#   interval to every fixed-width time BUCKET it touches, equi-joins on
#   (supplier, bucket), dedups pairs found in multiple buckets, and
#   applies the exact overlap predicate as a residual. Per-task work is
#   bounded by intervals-per-(supplier, bucket); nothing is ever
#   all-pairs. The DuckDB oracle states the plain non-equi semantics,
#   so the hash match PROVES the bucketed decomposition exact.
# - MAX CONCURRENCY answers "how many windows are open at once" WITHOUT
#   enumerating pairs at all: the classic +1/-1 boundary sweep, a
#   per-supplier running sum over 2x|intervals| boundary rows. At equal
#   timestamps closings sort before openings (half-open intervals), and
#   within a tied block all deltas are equal, so the multiset of prefix
#   values — hence the MAX — is tie-order independent in both engines.

_SHIP_DAYS = 7
_BUCKET_DAYS = 14

_OVERLAP_SQL = f"""
WITH iv AS (
  SELECT l_suppkey AS supp,
         CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS s
  FROM lineitem
),
g AS (
  SELECT supp, s, COUNT(*) AS c FROM iv GROUP BY 1, 2
),
contrib AS (
  -- doubled contributions (halved at the end): same-start shipments
  -- pair within their group (full 7-day overlap), distinct starts pair
  -- across groups with multiplicity ca*cb
  SELECT supp, c * (c - 1) AS n2, {_SHIP_DAYS} * c * (c - 1) AS ov2 FROM g
  UNION ALL
  SELECT a.supp, 2 * a.c * b.c,
         2 * a.c * b.c * (a.s + {_SHIP_DAYS} - b.s)
  FROM g a
  JOIN g b ON a.supp = b.supp AND b.s > a.s AND b.s < a.s + {_SHIP_DAYS}
)
SELECT supp AS l_suppkey,
       CAST(SUM(n2) / 2 AS BIGINT) AS n_overlapping_pairs,
       CAST(SUM(ov2) / 2 AS BIGINT) AS sum_overlap_days,
       ROUND(CAST(SUM(ov2) AS DOUBLE) / SUM(n2), 6) AS avg_overlap_days
FROM contrib
GROUP BY 1
HAVING SUM(n2) > 0
ORDER BY 1
"""


@register("interval_overlap_pairs", _OVERLAP_SQL)
def interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap join (range join) via time-bucket equi-join —
    see the section comment for the decomposition and why the oracle's
    plain non-equi join proves it exact. Pairing runs at the
    (supplier, start, multiplicity) GRAIN, not the row grain: the
    testdata has no unique lineitem key (synthetic (orderkey,
    linenumber) collides), and identical intervals pair arithmetically
    anyway — C(c,2) within a start, ca*cb across starts — which also
    shrinks the join input to distinct starts. Each start lands in
    every {_BUCKET_DAYS}-day bucket its window touches (a 7-day window
    touches at most 2), start pairs are equi-joined on (supplier,
    bucket) and deduped, the strict overlap predicate is the
    residual."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("supp"),
        F.unix_date(F.col("l_shipdate").cast("date")).cast("bigint").alias("s"),
    )
    g = li.groupBy("supp", "s").agg(F.count(F.lit(1)).alias("c"))
    within = g.select(
        "supp",
        (F.col("c") * (F.col("c") - 1)).alias("n2"),
        (F.lit(_SHIP_DAYS) * F.col("c") * (F.col("c") - 1)).alias("ov2"),
    )
    e = F.col("s") + F.lit(_SHIP_DAYS)  # exclusive end
    gb = g.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                (F.col("s") / _BUCKET_DAYS).cast("bigint"),
                ((e - 1) / _BUCKET_DAYS).cast("bigint"),
            )
        ),
    )
    a = gb.select(
        "supp", "bucket", F.col("s").alias("a_s"), F.col("c").alias("a_c")
    )
    b = gb.select(
        "supp", "bucket", F.col("s").alias("b_s"), F.col("c").alias("b_c")
    )
    cross = (
        a.join(b, ["supp", "bucket"])
        .filter(
            (F.col("b_s") > F.col("a_s"))
            & (F.col("b_s") < F.col("a_s") + _SHIP_DAYS)
        )
        # a start pair straddling a bucket boundary is found in both
        .select("supp", "a_s", "b_s", "a_c", "b_c")
        .distinct()
        .select(
            "supp",
            (2 * F.col("a_c") * F.col("b_c")).alias("n2"),
            (
                2
                * F.col("a_c")
                * F.col("b_c")
                * (F.col("a_s") + _SHIP_DAYS - F.col("b_s"))
            ).alias("ov2"),
        )
    )
    return (
        within.unionAll(cross)
        .groupBy(F.col("supp").alias("l_suppkey"))
        .agg(
            (F.sum("n2") / 2).cast("bigint").alias("n_overlapping_pairs"),
            (F.sum("ov2") / 2).cast("bigint").alias("sum_overlap_days"),
            F.round(
                F.sum("ov2").cast("double") / F.sum("n2"), 6
            ).alias("avg_overlap_days"),
        )
        .filter(F.col("n_overlapping_pairs") > 0)
        .orderBy("l_suppkey")
    )


_CONCURRENCY_SQL = f"""
WITH iv AS (
  SELECT l_suppkey AS supp,
         CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS s
  FROM lineitem
),
bounds AS (
  SELECT supp, s AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT supp, s + {_SHIP_DAYS}, -1 FROM iv
),
sweep AS (
  SELECT supp,
         SUM(delta) OVER (PARTITION BY supp ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS open_now
  FROM bounds
)
SELECT supp AS l_suppkey,
       (SELECT COUNT(*) FROM iv i WHERE i.supp = sweep.supp) AS n_shipments,
       CAST(MAX(open_now) AS BIGINT) AS max_concurrent
FROM sweep
GROUP BY supp
ORDER BY 1
"""


@register("interval_max_concurrency", _CONCURRENCY_SQL)
def interval_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of simultaneously open shipping windows per supplier
    — the interval-stabbing maximum via the +1/-1 boundary sweep (no
    pair enumeration: 2 boundary rows per interval, one per-supplier
    running sum). Half-open [s, s+7d): a window closing at t and one
    opening at t do NOT overlap, enforced by sorting closings (-1)
    before openings (+1) at equal t."""
    iv = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("supp"),
        F.unix_date(F.col("l_shipdate").cast("date")).cast("bigint").alias("s"),
    )
    bounds = iv.select(
        "supp", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select(
            "supp",
            (F.col("s") + _SHIP_DAYS).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    w = Window.partitionBy("supp").orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sweep = bounds.select("supp", F.sum("delta").over(w).alias("open_now"))
    peaks = sweep.groupBy("supp").agg(
        F.max("open_now").cast("bigint").alias("max_concurrent")
    )
    counts = iv.groupBy("supp").agg(F.count(F.lit(1)).alias("n_shipments"))
    return (
        peaks.join(counts, "supp")
        .select(
            F.col("supp").alias("l_suppkey"), "n_shipments", "max_concurrent"
        )
        .orderBy("l_suppkey")
    )


_COVERAGE_SQL = f"""
WITH iv AS (
  SELECT DISTINCT l_suppkey AS supp,
         CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS s
  FROM lineitem
),
m AS (
  SELECT supp, s,
         CASE WHEN lag(s) OVER (PARTITION BY supp ORDER BY s) IS NULL
              OR s - lag(s) OVER (PARTITION BY supp ORDER BY s)
                   > {_SHIP_DAYS}
              THEN 1 ELSE 0 END AS brk
  FROM iv
),
isl AS (
  SELECT supp, s,
         SUM(brk) OVER (PARTITION BY supp ORDER BY s
                        ROWS UNBOUNDED PRECEDING) AS isl_id
  FROM m
),
per AS (
  SELECT supp, isl_id, MAX(s) + {_SHIP_DAYS} - MIN(s) AS covered
  FROM isl GROUP BY 1, 2
),
sp AS (
  SELECT supp, MAX(s) + {_SHIP_DAYS} - MIN(s) AS span FROM iv GROUP BY 1
)
SELECT per.supp AS l_suppkey,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(per.covered) AS BIGINT) AS covered_days,
       CAST(MAX(sp.span) AS BIGINT) AS span_days,
       ROUND(CAST(SUM(per.covered) AS DOUBLE) / MAX(sp.span), 6)
         AS coverage_ratio
FROM per JOIN sp ON sp.supp = per.supp
GROUP BY 1
ORDER BY 1
"""


@register("interval_coverage_fraction", _COVERAGE_SQL)
def interval_coverage_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier activity coverage: each shipment opens a
    {_SHIP_DAYS}-day busy interval; merge the overlapping/adjoining
    intervals into islands (gaps-and-islands over the sorted starts —
    with equal-length intervals an island breaks exactly when the gap
    between consecutive starts exceeds the width) and report how much
    of the supplier's observed span [first start, last start + width)
    the merged intervals cover. The utilization/uptime profile an SLA
    or capacity review reads; completes the interval family next to
    pairwise overlap, max concurrency and daily backlog.

    All arithmetic is integer epoch-days until the final ratio (one
    double division of two integers). Scale shape: one distinct over
    (supplier, day), then every window and aggregate partitions on the
    supplier key — a single shuffle of the distinct-day set, output at
    supplier grain."""
    iv = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_suppkey").alias("supp"),
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("s"),
        )
        .distinct()
    )
    w = Window.partitionBy("supp").orderBy("s")
    brk = F.when(
        F.lag("s").over(w).isNull()
        | ((F.col("s") - F.lag("s").over(w)) > _SHIP_DAYS),
        1,
    ).otherwise(0)
    isl = iv.withColumn("brk", brk).withColumn(
        "isl_id",
        F.sum("brk").over(
            Window.partitionBy("supp").orderBy("s").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    per = isl.groupBy("supp", "isl_id").agg(
        (F.max("s") + _SHIP_DAYS - F.min("s")).alias("covered")
    )
    sp = iv.groupBy("supp").agg(
        (F.max("s") + _SHIP_DAYS - F.min("s")).alias("span")
    )
    return (
        per.groupBy("supp")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("covered").alias("covered_days"),
        )
        .join(sp, "supp")
        .select(
            F.col("supp").alias("l_suppkey"),
            "n_islands",
            "covered_days",
            F.col("span").alias("span_days"),
            F.round(F.col("covered_days") / F.col("span"), 6).alias(
                "coverage_ratio"
            ),
        )
        .orderBy("l_suppkey")
    )


# -- round 14c: as-of join (the trades-to-quotes primitive) ------------------

# Backward tolerance for the as-of match: a purchase older than this is
# "stale context" and the click reports no match. 30 days in µs.
_ASOF_TOL_US = 30 * 86_400 * 1_000_000


@register(
    "join_asof_backward",
    f"""
WITH probe AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'click'
),
build AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
  FROM events WHERE event_type = 'purchase'
),
cand AS (
  SELECT p.event_id AS click_event_id,
         p.user_id AS user_id,
         p.ts_us AS click_ts_us,
         b.event_id AS purchase_event_id,
         b.value AS purchase_value,
         p.ts_us - b.ts_us AS gap_us
  FROM probe p
  LEFT JOIN build b
    ON b.user_id = p.user_id AND b.ts_us <= p.ts_us
  QUALIFY row_number() OVER (
    PARTITION BY p.event_id
    ORDER BY b.ts_us DESC, b.event_id DESC
  ) = 1
)
SELECT click_event_id, user_id, click_ts_us,
       CASE WHEN gap_us <= {_ASOF_TOL_US} THEN purchase_event_id END
         AS purchase_event_id,
       CASE WHEN gap_us <= {_ASOF_TOL_US} THEN purchase_value END
         AS purchase_value,
       CASE WHEN gap_us <= {_ASOF_TOL_US} THEN gap_us END AS gap_us
FROM cand
ORDER BY click_event_id
""",
)
def join_asof_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join — the trades-to-quotes primitive the
    reference's equi-join surface (ref main.py:36 is its only join
    shape) cannot express: each click is matched to the LATEST purchase
    by the same user at-or-before the click, within a 30-day tolerance.
    Ties at the same timestamp resolve to the larger event_id (the
    fixtures' unique PK), so the match is total-ordered and
    deterministic on both engines.

    Relation to the events-family as-ofs (events_asof_prev_error /
    events_asof_tolerance, which pioneered the union+window shape
    here): this is the JOIN-surface form — it carries the matched BUILD
    ROW'S PAYLOAD (purchase event_id + value, not just a timestamp
    delta), pins the same-timestamp tie order by PK, and its DuckDB
    oracle is an INDEPENDENT all-pairs LEFT JOIN + QUALIFY formulation
    rather than a mirror of the window construction — so the driver
    gate cross-checks the algorithm itself, not a shared reading.

    Engine shape — NO JOIN AT ALL: both sides union into one stream
    tagged build=0 / probe=1, ONE shuffle on user_id, and a single
    running ``last(ignorenulls)`` window ordered by (ts, side,
    event_id) carries the latest build row forward into each probe row.
    This is the scalable as-of: cost is one exchange + one sort of
    |build|+|probe|, with zero row amplification — the all-pairs
    candidate set the oracle's LEFT JOIN materializes (bounded only by
    purchases-per-user) never exists here. The 30-day tolerance is a
    post-filter on the single carried candidate, which is EXACTLY
    equivalent to filtering before the match: any build row older than
    the carried latest one is older still.

    Determinism: timestamps compare as epoch-µs BIGINTs (the module's
    parquet-truncation convention); purchase_value passes through
    untouched; gap_us is integer subtraction."""
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    build = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        ts_us.alias("ts_us"),
        F.lit(0).alias("side"),
        F.col("event_id").alias("b_event_id"),
        F.col("value").alias("b_value"),
        F.lit(None).cast("bigint").alias("p_event_id"),
    )
    probe = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        ts_us.alias("ts_us"),
        F.lit(1).alias("side"),
        F.lit(None).cast("bigint").alias("b_event_id"),
        F.lit(None).cast("double").alias("b_value"),
        F.col("event_id").alias("p_event_id"),
    )
    # (ts, side, event_id) ordering puts build rows BEFORE probe rows at
    # equal ts (as-of includes equality) and the largest build event_id
    # last among same-ts builds (tie winner under last()).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "side", F.coalesce("b_event_id", "p_event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE carried struct, not parallel per-column windows: three
    # independent last(ignorenulls) calls would desynchronize on a
    # build row whose VALUE is NULL (the event_id window picks it, the
    # value window skips past it to an older row — a frankenrow the
    # oracle's intact-row LEFT JOIN can never emit). The struct is
    # non-null exactly for build rows, NULL fields and all, so every
    # probe row carries one intact build row or nothing (code-review
    # r14c).
    b_row = F.when(
        F.col("side") == 0,
        F.struct(
            F.col("ts_us").alias("ts_us"),
            F.col("b_event_id").alias("event_id"),
            F.col("b_value").alias("value"),
        ),
    )
    carried = (
        build.unionByName(probe)
        .withColumn("m", F.last(b_row, ignorenulls=True).over(w))
        .withColumn("m_event_id", F.col("m.event_id"))
        .withColumn("m_value", F.col("m.value"))
        .withColumn("m_ts_us", F.col("m.ts_us"))
        .filter(F.col("side") == 1)
    )
    gap = F.col("ts_us") - F.col("m_ts_us")
    ok = gap <= _ASOF_TOL_US
    return carried.select(
        F.col("p_event_id").alias("click_event_id"),
        "user_id",
        F.col("ts_us").alias("click_ts_us"),
        F.when(ok, F.col("m_event_id")).alias("purchase_event_id"),
        F.when(ok, F.col("m_value")).alias("purchase_value"),
        F.when(ok, gap).cast("bigint").alias("gap_us"),
    ).orderBy("click_event_id")
