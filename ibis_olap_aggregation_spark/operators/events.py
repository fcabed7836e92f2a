"""Event/time-series operators over the `events` table.

The reference has no streaming/temporal surface (SURVEY.md §2.10) — these
are the §7.4 extensions: tumbling/sliding/session windows, event dedup,
as-of (nearest-previous) join, JSON extraction. Each query here is the
BATCH form with a DuckDB oracle; the true Structured Streaming forms
(watermarks, late data) live in ibis_olap_aggregation_spark/streaming and
are covered by dedicated tests (streaming DataFrames cannot be collected
by the driver's oracle gate).

Scale notes (100 TB):
- window/groupBy aggregations are hash aggs with map-side partial
  aggregation — one shuffle on (window, keys), no driver data.
- sessionization uses a window partitioned by user_id: the shuffle is on
  user_id (high cardinality → even distribution), never a global window.
- the as-of join is the union-tag + last(ignorenulls) pattern: one shuffle
  on user_id, linear scan per partition — no range-join blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.queries import dsum, register
from ibis_olap_aggregation_spark.session import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "events_tumbling_window",
    """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       COUNT(*) AS event_count,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       COUNT(DISTINCT user_id) AS distinct_users
FROM events
GROUP BY 1, 2
""",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows: count / sum / distinct users per type.

    Batch twin of streaming tumbling-window agg (F.window also drives the
    withWatermark streaming form in streaming/engine.py).
    """
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            dsum("value", "sum_value"),
            F.countDistinct("user_id").alias("distinct_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
            "sum_value",
            "distinct_users",
        )
    )


@register(
    "events_sliding_window",
    """
WITH exploded AS (
  SELECT e.*,
         time_bucket(INTERVAL '30 minutes', e.ts) - k.k * INTERVAL '30 minutes'
           AS window_start
  FROM events e
  CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k) k
)
SELECT window_start,
       COUNT(*) AS event_count,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM exploded
GROUP BY 1
""",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1-hour width, 30-minute slide (each event lands in
    exactly 2 windows). F.window handles the window replication JVM-side."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            dsum("value", "sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_count",
            "sum_value",
        )
    )


@register(
    "events_session_window",
    """
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
),
sessions AS (
  SELECT *, SUM(is_new_session)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM marked
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       COUNT(*) AS event_count,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, session_seq
""",
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap, via the native
    F.session_window (same operator Structured Streaming uses for
    stateful sessionization; here in batch mode).

    session_window.end = last event ts + gap, matching the gap-based
    lag/cumulative-sum formulation in the oracle.
    """
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            dsum("value", "sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "event_count",
            "sum_value",
        )
    )


@register(
    "events_dedup_exact",
    """
SELECT user_id, event_type, COUNT(*) AS n
FROM (SELECT DISTINCT user_id, event_type, ts FROM events)
GROUP BY 1, 2
""",
)
def events_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact event dedup on (user_id, event_type, ts) — the batch twin of
    streaming dropDuplicatesWithinWatermark — then a count per key."""
    ev = _events(spark, sf_dir)
    return (
        ev.select("user_id", "event_type", "ts")
        .dropDuplicates(["user_id", "event_type", "ts"])
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


BURST_CAP = 3  # events kept per (user, minute)


@register(
    "events_burst_cap",
    f"""
WITH r AS (
  SELECT user_id,
         row_number() OVER (
           PARTITION BY user_id, time_bucket(INTERVAL '1 minute', ts)
           ORDER BY ts, event_id) AS rk
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN rk <= {BURST_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN rk > {BURST_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       CAST(MAX(rk) AS BIGINT) AS max_burst
FROM r
GROUP BY 1
""",
)
def events_burst_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst capping / rate limiting at ingestion: keep at most
    {BURST_CAP} events per (user, minute), deterministically (earliest
    by (ts, event_id) win), and report per user how much a cap would
    drop plus the worst observed burst. The standard abuse/bot damper in
    front of an event warehouse — and a shape Spark executes with ONE
    shuffle on (user_id, minute-bucket): the rank window partitions by
    the composite key, so no user's full history ever sits in one task
    (contrast a per-user global rank at 100 TB)."""
    ev = _events(spark, sf_dir)
    minute = F.window("ts", "1 minute")["start"]
    w = Window.partitionBy("user_id", "_minute").orderBy("ts", "event_id")
    r = ev.withColumn("_minute", minute).withColumn(
        "rk", F.row_number().over(w)
    )
    return r.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("rk") <= BURST_CAP, 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.when(F.col("rk") > BURST_CAP, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dropped"),
        F.max("rk").cast("bigint").alias("max_burst"),
    )


@register(
    "events_asof_prev_error",
    """
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'error' THEN ts END AS error_ts
  FROM events
  WHERE event_type IN ('click', 'error')
),
filled AS (
  SELECT *,
         last_value(error_ts IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS prev_error_ts
  FROM tagged
)
SELECT user_id, event_id AS click_event_id, ts AS click_ts,
       epoch_us(prev_error_ts) AS prev_error_micros,
       epoch_us(ts) - epoch_us(prev_error_ts) AS micros_since_error
FROM filled
WHERE event_type = 'click'
""",
)
def events_asof_prev_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every click, the most recent prior error by the
    same user. Union-tag + last(ignorenulls) over a user-partitioned
    window — ONE shuffle on user_id, no range-join explosion (the naive
    theta-join alternative is O(clicks x errors) per user)."""
    ev = _events(spark, sf_dir).filter(F.col("event_type").isin("click", "error"))
    tagged = ev.withColumn(
        "error_ts", F.when(F.col("event_type") == "error", F.col("ts"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.withColumn(
        "prev_error_ts", F.last("error_ts", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
        F.unix_micros(F.col("prev_error_ts").cast("timestamp")).alias(
            "prev_error_micros"
        ),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("prev_error_ts").cast("timestamp"))
        ).alias("micros_since_error"),
    )


@register(
    "events_json_extract",
    """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY 1
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (props is a JSON string column) +
    aggregate. get_json_object stays JVM-side (no UDF)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint"))
        .cast("bigint")
        .alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "events_funnel_click_purchase",
    """
WITH clicks AS (
  SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
),
first_purchase AS (
  SELECT c.user_id, c.click_ts,
         MIN(p.ts) AS purchase_ts
  FROM clicks c
  JOIN events p
    ON p.user_id = c.user_id AND p.event_type = 'purchase'
   AND p.ts > c.click_ts AND p.ts <= c.click_ts + INTERVAL '2 hours'
  GROUP BY 1, 2
)
SELECT COUNT(*) AS n_clicks,
       (SELECT COUNT(*) FROM first_purchase) AS n_converted,
       CAST((SELECT COUNT(*) FROM first_purchase) AS DOUBLE) / COUNT(*)
         AS conversion_rate
FROM clicks
""",
)
def events_funnel_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: clicks converting to a purchase within 2 hours
    (same user). The conversion join is an interval join on the user key
    — equi on user_id with a time-bound residual, so it shuffles once on
    the (high-cardinality) user, never a cross join. A streaming twin is
    interval_join_streams in streaming/engine.py."""
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("click_ts"))
            & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 2 hours")),
        )
        .groupBy("user_id", "click_ts")
        .agg(F.min("p_ts").alias("purchase_ts"))
    )
    n_clicks = clicks.count()
    n_conv = converted.count()
    return spark.createDataFrame(
        [(n_clicks, n_conv, float(n_conv) / n_clicks)],
        "n_clicks bigint, n_converted bigint, conversion_rate double",
    )


@register(
    "events_retention_cohorts",
    """
WITH act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
),
firsts AS (
  SELECT user_id, MIN(wk) AS cohort_week FROM act GROUP BY 1
),
ret AS (
  SELECT f.cohort_week,
         CAST(date_diff('day', f.cohort_week, a.wk) // 7 AS BIGINT) AS week_offset,
         COUNT(*) AS n_users
  FROM act a JOIN firsts f ON f.user_id = a.user_id
  GROUP BY 1, 2
),
base AS (SELECT cohort_week, n_users AS cohort_size FROM ret WHERE week_offset = 0)
SELECT r.cohort_week, r.week_offset, r.n_users,
       ROUND(r.n_users / b.cohort_size, 6) AS retention_rate
FROM ret r JOIN base b ON b.cohort_week = r.cohort_week
""",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted
    again at each later week they return — the (cohort week, offset)
    retention triangle with rates against the cohort's own size.

    Scale shape: activity dedups to (user, week) with map-side combine
    (one shuffle on user_id); firsts is a groupBy on the SAME key — AQE
    reuses the partitioning, no second full shuffle; the triangle and
    the offset-0 base are cohort-week-sized (tiny) -> broadcast join."""
    ev = _events(spark, sf_dir)
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    firsts = act.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    ret = (
        act.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    base = ret.filter(F.col("week_offset") == 0).select(
        F.col("cohort_week").alias("_cw"), F.col("n_users").alias("cohort_size")
    )
    return (
        ret.join(F.broadcast(base), ret["cohort_week"] == base["_cw"])
        .select(
            "cohort_week",
            "week_offset",
            "n_users",
            F.round(F.col("n_users") / F.col("cohort_size"), 6).alias(
                "retention_rate"
            ),
        )
    )


@register(
    "events_hourly_anomaly",
    """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, hour, n,
         COUNT(*) OVER w AS k,
         CAST(SUM(n) OVER w AS DOUBLE) AS s1,
         CAST(SUM(n * n) OVER w AS DOUBLE) AS s2
  FROM hourly
  WINDOW w AS (PARTITION BY event_type)
),
z AS (
  SELECT event_type, hour, n,
         (n - s1 / k) / sqrt((s2 - s1 * s1 / k) / (k - 1)) AS zv
  FROM m
  WHERE k > 1 AND (s2 - s1 * s1 / k) > 0
)
SELECT event_type, hour, n, ROUND(zv, 4) AS z_r
FROM z WHERE abs(zv) >= 2
""",
)
def events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: hours whose event count sits >= 2
    standard deviations from that event type's hourly mean — the ops
    query behind traffic-spike/outage alerting, and the batch twin of a
    streaming rate monitor.

    Moments are computed from EXACT integer window sums (counts < 2^53
    are exactly representable, so s1/s2 are bit-identical doubles on
    both engines and the z comparison cannot diverge at the threshold —
    engine-native stddev_samp implementations are not guaranteed to
    agree in the last ulp). One aggregation + one window over
    event_type: two shuffles at any scale."""
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type")
    m = (
        hourly.withColumn("k", F.count(F.lit(1)).over(w))
        .withColumn("s1", F.sum("n").over(w).cast("double"))
        # wide sum (oracle hugeint): sum of squared hourly counts
        # passes 2^63 once hours run ~1e8 events (the Spearman lesson)
        .withColumn(
            "s2",
            F.sum((F.col("n") * F.col("n")).cast("decimal(38,0)"))
            .over(w)
            .cast("double"),
        )
    )
    var_num = F.col("s2") - F.col("s1") * F.col("s1") / F.col("k")
    z = (F.col("n") - F.col("s1") / F.col("k")) / F.sqrt(
        var_num / (F.col("k") - 1)
    )
    return (
        m.filter((F.col("k") > 1) & (var_num > 0))
        .withColumn("zv", z)
        .filter(F.abs(F.col("zv")) >= 2)
        .select("event_type", "hour", "n", F.round("zv", 4).alias("z_r"))
    )


@register(
    "events_gapfill_hourly",
    """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
),
grid AS (
  SELECT t.event_type, g.h AS hour
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT unnest(generate_series((SELECT lo FROM bounds),
                                  (SELECT hi FROM bounds),
                                  INTERVAL '1 hour')) AS h
  ) g
)
SELECT gr.event_type, gr.hour,
       COALESCE(h.n, 0) AS event_count,
       COALESCE(h.sv, 0.0) AS sum_value
FROM grid gr
LEFT JOIN hourly h ON h.event_type = gr.event_type AND h.hour = gr.hour
""",
)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill (resample to a dense hourly grid): every
    (event_type, hour) cell between the corpus' first and last hour,
    zero-filled where no events landed — the shape behind downsampled
    dashboards and models that need dense regular inputs.

    Scale shape: the fact table is scanned twice (hourly agg + min/max
    bounds), both map-side combined; the dense grid itself is
    hours x types — independent of event count, tiny at any data scale —
    built by exploding ONE sequence() off the 1-row bounds aggregate and
    cross-joined with the distinct types (both driver-free). The grid
    side broadcasts into the final left join, so no extra fact shuffle."""
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"), dsum("value", "sv"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    types = ev.select("event_type").distinct()
    grid = (
        types.crossJoin(bounds)
        .withColumn("hour", F.explode(F.expr("sequence(lo, hi, interval 1 hour)")))
        .select("event_type", "hour")
    )
    return (
        F.broadcast(grid)
        .join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n"), F.lit(0)).alias("event_count"),
            F.coalesce(F.col("sv"), F.lit(0.0)).alias("sum_value"),
        )
    )


@register(
    "events_activity_islands",
    """
WITH active AS (
  SELECT DISTINCT user_id,
         date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',
                   date_trunc('hour', ts)) AS hour_idx
  FROM events
),
isl AS (
  SELECT user_id, hour_idx,
         hour_idx - row_number() OVER (PARTITION BY user_id
                                       ORDER BY hour_idx) AS island_key
  FROM active
),
runs AS (
  SELECT user_id, island_key, COUNT(*) AS run_len
  FROM isl GROUP BY 1, 2
)
SELECT user_id,
       CAST(SUM(run_len) AS BIGINT) AS n_active_hours,
       COUNT(*) AS n_islands,
       CAST(MAX(run_len) AS BIGINT) AS max_island_len
FROM runs GROUP BY 1
""",
)
def events_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, maximal runs of CONSECUTIVE active
    hours (the classic sessionization-by-calendar variant — session
    windows use inter-event gaps; islands use the discretized clock).
    The island key is hour_index - row_number(), constant within each
    consecutive run.

    Scale shape: dedup to (user, hour) grain first (one shuffle, grain
    bounded by users x hours << events), then a user-partitioned window
    — never a global sort. The hour index is an integer difference from
    a fixed epoch, identical in both engines (no timezone surface)."""
    ev = _events(spark, sf_dir)
    active = (
        ev.select(
            "user_id",
            F.expr(
                "timestampdiff(HOUR, timestamp'2024-01-01 00:00:00',"
                " date_trunc('hour', ts))"
            ).alias("hour_idx"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("hour_idx")
    isl = active.withColumn(
        "island_key", F.col("hour_idx") - F.row_number().over(w)
    )
    runs = isl.groupBy("user_id", "island_key").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.groupBy("user_id").agg(
        F.sum("run_len").cast("bigint").alias("n_active_hours"),
        F.count(F.lit(1)).alias("n_islands"),
        F.max("run_len").cast("bigint").alias("max_island_len"),
    )


@register(
    "events_user_lifecycle",
    """
SELECT user_id,
       MIN(ts) AS first_event_ts,
       MAX(ts) AS last_event_ts,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_event_types,
       COUNT(DISTINCT CAST(ts AS DATE)) AS n_active_days,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
""",
)
def events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifecycle profile: first/last touch, activity span,
    distinct-type breadth, purchase count, exact total value — the
    feature block behind churn/LTV models and the per-entity profile
    stage of a training pipeline.

    One shuffle on user_id; every aggregate is map-side combinable
    (the two COUNT(DISTINCT)s expand on (user, type) / (user, day) —
    grains bounded by users x small factors)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.min("ts").alias("first_event_ts"),
        F.max("ts").alias("last_event_ts"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.countDistinct(F.col("ts").cast("date")).alias("n_active_days"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
        dsum("value", "total_value"),
    )


@register(
    "window_session_features",
    """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
),
sessions AS (
  SELECT *, SUM(is_new_session)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM marked
)
SELECT user_id,
       CAST(session_seq AS BIGINT) AS session_seq,
       COUNT(*) AS n_events,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
       COUNT(DISTINCT event_type) AS n_event_types,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases
FROM sessions
GROUP BY 1, 2
""",
)
def window_session_features(spark, sf_dir):
    """Per-session feature vectors via the explicit lag/cumulative-sum
    sessionization idiom (the window-function twin of the native
    F.session_window used by events_session_window): a session boundary
    is a >=30-minute gap, session_seq is the running count of
    boundaries, and each (user, session) group yields the features a
    behavioral-training pipeline consumes (event count, duration,
    type diversity, spend, purchases).

    Robust to timestamp ties: tied rows see a 0 gap in any tie order,
    so session membership (and every downstream feature) is
    deterministic even though the lag order itself breaks ties
    arbitrarily. One shuffle on user_id serves both windows, and the
    final (user_id, session_seq) groupBy reuses it (hash partitioning
    on user_id satisfies the superset clustering requirement).
    """
    ev = _events(spark, sf_dir)
    # ts is TIMESTAMP_NTZ; the UTC session timezone (session.py) makes
    # the NTZ->TIMESTAMP cast an identity, so epoch math is exact
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "is_new_session",
        F.when(ts_us - F.lag(ts_us).over(w) >= 30 * 60 * 1_000_000, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    sessions = marked.withColumn(
        "session_seq",
        F.sum("is_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_micros(F.max("ts").cast("timestamp"))
            - F.unix_micros(F.min("ts").cast("timestamp"))
        ).alias("duration_us"),
        F.countDistinct("event_type").alias("n_event_types"),
        dsum("value", "sum_value"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
    )


# Staleness bound for the tolerance as-of: matches older than this are
# discarded (the sensor-fusion rule — a reading paired with a stale
# reference is worse than no pairing).
ASOF_TOLERANCE_MIN = 30


@register(
    "events_asof_tolerance",
    f"""
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'error' THEN ts END AS error_ts
  FROM events
  WHERE event_type IN ('click', 'error')
),
filled AS (
  SELECT *,
         last_value(error_ts IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS prev_error_ts
  FROM tagged
)
SELECT user_id, event_id AS click_event_id, ts AS click_ts,
       CASE WHEN epoch_us(ts) - epoch_us(prev_error_ts)
                 <= {ASOF_TOLERANCE_MIN} * 60 * 1000000
            THEN epoch_us(prev_error_ts) END AS matched_error_micros,
       CASE WHEN epoch_us(ts) - epoch_us(prev_error_ts)
                 <= {ASOF_TOLERANCE_MIN} * 60 * 1000000
            THEN epoch_us(ts) - epoch_us(prev_error_ts) END
         AS micros_since_error,
       CASE WHEN prev_error_ts IS NULL THEN 'no_match'
            WHEN epoch_us(ts) - epoch_us(prev_error_ts)
                 > {ASOF_TOLERANCE_MIN} * 60 * 1000000 THEN 'stale'
            ELSE 'matched' END AS match_status
FROM filled
WHERE event_type = 'click'
""",
)
def events_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE: the nearest prior error by the same
    user counts only if it happened within ASOF_TOLERANCE_MIN minutes —
    older matches are reported as `stale` with NULL timestamps (the
    sensor-fusion rule: pairing a click with an error from hours ago
    manufactures a correlation). Same single user-shuffle window as the
    unbounded as-of; the tolerance is a map-side post-filter, so the
    plan shape is unchanged at any scale."""
    ev = _events(spark, sf_dir).filter(F.col("event_type").isin("click", "error"))
    tagged = ev.withColumn(
        "error_ts", F.when(F.col("event_type") == "error", F.col("ts"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.withColumn(
        "prev_error_ts", F.last("error_ts", ignorenulls=True).over(w)
    )
    clicks = filled.filter(F.col("event_type") == "click")
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("prev_error_ts").cast("timestamp")
    )
    within = gap <= F.lit(ASOF_TOLERANCE_MIN * 60 * 1_000_000)
    status = (
        F.when(F.col("prev_error_ts").isNull(), "no_match")
        .when(~within, "stale")
        .otherwise("matched")
    )
    return clicks.select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
        F.when(
            within, F.unix_micros(F.col("prev_error_ts").cast("timestamp"))
        ).alias("matched_error_micros"),
        F.when(within, gap).alias("micros_since_error"),
        status.alias("match_status"),
    )


@register(
    "events_funnel_three_step",
    """
WITH v AS (
  SELECT user_id, MIN(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS c_ts
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.v_ts
    AND e.ts <= v.v_ts + INTERVAL '24 hours'
  GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS p_ts
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
    AND e.ts <= c.c_ts + INTERVAL '24 hours'
  GROUP BY 1
)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_view_click,
       (SELECT COUNT(*) FROM p) AS n_full_funnel,
       ROUND((SELECT COUNT(*) FROM c) * 1.0
             / (SELECT COUNT(*) FROM v), 6) AS view_to_click,
       ROUND((SELECT COUNT(*) FROM p) * 1.0
             / (SELECT COUNT(*) FROM c), 6) AS click_to_purchase
""",
)
def events_funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order 3-step funnel: first view -> first click within 24h
    of it -> first purchase within 24h of that click, per user. Each
    step is one user-keyed aggregation + one user-keyed join — the
    steps stay co-partitioned on user_id after the first shuffle, so at
    any scale the funnel costs ONE real repartition of the event
    stream, never a step-count multiple (and never the self-join
    explosion of the pattern-matching formulation)."""
    ev = _events(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("v_ts"))
            & (F.col("ts") <= F.col("v_ts") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("c_ts"))
            & (F.col("ts") <= F.col("c_ts") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_view_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_full_funnel"))
    return (
        nv.join(nc)
        .join(np_)
        .select(
            "n_view",
            "n_view_click",
            "n_full_funnel",
            F.round(F.col("n_view_click") * 1.0 / F.col("n_view"), 6).alias(
                "view_to_click"
            ),
            F.round(
                F.col("n_full_funnel") * 1.0 / F.col("n_view_click"), 6
            ).alias("click_to_purchase"),
        )
    )


@register(
    "events_funnel_conversion_rate",
    r"""
WITH f AS (
  SELECT user_id, k AS cohort_k FROM (
    SELECT user_id,
           -- TRY_CAST mirrors Spark's null-on-failure cast: a digit-less
           -- props row yields a NULL cohort on both engines, while a plain
           -- CAST('') would abort DuckDB (ADVICE r13)
           TRY_CAST(regexp_extract(props, '\d+') AS INTEGER) AS k,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events
  ) WHERE rn = 1
),
v AS (
  SELECT user_id, MIN(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS c_ts
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.v_ts
  GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS p_ts
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
  GROUP BY 1
)
SELECT f.cohort_k,
       COUNT(*) AS n_users,
       COUNT(v.user_id) AS n_viewed,
       COUNT(c.user_id) AS n_clicked,
       COUNT(p.user_id) AS n_purchased,
       ROUND(COUNT(c.user_id) * 1.0
             / NULLIF(COUNT(v.user_id), 0), 6) AS view_to_click,
       ROUND(COUNT(p.user_id) * 1.0
             / NULLIF(COUNT(c.user_id), 0), 6) AS click_to_purchase
FROM f
LEFT JOIN v ON v.user_id = f.user_id
LEFT JOIN c ON c.user_id = f.user_id
LEFT JOIN p ON p.user_id = f.user_id
GROUP BY 1
ORDER BY 1
""",
)
def events_funnel_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-COHORT funnel conversion (VERDICT r12 item 6 — completes the
    funnel family): users are grouped by the campaign key ``k`` of
    their FIRST event (parsed from the props JSON; (ts, event_id)
    tie-broken row_number makes "first" deterministic), and each
    cohort reports how many users ever viewed, first-clicked strictly
    after their first view, first-purchased strictly after that click,
    plus the two step-conversion ratios. The three_step twin is GLOBAL
    and 24h-windowed; this is the per-acquisition-cohort ratio a growth
    dashboard plots — strict ordering, no lateness window, cohort
    grain (~100 rows on this data). Calendar cohorts are degenerate
    here (every user's first event lands in the first two days), so
    the campaign key is the honest grouping.

    Scale shape: ONE scan of the event stream and ONE shuffle on
    user_id. The sequential step dependency (first view -> first click
    after it -> first purchase after that) is three chained
    whole-partition windows over the SAME partitioning — conditional
    MINs, no orderBy frames — so Catalyst plans a single exchange +
    sort reused across all three window operators (the first cut was
    the textbook 4-aggregate/3-join form: 7 fact scans and 8
    exchanges, measured in the executed plan). The cohort key rides
    the same windows as a lexicographic struct-MIN over
    (ts, event_id, k), the total order that makes "first event"
    deterministic. Then one user-grain dedup and a cohort-sized final
    aggregate. Determinism: counts are exact integers; ratios are
    single double divisions of those integers (identical IEEE on both
    engines)."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    wu = Window.partitionBy("user_id")
    is_view = F.col("event_type") == "view"
    is_click = F.col("event_type") == "click"
    is_purchase = F.col("event_type") == "purchase"
    step1 = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.min(
            F.struct(
                "ts",
                "event_id",
                F.regexp_extract("props", r"\d+", 0).cast("int").alias("k"),
            )
        )
        .over(wu)
        .getField("k")
        .alias("cohort_k"),
        F.min(F.when(is_view, F.col("ts"))).over(wu).alias("v_ts"),
    )
    step2 = step1.withColumn(
        "c_ts",
        F.min(
            F.when(is_click & (F.col("ts") > F.col("v_ts")), F.col("ts"))
        ).over(wu),
    )
    step3 = step2.withColumn(
        "p_ts",
        F.min(
            F.when(is_purchase & (F.col("ts") > F.col("c_ts")), F.col("ts"))
        ).over(wu),
    )
    users = step3.groupBy("user_id").agg(
        F.max("cohort_k").alias("cohort_k"),
        F.max("v_ts").alias("v_ts"),
        F.max("c_ts").alias("c_ts"),
        F.max("p_ts").alias("p_ts"),
    )
    n_viewed = F.count("v_ts")
    n_clicked = F.count("c_ts")
    n_purchased = F.count("p_ts")
    return (
        users.groupBy("cohort_k")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            n_viewed.alias("n_viewed"),
            n_clicked.alias("n_clicked"),
            n_purchased.alias("n_purchased"),
            F.round(
                n_clicked * 1.0 / F.nullif(n_viewed, F.lit(0)), 6
            ).alias("view_to_click"),
            F.round(
                n_purchased * 1.0 / F.nullif(n_clicked, F.lit(0)), 6
            ).alias("click_to_purchase"),
        )
        .orderBy("cohort_k")
    )


@register(
    "events_ewma_user_value",
    """
SELECT user_id,
       CAST(len(vals) AS BIGINT) AS n_events,
       vals[-1] AS last_value,
       list_reduce(vals, (acc, x) ->
         CAST(0.3 AS DOUBLE) * x + CAST(0.7 AS DOUBLE) * acc) AS ewma_value
FROM (
  SELECT user_id, list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
  FROM events
  GROUP BY user_id
)
""",
)
def events_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (alpha=0.3) over the event-value sequence — the
    sequential *stateful fold* aggregate (s_i = a*v_i + (1-a)*s_{i-1},
    seeded with the first value) that no plain window frame expresses.

    Engine shape: ONE shuffle on user_id (high-cardinality -> even),
    collect the per-user sequence, array_sort for a deterministic
    order, then a JVM-side `aggregate` fold in plain DOUBLE. Sequential
    per-key folds have a FIXED evaluation order, so the result is
    IEEE-bit-identical to DuckDB's list_reduce (acc-first, seeded with
    the first element) — the same determinism rule the float-path IVF
    scoring relies on; no decimal cast needed because nothing sums
    across rows in a nondeterministic order.

    Scale: per-user sequences are session-bounded (the same premise as
    sessionization); state never leaves the executor and there is no
    O(n^2) window re-evaluation a self-join formulation would cost.

    Ordering invariant: the struct sort here orders by (ts, event_id,
    v) — v is a THIRD sort key — while the oracle's
    ``list(... ORDER BY ts, event_id)`` leaves (ts, event_id) ties in
    arbitrary order. The engines agree only because event_id is UNIQUE
    per event (the fixtures' rowid-derived PK, asserted in
    tests/test_new_ops_properties.py), making the v tiebreak inert; if
    events ever gained duplicate (ts, event_id) pairs the oracle would
    need an explicit matching tiebreak.
    """
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id, "
            "cast(value as double) as v))), s -> s.v)"
        ).alias("vals")
    )
    return per_user.select(
        "user_id",
        F.size("vals").cast("bigint").alias("n_events"),
        F.element_at("vals", -1).alias("last_value"),
        F.expr(
            "aggregate(slice(vals, 2, size(vals) - 1), element_at(vals, 1), "
            "(acc, x) -> cast(0.3 as double) * x + cast(0.7 as double) * acc)"
        ).alias("ewma_value"),
    )


# ---------------------------------------------------------------------------
# round 12: time-to-event survival analysis (Kaplan-Meier with censoring)
# ---------------------------------------------------------------------------


@register(
    "events_survival_kaplan_meier",
    """
WITH s0 AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS tp
  FROM events e JOIN s0 ON s0.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s0.t0
  GROUP BY 1
),
hz AS (SELECT MAX(ts) AS h FROM events),
dur AS (
  SELECT s0.user_id,
         CASE WHEN p.tp IS NOT NULL
              THEN (epoch_us(p.tp) - epoch_us(s0.t0)) // 86400000000
              ELSE (epoch_us(hz.h) - epoch_us(s0.t0)) // 86400000000
         END AS day,
         CASE WHEN p.tp IS NOT NULL THEN 1 ELSE 0 END AS observed
  FROM s0 LEFT JOIN p ON p.user_id = s0.user_id CROSS JOIN hz
),
byday AS (
  SELECT day,
         CAST(SUM(observed) AS BIGINT) AS n_events,
         CAST(SUM(1 - observed) AS BIGINT) AS n_censored
  FROM dur GROUP BY 1
),
km AS (
  SELECT day, n_events, n_censored,
         (SELECT COUNT(*) FROM dur)
           - COALESCE(SUM(n_events + n_censored) OVER (
               ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS n_at_risk,
         n_events AS d
  FROM byday
)
SELECT day, CAST(n_at_risk AS BIGINT) AS n_at_risk, n_events, n_censored,
       -- d = n exhausts the risk set: the product hits EXACTLY 0 and
       -- stays there (absorbing), so the zero factor is kept out of
       -- the ln-sum and applied as a cumulative flag instead
       CASE WHEN MAX(CASE WHEN d = n_at_risk THEN 1 ELSE 0 END) OVER (
              ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) = 1 THEN 0.0
       ELSE ROUND(exp(SUM(
              CASE WHEN d = 0 OR d = n_at_risk THEN 0.0
                   ELSE ln(1.0 - CAST(d AS DOUBLE) / n_at_risk) END) OVER (
              ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            )), 6)
       END AS survival
FROM km
ORDER BY day
""",
)
def events_survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator over signup -> first-purchase
    delay, with right-censoring (VERDICT r11 item 6 — event-sequence
    analytics): the cohort is every user with a signup (t0 = first
    signup); the event is their first purchase strictly after t0;
    users with no such purchase are censored at the fixture horizon
    (global max ts). Durations are bucketed to whole days (exact
    integer microsecond division — no float in the grain), and the
    product-limit curve S(t) = prod(1 - d_t/n_t) is computed as
    exp(running-sum(ln)) over the day-ordered window, the same ordered
    fold in both engines (ln/exp parity measured — tfidf/BM25 idiom).

    Scale shape: two user-grain aggregations co-partitioned on user_id
    (one real shuffle of the event stream), one single-row horizon
    aggregate attached by broadcast, then everything is DAY-grain —
    calendar-bounded (30 rows here, ~37k rows for a century), so the
    unpartitioned cumulative window at the end is driver-trivial at
    any SF."""
    ev = _events(spark, sf_dir)
    s0 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s0, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    hz = ev.agg(F.max("ts").alias("h"))
    # exact integral day bucket: `div` on bigint microseconds (a double
    # quotient could round an exact day multiple up before truncation)
    day_of = (
        "(unix_micros(cast({t} as timestamp))"
        " - unix_micros(cast(t0 as timestamp))) div 86400000000"
    )
    dur = (
        s0.join(p, "user_id", "left")
        .crossJoin(F.broadcast(hz))
        .select(
            F.when(F.col("tp").isNotNull(), F.expr(day_of.format(t="tp")))
            .otherwise(F.expr(day_of.format(t="h")))
            .cast("bigint")
            .alias("day"),
            F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("observed"),
        )
    )
    byday = dur.groupBy("day").agg(
        F.sum("observed").cast("bigint").alias("n_events"),
        F.sum(1 - F.col("observed")).cast("bigint").alias("n_censored"),
    )
    # n_at_risk = cohort size minus everyone removed on EARLIER days;
    # both terms come from byday itself (an unbounded-frame window sum
    # = the cohort total), so the events stream is scanned exactly once
    # per arm — a separate dur.count() would re-run the whole
    # signup-agg + purchase-join pipeline a third time (code-review r12)
    w_prev = (
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    km = (
        byday.withColumn(
            "n_at_risk",
            (
                F.sum(F.col("n_events") + F.col("n_censored")).over(w_all)
                - F.coalesce(
                    F.sum(F.col("n_events") + F.col("n_censored")).over(w_prev),
                    F.lit(0),
                )
            ).cast("bigint"),
        )
        .withColumn(
            "survival",
            # d = n exhausts the risk set: survival is EXACTLY 0 from
            # that day on (absorbing) — the zero factor stays out of
            # the ln-sum (ln(0) is -inf/null) and is applied as a
            # cumulative flag, mirroring the oracle's CASE
            F.when(
                F.max(
                    F.when(F.col("n_events") == F.col("n_at_risk"), 1)
                    .otherwise(0)
                ).over(w_cum)
                == 1,
                F.lit(0.0),
            ).otherwise(
                F.round(
                    F.exp(
                        F.sum(
                            F.when(
                                (F.col("n_events") == 0)
                                | (F.col("n_events") == F.col("n_at_risk")),
                                F.lit(0.0),
                            ).otherwise(
                                F.log(
                                    F.lit(1.0)
                                    - F.col("n_events").cast("double")
                                    / F.col("n_at_risk")
                                )
                            )
                        ).over(w_cum)
                    ),
                    6,
                )
            ),
        )
    )
    return km.select(
        "day", "n_at_risk", "n_events", "n_censored", "survival"
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Multi-touch attribution: last-touch credit with a lookback window
# ---------------------------------------------------------------------------

# Marketing-touch event types (errors are not touches) and the lookback
# horizon after which a purchase is credited to 'direct'.
ATTR_TOUCH_TYPES = ("click", "view", "signup")
ATTR_WINDOW_DAYS = 7


@register(
    "events_attribution_lookback",
    f"""
WITH seq AS (
  SELECT user_id, ts, event_type, value,
         last_value(CASE WHEN event_type IN {ATTR_TOUCH_TYPES!r}
                         THEN event_type END IGNORE NULLS) OVER w AS lt,
         last_value(CASE WHEN event_type IN {ATTR_TOUCH_TYPES!r}
                         THEN ts END IGNORE NULLS) OVER w AS lts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
),
pur AS (
  SELECT CASE WHEN lt IS NOT NULL
                   AND lts >= ts - INTERVAL {ATTR_WINDOW_DAYS} DAY
              THEN lt ELSE 'direct' END AS credited_type,
         value,
         CASE WHEN lt IS NOT NULL
                   AND lts >= ts - INTERVAL {ATTR_WINDOW_DAYS} DAY
              THEN date_diff('microsecond', lts, ts) ELSE 0 END AS lat
  FROM seq WHERE event_type = 'purchase'
)
SELECT credited_type,
       COUNT(*) AS n_purchases,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value,
       ROUND(CAST(SUM(lat) AS DOUBLE) / COUNT(*) / 1e6, 6) AS avg_latency_sec
FROM pur GROUP BY 1
""",
)
def events_attribution_lookback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent marketing touch (click/view/signup) within a
    ATTR_WINDOW_DAYS lookback, else to 'direct'; per credited channel:
    purchase count, attributed revenue, mean touch-to-purchase latency.

    Scale shape: ONE window partitioned by user_id (high-cardinality —
    even shuffle), carrying the last touch forward with
    last(ignorenulls) — the same union-tag/as-of idiom as
    events_asof_join, so there is no range self-join and no per-purchase
    probe. Purchase rows themselves yield NULL in the touch CASE, so the
    frame may include the current row (strictly-prior semantics fall out
    for free); ties on ts order by event_id on both engines. Latency
    sums are exact microsecond bigints through sum_wide (repo wide-sum
    convention) with one rounding point at the end.
    """
    from ibis_olap_aggregation_spark.queries import sum_wide

    ev = _events(spark, sf_dir)
    is_touch = F.col("event_type").isin(*ATTR_TOUCH_TYPES)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = ev.select(
        "event_type",
        "ts",
        "value",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("lt"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("lts"),
    ).filter(F.col("event_type") == "purchase")
    attributed = F.col("lt").isNotNull() & (
        F.col("lts")
        >= F.col("ts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS")
    )
    pur = seq.select(
        F.when(attributed, F.col("lt")).otherwise("direct").alias(
            "credited_type"
        ),
        "value",
        # events.ts is TIMESTAMP_NTZ; unix_micros wants TIMESTAMP. The
        # difference of the two casts is correct because session.py
        # PINS spark.sql.session.timeZone to UTC (a fixed-offset zone):
        # both operands shift by the same constant. Under a DST zone
        # the two casts could pick different offsets when lts and ts
        # straddle a transition — do not relax the UTC pin without
        # moving this latency to an NTZ-native timestampdiff
        F.when(
            attributed,
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("lts").cast("timestamp")),
        )
        .otherwise(F.lit(0))
        .alias("lat"),
    )
    return pur.groupBy("credited_type").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        dsum("value", "attributed_value"),
        F.round(
            sum_wide(F.col("lat")).cast("double") / F.count(F.lit(1)) / 1e6, 6
        ).alias("avg_latency_sec"),
    )


@register(
    "events_rfm_segments",
    """
WITH hz AS (SELECT MAX(ts) AS max_ts FROM events),
u AS (
  SELECT user_id,
         date_diff('day', CAST(MAX(ts) AS DATE),
                   CAST((SELECT max_ts FROM hz) AS DATE)) AS recency_days,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS frequency,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(value AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END)
              AS DOUBLE) AS monetary
  FROM events GROUP BY 1
),
scored AS (
  SELECT user_id, recency_days, frequency, monetary,
         NTILE(5) OVER (ORDER BY recency_days DESC, user_id) AS r_score,
         NTILE(5) OVER (ORDER BY frequency, user_id) AS f_score,
         NTILE(5) OVER (ORDER BY monetary, user_id) AS m_score
  FROM u
)
SELECT r_score, f_score, m_score,
       COUNT(*) AS n_users,
       CAST(SUM(frequency) AS BIGINT) AS total_purchases,
       ROUND(SUM(monetary), 2) AS total_monetary
FROM scored
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (the classic CRM cube): per user, days since
    last activity (vs the global horizon), purchase count, and
    decimal-exact purchase value, each quintile-scored with NTILE(5)
    and rolled up to segment grain (r,f,m) with user counts and
    segment totals. Higher score = better on every axis (recency
    orders DESC so the most-recent users land in quintile 5).

    Determinism: every NTILE ordering carries a user_id tiebreak, so
    the quintile boundary assignment is a total order both engines
    agree on; monetary is summed in decimal before the final
    2-dp display round. Scale shape: one user-grain aggregate of the
    event stream (cached: four consumers), a single-row horizon
    broadcast, then each axis's quintile is derived ARITHMETICALLY
    from a global row number produced by the two-pass range-partition
    ranker (operators/ranking.py) — NTILE(k) assigns the first
    n mod k buckets one extra row, which is a closed-form function of
    (rank, n) — so no single-partition window ever sees the user
    table (a plain NTILE window would sort all users in one task at
    1e9-user scale). Segment output is at most 125 rows."""
    ev = _events(spark, sf_dir)
    hz = ev.agg(F.max("ts").alias("max_ts"))
    u = (
        ev.crossJoin(F.broadcast(hz))
        .groupBy("user_id")
        .agg(
            F.datediff(
                F.max_by(F.col("max_ts").cast("date"), F.lit(1)),
                F.max(F.col("ts").cast("date")),
            ).alias("recency_days"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "frequency"
            ),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(18,2)"),
                ).otherwise(F.lit(0).cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("monetary"),
        )
    )
    from ibis_olap_aggregation_spark.operators.ranking import (
        global_row_number,
    )
    from ibis_olap_aggregation_spark.session import query_cache

    # the user table feeds the count + three rankings: cache it so the
    # aggregate computes once (the ranker localCheckpoints its own
    # RANKED outputs but re-reads its input per call)
    u = query_cache(u.withColumn("_neg_r", -F.col("recency_days")))
    n = u.count()

    def ntile5(rank_col: str) -> F.Column:
        # closed-form NTILE(5) from a 1-based global rank: the first
        # n mod 5 buckets hold ceil(n/5) rows, the rest floor(n/5) —
        # both engines' NTILE definition (the oracle pins it)
        q, r = divmod(n, 5)
        head = r * (q + 1)
        rn = F.col(rank_col)
        in_head = rn <= F.lit(head)
        # bigint to match DuckDB's NTILE return type (the local
        # mirror's dtype gate caught the int32 drift)
        return (
            F.when(in_head, F.ceil(rn / F.lit(q + 1)))
            .otherwise(F.lit(r) + F.ceil((rn - F.lit(head)) / F.lit(max(q, 1))))
            .cast("bigint")
        )

    ranked = global_row_number(u, ["_neg_r", "user_id"], "_rn_r", row_count=n)
    ranked = global_row_number(
        ranked, ["frequency", "user_id"], "_rn_f", row_count=n
    )
    ranked = global_row_number(
        ranked, ["monetary", "user_id"], "_rn_m", row_count=n
    )
    scored = ranked.select(
        "user_id",
        "frequency",
        "monetary",
        ntile5("_rn_r").alias("r_score"),
        ntile5("_rn_f").alias("f_score"),
        ntile5("_rn_m").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("frequency").alias("total_purchases"),
            F.round(F.sum("monetary"), 2).alias("total_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )
