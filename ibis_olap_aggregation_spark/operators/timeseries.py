"""Time-series statistics over the daily event series: autocorrelation,
lagged cross-correlation, changepoint detection, day-of-week
seasonality. The reference has no temporal-analytics surface (SURVEY.md
§2.10); these are the standard forecasting-adjacent diagnostics a
warehouse runs on its activity streams.

Determinism discipline (the repo-wide idiom): every correlation /
variance here is computed from EXACT integer sufficient statistics —
daily counts are bigints, daily revenue is quantized to bigint cents —
and the statistic is ONE fixed double expression tree over those exact
ints, so both engines evaluate identical operands in identical order
and the ROUND(_, 6) outputs hash-compare exactly. Never an engine-
native corr()/stddev() (not guaranteed to agree in the last ulp), never
a cross-row double sum (order-dependent).

Scale notes (100 TB):
- every query collapses the fact stream to a DAY-grain aggregate first
  (one shuffle with map-side combine); everything after is dim-sized
  (the day table: ~365 rows/year regardless of fact volume).
- lag alignment is an equi-join on the shifted date key of the
  day-grain table — never a window over the raw stream.
- the changepoint scan evaluates every candidate split from prefix
  sums (one pass), not by re-aggregating per split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.queries import register, sum_wide, sum_wide_product
from ibis_olap_aggregation_spark.session import load_table


def _daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(d DATE, x bigint): events per day — the shared day-grain series."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
    )


_ACF_LAGS = 7

_ACF_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS nn,
         CAST(SUM(x) AS DOUBLE) AS s1,
         CAST(SUM(x * x) AS DOUBLE) AS s2
  FROM daily
),
lags AS (SELECT unnest(generate_series(1, {_ACF_LAGS})) AS lag),
pairs AS (
  SELECT l.lag,
         COUNT(*) AS cnt,
         CAST(SUM(a.x * b.x) AS DOUBLE) AS sxy,
         CAST(SUM(a.x) AS DOUBLE) AS sx,
         CAST(SUM(b.x) AS DOUBLE) AS sy
  FROM lags l
  JOIN daily a ON true
  JOIN daily b ON b.d = a.d + CAST(l.lag AS INTEGER)
  GROUP BY 1
)
SELECT CAST(p.lag AS INTEGER) AS lag, CAST(p.cnt AS BIGINT) AS n_pairs,
       ROUND((p.sxy - (t.s1 / t.nn) * p.sx - (t.s1 / t.nn) * p.sy
              + p.cnt * (t.s1 / t.nn) * (t.s1 / t.nn))
             / (t.s2 - t.nn * (t.s1 / t.nn) * (t.s1 / t.nn)), 6) AS acf
FROM pairs p, tot t
ORDER BY lag
"""


@register("events_autocorrelation", _ACF_SQL)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily event-count series at lags
    1..7 — the first diagnostic of any activity series (weekly
    periodicity shows as a lag-7 peak; a near-1 lag-1 says the series
    is trend-dominated). Standard ACF estimator with the FULL-series
    mean, numerator expanded to exact integer sums over the matched
    pairs: sum((x_t-m)(x_{t+k}-m)) = sxy - m*sx - m*sy + cnt*m^2."""
    daily = _daily_counts(spark, sf_dir)
    tot = daily.agg(
        F.count(F.lit(1)).cast("double").alias("nn"),
        sum_wide(F.col("x")).cast("double").alias("s1"),
        sum_wide_product(F.col("x"), F.col("x"), check_in=daily)
        .cast("double")
        .alias("s2"),
    )
    lags = spark.range(1, _ACF_LAGS + 1).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("d").alias("ad"), F.col("x").alias("ax"))
    b = daily.select(F.col("d").alias("bd"), F.col("x").alias("bx"))
    matched = a.crossJoin(F.broadcast(lags)).join(
        b, F.col("bd") == F.date_add(F.col("ad"), F.col("lag"))
    )
    pairs = (
        matched.groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            sum_wide_product(F.col("ax"), F.col("bx"), check_in=matched)
            .cast("double")
            .alias("sxy"),
            sum_wide(F.col("ax")).cast("double").alias("sx"),
            sum_wide(F.col("bx")).cast("double").alias("sy"),
        )
    )
    m = F.col("s1") / F.col("nn")
    acf = (
        F.col("sxy") - m * F.col("sx") - m * F.col("sy") + F.col("cnt") * m * m
    ) / (F.col("s2") - F.col("nn") * m * m)
    return (
        pairs.crossJoin(F.broadcast(tot))
        .select(
            "lag",
            F.col("cnt").cast("bigint").alias("n_pairs"),
            F.round(acf, 6).alias("acf"),
        )
        .orderBy("lag")
    )


_XCORR_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         COUNT(*) FILTER (WHERE event_type = 'click') AS x,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS y
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS nn,
         CAST(SUM(x) AS DOUBLE) AS s1x, CAST(SUM(x * x) AS DOUBLE) AS s2x,
         CAST(SUM(y) AS DOUBLE) AS s1y, CAST(SUM(y * y) AS DOUBLE) AS s2y
  FROM daily
),
lags AS (SELECT unnest(generate_series(-3, 3)) AS lag),
pairs AS (
  SELECT l.lag, COUNT(*) AS cnt,
         CAST(SUM(a.x * b.y) AS DOUBLE) AS sxy,
         CAST(SUM(a.x) AS DOUBLE) AS sx,
         CAST(SUM(b.y) AS DOUBLE) AS sy
  FROM lags l
  JOIN daily a ON true
  JOIN daily b ON b.d = a.d + CAST(l.lag AS INTEGER)
  GROUP BY 1
)
SELECT CAST(p.lag AS INTEGER) AS lag, CAST(p.cnt AS BIGINT) AS n_pairs,
       ROUND((p.sxy - (t.s1x / t.nn) * p.sy - (t.s1y / t.nn) * p.sx
              + p.cnt * (t.s1x / t.nn) * (t.s1y / t.nn))
             / sqrt((t.s2x - t.nn * (t.s1x / t.nn) * (t.s1x / t.nn))
                    * (t.s2y - t.nn * (t.s1y / t.nn) * (t.s1y / t.nn))), 6)
         AS xcorr
FROM pairs p, tot t
ORDER BY lag
"""


@register("events_cross_correlation", _XCORR_SQL)
def events_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between daily click and purchase counts
    at lags -3..+3 — the lead/lag diagnostic ("do clicks predict
    purchases k days later?"). corr(x_t, y_{t+k}) with full-series
    means/variances; a day with no events of one type contributes a
    true zero (the day grid is every day with ANY event, and the two
    counts are conditional aggregates of the same pass, so the zeros
    are in the data, not gap-filled after the fact)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("x"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("y"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("double").alias("nn"),
        sum_wide(F.col("x")).cast("double").alias("s1x"),
        sum_wide_product(F.col("x"), F.col("x"), check_in=daily)
        .cast("double")
        .alias("s2x"),
        sum_wide(F.col("y")).cast("double").alias("s1y"),
        sum_wide_product(F.col("y"), F.col("y"), check_in=daily)
        .cast("double")
        .alias("s2y"),
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("d").alias("ad"), F.col("x").alias("ax"))
    b = daily.select(F.col("d").alias("bd"), F.col("y").alias("by"))
    matched = a.crossJoin(F.broadcast(lags)).join(
        b, F.col("bd") == F.date_add(F.col("ad"), F.col("lag"))
    )
    pairs = (
        matched.groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            sum_wide_product(F.col("ax"), F.col("by"), check_in=matched)
            .cast("double")
            .alias("sxy"),
            sum_wide(F.col("ax")).cast("double").alias("sx"),
            sum_wide(F.col("by")).cast("double").alias("sy"),
        )
    )
    mx, my = F.col("s1x") / F.col("nn"), F.col("s1y") / F.col("nn")
    num = (
        F.col("sxy") - mx * F.col("sy") - my * F.col("sx")
        + F.col("cnt") * mx * my
    )
    den = F.sqrt(
        (F.col("s2x") - F.col("nn") * mx * mx)
        * (F.col("s2y") - F.col("nn") * my * my)
    )
    return (
        pairs.crossJoin(F.broadcast(tot))
        .select(
            "lag",
            F.col("cnt").cast("bigint").alias("n_pairs"),
            F.round(num / den, 6).alias("xcorr"),
        )
        .orderBy("lag")
    )


_CPT_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
pre AS (
  SELECT d,
         SUM(cents) OVER (ORDER BY d) AS sl,
         CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS nl,
         SUM(cents) OVER () AS st,
         COUNT(*) OVER () AS nt
  FROM daily
),
gains AS (
  SELECT d AS split_after,
         nl AS n_left, (nt - nl) AS n_right,
         CAST(sl AS DOUBLE) / nl / 100 AS mean_left,
         CAST(st - sl AS DOUBLE) / (nt - nl) / 100 AS mean_right,
         (CAST(sl AS DOUBLE) * sl / nl
          + CAST(st - sl AS DOUBLE) * (st - sl) / (nt - nl)
          - CAST(st AS DOUBLE) * st / nt) / 10000 AS gain
  FROM pre WHERE nl < nt
)
SELECT CAST(split_after AS TIMESTAMP) AS split_after,
       CAST(n_left AS BIGINT) AS n_left,
       CAST(n_right AS BIGINT) AS n_right,
       ROUND(mean_left, 6) AS mean_left, ROUND(mean_right, 6) AS mean_right,
       ROUND(gain, 4) AS gain
FROM gains
ORDER BY gain DESC, split_after
LIMIT 1
"""


@register("events_changepoint_binary_seg", _CPT_SQL)
def events_changepoint_binary_seg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection on daily purchase revenue by binary
    segmentation: the split maximizing the reduction in within-segment
    sum of squares, which for a mean-shift model reduces to maximizing
    SL^2/nL + SR^2/nR - S^2/N over prefix sums (the CUSUM-equivalent
    form — only segment SUMS appear, so prefix sums answer every
    candidate split in one pass). Revenue is quantized to bigint cents;
    the gain is one fixed double expression over exact ints.

    The prefix window runs over the DAY-grain series (dim-sized), so
    the unpartitioned ORDER BY d window is a few hundred rows at any
    fact scale — never over the raw stream."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    pre = daily.select(
        "d",
        # prefix/total cents sums routed wide (exact at any fact scale,
        # mirroring the oracle's hugeint window sums)
        F.sum(F.col("cents").cast("decimal(38,0)")).over(w).alias("sl"),
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("nl"),
        F.sum(F.col("cents").cast("decimal(38,0)")).over(wall).alias("st"),
        F.count(F.lit(1)).over(wall).alias("nt"),
    ).filter(F.col("nl") < F.col("nt"))
    sl, st = F.col("sl").cast("double"), F.col("st").cast("double")
    # sr mirrors the oracle's CAST(st - sl AS DOUBLE): the subtraction
    # happens EXACTLY (decimal), then one conversion — a double-minus-
    # double here would diverge by ulps once cents sums pass 2^53
    sr = (F.col("st") - F.col("sl")).cast("double")
    nl, nt = F.col("nl"), F.col("nt")
    nr = nt - nl
    gain = (sl * F.col("sl") / nl + sr * (F.col("st") - F.col("sl")) / nr
            - st * F.col("st") / nt) / 10000
    out = pre.select(
        F.col("d").cast("timestamp").alias("split_after"),
        nl.alias("n_left"),
        nr.cast("bigint").alias("n_right"),
        F.round(sl / nl / 100, 6).alias("mean_left"),
        F.round(sr / nr / 100, 6).alias("mean_right"),
        F.round(gain, 4).alias("gain"),
    )
    return out.orderBy(F.col("gain").desc(), "split_after").limit(1)


_DOW_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(x) AS DOUBLE) AS s1, CAST(COUNT(*) AS DOUBLE) AS nn
  FROM daily
),
dow AS (
  SELECT isodow(d) AS dow_iso, dayname(d) AS dow_name,
         COUNT(*) AS n_days, SUM(x) AS sx
  FROM daily GROUP BY 1, 2
)
SELECT CAST(dow_iso AS BIGINT) AS dow_iso, dow_name,
       CAST(n_days AS BIGINT) AS n_days,
       CAST(sx AS BIGINT) AS n_events,
       ROUND((CAST(sx AS DOUBLE) / n_days) / (t.s1 / t.nn), 6)
         AS seasonal_index
FROM dow, tot t
ORDER BY dow_iso
"""


@register("events_seasonality_dow_index", _DOW_SQL)
def events_seasonality_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index: each weekday's average daily event
    count as a ratio to the overall average daily count (the
    ratio-to-average method — index 1.2 means Mondays run 20% hot).
    ISO day numbering (1=Monday) and the engine-agnostic day NAME are
    both emitted; all means are fixed double trees over exact integer
    sums."""
    daily = _daily_counts(spark, sf_dir)
    tot = daily.agg(
        F.sum("x").cast("double").alias("s1"),
        F.count(F.lit(1)).cast("double").alias("nn"),
    )
    dow = daily.groupBy(
        (F.weekday("d") + 1).cast("bigint").alias("dow_iso"),
        F.date_format("d", "EEEE").alias("dow_name"),
    ).agg(F.count(F.lit(1)).alias("n_days"), F.sum("x").alias("sx"))
    idx = (F.col("sx").cast("double") / F.col("n_days")) / (
        F.col("s1") / F.col("nn")
    )
    return (
        dow.crossJoin(F.broadcast(tot))
        .select(
            "dow_iso",
            "dow_name",
            F.col("n_days").cast("bigint").alias("n_days"),
            F.col("sx").cast("bigint").alias("n_events"),
            F.round(idx, 6).alias("seasonal_index"),
        )
        .orderBy("dow_iso")
    )


_ROLL_DAYS = 6  # trailing window: current day + 6 preceding

_ROLLCORR_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         COUNT(*) FILTER (WHERE event_type = 'click') AS x,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS y
  FROM events GROUP BY 1
),
w AS (
  -- window sums auto-promote to HUGEINT (exact) and convert to
  -- double HERE, the single rounding point — downstream arithmetic is
  -- then one identical double tree on both engines
  SELECT d, x, y,
         COUNT(*) OVER win AS n,
         CAST(SUM(x) OVER win AS DOUBLE) AS sx,
         CAST(SUM(y) OVER win AS DOUBLE) AS sy,
         CAST(SUM(x * x) OVER win AS DOUBLE) AS sxx,
         CAST(SUM(y * y) OVER win AS DOUBLE) AS syy,
         CAST(SUM(x * y) OVER win AS DOUBLE) AS sxy
  FROM daily
  WINDOW win AS (ORDER BY d RANGE BETWEEN INTERVAL {_ROLL_DAYS} DAYS
                 PRECEDING AND CURRENT ROW)
)
SELECT CAST(d AS TIMESTAMP) AS day, CAST(n AS BIGINT) AS n_days,
       ROUND((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
             6) AS rolling_corr
FROM w
WHERE n >= 3 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
ORDER BY day
"""


@register("window_rolling_corr", _ROLLCORR_SQL)
def window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing rolling correlation between daily click and
    purchase counts — the windowed form of the global cross-correlation
    (is the click->purchase coupling stable or drifting?). All five
    sufficient statistics are exact integer WINDOW sums over a
    value-based (RANGE) date frame, so a missing day shrinks the window
    on both engines identically; the correlation is one fixed double
    tree per row. Degenerate windows (n<3 or zero variance) are
    excluded on both sides.

    Scale: the window runs over the DAY-grain series (dim-sized); the
    unpartitioned frame is a few hundred rows at any fact volume."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("x"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("y"),
    )
    # RANGE frame on epoch days == DuckDB's RANGE INTERVAL frame
    win = (
        Window.orderBy(F.unix_date("d"))
        .rangeBetween(-_ROLL_DAYS, Window.currentRow)
    )
    def wsum(col):  # exact wide window sum -> double (see oracle note)
        return F.sum(col.cast("decimal(38,0)")).over(win).cast("double")

    w = daily.select(
        "d",
        F.count(F.lit(1)).over(win).alias("n"),
        wsum(F.col("x")).alias("sx"),
        wsum(F.col("y")).alias("sy"),
        wsum(F.col("x") * F.col("x")).alias("sxx"),
        wsum(F.col("y") * F.col("y")).alias("syy"),
        wsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(vx * vy)
    return (
        w.filter((n >= 3) & (vx > 0) & (vy > 0))
        .select(
            F.col("d").cast("timestamp").alias("day"),
            n.cast("bigint").alias("n_days"),
            F.round(corr, 6).alias("rolling_corr"),
        )
        .orderBy("day")
    )


_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.3
_HOLT_H = 7

_HOLT_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS x
  FROM events GROUP BY 1
),
series AS (
  SELECT list(x ORDER BY d) AS xs, MAX(d) AS last_d, COUNT(*) AS n
  FROM daily
),
fitted AS (
  -- DuckDB list_reduce has no seed parameter: the fold is acc-first
  -- SEEDED BY THE FIRST ELEMENT, so each x is lifted to the state
  -- shape [x, 0.0] and the first element IS the wanted seed (x1, 0);
  -- the lambda then runs from element 2 onward — exactly Spark's
  -- aggregate(slice(xs, 2, n-1), array(x1, 0.0), ...)
  SELECT n, last_d,
         list_reduce(
           list_transform(xs, v -> [v, 0.0]),
           (acc, el) ->
             [{_HOLT_ALPHA} * el[1]
                + (1 - {_HOLT_ALPHA}) * (acc[1] + acc[2]),
              {_HOLT_BETA} * (({_HOLT_ALPHA} * el[1]
                + (1 - {_HOLT_ALPHA}) * (acc[1] + acc[2])) - acc[1])
                + (1 - {_HOLT_BETA}) * acc[2]]
         ) AS st
  FROM series
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(last_d AS TIMESTAMP) AS last_day,
       ROUND(st[1], 6) AS level,
       ROUND(st[2], 6) AS trend,
       ROUND(st[1] + {_HOLT_H} * st[2], 6) AS forecast_7d
FROM fitted
"""


@register("events_forecast_holt", _HOLT_SQL)
def events_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double exponential) smoothing over the daily
    event-count series: level/trend recursion l' = a*x + (1-a)*(l+t),
    t' = b*(l'-l) + (1-b)*t seeded at (x1, 0), plus the h=7 forecast
    l + 7t — the simplest trend-aware forecaster, and the registry's
    demonstration that SEQUENTIAL recursions (which no window frame
    expresses) still pair with the oracle: a per-row array fold in
    plain double is bit-identical across engines because the
    evaluation ORDER is fixed by the fold itself (the established
    EWMA/entropy idiom). Spark folds with aggregate(); DuckDB with
    list_reduce — no seed parameter there, so each x lifts to the
    state shape [x, 0] and the first element IS the seed (see the SQL
    comment).

    Scale: the fold input is the DAY-grain series (dim-sized array,
    hundreds of elements); the fact stream collapses in one map-side
    combined aggregate."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    series = daily.agg(
        F.array_sort(
            F.collect_list(F.struct("d", "x"))
        ).alias("pairs"),
        F.max("d").alias("last_d"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "n",
        "last_d",
        F.expr("transform(pairs, p -> p.x)").alias("xs"),
    )
    a, b = _HOLT_ALPHA, _HOLT_BETA
    st = F.expr(
        f"""aggregate(
              slice(xs, 2, size(xs) - 1),
              array(element_at(xs, 1), 0.0D),
              (acc, v) -> array(
                {a}D * v + {1 - a}D * (element_at(acc, 1)
                                       + element_at(acc, 2)),
                {b}D * (({a}D * v + {1 - a}D * (element_at(acc, 1)
                                                + element_at(acc, 2)))
                        - element_at(acc, 1))
                  + {1 - b}D * element_at(acc, 2)))"""
    )
    return series.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.col("last_d").cast("timestamp").alias("last_day"),
        F.round(F.element_at(st, 1), 6).alias("level"),
        F.round(F.element_at(st, 2), 6).alias("trend"),
        F.round(
            F.element_at(st, 1) + _HOLT_H * F.element_at(st, 2), 6
        ).alias("forecast_7d"),
    )
