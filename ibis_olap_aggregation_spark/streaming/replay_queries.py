"""Registry-facing Structured Streaming twins (VERDICT r10 item 6):
four streaming-native surfaces the batch registry oracle-pairs —
watermarked stateful dedup, replay-harness integrity, a stream-stream
event-time interval join, and a CDC latest-state upsert sink.

Every query REALLY runs a stream — a rate-limited file-source replay
(``maxFilesPerTrigger=1`` over an 8-file, time-range-partitioned copy
of the events table, so the run takes 8 genuine micro-batches through
a checkpointed Trigger.AvailableNow drain into a memory sink) — and
return a batch DataFrame over the sink that a plain DuckDB aggregate
can mirror. That closes the loop the suite's stream==batch equivalence
tests open: the driver's differential gate now exercises the streaming
engine end-to-end (source schema normalization, watermarking, stateful
dedup, exactly-once drain), not just the batch twins.

Determinism notes:
- the replay directory is built once per (application, sf_dir) by
  ``repartitionByRange(8, ts)`` — contiguous event-time ranges, so a
  chronological replay never late-drops a first occurrence; file
  mtimes are staggered so the file source's mtime ordering replays
  them chronologically.
- the dedup twin's watermark horizon (3650 days) covers any fixture's
  event-time span: state is never purged mid-run, so the streamed
  output equals the batch DISTINCT for ANY replay order — the oracle
  equality does not depend on the mtime ordering, which is best-effort.
  (Production uses a horizon matched to its duplicate window; the
  operator and plumbing are identical.)
- each invocation uses a fresh checkpoint dir and a unique memory-sink
  name, so re-runs drain the full input instead of replay-skipping.

Scale notes (100 TB): the file-source replay IS the production shape —
a backlogged landing directory drained at a bounded files-per-trigger
rate; dropDuplicatesWithinWatermark keys state on (user_id,
event_type, ts) and purges it past the horizon, so state is bounded by
the duplicate window, not the stream's history. The memory sink is the
test/driver harness; production writes parquet/kafka with the same
writeStream call (engine.run_to_memory docstring).
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.queries import register
from ibis_olap_aggregation_spark.session import load_table
from ibis_olap_aggregation_spark.streaming.engine import (
    dedup_within_watermark,
    interval_join_streams,
    run_to_memory,
    run_upsert_sink,
    session_counts,
    sliding_counts,
    stream_events,
    tumbling_counts,
    user_running_totals,
)

_N_REPLAY_FILES = 8
_IDS = itertools.count()


def _replay_dir(spark: SparkSession, sf_dir: str) -> str:
    """Time-range-partitioned 8-file copy of events for rate-limited
    replay, built once per (application, sf_dir) under the system tmp
    dir. Contiguous ranges per file + staggered mtimes give the file
    source a chronological replay (see module docstring)."""
    key = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_replay",
        f"{spark.sparkContext.applicationId}_{key}",
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "events")
            .repartitionByRange(_N_REPLAY_FILES, "ts")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(out)
        )
        parts = sorted(
            f for f in os.listdir(out) if f.startswith("part-")
        )
        base = os.stat(out).st_mtime
        for i, f in enumerate(parts):
            p = os.path.join(out, f)
            os.utime(p, (base + i + 1, base + i + 1))
    return out


def _drain(
    spark: SparkSession,
    df: DataFrame,
    prefix: str,
    *,
    output_mode: str = "append",
) -> DataFrame:
    """Checkpointed AvailableNow drain into a uniquely-named memory
    sink. The sink's temp view and the checkpoint dir are registered
    for query-scoped release (ADVICE r11 item 2): without it a long
    sweep accumulates one fully-drained stream in driver memory plus
    one checkpoint tree on disk PER streaming-twin invocation until
    session stop. Release happens at the next registry-query entry —
    after the driver/bench has consumed this query's result (the
    registry-wide consumption contract, see session.query_cache)."""
    import shutil

    from ibis_olap_aggregation_spark.session import register_query_cleanup

    name = f"{prefix}_{next(_IDS)}"
    ckpt = tempfile.mkdtemp(prefix=f"spark_graft_ckpt_{name}_")
    _DRAIN_PROGRESS.value = run_to_memory(
        df, name, checkpoint_dir=ckpt, output_mode=output_mode
    )

    def _release(view=name, path=ckpt):
        # rmtree FIRST (ignore_errors — cannot raise): if the session is
        # already stopped, dropTempView raises and release swallows it —
        # ordering the other way would leak the checkpoint tree the
        # cleanup exists to remove (code-review r12)
        shutil.rmtree(path, ignore_errors=True)
        spark.catalog.dropTempView(view)

    register_query_cleanup(_release)
    return spark.table(name)


# Per-micro-batch progress reports of the CALLING THREAD's most recent
# _drain, for state audits (tests read stateOperators.numRowsTotal /
# numRowsRemoved to prove the bounded-horizon twin's eviction path
# actually runs). Thread-local for the same reason session's cache
# registry is: concurrent driver threads must not clobber each other's
# audit evidence.
import threading as _threading

_DRAIN_PROGRESS = _threading.local()


def last_drain_progress() -> list[dict]:
    """Progress reports of the calling thread's most recent _drain."""
    return getattr(_DRAIN_PROGRESS, "value", [])


@register(
    "streaming_dedup_within_watermark_twin",
    """
WITH d AS (SELECT DISTINCT user_id, event_type, ts FROM events),
a AS (SELECT event_type, COUNT(*) AS n_after_dedup FROM d GROUP BY 1),
r AS (SELECT event_type, COUNT(*) AS n_raw FROM events GROUP BY 1)
SELECT a.event_type, a.n_after_dedup,
       r.n_raw - a.n_after_dedup AS n_duplicates_dropped
FROM a JOIN r ON r.event_type = a.event_type
ORDER BY a.event_type
""",
)
def streaming_dedup_within_watermark_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dropDuplicatesWithinWatermark, driven end-to-end: 8-micro-batch
    rate-limited file replay -> watermarked stateful dedup on
    (user_id, event_type, ts) -> checkpointed AvailableNow drain ->
    per-type survivor counts next to the duplicates dropped. The oracle
    is the batch DISTINCT — exactly what the streaming operator must
    reproduce (first-seen row per key emitted once, later arrivals
    within the horizon suppressed). Output stays at the dedup-KEY grain
    (counts per event_type): which physical row survives a key tie is
    the operator's own arrival-order choice and is not part of the
    cross-engine contract."""
    ev = stream_events(spark, _replay_dir(spark, sf_dir), max_files_per_trigger=1)
    dd = dedup_within_watermark(ev, watermark="3650 days")
    sunk = _drain(spark, dd, "dedup_wm")
    after = sunk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_after_dedup")
    )
    raw = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_raw"))
    )
    return (
        after.join(raw, "event_type")
        .select(
            "event_type",
            "n_after_dedup",
            (F.col("n_raw") - F.col("n_after_dedup")).alias(
                "n_duplicates_dropped"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "streaming_file_replay_rate_limited",
    """
SELECT event_type,
       COUNT(*) AS event_count,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
FROM events
GROUP BY 1
ORDER BY 1
""",
)
def streaming_file_replay_rate_limited(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The rate-limited replay harness itself, verified for integrity:
    8 micro-batches (maxFilesPerTrigger=1) drain the full events table
    through the checkpointed memory sink, and the per-type counts, user
    cardinality, exact-decimal value sums and ts range must equal the
    batch table's — proving exactly-once file-source delivery and the
    ts physical-type normalization (TIMESTAMP(NANOS) -> timestamp) on
    the streaming read path. This is the replay harness a backfill or
    reprocessing pipeline runs against a landing directory; the oracle
    is the plain batch aggregate of the same rows."""
    ev = stream_events(spark, _replay_dir(spark, sf_dir), max_files_per_trigger=1)
    sunk = _drain(spark, ev, "replay_raw")
    return (
        sunk.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        )
        .orderBy("event_type")
    )


@register(
    "streaming_interval_join_twin",
    """
SELECT l.user_id,
       COUNT(*) AS n_pairs,
       COUNT(DISTINCT l.event_id) AS n_left_events
FROM events l
JOIN events r ON r.user_id = l.user_id
  AND r.ts > l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts
GROUP BY 1
ORDER BY 1
""",
)
def streaming_interval_join_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream event-time interval join, driven end-to-end: two
    independent rate-limited replays of the events table inner-join on
    user_id with the (l.ts - 1h, l.ts] time bound, drain through the
    checkpointed memory sink, and the per-user pair counts must equal
    the batch self-join (oracle). Inner stream-stream joins emit each
    match exactly once as soon as both rows have arrived, so the
    equality holds for any replay interleaving as long as state is not
    purged mid-run — the twin's watermark horizon (3650 days) covers
    the fixture span, exactly like the dedup twin. (Production sets the
    horizon to its lateness bound and the same time constraint lets the
    state store evict rows that can no longer match — the reason the
    join condition carries the bound at all.)

    Cost note: with the span-covering horizon NOTHING evicts, and the
    default HDFS-backed state store rewrites each partition's full
    state snapshot every micro-batch — measured ~33s at sf0.1 (100k
    rows/side x 8 batches). That is the twin's verification trade, not
    the operator's scale shape: a production lateness horizon keeps
    state at the bound's width, and RocksDB state stores write deltas."""
    path = _replay_dir(spark, sf_dir)
    l = stream_events(spark, path, max_files_per_trigger=1)
    r = stream_events(spark, path, max_files_per_trigger=1)
    j = interval_join_streams(
        l, r, key="user_id", interval="1 hour", watermark="3650 days"
    )
    sunk = _drain(spark, j, "ivjoin")
    return (
        sunk.groupBy(F.col("l_key").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("l_event_id").alias("n_left_events"),
        )
        .orderBy("user_id")
    )


@register(
    "streaming_interval_join_eviction",
    """
SELECT l.user_id,
       COUNT(*) AS n_pairs,
       COUNT(DISTINCT l.event_id) AS n_left_events
FROM events l
JOIN events r ON r.user_id = l.user_id
  AND r.ts > l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts
GROUP BY 1
ORDER BY 1
""",
)
def streaming_interval_join_eviction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The interval join with a PRODUCTION watermark horizon (2h = 2x
    the 1h interval), so the state-eviction machinery the operator
    exists for actually RUNS (VERDICT r11 item 4 — the span-covering
    twin above never evicts): with both sides time-bounded, Spark
    evicts left rows once watermark > l.ts and right rows once
    watermark > r.ts + 1h, keeping state at the horizon's width (~4h of
    events) instead of the stream's history.

    Why the FULL batch self-join is still the oracle: the replay dir is
    contiguous event-time ranges (repartitionByRange) drained oldest-
    file-first (distinct staggered mtimes, maxFilesPerTrigger=1), so
    every batch's min ts >= every earlier batch's max ts — no row is
    ever late, and for any within-interval pair (r.ts <= l.ts, so r
    lands in an earlier-or-same batch) the watermark when l arrives is
    <= l.ts - 2h < r.ts + 1h, i.e. r is provably still in state. Spark
    only evicts provably-unmatchable rows, so eviction cannot drop a
    pair — the streamed output equals the unrestricted batch join while
    per-batch state stays bounded (asserted from the run's
    stateOperators metrics in tests; sf0.1 smoke in PARITY.md)."""
    path = _replay_dir(spark, sf_dir)
    l = stream_events(spark, path, max_files_per_trigger=1)
    r = stream_events(spark, path, max_files_per_trigger=1)
    j = interval_join_streams(
        l, r, key="user_id", interval="1 hour", watermark="2 hours"
    )
    sunk = _drain(spark, j, "ivjoin_evict")
    return (
        sunk.groupBy(F.col("l_key").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("l_event_id").alias("n_left_events"),
        )
        .orderBy("user_id")
    )


@register(
    "streaming_upsert_latest_state_twin",
    """
WITH ranked AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM events
)
SELECT user_id, event_type, ts_us, value, event_id
FROM ranked WHERE rk = 1
ORDER BY 1, 2
""",
)
def streaming_upsert_latest_state_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CDC latest-state maintenance, driven end-to-end: the rate-limited
    replay streams into a VersionedParquetTable through foreachBatch
    (engine.run_upsert_sink) with a conflict-resolving ``prepare`` hook
    — each micro-batch reduces to its greatest-(ts, event_id) row per
    (user_id, event_type) and re-merges against the CURRENT snapshot
    for the touched keys, so the committed state converges to the
    global latest row per key for ANY replay order (order-independent
    CDC, not last-write-wins). The oracle is the batch argmax; the
    final snapshot must equal it after 8 atomic version commits.

    Scale shape: per micro-batch one key anti-join against the current
    snapshot plus a semi-join-bounded conflict re-merge — the state
    table is KEY-sized (users x event types), never event-sized."""
    from pyspark.sql import Window

    from ibis_olap_aggregation_spark.sources.io import VersionedParquetTable

    ev = stream_events(spark, _replay_dir(spark, sf_dir), max_files_per_trigger=1)
    proj = ev.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        "event_id",
    )
    cols = ["user_id", "event_type", "ts_us", "value", "event_id"]
    keys = ["user_id", "event_type"]
    root = os.path.join(
        tempfile.mkdtemp(prefix="spark_graft_state_"), "latest_state"
    )
    base = spark.createDataFrame(
        [], "user_id bigint, event_type string, ts_us bigint, value double, event_id bigint"
    )
    table = VersionedParquetTable.create(spark, root, base)
    w = Window.partitionBy(*keys).orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )

    def _latest(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("_rk", F.row_number().over(w))
            .filter("_rk = 1")
            .select(*cols)
        )

    def _prepare(batch: DataFrame) -> DataFrame:
        reduced = _latest(batch.select(*cols))
        contested = table.read().join(
            reduced.select(*keys).distinct(), keys, "semi"
        )
        return _latest(reduced.unionByName(contested.select(*cols)))

    name = f"upsert_{next(_IDS)}"
    ckpt = tempfile.mkdtemp(prefix=f"spark_graft_ckpt_{name}_")
    run_upsert_sink(proj, table, keys, checkpoint_dir=ckpt, prepare=_prepare)

    # the versioned state tree and checkpoint are per-invocation /tmp
    # artifacts (ADVICE r11 item 2) — released at the next registry
    # query, after the returned snapshot has been consumed
    import shutil

    from ibis_olap_aggregation_spark.session import register_query_cleanup

    state_tmp = os.path.dirname(root)
    register_query_cleanup(
        lambda: (
            shutil.rmtree(state_tmp, ignore_errors=True),
            shutil.rmtree(ckpt, ignore_errors=True),
        )
    )
    return table.read().select(*cols).orderBy("user_id", "event_type")


@register(
    "streaming_running_totals_twin",
    """
WITH u AS (
  SELECT user_id, COUNT(*) AS n_events,
         SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS cents
  FROM events GROUP BY 1
)
SELECT n_events,
       COUNT(*) AS n_users,
       CAST(SUM(cents) AS DOUBLE) / 100 AS total_value
FROM u GROUP BY 1 ORDER BY 1
""",
)
def streaming_running_totals_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState, driven end-to-end through the driver
    gate: 8-micro-batch rate-limited replay -> the custom per-user
    stateful accumulator (engine.user_running_totals: event count +
    exact integer-cents value total, Arrow-batched, state-store
    persisted) -> checkpointed drain -> per-user FINAL state -> user
    distribution by event count. Closes the last never-driver-checked
    streaming surface: dedup/replay/interval-join/upsert twins cover
    the built-in stateful operators; this one covers the custom-state
    API the silence-alert and running-total operators are built on.

    Order-independence (the twin contract every replay twin keeps):
    the state transition is COMMUTATIVE (count increments + integer
    cents sums, rounded per element before accumulating), so the final
    per-user state is replay-order invariant; update-mode emits one
    progress row per (user, touched micro-batch), and the final state
    is selected with max() per user — both columns are monotone
    nondecreasing across a user's updates, no ordering assumption.
    State is one fixed-width row per user (the production bound:
    key-sized, like the CDC upsert twin's), never event-sized.

    Rounding contract: the accumulator rounds value*100 per element with
    numpy (half-to-even) and the oracle with DuckDB ROUND (half-away) —
    they agree because events.value is exactly 2-decimal (verified: max
    distance from the cent grid ~4e-12 at every SF), so the half-cent
    boundary is unreachable. A 3-decimal fixture would need a shared
    rounding mode first.
    """
    ev = stream_events(
        spark, _replay_dir(spark, sf_dir), max_files_per_trigger=1
    )
    rt = user_running_totals(ev)
    # update output mode: the memory sink keeps every per-batch update
    # row (it does NOT overwrite by key) — the max() selection below is
    # what resolves a user's final state
    sunk = _drain(spark, rt, "running_totals", output_mode="update")
    # final state = the update row with the LARGEST n_events (strictly
    # increasing per touched batch) — max_by, not max(cents): cents is
    # only monotone while values are nonnegative, and the selection
    # must not lean on that data property (code-review r12b)
    final = sunk.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value_cents", "n_events").alias("cents"),
    )
    return (
        final.groupBy("n_events")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            (F.sum("cents").cast("double") / 100).alias("total_value"),
        )
        .orderBy("n_events")
    )


@register(
    "streaming_session_window_twin",
    """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
sess AS (
  SELECT user_id, ts, event_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
per AS (
  SELECT user_id, sid, COUNT(*) AS n, MIN(ts) AS s_start,
         MAX(ts) + INTERVAL '30 minutes' AS s_end
  FROM sess GROUP BY 1, 2
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(MAX(n) AS BIGINT) AS longest_session_events,
       strftime(MIN(s_start), '%Y-%m-%d %H:%M:%S') AS first_session_start,
       strftime(MAX(s_end), '%Y-%m-%d %H:%M:%S') AS last_session_end
FROM per GROUP BY 1 ORDER BY 1
""",
)
def streaming_session_window_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Native stateful SESSIONIZATION driven end-to-end through the
    streaming engine (the seventh twin — session windows are THE
    canonical stateful streaming operator): 8-micro-batch rate-limited
    file replay -> F.session_window(gap=30min) per user, sessions
    MERGING across micro-batches in the state store -> complete-mode
    drain -> per-user rollup (session count, event total, longest
    session, first start / last end). The oracle is the batch
    gaps-and-islands sessionization — exactly what cross-batch session
    merging must reproduce. The 3650-day watermark horizon covers any
    fixture span, so no event is ever late-dropped and the streamed
    state equals the batch sessions for ANY replay order (complete
    mode emits final state, not watermark-closed windows) — this twin
    belongs in the reversed-replay-order test with the other
    order-independent ones.

    Scale shape: state is keyed on (user_id, session) and sized by
    OPEN sessions, not history; production uses a horizon matched to
    its lateness SLA (sessions then emit in append mode as the
    watermark passes them) — operator and plumbing identical, only
    the horizon and output mode are harness choices, same contract as
    the dedup twin's documented horizon note."""
    ev = stream_events(
        spark, _replay_dir(spark, sf_dir), max_files_per_trigger=1
    )
    sess = session_counts(ev, watermark="3650 days")
    sunk = _drain(spark, sess, "session_wm", output_mode="complete")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return (
        sunk.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("event_count").cast("bigint").alias("n_events"),
            F.max("event_count").cast("bigint").alias("longest_session_events"),
            F.date_format(F.min("session_start"), fmt).alias(
                "first_session_start"
            ),
            F.date_format(F.max("session_end"), fmt).alias("last_session_end"),
        )
        .orderBy("user_id")
    )


@register(
    "streaming_tumbling_window_twin",
    """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       event_type,
       COUNT(*) AS event_count,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def streaming_tumbling_window_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked event-time tumbling aggregation driven end-to-end
    through the streaming engine (the eighth twin): 8-micro-batch
    rate-limited replay -> withWatermark + 1-hour F.window groupBy
    (incremental state per open window) -> complete-mode drain. The
    oracle is the plain batch hourly aggregate — what incremental
    window-state maintenance across micro-batches must reproduce.
    Complete-mode final state is arrival-order-free under the
    span-covering horizon, so this twin joins the reversed-replay
    test. Production trades the harness horizon for an SLA watermark
    + append mode (windows then emit as the watermark passes their
    end) — operator and plumbing identical."""
    ev = stream_events(
        spark, _replay_dir(spark, sf_dir), max_files_per_trigger=1
    )
    agg = tumbling_counts(ev, window="1 hour", watermark="3650 days")
    sunk = _drain(spark, agg, "tumbling_wm", output_mode="complete")
    return sunk.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
        "event_count",
        "sum_value",
    ).orderBy("window_start", "event_type")


@register(
    "streaming_sliding_window_twin",
    """
WITH exploded AS (
  SELECT e.ts,
         time_bucket(INTERVAL '30 minutes', e.ts) - k.k * INTERVAL '30 minutes'
           AS window_start
  FROM events e
  CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k) k
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS event_count
FROM exploded
GROUP BY 1
ORDER BY 1
""",
)
def streaming_sliding_window_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sliding event-time windows (1-hour width, 30-minute slide — each
    event maintained in TWO overlapping windows' state) driven through
    the streaming engine: 8-micro-batch replay -> watermarked sliding
    aggregation -> complete-mode drain. Oracle: the batch
    explode-into-two-buckets formulation. Complete-mode final state is
    arrival-order-free under the span-covering horizon (reversed-replay
    tested); production trades horizon for an SLA watermark + append
    mode, identical operator."""
    ev = stream_events(
        spark, _replay_dir(spark, sf_dir), max_files_per_trigger=1
    )
    agg = sliding_counts(
        ev, window="1 hour", slide="30 minutes", watermark="3650 days"
    )
    sunk = _drain(spark, agg, "sliding_wm", output_mode="complete")
    return sunk.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_count",
    ).orderBy("window_start")


# Recovery-evidence stash for the checkpoint-recovery twin: the property
# test needs the two phases' per-batch input-row counts to prove the
# restart RECOVERED (files 1-4 never re-read) instead of re-ingesting.
# Thread-local like _DRAIN_PROGRESS, same rationale.
_RECOVERY_EVIDENCE = _threading.local()


def last_recovery_evidence() -> dict:
    """Evidence dict of the calling thread's most recent
    streaming_checkpoint_recovery_twin run."""
    return getattr(_RECOVERY_EVIDENCE, "value", {})


@register(
    "streaming_checkpoint_recovery_twin",
    """
SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       event_type,
       COUNT(*) AS event_count,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def streaming_checkpoint_recovery_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Checkpoint RECOVERY mid-replay — the streaming claim a 100 TB
    operator actually needs proven (VERDICT r13 item 7): the pipeline
    is interrupted after micro-batch 4 of 8 and restarted FROM THE
    CHECKPOINT ALONE, and the final output must still equal the batch
    oracle exactly once — no lost files, no double-counted files.

    Phase 1 lands only the first 4 replay files in a fresh landing
    directory and drains them through a watermarked 1-day tumbling
    aggregation (4 checkpointed micro-batches, complete mode), then
    the query object is discarded — from the engine's perspective this
    is the crash point: nothing survives but the checkpoint's offset
    log and state store (the memory-sink rows are NOT reused; complete
    mode rewrites the sink from state on every trigger, so the
    restart's output comes from RECOVERED state, and the property
    test's harder variant kills a continuously-triggering query
    without waiting for idle). Phase 2 lands files 5-8, rebuilds the
    whole pipeline from scratch (new source, new plan), points it at
    the SAME checkpoint + sink name, and drains AvailableNow.

    Exactly-once evidence (asserted in tests via
    last_recovery_evidence): phase 2's summed numInputRows equals the
    row count of files 5-8 alone — the recovered offset log prevents
    re-reading files 1-4 — while the oracle hash match proves their
    CONTENT is nonetheless fully present in the final state. State
    recovery, not sink replay, is what carries phase 1's contribution
    across the restart.

    Scale shape: identical operator/plumbing to the tumbling twin; the
    landing-directory staging IS the production restart drill (a
    backlogged landing dir, a crashed job, a redeploy from
    checkpoint)."""
    import shutil

    from ibis_olap_aggregation_spark.session import register_query_cleanup

    replay = _replay_dir(spark, sf_dir)
    parts = sorted(f for f in os.listdir(replay) if f.startswith("part-"))
    land = tempfile.mkdtemp(prefix="spark_graft_recovery_land_")
    ckpt = tempfile.mkdtemp(prefix="spark_graft_recovery_ckpt_")
    name = f"ckpt_recovery_{next(_IDS)}"

    def _land(names: list[str], mtime_base: float) -> None:
        for i, f in enumerate(names):
            dst = os.path.join(land, f)
            shutil.copy(os.path.join(replay, f), dst)
            os.utime(dst, (mtime_base + i + 1, mtime_base + i + 1))

    def _run_phase() -> list[dict]:
        ev = stream_events(spark, land, max_files_per_trigger=1)
        agg = tumbling_counts(ev, window="1 day", watermark="3650 days")
        return run_to_memory(
            agg, name, checkpoint_dir=ckpt, output_mode="complete"
        )

    base = os.stat(land).st_mtime
    _land(parts[:4], base)
    p1 = _run_phase()
    # ---- crash point: only the checkpoint survives from here ----
    _land(parts[4:], base + 100)
    p2 = _run_phase()

    _RECOVERY_EVIDENCE.value = {
        "phase1_batches": len(p1),
        "phase2_batches": len(p2),
        "phase1_rows": sum(pr.get("numInputRows", 0) for pr in p1),
        "phase2_rows": sum(pr.get("numInputRows", 0) for pr in p2),
        "replay_dir": replay,
        "tail_files": [os.path.join(replay, f) for f in parts[4:]],
    }

    def _release(view=name, paths=(land, ckpt)):
        for p in paths:
            shutil.rmtree(p, ignore_errors=True)
        spark.catalog.dropTempView(view)

    register_query_cleanup(_release)
    return (
        spark.table(name)
        .select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "event_count",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


# Re-run the driver-coverage reorder AFTER this module's @register calls
# (ADVICE r11 item 3): when this module is imported FIRST, the circular
# import binds a partially-initialized replay_queries into queries.py,
# whose own final reorder then runs BEFORE the registrations above —
# this call makes the scheduler placement import-path independent.
from ibis_olap_aggregation_spark.queries import (  # noqa: E402
    _reorder_for_driver_coverage,
)

_reorder_for_driver_coverage()


# -- round 14c: streaming as-of enrichment (eleventh twin) -------------------

from ibis_olap_aggregation_spark.operators.temporal import (  # noqa: E402
    _ASOF_TOL_US,
)
from ibis_olap_aggregation_spark.queries import ORACLES as _ORACLES  # noqa: E402
from ibis_olap_aggregation_spark.streaming.engine import asof_enrich  # noqa: E402


@register(
    "streaming_asof_enrich_twin",
    _ORACLES["join_asof_backward"],
)
def streaming_asof_enrich_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming form of [join_asof_backward], driven end-to-end
    (the eleventh twin): 8-micro-batch rate-limited file replay ->
    applyInPandasWithState per user (engine.asof_enrich: state = ONE
    latest-purchase row, clicks enriched in event-time order within
    each batch) -> checkpointed append-mode drain -> the IDENTICAL
    output contract, hash-verified against the SAME DuckDB oracle as
    the batch op — stream == batch, proven through the driver gate.

    Ordering contract: like the interval-join twin (and unlike the
    commutative count/sum twins), as-of enrichment is event-time-
    ordered by nature — correctness rides the replay dir's contiguous
    oldest-first ranges, which is exactly the watermark-ordered
    delivery a production event-time pipeline provides; a click is
    enriched once, when processed, and never revised (append mode,
    exactly-once through the checkpoint).

    Scale shape: state is user-keyed and CONSTANT-width (one latest
    purchase per user, updated in place) — not a purchase log, not
    history; the per-batch work is one Arrow-batched ordered walk per
    touched user. The nullable match fields cross the Arrow boundary
    as DOUBLE (NaN-capable) and are cast back to BIGINT here."""
    ev = stream_events(
        spark, _replay_dir(spark, sf_dir), max_files_per_trigger=1
    )
    proj = ev.filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
        "value",
    )
    sunk = _drain(
        spark, asof_enrich(proj, _ASOF_TOL_US), "asof_enrich"
    )
    return sunk.select(
        F.col("click_event_id").cast("bigint").alias("click_event_id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("click_ts_us").cast("bigint").alias("click_ts_us"),
        F.col("purchase_event_id").cast("bigint").alias("purchase_event_id"),
        "purchase_value",
        F.col("gap_us").cast("bigint").alias("gap_us"),
    ).orderBy("click_event_id")


# The as-of twin above registered AFTER the module's re-reorder call —
# when THIS module is the first import, its placement must go through
# the same driver-coverage reorder as the canonical path (the interrupted
# build left this trailing registration unordered; inherited-state fix,
# optimization round 14).
_reorder_for_driver_coverage()
