"""Structured Streaming surface over the `events` table.

The reference has no streaming at all (SURVEY.md §2.10); this module is
the §7.4 extension built on Spark's native incremental engine:
readStream -> event-time windowed aggregation with watermarks ->
writeStream. The batch twins of these queries (operators/events.py) are
oracle-checked by the driver; the tests in tests/test_streaming.py prove
the STREAMING semantics — micro-batch processing, watermark-driven late
data dropping, cross-batch state (dedup, sessions, custom stateful ops).

Scale notes: all operators here are Spark's own stateful operators —
state lives in the executor state store (RocksDB-backed on a real
cluster), partitioned by grouping key; watermarks bound state size.
`user_running_totals` shows applyInPandasWithState for semantics the
built-ins can't express (cross-batch custom accumulators): state is
per-user, Arrow-batched, and scales horizontally with user cardinality.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType


# Fallback stream-source schema: the events table contract (TESTDATA.md).
# Used only when the source directory is empty at stream start — the
# normal streaming startup order, where the consumer comes up before the
# first producer file lands and a batch probe has nothing to infer from.
EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint,"
    " event_type string, value double, props string"
)


def stream_events(
    spark: SparkSession,
    path: str,
    *,
    max_files_per_trigger: int | None = None,
    schema=None,
) -> DataFrame:
    """File-source stream over events parquet: each file becomes (part
    of) a micro-batch. `ts` normalizes to TIMESTAMP exactly like the
    batch loader (session.load_table), whichever physical type the files
    carry — TIMESTAMP(NANOS) (surfaced as bigint nanos under the legacy
    conf) or plain TIMESTAMP(MICROS). Streaming sources need an explicit
    schema: pass one, or a one-off batch read of the same path probes it
    (assuming a fixed bigint schema silently reinterprets micros as
    nanos — 1970-dated windows — when the upstream writer changes
    precision). When the directory is EMPTY at start (consumer-first
    startup), the probe cannot infer and the EVENTS_SCHEMA contract is
    the fallback."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        try:
            schema = spark.read.parquet(path).schema
        except Exception:  # noqa: BLE001 - empty dir: nothing to infer from
            schema = EVENTS_SCHEMA
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    # TIMESTAMP (not NTZ): watermarks require it; session tz is UTC so the
    # values line up 1:1 with the batch loader's timestamp_ntz.
    if dict(df.dtypes).get("ts") == "bigint":  # nanos-as-long
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(
    events: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time tumbling window aggregation with a watermark: state for
    a window is dropped once the watermark passes its end; events older
    than the watermark are discarded (late-data policy)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding event-time windows (each event in window/slide windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(F.col("w.start").alias("window_start"), "event_count")
    )


def session_counts(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows (30-min inactivity gap) per user — Spark's native
    stateful session operator; sessions merge across micro-batches until
    the watermark closes them."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "event_count",
        )
    )


def dedup_within_watermark(events: DataFrame, *, watermark: str = "1 day") -> DataFrame:
    """Streaming exact dedup on (user_id, event_type, ts): duplicates
    arriving within the watermark horizon are dropped; state is purged
    past it (bounded memory — the streaming twin of dropDuplicates)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type", "ts"]
    )


_RUNNING_STATE = StructType(
    [StructField("n", LongType()), StructField("value_cents", LongType())]
)
_RUNNING_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value_cents", LongType()),
    ]
)


def _running_totals_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Cross-batch per-user accumulator (integer cents — exact)."""
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # round each element BEFORE accumulating: summing floats first
        # would make the total depend on micro-batch boundaries (same
        # stream, different trigger -> different cents)
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value_cents": [cents]}
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user event count + exact
    value total maintained across micro-batches via
    applyInPandasWithState (Arrow-batched, state store persisted)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=_RUNNING_OUT,
        stateStructType=_RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    interval: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with an event-time interval constraint:
    left rows match right rows of the same key whose timestamp falls in
    (left.ts - interval, left.ts]. BOTH sides carry watermarks + the time
    bound, so the state store can discard rows once they can no longer
    match — without the bound, stream-stream join state grows forever."""
    l = left.withWatermark("ts", watermark).select(
        F.col(key).alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    return l.join(
        r,
        F.expr(
            f"l_key = r_key AND r_ts > l_ts - INTERVAL {interval} AND r_ts <= l_ts"
        ),
    )


def enrich_with_static(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: each micro-batch broadcast-joins the static
    dimension (re-read per batch, so slowly-changing dims stay fresh).
    The streaming side never shuffles for the join.

    CALLER CONTRACT: ``dim`` must be broadcast-sized (the hint is
    unconditional because a row-count probe per micro-batch would add a
    blocking job on every trigger). For SF-linear dims past the ~2M-row
    bound (session.DIM_BROADCAST_ROW_CAP), pre-aggregate or slice the
    dim before enriching, or use a plain un-hinted join and let AQE
    size it per micro-batch."""
    return events.join(F.broadcast(dim), on, "left")


def run_to_memory(
    df: DataFrame,
    name: str,
    *,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> list[dict]:
    """Drain all available input (Trigger.AvailableNow) into an
    in-memory table `name`, then stop. Test/inspection sink; production
    sinks are parquet/kafka with the same writeStream call. Returns the
    run's per-micro-batch progress reports (dicts) so callers can audit
    state-store behavior — numRowsTotal / numRowsRemoved under
    ``stateOperators`` are how the eviction tests prove state actually
    flattens under a bounded watermark horizon.

    CAVEAT: ``recentProgress`` keeps only the LAST
    spark.sql.streaming.numRecentProgressUpdates reports (default 100)
    — a drain of more micro-batches than that returns a truncated tail,
    so audits summing across "the run" must either keep batch counts
    under the cap (the replay twins use 8 files) or raise the conf."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", os.path.join(checkpoint_dir, name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return list(q.recentProgress)


# -- silence / gap detection: event-time state timeouts ---------------------
_SILENCE_OUT = StructType(
    [
        StructField("event_type", StringType(), False),
        StructField("last_seen_ms", LongType(), True),
        StructField("n_events_seen", LongType(), True),
    ]
)
_SILENCE_STATE = StructType(
    [
        StructField("last_seen_ms", LongType(), True),
        StructField("n_events", LongType(), True),
    ]
)


def _make_silence_fn(gap_ms: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # the watermark passed last_seen + gap with NO new data for
            # this key: emit the alert and drop the state (a later event
            # for the key re-creates it — i.e. alerts re-arm)
            last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "event_type": [key[0]],
                    "last_seen_ms": [last],
                    "n_events_seen": [n],
                }
            )
            return
        last, n = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if len(pdf):
                ms = (pdf["ts"].astype("int64") // 1_000_000).max()
                last = max(last, int(ms))
                n += len(pdf)
        state.update((last, n))
        state.setTimeoutTimestamp(last + gap_ms)
        yield pd.DataFrame(
            {"event_type": [], "last_seen_ms": [], "n_events_seen": []}
        ).astype({"event_type": "object"})

    return fn


def silence_alerts(
    events: DataFrame, *, gap_ms: int, watermark: str = "0 seconds"
) -> DataFrame:
    """Silence (missing-heartbeat) detector — the alert behind "source X
    stopped sending": emits one row per event_type whose stream has
    been silent for `gap_ms` of EVENT TIME, carrying the last-seen
    timestamp and the count seen before the gap.

    This is the capability Spark's built-in stateful operators cannot
    express — an output triggered by the ABSENCE of input — implemented
    with applyInPandasWithState + EventTimeTimeout: every batch with
    data re-arms a per-key timeout at last_seen + gap; when the
    watermark (driven by OTHER keys still flowing) passes that mark
    with no new data, Spark invokes the function with hasTimedOut=True
    and the alert is emitted, after which the state is dropped (alerts
    re-arm if the key resumes). State is one (long, long) per key,
    partitioned by key across executors; the watermark bounds both
    state and timeout bookkeeping.
    """
    return (
        events.withWatermark("ts", watermark)
        .select("event_type", "ts")
        .groupBy("event_type")
        .applyInPandasWithState(
            _make_silence_fn(gap_ms),
            outputStructType=_SILENCE_OUT,
            stateStructType=_SILENCE_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_upsert_sink(
    df: DataFrame,
    table,
    key_cols: list[str],
    *,
    checkpoint_dir: str,
    keep_versions: int = 2,
    prepare=None,
) -> None:
    """Stream into a `VersionedParquetTable` with one atomic commit per
    micro-batch (foreachBatch -> SCD-1 upsert -> manifest flip): the
    streaming CDC-ingestion pattern. Readers always see a complete
    snapshot — a batch that dies mid-write leaves the table on the
    previous version (the orphan directory is GC'd by the next batch),
    and exactly-once lands for free because re-running a failed batch
    re-upserts the same keys idempotently. Drains available input
    (Trigger.AvailableNow) then stops; a production job runs the same
    call with a processing-time trigger.

    At scale each micro-batch costs one key anti-join against the
    current snapshot — right for metadata-sized tables (quality scores,
    dedup verdicts, license state); for append-only event firehoses use
    a plain parquet append sink and compact instead.

    ``prepare`` (optional): a ``DataFrame -> DataFrame`` hook applied to
    each non-empty micro-batch before the upsert — the CDC
    conflict-resolution point. The raw SCD-1 merge is last-write-wins
    and appends update rows verbatim, so a batch carrying several rows
    per key (or a replay arriving out of order) needs the hook to
    reduce to one winner per key — e.g. greatest-(ts, id), optionally
    re-merged against ``table.read()`` for order-independence (see
    streaming/replay_queries.py's latest-state twin). Replays stay
    idempotent as long as ``prepare`` is deterministic given (batch,
    current table state)."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if prepare is not None:
            batch = prepare(batch)
        table.upsert(batch, key_cols, keep_versions=keep_versions)

    q = (
        df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "upsert_sink"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# -- as-of enrichment: per-key latest-observation state ----------------------
#
# The streaming form of operators/temporal.join_asof_backward: state per
# user is ONE row (the latest purchase seen), clicks are enriched with
# it as they arrive. Correctness rides the replay engine's contiguous
# event-time ranges drained oldest-first (the interval-join twin's
# documented contract): within a micro-batch rows sort by event time, so
# the enrichment a click sees equals the batch as-of's. Nullable output
# fields are DOUBLE at the Arrow boundary (a LongType column cannot
# carry NaN through pandas) — the twin casts them back to BIGINT.
from pyspark.sql.types import DoubleType  # noqa: E402

_ASOF_STATE = StructType(
    [
        StructField("p_ts_us", LongType(), True),
        StructField("p_event_id", LongType(), True),
        StructField("p_value", DoubleType(), True),
    ]
)
_ASOF_OUT = StructType(
    [
        StructField("click_event_id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("click_ts_us", LongType(), False),
        StructField("purchase_event_id", DoubleType(), True),
        StructField("purchase_value", DoubleType(), True),
        StructField("gap_us", DoubleType(), True),
    ]
)
_ASOF_COLS = [f.name for f in _ASOF_OUT.fields]
# explicit dtypes for the yielded frames: an all-None object column
# (match fields when nothing matched in a batch) trips pandas'
# concat-with-all-NA deprecation inside pyspark's Arrow serializer and
# can drift the inferred type batch-to-batch
_ASOF_DTYPES = {
    "click_event_id": "int64",
    "user_id": "int64",
    "click_ts_us": "int64",
    "purchase_event_id": "float64",
    "purchase_value": "float64",
    "gap_us": "float64",
}


def _asof_frame(data: dict[str, list]) -> pd.DataFrame:
    return pd.DataFrame(
        {c: pd.Series(data[c], dtype=_ASOF_DTYPES[c]) for c in _ASOF_COLS}
    )


def _make_asof_fn(tol_us: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # pandas 2.x deprecation noise from PYSPARK'S OWN serializer
        # concat (serializers.py dump_stream): a group whose clicks all
        # went unmatched yields all-NA float64 match columns — required
        # NULLs, not a dtype accident (every yielded frame is built
        # with explicit dtypes via _asof_frame). Worker-scoped filter;
        # the eventual pandas behavior change cannot alter our typed
        # frames.
        import warnings

        warnings.filterwarnings(
            "ignore",
            message="The behavior of DataFrame concatenation with empty "
            "or all-NA entries",
            category=FutureWarning,
        )
        p_ts, p_eid, p_val = state.get if state.exists else (None, None, None)
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return  # nothing to enrich, nothing to update — yield no frame
        batch = pd.concat(frames, ignore_index=True)
        # event-time walk: purchases BEFORE clicks at equal ts (as-of
        # includes equality), PK-ordered within a side — the batch
        # operator's exact tie rule
        batch["side"] = (batch["event_type"] != "purchase").astype("int64")
        batch = batch.sort_values(["ts_us", "side", "event_id"])
        out: dict[str, list] = {c: [] for c in _ASOF_COLS}
        for r in batch.itertuples(index=False):
            if r.side == 0:
                if p_ts is None or (r.ts_us, r.event_id) > (p_ts, p_eid):
                    p_ts, p_eid = int(r.ts_us), int(r.event_id)
                    p_val = None if pd.isna(r.value) else float(r.value)
            else:
                gap = None if p_ts is None else int(r.ts_us) - p_ts
                hit = gap is not None and gap <= tol_us
                out["click_event_id"].append(int(r.event_id))
                out["user_id"].append(int(key[0]))
                out["click_ts_us"].append(int(r.ts_us))
                out["purchase_event_id"].append(float(p_eid) if hit else None)
                out["purchase_value"].append(p_val if hit else None)
                out["gap_us"].append(float(gap) if hit else None)
        if p_ts is not None:
            state.update((p_ts, p_eid, p_val))
        yield _asof_frame(out)

    return fn


def asof_enrich(events: DataFrame, tol_us: int) -> DataFrame:
    """Streaming backward as-of: enrich each click with the latest
    purchase by the same user, within ``tol_us``. State per user is ONE
    latest-purchase row — bounded by the key space, never by history
    (the property that lets this run forever at 100 TB/day). Input must
    carry user_id, ts_us, event_id, event_type, value."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_asof_fn(tol_us),
        outputStructType=_ASOF_OUT,
        stateStructType=_ASOF_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
