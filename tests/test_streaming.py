"""Structured Streaming semantics tests.

Batch-equivalence: draining the whole events table through the stream
must reproduce the (oracle-checked) batch aggregations.
Watermark semantics: a second micro-batch containing events older than
the advanced watermark must have those events DROPPED (real late-data
behavior, provable only across micro-batches).
Custom state: applyInPandasWithState accumulates across micro-batches.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.session import load_table
from ibis_olap_aggregation_spark.streaming import engine as se


@pytest.fixture()
def workdir():
    d = f"/tmp/spark_streaming_test_{uuid.uuid4().hex[:8]}"
    os.makedirs(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_batch_files(workdir, src, *batches):
    """Place each batch as ONE bare parquet file in `src` (the streaming
    file source lists plain files, not nested dirs), with strictly
    increasing mtimes so micro-batch order follows batch order."""
    import glob

    base = os.stat(workdir).st_mtime
    for i, df in enumerate(batches):
        tmp = os.path.join(workdir, f"_stage_{i}")
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (base + 60 * i, base + 60 * i))


def _events_as_stream_dir(spark, sf_small, workdir, n_files=1):
    src = os.path.join(workdir, "input")
    # rewrite through Spark so the stream schema matches the batch loader
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_small}/events.parquet")
    raw.repartition(n_files).write.mode("overwrite").parquet(src)
    return src


def test_tumbling_stream_equals_batch(spark, sf_small, workdir):
    src = _events_as_stream_dir(spark, sf_small, workdir)
    stream = se.stream_events(spark, src)
    se.run_to_memory(
        se.tumbling_counts(stream),
        "t_tumbling",
        checkpoint_dir=workdir,
        output_mode="complete",
    )
    got = {
        (r.window_start, r.event_type): (r.event_count, r.sum_value)
        for r in spark.table("t_tumbling").collect()
    }
    batch = (
        load_table(spark, sf_small, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("s"),
        )
    )
    want = {(r.w.start, r.event_type): (r.n, r.s) for r in batch.collect()}
    assert got == want


def test_session_stream_equals_batch(spark, sf_small, workdir):
    src = _events_as_stream_dir(spark, sf_small, workdir)
    stream = se.stream_events(spark, src)
    se.run_to_memory(
        se.session_counts(stream),
        "t_sessions",
        checkpoint_dir=workdir,
        output_mode="complete",
    )
    got = spark.table("t_sessions")
    batch = (
        load_table(spark, sf_small, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("event_count"))
    )
    assert got.count() == batch.count()
    assert got.agg(F.sum("event_count")).collect()[0][0] == load_table(
        spark, sf_small, "events"
    ).count()


def test_watermark_drops_late_events(spark, workdir):
    """Late-data policy across micro-batches. Spark filters late events
    with the watermark COMMITTED BY THE PREVIOUS batch (eviction uses the
    current one — SPARK-40925 semantics), so the watermark must be
    advanced and committed (batches 0-1) before the late file (batch 2)
    arrives for the drop to be observable."""
    src = os.path.join(workdir, "late_input")
    os.makedirs(src)

    def mk(rows):
        return spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.unix_micros(F.to_timestamp("ts")) * 1000)

    b0 = mk([(1, "2024-06-10 12:00:00", 1, "click", 1.0, "{}"),
             (2, "2024-06-10 12:30:00", 1, "click", 1.0, "{}")])
    b1 = mk([(3, "2024-06-10 12:45:00", 1, "click", 1.0, "{}")])
    b2 = mk([(4, "2024-06-09 00:00:00", 1, "click", 1.0, "{}"),  # ~36h late
             (5, "2024-06-10 13:10:00", 1, "click", 1.0, "{}")])  # on time
    _write_batch_files(workdir, src, b0, b1, b2)

    stream = se.stream_events(spark, src, max_files_per_trigger=1)
    se.run_to_memory(
        se.tumbling_counts(stream, window="1 hour", watermark="2 hours"),
        "t_late",
        checkpoint_dir=workdir,
        output_mode="update",
    )
    rows = {}
    for r in spark.table("t_late").collect():
        k = r.window_start.isoformat()
        rows[k] = max(rows.get(k, 0), r.event_count)
    # event 4 (2024-06-09, far behind the committed watermark) is dropped:
    # its window never appears; the on-time events all count
    assert not any(k.startswith("2024-06-09") for k in rows), rows
    assert rows.get("2024-06-10T12:00:00") == 3, rows
    assert rows.get("2024-06-10T13:00:00") == 1, rows


def test_dedup_within_watermark(spark, sf_small, workdir):
    src = _events_as_stream_dir(spark, sf_small, workdir)
    ev = load_table(spark, sf_small, "events")
    doubled = os.path.join(workdir, "doubled")
    ev.unionAll(ev).repartition(2).write.parquet(doubled)
    stream = se.stream_events(spark, doubled).drop("ts_raw")
    deduped = se.dedup_within_watermark(stream.select("user_id", "event_type", "ts"))
    se.run_to_memory(deduped, "t_dedup", checkpoint_dir=workdir, output_mode="append")
    assert spark.table("t_dedup").count() == ev.select("user_id", "event_type", "ts").distinct().count()


def test_sliding_stream_equals_batch(spark, sf_small, workdir):
    src = _events_as_stream_dir(spark, sf_small, workdir)
    stream = se.stream_events(spark, src)
    se.run_to_memory(
        se.sliding_counts(stream),
        "t_sliding",
        checkpoint_dir=workdir,
        output_mode="complete",
    )
    got = {
        (r.window_start, r.event_count)
        for r in spark.table("t_sliding").collect()
    }
    batch = (
        load_table(spark, sf_small, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {(r.w.start, r.n) for r in batch.collect()}
    assert got == want


def test_foreachbatch_parquet_sink(spark, sf_small, workdir):
    """foreachBatch: the production sink shape — arbitrary batch writes
    (parquet here) with the micro-batch id available for idempotence."""
    src = _events_as_stream_dir(spark, sf_small, workdir)
    out = os.path.join(workdir, "sink")
    seen = []

    def write_batch(batch_df, batch_id):
        seen.append(batch_id)
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    stream = se.stream_events(spark, src)
    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", os.path.join(workdir, "ck_fb"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert seen, "at least one micro-batch"
    back = spark.read.parquet(out)
    assert back.count() == load_table(spark, sf_small, "events").count()


def test_stream_static_enrichment(spark, sf_small, workdir):
    """Each micro-batch joins the static dim without shuffling the
    stream; result matches the batch join."""
    src = _events_as_stream_dir(spark, sf_small, workdir)
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.1), ("error", -1.0), ("purchase", 10.0)],
        "event_type string, weight double",
    )
    stream = se.stream_events(spark, src)
    enriched = se.enrich_with_static(stream, dim, "event_type").groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("weight").cast("decimal(18,2)")).cast("double").alias("w"),
    )
    se.run_to_memory(enriched, "t_enrich", checkpoint_dir=workdir, output_mode="complete")
    got = {(r.event_type, r.n, r.w) for r in spark.table("t_enrich").collect()}
    batch = (
        load_table(spark, sf_small, "events")
        .join(F.broadcast(dim), "event_type", "left")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("weight").cast("decimal(18,2)")).cast("double").alias("w"),
        )
    )
    want = {(r.event_type, r.n, r.w) for r in batch.collect()}
    assert got == want


def test_stream_stream_interval_join(spark, sf_small, workdir):
    """Stream-stream join (clicks x errors within the trailing hour, per
    user) must equal the equivalent batch interval join."""
    src = _events_as_stream_dir(spark, sf_small, workdir)
    stream = se.stream_events(spark, src)
    clicks = stream.filter(F.col("event_type") == "click")
    errors = stream.filter(F.col("event_type") == "error")
    joined = se.interval_join_streams(clicks, errors)
    se.run_to_memory(joined, "t_ssj", checkpoint_dir=workdir, output_mode="append")
    got = {
        (r.l_event_id, r.r_event_id) for r in spark.table("t_ssj").collect()
    }
    ev = load_table(spark, sf_small, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    bc = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("l_key"), F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"))
    be = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("r_key"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"))
    batch = bc.join(
        be,
        F.expr("l_key = r_key AND r_ts > l_ts - INTERVAL 1 hour AND r_ts <= l_ts"),
    )
    want = {(r.l_event_id, r.r_event_id) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_running_totals_accumulate_across_batches(spark, workdir):
    src = os.path.join(workdir, "state_input")
    os.makedirs(src)
    b1 = spark.createDataFrame(
        [(1, "2024-06-10 12:00:00", 7, "click", 1.50, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.unix_micros(F.to_timestamp("ts")) * 1000)
    b2 = spark.createDataFrame(
        [(2, "2024-06-10 13:00:00", 7, "click", 2.25, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.unix_micros(F.to_timestamp("ts")) * 1000)
    _write_batch_files(workdir, src, b1, b2)

    stream = se.stream_events(spark, src, max_files_per_trigger=1)
    se.run_to_memory(
        se.user_running_totals(stream),
        "t_state",
        checkpoint_dir=workdir,
        output_mode="update",
    )
    rows = spark.table("t_state").collect()
    # update mode emits one row per batch; the LAST emission has the running total
    final = max((r for r in rows if r.user_id == 7), key=lambda r: r.n_events)
    assert final.n_events == 2
    assert final.total_value_cents == 375


def test_stream_starts_on_empty_source_dir(spark, sf_small, workdir):
    """Consumer-first startup: the stream must come up on an EMPTY source
    directory (batch schema probe has nothing to infer from -> falls back
    to the EVENTS_SCHEMA contract) and then process files that land after
    the query started."""
    src = os.path.join(workdir, "empty_input")
    os.makedirs(src)
    stream = se.stream_events(spark, src)  # must not raise
    agg = se.tumbling_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("empty_start")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert spark.sql("SELECT * FROM empty_start").count() == 0

    # first producer file lands after the consumer existed
    ev = load_table(spark, sf_small, "events").limit(100)
    _write_batch_files(workdir, src, ev)
    stream2 = se.stream_events(spark, src)
    se.run_to_memory(
        se.tumbling_counts(stream2),
        "empty_start2",
        checkpoint_dir=os.path.join(workdir, "ckpt_empty2"),
        output_mode="update",  # emit open windows too: count all 100
    )
    got = spark.sql("SELECT SUM(event_count) AS n FROM empty_start2").collect()[0].n
    assert got == 100


def test_silence_alert_fires_on_event_time_gap(spark, workdir):
    """Silence detection via EventTimeTimeout: 'heartbeat' stops after
    12:30 while 'click' keeps flowing (advancing the watermark); once
    the watermark passes heartbeat's last_seen + gap, the alert row is
    emitted with the pre-gap count. The still-flowing type never
    alerts. Timeouts use the watermark committed by the PREVIOUS batch
    (same SPARK-40925 semantics as late-drop), so the advancing batches
    precede a final flush batch."""
    src = os.path.join(workdir, "silence_input")
    os.makedirs(src)

    def mk(rows):
        return spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.unix_micros(F.to_timestamp("ts")) * 1000)

    b0 = mk([(1, "2024-06-10 12:00:00", 1, "heartbeat", 1.0, "{}"),
             (2, "2024-06-10 12:30:00", 1, "heartbeat", 1.0, "{}"),
             (3, "2024-06-10 12:30:00", 1, "click", 1.0, "{}")])
    b1 = mk([(4, "2024-06-10 15:00:00", 1, "click", 1.0, "{}")])
    b2 = mk([(5, "2024-06-10 16:00:00", 1, "click", 1.0, "{}")])
    b3 = mk([(6, "2024-06-10 16:30:00", 1, "click", 1.0, "{}")])
    _write_batch_files(workdir, src, b0, b1, b2, b3)

    stream = se.stream_events(spark, src, max_files_per_trigger=1)
    se.run_to_memory(
        se.silence_alerts(stream, gap_ms=60 * 60 * 1000),  # 1h gap
        "t_silence",
        checkpoint_dir=workdir,
        output_mode="append",
    )
    alerts = {r.event_type: r for r in spark.table("t_silence").collect()}
    assert "heartbeat" in alerts, alerts
    hb = alerts["heartbeat"]
    import datetime as _dt
    assert hb.last_seen_ms == int(
        _dt.datetime(2024, 6, 10, 12, 30, tzinfo=_dt.timezone.utc).timestamp() * 1000
    )
    assert hb.n_events_seen == 2
    # click kept flowing through the end: its timeout never fired
    assert "click" not in alerts, alerts


def test_silence_alert_rearms_after_resume(spark, workdir):
    """After an alert fires, a resumed key re-creates state and a SECOND
    silence window fires a second alert with the post-resume count —
    the detector is a recurring monitor, not a one-shot."""
    src = os.path.join(workdir, "silence_rearm")
    os.makedirs(src)

    def mk(rows):
        return spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.unix_micros(F.to_timestamp("ts")) * 1000)

    batches = [
        mk([(1, "2024-06-10 10:00:00", 1, "heartbeat", 1.0, "{}"),
            (2, "2024-06-10 10:00:00", 1, "click", 1.0, "{}")]),
        mk([(3, "2024-06-10 12:00:00", 1, "click", 1.0, "{}")]),   # hb gap 1
        mk([(4, "2024-06-10 12:30:00", 1, "click", 1.0, "{}")]),   # alert 1 fires
        mk([(5, "2024-06-10 13:00:00", 1, "heartbeat", 1.0, "{}")]),  # resume
        mk([(6, "2024-06-10 15:00:00", 1, "click", 1.0, "{}")]),   # hb gap 2
        mk([(7, "2024-06-10 15:30:00", 1, "click", 1.0, "{}")]),   # alert 2 fires
        mk([(8, "2024-06-10 16:00:00", 1, "click", 1.0, "{}")]),
    ]
    _write_batch_files(workdir, src, *batches)
    stream = se.stream_events(spark, src, max_files_per_trigger=1)
    se.run_to_memory(
        se.silence_alerts(stream, gap_ms=60 * 60 * 1000),
        "t_sil_rearm",
        checkpoint_dir=workdir,
        output_mode="append",
    )
    hb = sorted(
        (r.last_seen_ms, r.n_events_seen)
        for r in spark.table("t_sil_rearm").collect()
        if r.event_type == "heartbeat"
    )
    import datetime as _dt

    def ms(h):
        return int(_dt.datetime(2024, 6, 10, h, tzinfo=_dt.timezone.utc)
                   .timestamp() * 1000)

    # alert 1: last seen 10:00 with 1 event; alert 2 (re-armed): last
    # seen 13:00, count restarted at 1 after the state was dropped
    assert hb == [(ms(10), 1), (ms(13), 1)], hb


def test_streaming_upsert_sink_versions_atomically(spark, tmp_path):
    """foreachBatch + VersionedParquetTable: streamed updates merge into
    the table with one committed version per non-empty micro-batch, and
    the final state equals the same upsert applied in batch."""
    from ibis_olap_aggregation_spark.sources.io import VersionedParquetTable
    from ibis_olap_aggregation_spark.streaming.engine import run_upsert_sink

    base = spark.createDataFrame(
        [(1, "en", 10), (2, "de", 20), (3, "fr", 30)],
        "doc_id bigint, lang string, n_chars bigint",
    )
    root = str(tmp_path / "versioned_sink")
    table = VersionedParquetTable.create(spark, root, base)

    # stream source: one parquet file of updates (replace doc 2, add 4)
    src = str(tmp_path / "updates_src")
    updates = spark.createDataFrame(
        [(2, "xx", 99), (4, "es", 40)],
        "doc_id bigint, lang string, n_chars bigint",
    )
    updates.write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id bigint, lang string, n_chars bigint"
    ).parquet(src)

    run_upsert_sink(
        stream, table, ["doc_id"], checkpoint_dir=str(tmp_path / "ckpt")
    )

    assert table.current_version() == 1
    got = {r["doc_id"]: (r["lang"], r["n_chars"]) for r in table.read().collect()}
    assert got == {1: ("en", 10), 2: ("xx", 99), 3: ("fr", 30), 4: ("es", 40)}
    # previous snapshot still readable: the pre-stream state
    old = {r["doc_id"]: r["lang"] for r in table.read(0).collect()}
    assert old == {1: "en", 2: "de", 3: "fr"}


def test_streaming_upsert_sink_crash_recovery_no_double_commit(spark, tmp_path):
    """CDC-sink crash recovery (VERDICT r5 task #7): kill the
    foreachBatch writer mid-batch — in the WORST position, after the
    table commit but before the streaming checkpoint advances — and
    assert the restarted stream replays the batch without a double
    commit: the replayed upsert re-merges the same keys idempotently,
    so the final content is exactly the batch-applied result (no
    duplicate rows, no lost updates), with every intermediate version a
    complete readable snapshot."""
    import pytest as _pytest
    from pyspark.errors import StreamingQueryException

    from ibis_olap_aggregation_spark.sources.io import VersionedParquetTable
    from ibis_olap_aggregation_spark.streaming.engine import run_upsert_sink

    schema = "doc_id bigint, lang string, n_chars bigint"
    base = spark.createDataFrame(
        [(1, "en", 10), (2, "de", 20), (3, "fr", 30)], schema
    )
    root = str(tmp_path / "versioned_crash_sink")
    table = VersionedParquetTable.create(spark, root, base)

    src = str(tmp_path / "updates_src")
    updates = spark.createDataFrame([(2, "xx", 99), (4, "es", 40)], schema)
    updates.write.parquet(src)

    real_upsert = table.upsert
    crashed = {"done": False}

    def crash_after_commit(batch, key_cols, **kw):
        v = real_upsert(batch, key_cols, **kw)
        if not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("simulated writer death after commit")
        return v

    table.upsert = crash_after_commit

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        run_upsert_sink(
            stream, table, ["doc_id"],
            checkpoint_dir=str(tmp_path / "ckpt"), keep_versions=10,
        )

    with _pytest.raises(StreamingQueryException):
        run()
    # the commit landed before the crash: readers already see the merge,
    # and the table is on a complete snapshot (crash-atomicity)
    assert table.current_version() == 1
    assert crashed["done"]

    # restart with the SAME checkpoint: the un-checkpointed batch
    # replays, the upsert re-merges the same keys (idempotent content)
    run()

    final = {r["doc_id"]: (r["lang"], r["n_chars"]) for r in table.read().collect()}
    assert final == {1: ("en", 10), 2: ("xx", 99), 3: ("fr", 30), 4: ("es", 40)}
    # no duplicate keys anywhere in the replayed snapshot
    assert table.read().count() == 4
    # the replay produced a NEW version with identical content — commit
    # count may advance, CONTENT may not double-apply
    assert table.current_version() == 2
    v1 = {r["doc_id"]: (r["lang"], r["n_chars"]) for r in table.read(1).collect()}
    assert v1 == final


def test_streaming_upsert_sink_crash_before_commit_leaves_table_untouched(
    spark, tmp_path
):
    """Complement of the after-commit crash test: a writer that dies
    BEFORE the table commit (mid-merge) must leave readers on the old
    version entirely, and the restarted stream must land the batch
    exactly once — the at-least-once replay plus idempotent merge is
    only exactly-once if the failed attempt left no partial state."""
    import pytest as _pytest
    from pyspark.errors import StreamingQueryException

    from ibis_olap_aggregation_spark.sources.io import VersionedParquetTable
    from ibis_olap_aggregation_spark.streaming.engine import run_upsert_sink

    schema = "doc_id bigint, lang string, n_chars bigint"
    base = spark.createDataFrame([(1, "en", 10), (2, "de", 20)], schema)
    root = str(tmp_path / "versioned_precrash_sink")
    table = VersionedParquetTable.create(spark, root, base)

    src = str(tmp_path / "updates_src")
    spark.createDataFrame([(2, "xx", 99), (3, "fr", 30)], schema).write.parquet(src)

    real_upsert = table.upsert
    crashed = {"done": False}

    def crash_before_commit(batch, key_cols, **kw):
        if not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("simulated writer death before commit")
        return real_upsert(batch, key_cols, **kw)

    table.upsert = crash_before_commit

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        run_upsert_sink(
            stream, table, ["doc_id"],
            checkpoint_dir=str(tmp_path / "ckpt"), keep_versions=10,
        )

    with _pytest.raises(StreamingQueryException):
        run()
    # nothing committed, nothing partial: readers still on version 0
    assert table.current_version() == 0
    assert table.read().count() == 2

    run()  # restart: the batch replays and commits exactly once
    assert table.current_version() == 1
    final = {r["doc_id"]: r["lang"] for r in table.read().collect()}
    assert final == {1: "en", 2: "xx", 3: "fr"}


def test_scd2_stream_maintenance_equals_batch(spark, sf_small, tmp_path):
    """Streaming SCD2 maintenance: split the event history into three
    time-ordered micro-batches, run the foreachBatch merge sink, and
    the final dimension must equal the one-shot batch build — closed
    history, open versions, event counts, everything."""
    import pandas as pd

    from ibis_olap_aggregation_spark.queries import QUERIES
    from ibis_olap_aggregation_spark.sources.io import VersionedParquetTable
    from ibis_olap_aggregation_spark.streaming import scd2_stream as ss
    from ibis_olap_aggregation_spark.streaming.engine import stream_events

    ev = load_table(spark, sf_small, "events")
    # three ts-tercile batches: per-user order is preserved across
    # batches. Written via _write_batch_files (one bare file per batch,
    # strictly increasing mtimes): the file source orders by mod time,
    # and coarse fs timestamps on three fast appends can tie and
    # reorder batches, tripping the ordering guard (ADVICE r7).
    bounds = ev.selectExpr(
        "percentile(unix_micros(cast(ts as timestamp)), 0.34) AS b1",
        "percentile(unix_micros(cast(ts as timestamp)), 0.67) AS b2",
    ).first()
    src = str(tmp_path / "scd2_src")
    os.makedirs(src)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    _write_batch_files(
        str(tmp_path),
        src,
        ev.filter(us <= bounds.b1),
        ev.filter((us > bounds.b1) & (us <= bounds.b2)),
        ev.filter(us > bounds.b2),
    )

    seed = spark.createDataFrame([], ss.SCD2_SCHEMA)
    root = str(tmp_path / "scd2_dim")
    table = VersionedParquetTable.create(spark, root, seed)
    stream = stream_events(spark, src, max_files_per_trigger=1)
    ss.run_scd2_sink(stream, table, checkpoint_dir=str(tmp_path / "ckpt"))

    assert table.current_version() >= 2  # one commit per non-empty batch
    got_full = table.read().toPandas()
    # watermark sanity: every version's last counted event sits inside
    # its interval
    assert (got_full["valid_last_us"] >= got_full["valid_from_us"]).all()
    closed_rows = got_full[got_full["valid_to_us"].notna()]
    assert (closed_rows["valid_last_us"] <= closed_rows["valid_to_us"]).all()
    # the batch build keeps the historical 6-column schema; equivalence
    # is over that shared surface
    got = (
        got_full.drop(columns=["valid_last_us"])
        .sort_values(["user_id", "version"])
        .reset_index(drop=True)
    )
    want = (
        QUERIES["scd2_user_tier_dim"](spark, sf_small)
        .toPandas()
        .sort_values(["user_id", "version"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_scd2_stream_replayed_batch_is_skipped(spark, sf_small, tmp_path):
    """Exactly-once: re-running the stream with a FRESH checkpoint (so
    every batch replays) must not change the table — the batch-id
    ledger refuses already-applied batches instead of double-counting
    the same-tier merge path."""
    import pandas as pd

    from ibis_olap_aggregation_spark.sources.io import VersionedParquetTable
    from ibis_olap_aggregation_spark.streaming import scd2_stream as ss
    from ibis_olap_aggregation_spark.streaming.engine import stream_events

    ev = load_table(spark, sf_small, "events").limit(200)
    src = str(tmp_path / "src")
    ev.coalesce(1).write.parquet(src)
    seed = spark.createDataFrame([], ss.SCD2_SCHEMA)
    table = VersionedParquetTable.create(spark, str(tmp_path / "dim"), seed)

    ss.run_scd2_sink(
        stream_events(spark, src), table, checkpoint_dir=str(tmp_path / "c1")
    )
    v1 = table.current_version()
    before = table.read().toPandas().sort_values(["user_id", "version"])
    ss.run_scd2_sink(
        stream_events(spark, src), table, checkpoint_dir=str(tmp_path / "c2")
    )
    assert table.current_version() == v1
    after = table.read().toPandas().sort_values(["user_id", "version"])
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True), after.reset_index(drop=True)
    )


def test_scd2_stream_rejects_out_of_order(spark, sf_small, tmp_path):
    """The ordering guard must actually FIRE (a pruned raise_error
    column is the classic dead-assert): merging a batch that predates
    a user's open version raises instead of silently corrupting
    history."""
    import pytest

    from ibis_olap_aggregation_spark.sources.io import VersionedParquetTable
    from ibis_olap_aggregation_spark.streaming import scd2_stream as ss

    ev = load_table(spark, sf_small, "events")
    late_first = ev.orderBy("ts", "event_id").limit(400)
    seed = spark.createDataFrame([], ss.SCD2_SCHEMA)
    table = VersionedParquetTable.create(spark, str(tmp_path / "dim"), seed)
    # apply the LATER half first, then replay the earlier half
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    med = late_first.selectExpr(
        "percentile(unix_micros(cast(ts as timestamp)), 0.5) AS m"
    ).first().m
    table.upsert(
        ss.merge_scd2_batch(table.read(), late_first.filter(us > med)),
        ["user_id", "version"],
    )
    with pytest.raises(Exception, match="ordering violation"):
        ss.merge_scd2_batch(
            table.read(), late_first.filter(us <= med)
        ).collect()


def test_scd2_stream_rejects_interleaved_late_event(spark, sf_small, tmp_path):
    """ADVICE r7 (medium): a late event landing AFTER the open
    version's onset but BEFORE events already counted into it used to
    pass the onset-only guard and silently corrupt history. The
    valid_last_us watermark guard must refuse it."""
    import pytest

    from ibis_olap_aggregation_spark.operators.temporal import scd2_dim_from
    from ibis_olap_aggregation_spark.sources.io import VersionedParquetTable
    from ibis_olap_aggregation_spark.streaming import scd2_stream as ss

    ev = load_table(spark, sf_small, "events").orderBy("ts", "event_id").limit(400)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    # find an event strictly inside some user's OPEN run: removing it
    # from batch 1 leaves that run's onset and watermark intact, and
    # replaying it alone is exactly the interleave the guard must catch
    open_runs = (
        scd2_dim_from(ev, with_last=True)
        .filter("valid_to_us IS NULL AND n_events >= 3")
        .filter("valid_last_us > valid_from_us")
        .limit(20)
        .collect()
    )
    late_event_id = None
    for r in open_runs:
        cand = (
            ev.filter(
                (F.col("user_id") == r.user_id)
                & (us > r.valid_from_us)
                & (us < r.valid_last_us)
            )
            .limit(1)
            .collect()
        )
        if cand:
            late_event_id = cand[0]["event_id"]
            break
    assert late_event_id is not None, "fixture has no interior open-run event"

    seed = spark.createDataFrame([], ss.SCD2_SCHEMA)
    table = VersionedParquetTable.create(spark, str(tmp_path / "dim"), seed)
    table.upsert(
        ss.merge_scd2_batch(
            table.read(), ev.filter(F.col("event_id") != late_event_id)
        ),
        ["user_id", "version"],
    )
    with pytest.raises(Exception, match="ordering violation"):
        ss.merge_scd2_batch(
            table.read(), ev.filter(F.col("event_id") == late_event_id)
        ).collect()


def test_scd2_ledger_survives_crash_between_phases(spark, sf_small, tmp_path):
    """The applied-batch ledger commits in the SAME manifest write as
    the data (upsert meta), so 'data committed but ledger missing'
    cannot exist: after any committed version, current_meta() already
    names the batch."""
    from ibis_olap_aggregation_spark.sources.io import VersionedParquetTable
    from ibis_olap_aggregation_spark.streaming import scd2_stream as ss

    ev = load_table(spark, sf_small, "events").limit(100)
    seed = spark.createDataFrame([], ss.SCD2_SCHEMA)
    table = VersionedParquetTable.create(spark, str(tmp_path / "dim"), seed)
    rows = ss.merge_scd2_batch(table.read(), ev)
    table.upsert(
        rows, ["user_id", "version"], meta={"scd2_applied_batches": [0]}
    )
    assert table.current_meta() == {"scd2_applied_batches": [0]}
    # a metadata-less upsert elsewhere must NOT wipe the ledger
    table.upsert(table.read().limit(1), ["user_id", "version"])
    assert table.current_meta() == {"scd2_applied_batches": [0]}


def test_scd2_merge_migrates_six_column_dim(spark, sf_small):
    """A dimension persisted before valid_last_us existed (6-column
    schema) must merge cleanly: the shim backfills the watermark with
    valid_from_us (ADVICE r8) instead of failing on a missing column,
    and the result matches merging the same batch into the equivalent
    7-column dim."""
    from ibis_olap_aggregation_spark.streaming import scd2_stream as ss

    ev = load_table(spark, sf_small, "events")
    med = ev.selectExpr(
        "percentile(unix_micros(cast(ts as timestamp)), 0.5) AS m"
    ).first().m
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    first, second = ev.filter(us <= med), ev.filter(us > med)

    seed = spark.createDataFrame([], ss.SCD2_SCHEMA)
    dim7 = ss.merge_scd2_batch(seed, first)
    # the old persisted shape: same rows, watermark column absent —
    # equivalent to a 7-column dim whose watermark equals the onset
    dim6 = dim7.drop("valid_last_us")
    got = ss.merge_scd2_batch(dim6, second)
    want = ss.merge_scd2_batch(
        dim7.withColumn("valid_last_us", F.col("valid_from_us")), second
    )
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )


def test_streaming_twin_artifacts_released_with_query_caches(spark, sf_small):
    """ADVICE r11 item 2: each streaming-twin invocation used to leave
    its drained memory-sink table (full stream in driver memory) and
    checkpoint dir behind for the session's lifetime. They are now
    registered as query-scoped cleanups: after the result is consumed
    and release_query_caches() runs (what the next registry-query entry
    does), the sink's temp view is gone and the checkpoint dir removed."""
    import glob
    import tempfile

    from ibis_olap_aggregation_spark.queries import QUERIES
    from ibis_olap_aggregation_spark.session import release_query_caches

    release_query_caches()
    views_before = {t.name for t in spark.catalog.listTables()}
    ckpt_glob = os.path.join(tempfile.gettempdir(), "spark_graft_ckpt_dedup_wm_*")
    ckpts_before = set(glob.glob(ckpt_glob))

    out = QUERIES["streaming_dedup_within_watermark_twin"](spark, sf_small)
    assert out.count() > 0  # consume BEFORE release (the registry contract)

    views_mid = {t.name for t in spark.catalog.listTables()}
    assert any(v.startswith("dedup_wm_") for v in views_mid - views_before)
    assert set(glob.glob(ckpt_glob)) - ckpts_before

    release_query_caches()
    views_after = {t.name for t in spark.catalog.listTables()}
    assert not any(v.startswith("dedup_wm_") for v in views_after - views_before)
    assert set(glob.glob(ckpt_glob)) == ckpts_before


def test_streaming_upsert_state_tree_released(spark, sf_small):
    """The upsert twin's versioned /tmp state tree is query-scoped too:
    gone after release (its snapshot must be consumed first)."""
    import glob
    import tempfile

    from ibis_olap_aggregation_spark.queries import QUERIES
    from ibis_olap_aggregation_spark.session import release_query_caches

    release_query_caches()
    state_glob = os.path.join(tempfile.gettempdir(), "spark_graft_state_*")
    before = set(glob.glob(state_glob))
    out = QUERIES["streaming_upsert_latest_state_twin"](spark, sf_small)
    rows = out.collect()
    assert rows
    assert set(glob.glob(state_glob)) - before
    release_query_caches()
    assert set(glob.glob(state_glob)) == before


def test_interval_join_eviction_matches_batch_and_state_flattens(spark, sf_small):
    """VERDICT r12 item 4: the bounded-horizon (2h watermark) interval
    join twin must (a) still equal the full batch self-join — the
    chronological contiguous replay means no row is late and no
    in-state row a future pair needs is ever evicted — and (b) actually
    EXERCISE eviction: rows must be removed from the join state during
    the run and peak state must stay well below the twice-streamed
    input (the unbounded twin holds 2x all rows by the last batch)."""
    from ibis_olap_aggregation_spark.queries import QUERIES
    from ibis_olap_aggregation_spark.session import load_table, release_query_caches
    from ibis_olap_aggregation_spark.streaming import replay_queries as rq

    release_query_caches()
    got = QUERIES["streaming_interval_join_eviction"](spark, sf_small)
    got_rows = {r.user_id: (r.n_pairs, r.n_left_events) for r in got.collect()}
    progress = list(rq.last_drain_progress())

    ev = load_table(spark, sf_small, "events").select("user_id", "ts", "event_id")
    l = ev.select(
        F.col("user_id").alias("lu"), F.col("ts").alias("lts"),
        F.col("event_id").alias("lid"),
    )
    r = ev.select(F.col("user_id").alias("ru"), F.col("ts").alias("rts"))
    batch = (
        l.join(
            r,
            (F.col("ru") == F.col("lu"))
            & (F.col("rts") > F.col("lts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("rts") <= F.col("lts")),
        )
        .groupBy("lu")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("lid").alias("n_left_events"),
        )
    )
    want = {r.lu: (r.n_pairs, r.n_left_events) for r in batch.collect()}
    assert got_rows == want

    # state audit: eviction ran, and state never held both full streams
    ops = [p["stateOperators"][0] for p in progress if p.get("stateOperators")]
    assert ops, "no state operator metrics captured"
    assert sum(o.get("numRowsRemoved", 0) for o in ops) > 0, "nothing evicted"
    n_events = ev.count()
    peak = max(o["numRowsTotal"] for o in ops)
    assert peak < 2 * n_events * 0.6, (peak, 2 * n_events)
    release_query_caches()


# ---------------------------------------------------------------------------
# checkpoint recovery (round 14)
# ---------------------------------------------------------------------------


def test_checkpoint_recovery_twin_resumes_not_reingests(spark, sf_small):
    """Exactly-once evidence for streaming_checkpoint_recovery_twin:
    phase 2 (the restart from checkpoint) must have read ONLY files
    5-8 — its summed numInputRows equals those files' row count, and
    phase 1's 4 batches carried the rest. The oracle hash match (the
    mirror test) proves the CONTENT of files 1-4 still reached the
    final output — i.e. it traveled through the recovered state store,
    not a re-read."""
    from ibis_olap_aggregation_spark.queries import QUERIES
    from ibis_olap_aggregation_spark.streaming.replay_queries import (
        last_recovery_evidence,
    )

    out = QUERIES["streaming_checkpoint_recovery_twin"](spark, sf_small)
    total_out = out.agg(F.sum("event_count")).first()[0]
    ev = last_recovery_evidence()
    assert ev["phase1_batches"] == 4
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tail_rows = spark.read.parquet(*ev["tail_files"]).count()
    all_rows = load_table(spark, sf_small, "events").count()
    assert ev["phase2_rows"] == tail_rows
    assert ev["phase1_rows"] == all_rows - tail_rows
    # nothing lost, nothing duplicated end-to-end
    assert total_out == all_rows


def test_ungraceful_midflight_kill_recovers_exactly_once(
    spark, sf_small, workdir
):
    """The harder variant: a CONTINUOUSLY-TRIGGERING query over the full
    8-file backlog is stopped without waiting for idle as soon as at
    least one micro-batch has committed — a genuine mid-replay
    interruption at a nondeterministic point — then a rebuilt pipeline
    restarts from the same checkpoint with AvailableNow. The final
    complete-mode state must equal the batch aggregate exactly,
    whatever the kill point, and the two phases' input rows must sum
    to the table (no re-read of committed files)."""
    import time

    from ibis_olap_aggregation_spark.streaming.replay_queries import (
        _replay_dir,
    )

    replay = _replay_dir(spark, sf_small)
    ckpt = os.path.join(workdir, "ckpt")
    name = f"kill_recover_{uuid.uuid4().hex[:8]}"

    def pipeline():
        ev = se.stream_events(spark, replay, max_files_per_trigger=1)
        return se.tumbling_counts(ev, window="1 day", watermark="3650 days")

    q = (
        pipeline()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p.numInputRows > 0 for p in q.recentProgress):
            break
        time.sleep(0.05)
    q.stop()  # mid-flight: no graceful drain, no waiting for idle
    q.awaitTermination()
    phase1_rows = sum(p.numInputRows for p in q.recentProgress)

    q2 = (
        pipeline()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    phase2_rows = sum(p.numInputRows for p in q2.recentProgress)

    got = (
        spark.table(name)
        .select("window_start", "event_type", "event_count", "sum_value")
        .orderBy("window_start", "event_type")
        .toPandas()
    )
    batch = (
        load_table(spark, sf_small, "events")
        .groupBy(
            F.window(F.col("ts").cast("timestamp"), "1 day")["start"].alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("window_start", "event_type")
        .toPandas()
    )
    assert got.equals(batch), (got.head(), batch.head())
    total = load_table(spark, sf_small, "events").count()
    # committed offsets are never re-read; an uncommitted in-flight
    # batch at the kill point is REPLAYED by phase 2 (its rows were
    # never committed), so the sum can only exceed the table by rows
    # the sink never counted as committed — assert no LOSS and no
    # committed-batch duplication
    assert phase1_rows + phase2_rows >= total
    spark.catalog.dropTempView(name)
