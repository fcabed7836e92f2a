"""Streaming SCD Type-2 maintenance: keep the versioned user-tier
dimension (operators/temporal.py `scd2_user_tier_dim`) current as event
micro-batches arrive — the incremental-warehouse counterpart of the
batch build, via foreachBatch + the crash-atomic VersionedParquetTable.

Per micro-batch the merge is INCREMENTAL: only users present in the
batch are touched. The batch's own tier runs are computed with the same
lag/run-id construction as the batch operator, then STITCHED onto each
user's open version:

- same tier as the open version  -> the open version extends (event
  count accumulates, valid_from keeps the original onset);
- different tier                 -> the open version closes at the
  batch run's onset and new versions append after it;
- user unseen so far             -> the batch runs become versions 1..k.

Ordering contract: events must arrive time-ordered per user ACROSS
micro-batches (an event older than a user's open version would demand
rewriting closed history — that is a backfill/replay, not streaming
maintenance). Within a batch, order is reconstructed by (ts, event_id)
exactly as the batch operator does. Late data should be fenced with a
watermark upstream; a violation surfaces as a NEGATIVE-length interval,
which `merge_scd2_batch` refuses loudly rather than corrupting history.

Scale: each micro-batch costs one run-length aggregation of the batch
(shuffle on user_id), one join against the open slice of the dimension
(keyed on user_id; the open slice is user-count bounded), and one
upsert into the versioned table (anti-join on the touched keys). The
closed history is never rewritten.

Exactly-once: the upsert keys are (user_id, version) and the stitch is
deterministic given (dim state, batch), so a replayed batch after a
crash re-derives byte-identical rows against the already-merged
snapshot ONLY when the batch was not half-applied — which the
VersionedParquetTable guarantees (a batch either committed its version
flip or left the table untouched; tests cover both crash positions for
the CDC sink, streaming/engine.py run_upsert_sink).
Re-merging an ALREADY-APPLIED batch is also idempotent for the
same-tier path (counts would double only if the run were re-added —
it is not, because the replay stitches onto the post-merge open
version and extends it by the same events the crashed attempt already
folded in... which WOULD double-count). To keep replay exactly-once
the sink therefore tags each committed version with the batch id and
SKIPS a batch whose id is already recorded — the same
transactional-sink idiom Structured Streaming documents for
foreachBatch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TIER = "CASE WHEN value < 60 THEN 'low' WHEN value < 140 THEN 'mid' ELSE 'high' END"

# dimension schema (mirrors operators/temporal.py scd2_user_tier_dim)
SCD2_SCHEMA = (
    "user_id bigint, version bigint, tier string, "
    "valid_from_us bigint, valid_to_us bigint, n_events bigint"
)


def scd2_batch_runs(batch: DataFrame) -> DataFrame:
    """Run-length compress ONE micro-batch into per-user tier runs:
    (user_id, run_seq 1.., tier, valid_from_us, valid_to_us — null for
    the batch's last run — and n_events). Identical window construction
    to the batch operator (lag -> change flag -> running sum)."""
    ev = batch.select(
        "user_id",
        "ts",
        "event_id",
        F.expr(_TIER).alias("tier"),
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
        "run_seq",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    grouped = runs.groupBy(
        "user_id", F.col("run_seq").cast("bigint").alias("run_seq"), "tier"
    ).agg(F.min("ts").alias("from_ts"), F.count(F.lit(1)).alias("n_events"))
    w2 = Window.partitionBy("user_id").orderBy("run_seq")
    return grouped.select(
        "user_id",
        "run_seq",
        "tier",
        F.unix_micros(F.col("from_ts").cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(F.lead("from_ts").over(w2).cast("timestamp")).alias(
            "valid_to_us"
        ),
        F.col("n_events").cast("bigint").alias("n_events"),
    )


def merge_scd2_batch(dim: DataFrame, batch: DataFrame) -> DataFrame:
    """The rows to UPSERT (keys: user_id, version) that bring ``dim``
    current with ``batch``. Closed history is never touched; returns
    only modified/new rows."""
    runs = scd2_batch_runs(batch)
    open_v = dim.filter(F.col("valid_to_us").isNull()).select(
        F.col("user_id").alias("o_user"),
        F.col("version").alias("o_version"),
        F.col("tier").alias("o_tier"),
        F.col("valid_from_us").alias("o_from"),
        F.col("n_events").alias("o_n"),
    )
    first_run = runs.filter(F.col("run_seq") == 1).select(
        F.col("user_id").alias("f_user"),
        F.col("tier").alias("f_tier"),
        F.col("valid_from_us").alias("f_from"),
    )
    j = runs.join(open_v, runs.user_id == open_v.o_user, "left").join(
        first_run, runs.user_id == first_run.f_user
    )
    # ordering contract: nothing in the batch may predate the open onset
    j = j.withColumn(
        "_guard",
        F.when(
            F.col("o_from").isNotNull()
            & (F.col("valid_from_us") < F.col("o_from")),
            F.raise_error(
                F.concat(
                    F.lit("scd2 stream ordering violation for user "),
                    F.col("user_id").cast("string"),
                    F.lit(": batch event predates the open version"),
                )
            ),
        ),
    ).drop("_guard")
    has_open = F.col("o_version").isNotNull()
    first_merges = has_open & (F.col("f_tier") == F.col("o_tier"))
    merged_first = first_merges & (F.col("run_seq") == 1)
    # version arithmetic: no open version -> 1..k as-is; merged first
    # run lands ON the open version (runs shift back one); tier change
    # -> every run lands past the open version
    version = (
        F.when(~has_open, F.col("run_seq"))
        .when(first_merges, F.col("o_version") + F.col("run_seq") - 1)
        .otherwise(F.col("o_version") + F.col("run_seq"))
    )
    new_rows = j.select(
        "user_id",
        version.cast("bigint").alias("version"),
        "tier",
        F.when(merged_first, F.col("o_from"))
        .otherwise(F.col("valid_from_us"))
        .alias("valid_from_us"),
        "valid_to_us",
        F.when(merged_first, F.col("n_events") + F.col("o_n"))
        .otherwise(F.col("n_events"))
        .alias("n_events"),
    )
    # closing row for a tier-changing open version: valid_to = the
    # batch's first onset for that user
    closed = (
        open_v.join(first_run, open_v.o_user == first_run.f_user)
        .filter(F.col("o_tier") != F.col("f_tier"))
        .select(
            F.col("o_user").alias("user_id"),
            F.col("o_version").alias("version"),
            F.col("o_tier").alias("tier"),
            F.col("o_from").alias("valid_from_us"),
            F.col("f_from").alias("valid_to_us"),
            F.col("o_n").alias("n_events"),
        )
    )
    return new_rows.unionByName(closed)


def run_scd2_sink(stream: DataFrame, table, *, checkpoint_dir: str) -> None:
    """Maintain an SCD2 dimension from an event stream: one atomic
    table version per non-empty micro-batch, exactly-once via a
    batch-id ledger next to the table (the documented foreachBatch
    transactional-sink idiom — a replayed batch whose id is already
    recorded is skipped, because re-stitching an applied batch would
    double-count the same-tier merge path)."""
    ledger = os.path.join(table.root, "_applied_batches.json")

    def _applied() -> set[int]:
        try:
            with open(ledger) as f:
                return set(json.load(f))
        except OSError:
            return set()

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty() or batch_id in _applied():
            return
        dim = table.read()
        rows = merge_scd2_batch(dim, batch)
        table.upsert(rows, ["user_id", "version"])
        done = sorted(_applied() | {batch_id})
        tmp = ledger + ".tmp"
        with open(tmp, "w") as f:
            json.dump(done, f)
        os.replace(tmp, ledger)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "scd2_sink"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
