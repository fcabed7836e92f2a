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
watermark upstream; as a backstop the dimension carries each version's
LAST counted event timestamp (`valid_last_us`), and `merge_scd2_batch`
refuses loudly — raise_error, nothing committed — any batch containing
an event at or before the open version's watermark. The onset alone
would miss a late event that interleaves after the open version's
start but before events already counted into it (ADVICE r7); the
watermark guard catches both that interleave and the pre-onset case
(the watermark is always >= the onset). Events exactly AT the
watermark are refused too: their (ts, event_id) order relative to the
already-counted event is no longer reconstructible across batches.

Scale: each micro-batch costs one run-length aggregation of the batch
(shuffle on user_id), one join against the open slice of the dimension
(keyed on user_id; the open slice is user-count bounded), and one
upsert into the versioned table (anti-join on the touched keys). The
closed history is never rewritten.

Exactly-once: a batch either committed its version flip or left the
table untouched (VersionedParquetTable's guarantee; both crash
positions are test-covered for the CDC sink). But re-stitching an
ALREADY-APPLIED batch would double-count — the replay would extend the
post-merge open version by events it already contains — so the sink
records each applied batch id IN THE TABLE MANIFEST, committed by the
same atomic write as the data (`upsert(meta=...)`), and skips recorded
ids. A side-file ledger would leave a crash window between data commit
and ledger write through which a replay double-counts; the in-manifest
ledger has no such window.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.operators.temporal import scd2_dim_from

# dimension schema: operators/temporal.py scd2_user_tier_dim plus the
# per-version last-event watermark the ordering guard rides on
SCD2_SCHEMA = (
    "user_id bigint, version bigint, tier string, "
    "valid_from_us bigint, valid_to_us bigint, valid_last_us bigint, "
    "n_events bigint"
)


def scd2_batch_runs(batch: DataFrame) -> DataFrame:
    """Run-length compress ONE micro-batch into per-user tier runs:
    (user_id, run_seq 1.., tier, valid_from_us, valid_to_us — null for
    the batch's last run — valid_last_us and n_events). Delegates to
    the BATCH operator's construction (operators/temporal.scd2_dim_from):
    the stream==batch equivalence only means something while both sides
    run the one shared build, so there is deliberately no second copy
    of the window logic or the tier thresholds here."""
    return scd2_dim_from(batch, with_last=True).withColumnRenamed(
        "version", "run_seq"
    )


def merge_scd2_batch(dim: DataFrame, batch: DataFrame) -> DataFrame:
    """The rows to UPSERT (keys: user_id, version) that bring ``dim``
    current with ``batch``. Closed history is never touched; returns
    only modified/new rows."""
    if "valid_last_us" not in dim.columns:
        # migration shim (ADVICE r8): valid_last_us joined the schema
        # after dimensions were first persisted, so a 6-column dim from
        # an older run would fail here with a missing column. Backfill
        # with valid_from_us — the weakest watermark that is always
        # true (the version's onset IS a counted event), so the
        # ordering guard stays sound, merely less strict for the first
        # merge after migration (events between the old dim's onset and
        # its true last counted event are no longer detectable — they
        # were already un-detectable in the 6-column schema).
        dim = dim.withColumn("valid_last_us", F.col("valid_from_us"))
    runs = scd2_batch_runs(batch)
    open_v = dim.filter(F.col("valid_to_us").isNull()).select(
        F.col("user_id").alias("o_user"),
        F.col("version").alias("o_version"),
        F.col("tier").alias("o_tier"),
        F.col("valid_from_us").alias("o_from"),
        F.col("valid_last_us").alias("o_last"),
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
    # ordering contract: nothing in the batch may land at or before the
    # open version's LAST counted event (the watermark — always >= the
    # onset, so this subsumes the old predates-the-onset check and also
    # catches a late event interleaving inside the open run's span,
    # ADVICE r7). The guard must ride a column every output row
    # EVALUATES — an unreferenced withColumn gets pruned by Catalyst,
    # and a branch of a when() never evaluates for rows taking the
    # other branch (the first cut wrapped valid_from_us, whose
    # merged-first branch reads o_from instead: a same-tier late run
    # slipped straight through — the per-ROW dead-assert pitfall; both
    # pinned by tests/test_streaming.py::test_scd2_stream_rejects_*).
    # valid_last_us is selected unconditionally below, so the guard
    # wraps it. Run 1's onset is the user's minimum batch timestamp, so
    # one comparison covers every event in the batch.
    guarded_last = F.when(
        F.col("o_last").isNotNull()
        & (F.col("valid_from_us") <= F.col("o_last")),
        F.raise_error(
            F.concat(
                F.lit("scd2 stream ordering violation for user "),
                F.col("user_id").cast("string"),
                F.lit(
                    ": batch event at or before the open version's"
                    " last counted event"
                ),
            )
        ).cast("bigint"),
    ).otherwise(F.col("valid_last_us"))
    j = j.withColumn("valid_last_us", guarded_last)
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
        # the batch's events all postdate o_last (guarded above), so a
        # run's own last event is the merged version's watermark too
        F.col("valid_last_us"),
        F.when(merged_first, F.col("n_events") + F.col("o_n"))
        .otherwise(F.col("n_events"))
        .alias("n_events"),
    )
    # closing row for a tier-changing open version: valid_to = the
    # batch's first onset for that user; its events (and watermark)
    # are untouched
    closed = (
        open_v.join(first_run, open_v.o_user == first_run.f_user)
        .filter(F.col("o_tier") != F.col("f_tier"))
        .select(
            F.col("o_user").alias("user_id"),
            F.col("o_version").alias("version"),
            F.col("o_tier").alias("tier"),
            F.col("o_from").alias("valid_from_us"),
            F.col("f_from").alias("valid_to_us"),
            F.col("o_last").alias("valid_last_us"),
            F.col("o_n").alias("n_events"),
        )
    )
    return new_rows.unionByName(closed)


def run_scd2_sink(stream: DataFrame, table, *, checkpoint_dir: str) -> None:
    """Maintain an SCD2 dimension from an event stream: one atomic
    table version per non-empty micro-batch, exactly-once via a
    batch-id ledger committed IN THE TABLE MANIFEST (the documented
    foreachBatch transactional-sink idiom) — a replayed batch whose id
    is already recorded is skipped, because re-stitching an applied
    batch would double-count the same-tier merge path.

    The ledger rides `VersionedParquetTable.upsert(meta=...)`, so it
    flips in the SAME atomic manifest write as the data: a crash
    between 'data committed' and 'ledger written' cannot exist (a
    side-file ledger has exactly that window, and a replay through it
    double-counts)."""

    def _applied() -> set[int]:
        return set(table.current_meta().get("scd2_applied_batches", []))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty() or batch_id in _applied():
            return
        dim = table.read()
        rows = merge_scd2_batch(dim, batch)
        table.upsert(
            rows,
            ["user_id", "version"],
            meta={"scd2_applied_batches": sorted(_applied() | {batch_id})},
        )

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "scd2_sink"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
