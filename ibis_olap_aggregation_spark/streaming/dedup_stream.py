"""Streaming incremental dedup: continuous ingestion vs a corpus store.

The production pipeline behind "dedupe documents as they arrive":
a Structured Streaming source of new documents, a persisted corpus
SIGNATURE STORE (parquet, `doc_signatures` layout), and per micro-batch

  1. signatures of the batch only (map-side — the corpus is never
     re-hashed),
  2. exact-tier dedup WITHIN the batch (content-hash groupBy: the
     smallest doc_id is canonical, the rest are `exact_dup` of it),
  3. `classify_new_vs_corpus` for the batch canonicals (exact hash
     join + LSH band join + Jaccard verify on candidates),
  4. verdicts appended to the verdict log; docs that survived as
     `unique` appended to the signature store so LATER batches dedupe
     against them.

Near-dup pairs WITHIN one micro-batch are intentionally NOT resolved
here: both members classify against the (pre-batch) store and can both
land `unique`. Resolving them needs the full pair machinery
(`dedup_duplicate_clusters`) — the standard design runs streaming
dedup as the cheap first pass and reconciles intra-batch near-dups in
the periodic batch re-dedup. The exact tier IS resolved in-batch
(step 2), so identical payloads arriving together never double-enter
the store.

Scale notes: the store grows by unique docs only; its band join is the
same asymmetric bucket equi-join as the batch query (shuffles the
batch's bands, not the store, when the store is bucketed on
(band_id, band_hash)).

Exactly-once: both sinks are partitioned by the micro-batch id and
written with dynamic partition overwrite, and classification excludes
store rows tagged with the CURRENT batch id. A batch that crashes
after either write (before the checkpoint commit) is replayed against
the exact pre-batch store view and simply REPLACES its own partitions
— bit-identical verdicts, no duplicate store rows, no self-matches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.operators.dedup import (
    classify_new_vs_corpus,
    doc_signatures,
)

__all__ = [
    "DOCS_SCHEMA",
    "seed_signature_store",
    "dedup_batch_against_store",
    "run_dedup_stream",
]

# The documents table contract (TESTDATA.md) — streams must declare a
# schema up front (the source dir may be empty at start).
DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


# Store rows carry the id of the micro-batch that appended them
# (seed rows: -1). Classification for batch N excludes rows tagged N,
# so re-running a crashed batch sees EXACTLY the pre-batch store — no
# self-matches, bit-identical verdicts (see run_dedup_stream).
SEED_BATCH_ID = -1


def seed_signature_store(docs: DataFrame, store_dir: str) -> None:
    """Initialize the corpus signature store from an existing
    (already-deduplicated) document table.

    Writes INTO the `_batch_id=-1` partition directory rather than via
    partitionBy: a partitioned write of an EMPTY seed (a pipeline that
    starts from nothing) would emit no files at all, leaving the store
    unreadable; the static-subdir write always lands a schema-bearing
    file and partition discovery still reads it as `_batch_id=-1`.

    Seeding is ONE-TIME init: a store_dir that already holds stream
    partitions (`_batch_id>=0` from a previous run) is refused —
    overwriting only the seed partition would leave those stale rows to
    silently rejoin the corpus on the next read. Delete the store (and
    the stream's checkpoint) to re-initialize from scratch.

    CONCURRENCY ASSUMPTION: seeding happens BEFORE the stream starts,
    in the same single setup process — the guard is check-then-act, not
    a lock. As a backstop against a mis-sequenced pipeline (stream
    already appending while the seed writes), the scan re-runs AFTER
    the write and fails loudly; the half-seeded store must then be
    deleted along with the checkpoint."""

    def _stream_partitions() -> list[str]:
        return [
            e
            for e in (os.listdir(store_dir) if os.path.isdir(store_dir) else [])
            if e.startswith("_batch_id=") and e != f"_batch_id={SEED_BATCH_ID}"
        ]

    stale = _stream_partitions()
    if stale:
        raise ValueError(
            f"signature store {store_dir!r} already has stream partitions "
            f"({sorted(stale)[:3]}...): re-seeding would leave a ghost "
            "corpus — delete the store and checkpoint directories first"
        )
    doc_signatures(docs).write.mode("overwrite").parquet(
        os.path.join(store_dir, f"_batch_id={SEED_BATCH_ID}")
    )
    from ibis_olap_aggregation_spark.sources.io import _invalidate_probe_memo

    _invalidate_probe_memo()  # signature store (re-)seeded in place
    landed = _stream_partitions()
    if landed:
        raise RuntimeError(
            f"signature store {store_dir!r} gained stream partitions "
            f"({sorted(landed)[:3]}...) WHILE seeding — a stream was "
            "already running; delete the store and checkpoint and seed "
            "before starting the stream"
        )


def dedup_batch_against_store(
    spark: SparkSession, batch: DataFrame, store_dir: str, batch_id: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """One increment: returns (verdicts, new_store_rows).

    verdicts: (doc_id, verdict, matched_doc_id, n_lsh_candidates) for
    EVERY batch doc — in-batch exact dups carry verdict `exact_dup`
    with the batch canonical as match (and n_lsh_candidates = 0: they
    never reach the LSH tier). new_store_rows: signature rows of the
    docs that classified `unique` (the store delta, minus the
    `_batch_id` tag the stream writer adds).

    ``batch_id``: when re-running a crashed micro-batch, store rows a
    previous attempt of the SAME batch already appended must not
    classify against themselves — rows tagged with this id are
    excluded, restoring the exact pre-batch store view."""
    sigs = doc_signatures(batch)
    # in-batch exact tier: one content-hash groupBy
    canon = sigs.groupBy("ch").agg(F.min("doc_id").alias("_canon"))
    sigs = sigs.join(canon, "ch")
    batch_dups = sigs.filter(F.col("doc_id") != F.col("_canon")).select(
        "doc_id",
        F.lit("exact_dup").alias("verdict"),
        F.col("_canon").alias("matched_doc_id"),
        F.lit(0).cast("bigint").alias("n_lsh_candidates"),
    )
    canonicals = sigs.filter(F.col("doc_id") == F.col("_canon")).drop("_canon")
    store = spark.read.parquet(store_dir)
    if "_batch_id" in store.columns:
        if batch_id is not None:
            store = store.filter(F.col("_batch_id") != batch_id)
        store = store.drop("_batch_id")
    verdicts = classify_new_vs_corpus(canonicals, store)
    new_rows = canonicals.join(
        verdicts.filter(F.col("verdict") == "unique").select("doc_id"),
        "doc_id",
    )
    return verdicts.unionByName(batch_dups), new_rows


def run_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    store_dir: str,
    verdicts_dir: str,
    *,
    checkpoint_dir: str,
) -> None:
    """Drain all available new document files through the incremental
    dedup (Trigger.AvailableNow), appending verdicts and growing the
    signature store. Re-invoking with the same checkpoint processes
    only files not seen before — the restartable continuous pipeline.
    """
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one source file per increment
        .parquet(source_dir)
    )

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        verdicts, new_rows = dedup_batch_against_store(
            batch.sparkSession, batch, store_dir, batch_id=batch_id
        )
        # one classification pass: both writes consume the persisted
        # verdicts (the expensive lineage — store scan + LSH join +
        # verify — would otherwise execute twice per batch)
        verdicts = verdicts.persist()
        try:
            # Both sinks are partitioned by batch id and written with
            # DYNAMIC partition overwrite: a re-run of a crashed batch
            # REPLACES its own partition instead of appending a second
            # copy, and classification above excluded any store rows a
            # previous attempt tagged with this batch_id — so replay
            # yields bit-identical verdicts and an exactly-once store,
            # with no coordination beyond the rename the sink already
            # does. Other batches' partitions are never touched.
            verdicts.withColumn("batch_id", F.lit(batch_id)).write.option(
                "partitionOverwriteMode", "dynamic"
            ).partitionBy("batch_id").mode("overwrite").parquet(verdicts_dir)
            new_rows.withColumn(
                "_batch_id", F.lit(batch_id).cast("bigint")
            ).write.option(
                "partitionOverwriteMode", "dynamic"
            ).partitionBy("_batch_id").mode("overwrite").parquet(store_dir)
        finally:
            verdicts.unpersist()

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option(
            "checkpointLocation", os.path.join(checkpoint_dir, "dedup_stream")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
