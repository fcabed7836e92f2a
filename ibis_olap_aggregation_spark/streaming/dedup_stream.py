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
(band_id, band_hash)). foreachBatch gives per-batch exactly-once on
the store as long as appends are idempotent per batch_id — here a
failed batch is simply re-run (append of the same unique docs by the
restarted batch; doc_id-keyed readers dedupe, documented contract).
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


def seed_signature_store(docs: DataFrame, store_dir: str) -> None:
    """Initialize the corpus signature store from an existing
    (already-deduplicated) document table."""
    doc_signatures(docs).write.mode("overwrite").parquet(store_dir)


def dedup_batch_against_store(
    spark: SparkSession, batch: DataFrame, store_dir: str
) -> tuple[DataFrame, DataFrame]:
    """One increment: returns (verdicts, new_store_rows).

    verdicts: (doc_id, verdict, matched_doc_id, n_lsh_candidates) for
    EVERY batch doc — in-batch exact dups carry verdict `exact_dup`
    with the batch canonical as match (and n_lsh_candidates = 0: they
    never reach the LSH tier). new_store_rows: signature rows of the
    docs that classified `unique` (the store delta)."""
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
            batch.sparkSession, batch, store_dir
        )
        # verdicts first: if the batch dies between the two writes, the
        # re-run re-appends verdicts keyed by doc_id (idempotent for
        # doc_id-keyed readers) and the store append still happens
        # exactly once per successful batch
        verdicts.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(verdicts_dir)
        new_rows.write.mode("append").parquet(store_dir)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option(
            "checkpointLocation", os.path.join(checkpoint_dir, "dedup_stream")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
