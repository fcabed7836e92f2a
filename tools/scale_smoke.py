"""Empirical scale smoke for the dedup/text family: amplify the sf0.1
documents corpus Nx (default 20x ~ 100k docs) with mutated copies,
then time the bucketed pipelines end-to-end. The point is the SHAPE of
the numbers: bucketed LSH/span costs must grow ~linearly in corpus
size (never quadratically), and the salted bucket caps must keep
per-task pair generation bounded even though amplification multiplies
every near-dup class.

Usage: python tools/scale_smoke.py [amplification]
Writes nothing to the repo; amplified parquet lives under /tmp.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.queries import QUERIES
from ibis_olap_aggregation_spark.session import get_spark, load_table

AMP = int(sys.argv[1]) if len(sys.argv) > 1 else 20
SRC = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("scale-smoke")
    base = load_table(spark, SRC, "documents")
    n0 = base.count()
    work = tempfile.mkdtemp(prefix="scale_smoke_")
    # each copy k mutates the text tail (append a copy marker word) so
    # copies are NEAR-dups (high Jaccard) not exact dups — the worst
    # case for LSH bucket sizes: every original spawns an AMP-sized
    # near-duplicate class
    copies = base.crossJoin(
        spark.range(AMP).select(F.col("id").alias("k"))
    ).select(
        (F.col("doc_id") * AMP + F.col("k")).alias("doc_id"),
        F.when(F.col("k") == 0, F.col("text")).otherwise(
            F.concat_ws(" ", F.col("text"), F.lit("copy"),
                        F.col("k").cast("string"))
        ).alias("text"),
        "lang",
        "source",
        F.length("text").alias("n_chars"),
    )
    copies.write.parquet(os.path.join(work, "documents.parquet"))
    # embeddings table untouched (only doc-keyed queries here)
    spark.read.parquet(os.path.join(SRC, "embeddings.parquet")).write.parquet(
        os.path.join(work, "embeddings.parquet")
    )
    n1 = spark.read.parquet(os.path.join(work, "documents.parquet")).count()
    print(f"amplified corpus: {n0} -> {n1} docs (x{AMP})")

    for name in (
        "dedup_exact_content",
        "dedup_minhash_lsh_candidates",
        "dedup_exact_substring_spans",
        "dedup_simhash_near_pairs",
        "dedup_duplicate_clusters",
        "dedup_incremental_new_docs",
        "text_tfidf_top_terms",
        "text_pretoken_count",
        "multimodal_frame_sample",
        # round-12 second batch: both are footer-column map/agg shapes —
        # must stay linear (packing) / flat (mixture) on the corpus axis
        "pipeline_pack_sequences",
        "text_mixture_temperature_weights",
        # round 14: survivor election (one content-hash window over the
        # corpus) + the 3-stage mixture — must track the exact-dedup
        # line (same corpus-sized shuffle), everything after is |langs|x3
        "pipeline_curriculum_mixture_schedule",
    ):
        t0 = time.perf_counter()
        df = QUERIES[name](spark, work)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{name:32s} {dt:7.2f}s")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()


# -- extended sweeps (embeddings / events), run as: scale_smoke.py --all ----
def amplified_embeddings(spark, work: str, amp: int) -> None:
    from ibis_olap_aggregation_spark.session import load_table as _lt

    emb = _lt(spark, SRC, "embeddings")
    emb.crossJoin(spark.range(amp).select(F.col("id").alias("k"))).select(
        (F.col("vec_id") * amp + F.col("k")).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) ->"
            " CAST(x + IF(i = 0, k / 1000.0, 0.0) AS FLOAT))"
        ).alias("embedding"),
        "label",
    ).write.parquet(os.path.join(work, "embeddings.parquet"))


def amplified_events(spark, work: str, amp: int) -> None:
    from ibis_olap_aggregation_spark.session import load_table as _lt

    ev = _lt(spark, SRC, "events")
    ev.crossJoin(spark.range(amp).select(F.col("id").alias("k"))).select(
        (F.col("event_id") * amp + F.col("k")).alias("event_id"),
        (F.col("ts") + F.make_interval(secs=F.col("k") * 7)).alias("ts"),
        (F.col("user_id") * amp + F.col("k")).alias("user_id"),
        "event_type",
        "value",
        "props",
    ).write.parquet(os.path.join(work, "events.parquet"))


EMB_QUERIES = (
    "sim_rp_lsh_multiprobe_topk",
    "sim_ivf_centroid_assign",
    "dedup_embedding_cosine_lsh_pairs",
    "dedup_semantic_ivf",
)
EVENT_QUERIES = (
    "events_tumbling_window",
    "events_session_window",
    "events_activity_islands",
    "events_gapfill_hourly",
    "events_asof_prev_error",
    "events_hourly_anomaly",
    "events_user_lifecycle",
    "events_retention_cohorts",
)
# Round-3 measured reference points (local[32], 24g heap):
#   documents x20 (100k docs):  exact 2.3s | minhash-LSH 24.6s |
#     spans 2.9s | simhash pairs 34.9s | clusters 18.9s | tfidf 6.7s
#   events x100 (10M rows): 2.8-18.1s per query, linear shapes
#   embeddings: pair listing is OUTPUT-bound after the adaptive-bits
#     fix (20k vecs -> 932k pairs 57s; 60k -> 6.2M pairs 201s)
