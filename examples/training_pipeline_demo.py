"""End-to-end training-data pipeline demo: the engine's operator
families composed the way a 100 TB corpus-preparation job would run.

    documents
      -> quality scoring (filter low-quality)
      -> repetition filter (Gopher-style boilerplate gate)
      -> PII/pattern redaction (rewrite, not drop)
      -> exact dedup (md5 canonical)
      -> near-dup clustering (MinHash LSH -> verify -> components),
         keep one doc per cluster
      -> semantic dedup (within-IVF-cluster cosine over embeddings)
      -> deterministic train/validation split (hash sampling)
      -> context-window chunking of the train split
      -> token accounting per split

Every stage is a registry operator (oracle-checked individually); this
script shows them composed. Run:
    PYTHONPATH=. python examples/training_pipeline_demo.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from ibis_olap_aggregation_spark import get_spark, load_table
from ibis_olap_aggregation_spark.operators.dedup import (
    connected_components,
    dedup_minhash_lsh_candidates,
    hashed_shingles_col,
)
from ibis_olap_aggregation_spark.operators.quality import hash_sample
from ibis_olap_aggregation_spark.operators.text import tokens_col
from ibis_olap_aggregation_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.01"
QUALITY_MIN = 0.70
JACCARD = 0.5


def main() -> None:
    spark = get_spark("training_pipeline_demo")
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()

    # 1. quality gate (operators/text.py scoring)
    scored = QUERIES["text_quality_score"](spark, SF_DIR)
    keep_ids = scored.filter(F.col("quality_score") >= QUALITY_MIN).select("doc_id")
    docs = docs.join(keep_ids, "doc_id")
    n1 = docs.count()

    # 1b. repetition gate (operators/pipeline.py, Gopher-style)
    rep = QUERIES["text_repetition_signals"](spark, SF_DIR)
    docs = docs.join(
        rep.filter(~F.col("is_repetitive")).select("doc_id"), "doc_id"
    )
    n1b = docs.count()

    # 1c. redaction rewrites text in place (drop nothing)
    docs = docs.withColumn(
        "text",
        F.regexp_replace(
            F.col("text"), F.lit(r"\b(key|hash|secret)\b"), F.lit("<TERM>")
        ),
    )

    # 2. exact dedup: canonical doc per content hash
    canon = (
        docs.groupBy(F.md5(F.lower(F.trim("text"))).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    docs = docs.join(canon, "doc_id")
    n2 = docs.count()

    # 3. near-dup removal: LSH candidates -> verified pairs -> components,
    #    keep the cluster canonical (min doc_id)
    sets = docs.withColumn("t", tokens_col()).withColumn(
        "hs", hashed_shingles_col()
    ).select("doc_id", "hs").cache()
    cand = dedup_minhash_lsh_candidates(spark, SF_DIR).select("doc_a", "doc_b")
    cand = (
        cand.join(sets.select(F.col("doc_id").alias("doc_a")), "doc_a")
        .join(sets.select(F.col("doc_id").alias("doc_b")), "doc_b")
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb"))
    inter = F.size(F.array_intersect("ha", "hb"))
    jac = inter / (F.size("ha") + F.size("hb") - inter)
    pairs = (
        cand.join(sa, "doc_a").join(sb, "doc_b").filter(jac >= JACCARD)
        .select("doc_a", "doc_b")
    )
    comp = connected_components(pairs, "doc_a", "doc_b")
    drop = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    docs = docs.join(drop, "doc_id", "left_anti")
    n3 = docs.count()

    # 3b. semantic dedup over embeddings (SemDeDup shape): vec_id in the
    # synthetic testdata corresponds 1:1 to doc_id, so the per-cluster
    # drop decisions apply directly to documents
    from ibis_olap_aggregation_spark.operators.pipeline import SEMDEDUP_TAU  # noqa: F401

    sem = QUERIES["dedup_semantic_ivf"](spark, SF_DIR)
    n_sem_dropped = sem.agg(F.sum("n_dropped")).collect()[0][0]

    # 4. deterministic split: ~90% train / ~10% validation by key hash
    train = hash_sample(docs, "doc_id", 0.9)
    val = docs.join(train.select("doc_id"), "doc_id", "left_anti")

    # 5. context-window chunking of the train split (32 tok, stride 24)
    chunks = (
        train.withColumn("t", tokens_col())
        .select(
            "doc_id",
            F.explode_outer(
                F.expr(
                    "transform(sequence(1, size(t), 24),"
                    " s -> slice(t, s, 32))"
                )
            ).alias("chunk"),
        )
        .filter(F.col("chunk").isNotNull())
    )
    n_chunks = chunks.count()

    # 6. token accounting per split
    stats = []
    for name, d in (("train", train), ("validation", val)):
        row = (
            d.withColumn("t", tokens_col())
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum(F.size("t")).alias("tokens"),
            )
            .collect()[0]
        )
        stats.append((name, row.docs, row.tokens))

    # 6b. span-level duplication accounting (round-3): fraction of each
    # surviving doc's tokens sitting in corpus-duplicated 8-token spans
    # (what a span-cut-out stage would remove instead of whole docs)
    spans = QUERIES["dedup_exact_substring_spans"](spark, SF_DIR)
    span_row = (
        spans.join(docs.select("doc_id"), "doc_id")
        .agg(
            F.round(F.avg("dup_token_fraction"), 4).alias("avg_dup_frac"),
            F.count(F.when(F.col("n_dup_segments") > 0, 1)).alias("n_docs_hit"),
        )
        .collect()[0]
    )

    # 6c. hard rule-gate funnel report (round-3, Gopher-style): what the
    # per-source pass rates would have been — the report a pipeline
    # owner reads before dropping a source entirely
    funnel = QUERIES["text_gopher_rules_funnel"](spark, SF_DIR)
    worst = funnel.orderBy("pass_rate").limit(1).collect()[0]

    # 7. provider accounting + quota (round-3 stages): how much each
    # source shrank under dedup, and the deterministic per-source cap
    shrink = QUERIES["dedup_survivor_stats"](spark, SF_DIR)
    n_src = shrink.count()
    quota = QUERIES["sample_hash_topk_per_source"](spark, SF_DIR)
    quota_row = quota.agg(
        F.sum("n_kept").alias("kept"), F.sum("n_total").alias("total")
    ).collect()[0]

    # 8. tokenizer-facing stages (round-12 additions): language mixture
    # weights for the training sampler, and the context-window packing
    # plan for the surviving corpus
    mix = QUERIES["text_mixture_temperature_weights"](spark, SF_DIR)
    upsampled = mix.filter(F.col("epochs") > 1).count()
    packs = QUERIES["pipeline_pack_sequences"](spark, SF_DIR)
    pack_row = packs.agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("n_straddlers").alias("straddlers"),
    ).collect()[0]

    print(f"corpus:            {n0} docs")
    print(f"quality >= {QUALITY_MIN}:   {n1} docs  (-{n0 - n1})")
    print(f"repetition gate:   {n1b} docs  (-{n1 - n1b})")
    print(f"exact dedup:       {n2} docs  (-{n1b - n2})")
    print(f"near-dup dedup:    {n3} docs  (-{n2 - n3})")
    print(f"semantic near-dups flagged over embeddings: {n_sem_dropped}")
    print(f"train chunks (32 tok / stride 24): {n_chunks}")
    for name, nd, nt in stats:
        print(f"{name:12s} {nd:5d} docs  {nt:8d} tokens")
    print(f"provider accounting: {n_src} sources; per-source quota keeps "
          f"{quota_row.kept}/{quota_row.total} docs")
    print(f"span-dup residue in survivors: {span_row.n_docs_hit} docs touched, "
          f"avg dup-token fraction {span_row.avg_dup_frac}")
    print(f"worst rule-gate source: {worst.source} (pass rate {worst.pass_rate})")
    print(f"mixture: {upsampled} languages up-sampled (epochs > 1) at alpha=0.3")
    print(f"packing plan: {pack_row.n_windows} context windows, "
          f"{pack_row.straddlers} boundary straddlers")
    assert stats[0][1] + stats[1][1] == n3


if __name__ == "__main__":
    main()
