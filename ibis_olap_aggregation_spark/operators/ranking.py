"""Scalable global ranking helpers.

The reference assigns its depth-first display order with
``ROW_NUMBER() OVER (ORDER BY ...)`` — an UNPARTITIONED window
(reference classes/hierarchy_dimension_table.py:133-139), which Spark
executes on a single partition: a scale cliff. ``global_row_number``
computes the same dense 1-based global rank with no single-partition
stage: range-repartition on the order key, per-partition row_number,
then add per-partition offsets (partition counts are tiny — one row per
partition — so collecting them to the driver is O(#partitions)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

__all__ = ["global_row_number"]


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "row_num",
    num_partitions: int | None = None,
    row_count: int | None = None,
    bucket: tuple[F.Column, int] | None = None,
) -> DataFrame:
    """Dense global 1-based rank ordered by ``order_cols``.

    Deterministic when ``order_cols`` is a total order (ties would be
    broken arbitrarily). RangePartitioner assigns ascending key ranges
    to ascending partition ids, so partition-local ranks + cumulative
    partition-count offsets compose into the global rank.

    ``row_count``: pass a known (upper-bound) size to skip the count
    pass. Inputs that fit ONE range partition skip the offset-collect
    pass too — a tiny dim is ranked in a single lazy window, zero extra
    driver actions.

    ``bucket``: optional ``(expr, n_buckets)`` DETERMINISTIC coarse
    pre-bucketing — ``expr`` must be an integer column expression that
    is monotone non-decreasing along the ``order_cols`` order (e.g.
    ``leading_key * n_buckets DIV (domain_max + 1)`` for a known key
    domain). When given, the sampled range partitioner — and with it
    the eager ``localCheckpoint`` that pins its nondeterministic
    boundaries (see below) — is skipped entirely: bucket membership is
    a pure function of the row, so per-bucket counts collected in one
    bounded aggregate job stay valid for every later job, and the
    ranking itself stays LAZY (a ``Window.partitionBy(bucket)`` keyed
    shuffle inside the consumer's own job — concurrent consumers of
    several rankings pipeline them in one job instead of serializing
    one eager checkpoint each). Callers are responsible for a bucket
    expression that spreads rows evenly (a uniform leading key makes
    the quantile-style expression above uniform by construction).
    """
    if bucket is not None:
        bexpr, n_buckets = bucket
        bucketed = df.withColumn("_bkt", bexpr.cast("int"))
        counts = sorted(
            (r["_bkt"], r["_cnt"])
            for r in bucketed.groupBy("_bkt")
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .collect()
        )
        if len(counts) > n_buckets:
            raise ValueError(
                f"bucket expression produced {len(counts)} distinct values "
                f"(> n_buckets={n_buckets}) — not a valid coarse bucketing"
            )
        offsets, acc = {}, 0
        for bkt, cnt in counts:
            offsets[bkt] = acc
            acc += cnt
        w = Window.partitionBy("_bkt").orderBy(*[F.col(c) for c in order_cols])
        offset_expr = (
            F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in offsets.items() for x in kv]
                ),
                F.col("_bkt"),
            )
            if offsets
            else F.lit(0)
        )
        return bucketed.withColumn(
            out_col, (F.row_number().over(w) + offset_expr).cast("int")
        ).drop("_bkt")
    if num_partitions is None:
        # ~50k rows per range partition, capped at the session shuffle
        # width: tiny inputs get 1 partition (no per-stage overhead),
        # larger inputs parallelize the per-partition sort+window (the
        # old 500k target left a 600k-row ranking on 2 of 32 cores —
        # measured 3x slower than 16 partitions; the cap, not the
        # divisor, bounds partition count at cluster scale)
        cap = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
        n = row_count if row_count is not None else df.count()
        num_partitions = max(1, min(cap, n // 50_000 + 1))
    if num_partitions == 1:
        # single range partition: the offsets are trivially zero, so the
        # 2-pass offset machinery (count + collect) is pure overhead
        w = Window.partitionBy(F.lit(0)).orderBy(*[F.col(c) for c in order_cols])
        return df.repartition(1).withColumn(
            out_col, F.row_number().over(w).cast("int")
        )
    ranged = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    # MATERIALIZE (eager localCheckpoint) before the offset collect: the
    # counts pass and the final consumer are SEPARATE jobs, and the
    # range partitioner's sampled boundaries are not stable across jobs
    # (AQE can re-coalesce the upstream stage differently per job), so
    # without freezing the physical partitioning the offsets of one
    # partitioning get applied to another — observed as duplicate/gapped
    # global ranks (61/64 distinct file ids in
    # layout_zorder_file_skipping at sf0.01). localCheckpoint rather
    # than persist(): truncating lineage makes re-sampling IMPOSSIBLE —
    # a lost block cannot be recomputed at all, so on a real cluster an
    # executor loss FAILS the ranking job outright (retryable, loud)
    # where persist would silently rebuild under a re-sampled
    # partitioner and apply stale offsets to it (silent wrong ranks).
    # Fail-loud over recover-wrong is the deliberate trade here, and the
    # blocks are
    # RDD-scoped — the ContextCleaner frees them once the result is
    # dropped, where Dataset.persist entries sit in the CacheManager
    # until an explicit unpersist that a lazily-consumed return value
    # has no safe place to issue (the r4/r5 sweep-scale leak).
    # MEMORY_AND_DISK by measurement: a DISK_ONLY checkpoint added
    # ~2s to layout_zorder_file_skipping (two rankings, each read
    # twice) and ~1s to every dim build at sf0.1 — the blocks are
    # GC-freed either way, so memory-first costs nothing at sweep
    # scale.
    local = ranged.withColumn("_rn", F.row_number().over(w)).localCheckpoint(
        eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
    )
    counts = sorted(
        (r["_pid"], r["_cnt"])
        for r in local.groupBy("_pid").agg(F.max("_rn").alias("_cnt")).collect()
    )
    offsets, acc = {}, 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    offset_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]), F.col("_pid")
    ) if offsets else F.lit(0)
    return local.withColumn(out_col, (F.col("_rn") + offset_expr).cast("int")).drop(
        "_pid", "_rn"
    )
