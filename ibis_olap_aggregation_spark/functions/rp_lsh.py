"""Random-hyperplane LSH primitives shared by similarity and dedup.

Leaf module (imports only PySpark) so both operator modules can use the
machinery at import time without a cycle. Hyperplanes are md5-DERIVED —
no RNG — so Spark and DuckDB construct bit-identical planes and every
bucket assignment matches across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rp_planes_df(spark: SparkSession, n_planes: int, bits: int) -> DataFrame:
    """Deterministic md5-derived random hyperplanes: n_planes rows of
    (plane_id, table_id, w[64]) with weights in [-1, 1]. Identical to the
    DuckDB construction (duck_rp_planes_sql) — both engines derive the
    SAME planes, so bucket assignments match bit-for-bit."""
    h = (
        "cast(conv(substr(md5(concat(cast(plane_id as string), '|',"
        " cast(i as string))), 1, 15), 16, 10) as bigint)"
    )
    return (
        spark.range(n_planes)
        .select(F.col("id").cast("int").alias("plane_id"))
        .select(
            "plane_id",
            (F.col("plane_id") / bits).cast("int").alias("table_id"),
            F.expr(
                f"transform(sequence(1, 64), i -> (({h} % 2001) - 1000) / 1000.0)"
            ).alias("w"),
        )
    )


def rp_sigs(e: DataFrame, planes: DataFrame, bits: int) -> DataFrame:
    """Banded sign signatures: one (vec_id, table_id, bucket) row per
    vector per table. Broadcast crossJoin against the tiny plane table +
    a map-side-combined groupBy — map-only per vector."""
    dot = "aggregate(zip_with(v, w, (x, y) -> x * y), 0d, (acc, x) -> acc + x)"
    return (
        e.crossJoin(F.broadcast(planes))
        .withColumn(
            "bit",
            F.when(
                F.expr(dot) > 0, F.expr(f"shiftleft(1L, plane_id % {bits})")
            ).otherwise(F.lit(0).cast("bigint")),
        )
        .groupBy("vec_id", "table_id")
        .agg(F.sum("bit").alias("bucket"))
    )


def duck_rp_planes_sql(n_planes: int, bits: int) -> str:
    """DuckDB twin of rp_planes_df + rp_sigs (CTEs `planes`, `sigs`;
    expects CTE `e(vec_id, v)` in scope)."""
    return f"""
planes AS (
  SELECT p.p AS plane_id, p.p // {bits} AS table_id,
         list_transform(generate_series(1, 64),
           i -> ((('0x' || substr(md5(p.p::VARCHAR || '|' || i::VARCHAR), 1, 15))::BIGINT
                  % 2001) - 1000) / 1000.0) AS w
  FROM (SELECT unnest(generate_series(0, {n_planes - 1})) AS p) p
),
sigs AS (
  SELECT e.vec_id, pl.table_id,
         SUM(CASE WHEN list_sum(list_transform(generate_series(1, 64),
                    i -> e.v[i] * pl.w[i])) > 0
                  THEN 1 << (pl.plane_id % {bits}) ELSE 0 END) AS bucket
  FROM e CROSS JOIN planes pl
  GROUP BY 1, 2
)"""
