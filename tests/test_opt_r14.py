"""Optimization-round-14 focused tests: internals changed for speed must
keep their outputs bit-identical to the unoptimized paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.operators.ranking import global_row_number

SF = "/root/testdata/sf0.001"


def test_bucket_ranker_matches_sampled_ranker(spark):
    """The deterministic-bucket fast path (layout file-skipping ops) must
    produce exactly the ranks of the sampled-range path on a total
    order, including a skewed/clustered key distribution."""
    df = spark.range(0, 7001).select(
        (F.col("id") % 97).alias("k"),  # clustered leading key
        ((F.col("id") * 37) % 7001).alias("t"),  # unique tiebreak
    )
    sampled = global_row_number(df, ["k", "t"], "rk").orderBy("k", "t")
    bucketed = global_row_number(
        df,
        ["k", "t"],
        "rk",
        bucket=(F.expr("(k * 16) DIV 97"), 16),
    ).orderBy("k", "t")
    a = [(r["k"], r["t"], r["rk"]) for r in sampled.collect()]
    b = [(r["k"], r["t"], r["rk"]) for r in bucketed.collect()]
    assert a == b
    ranks = sorted(r[2] for r in b)
    assert ranks == list(range(1, 7002))  # dense 1-based permutation


def test_bucket_ranker_rejects_overflowing_bucket_expr(spark):
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="not a valid coarse bucketing"):
        global_row_number(df, ["k"], "rk", bucket=(F.col("k"), 10)).collect()
