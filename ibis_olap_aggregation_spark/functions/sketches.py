"""Mergeable sketch aggregates — the approximate layer for 100 TB
interactive OLAP, built on Spark's native Datasketches integration
(hll_sketch_agg / theta_sketch_agg families, JVM-side, whole-stage
codegen) rather than any Python implementation.

Why sketches matter at scale: exact COUNT(DISTINCT) shuffles the
distinct value set; a sketch is a CONSTANT-size binary that partial-
aggregates map-side and merges associatively — so a 1000-executor
rollup of distinct users costs one tiny-row shuffle, and pre-computed
per-partition/per-day sketches re-aggregate to any grain WITHOUT
touching the facts again (the classic sketch-cube pattern). Theta
sketches additionally support set algebra (union / intersect / diff
across segments) that COUNT(DISTINCT) cannot answer from aggregates at
all.

The exact forms stay the registry default (the oracle gate is
bit-exact); these are the documented approximate escape hatch, tested
for merge-losslessness and error bounds in tests/test_sketches.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_partial",
    "hll_rollup",
    "theta_partial",
    "theta_rollup",
    "theta_overlap",
    "approx_topk",
    "approx_quantiles",
]


def hll_partial(
    df: DataFrame, keys: Sequence[str], col: str, *, lgk: int = 12
) -> DataFrame:
    """Per-group HLL sketch partials: `keys` + a binary `hll_sketch`
    column. Store these at the finest grain you will ever query (e.g.
    per day x segment); any coarser distinct-count comes from
    :func:`hll_rollup` over the partials — no re-scan of facts."""
    return df.groupBy(*keys).agg(
        F.expr(f"hll_sketch_agg({col}, {lgk})").alias("hll_sketch")
    )


def hll_rollup(
    partials: DataFrame, keys: Sequence[str], *, out: str = "approx_distinct"
) -> DataFrame:
    """Merge HLL partials up to `keys` grain and estimate. Union of
    same-parameter HLL sketches is lossless: rolling up partials gives
    IDENTICAL estimates to sketching the raw data at the coarser grain
    (pinned by test_hll_merge_lossless)."""
    merged = partials.groupBy(*keys).agg(
        F.expr("hll_union_agg(hll_sketch)").alias("_u")
    )
    return merged.select(
        *keys, F.expr("hll_sketch_estimate(_u)").alias(out)
    )


def theta_partial(
    df: DataFrame, keys: Sequence[str], col: str, *, lgk: int = 12
) -> DataFrame:
    """Per-group theta sketch partials (binary `theta_sketch` column).
    Theta buys set ALGEBRA over segments: see :func:`theta_overlap`."""
    return df.groupBy(*keys).agg(
        F.expr(f"theta_sketch_agg({col}, {lgk})").alias("theta_sketch")
    )


def theta_rollup(
    partials: DataFrame, keys: Sequence[str], *, out: str = "approx_distinct"
) -> DataFrame:
    """Merge theta partials up to `keys` grain and estimate."""
    merged = partials.groupBy(*keys).agg(
        F.expr("theta_union_agg(theta_sketch)").alias("_u")
    )
    return merged.select(
        *keys, F.expr("theta_sketch_estimate(_u)").alias(out)
    )


def theta_overlap(df: DataFrame, a: str, b: str) -> DataFrame:
    """Set algebra between two theta-sketch COLUMNS of `df` (names, as
    produced by :func:`theta_partial`): appends estimated distinct
    counts of the union, intersection, and a-minus-b — the "how many
    users did BOTH segments touch" question exact distinct aggregates
    cannot answer without re-scanning facts."""
    return df.withColumns(
        {
            "union_distinct": F.expr(
                f"theta_sketch_estimate(theta_union({a}, {b}))"
            ),
            "intersection_distinct": F.expr(
                f"theta_sketch_estimate(theta_intersection({a}, {b}))"
            ),
            "difference_distinct": F.expr(
                f"theta_sketch_estimate(theta_difference({a}, {b}))"
            ),
        }
    )


def approx_topk(
    df: DataFrame, col: str, k: int = 10, *, max_items: int = 10_000
) -> DataFrame:
    """Approximate top-k heavy hitters: one aggregation, constant-size
    state (frequent-items sketch) — the scale form of groupBy+orderBy+
    limit when the key cardinality itself is huge. Returns (item,
    est_count) rows; counts are estimates. (The field is not named
    "count": that collides with Row.count on collected results.)"""
    return (
        df.agg(F.expr(f"approx_top_k({col}, {k}, {max_items})").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").alias("est_count"),
        )
    )


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: Sequence[float],
    *,
    accuracy: int = 10_000,
) -> list[float]:
    """Mergeable approximate quantiles (Greenwald-Khanna): one pass, no
    global sort. accuracy=N bounds rank error by 1/N of the row count."""
    probs = ", ".join(str(p) for p in probabilities)
    row = df.agg(
        F.expr(f"approx_percentile({col}, array({probs}), {accuracy})").alias("q")
    ).collect()[0]
    return list(row.q)
