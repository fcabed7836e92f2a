"""Distributed connected-components kernel (alternating large-star/
small-star, Kiveris et al. SoCC'14): equivalence against the driver
union-find path plus the round-count bound that motivates it — a
chain-shaped component (the worst case for min-label propagation,
whose round count is the graph DIAMETER) must converge in O(log n)
rounds, not O(n)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.operators.dedup import (
    _star_components,
    connected_components,
)


def _labels(df) -> dict:
    return {r["node"]: r["component"] for r in df.collect()}


def _oriented(spark, pairs):
    df = spark.createDataFrame(pairs, ["x", "y"])
    return (
        df.select(F.greatest("x", "y").alias("a"), F.least("x", "y").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def test_chain_converges_in_log_rounds_and_matches_union_find(spark):
    """512-node chain: diameter 511, so min-label propagation would
    need ~511 rounds (the previous kernel capped at 20 and would
    RAISE). The star kernel halves component height per round."""
    n = 512
    pairs = [(i, i + 1) for i in range(n - 1)]
    labels, rounds = _star_components(_oriented(spark, pairs), max_iter=20)
    got = _labels(labels)
    assert len(got) == n
    assert all(c == 0 for c in got.values())
    # log2(512) = 9; one extra round confirms the fixed point
    assert rounds <= 12, rounds


def test_distributed_path_matches_driver_union_find(spark):
    """Seeded random multi-component graph: connected_components forced
    down the distributed path (driver_threshold=0) must agree exactly
    with the driver union-find path on every node."""
    rng = random.Random(9)
    pairs = []
    for comp in range(8):  # 8 disjoint blobs of 40 nodes
        base = comp * 100
        nodes = [base + i for i in range(40)]
        for i in range(1, 40):  # random spanning tree + extra edges
            pairs.append((nodes[i], nodes[rng.randrange(i)]))
        pairs += [
            (nodes[rng.randrange(40)], nodes[rng.randrange(40)])
            for _ in range(25)
        ]
    edges = _oriented(spark, pairs).select(
        F.col("a").alias("na"), F.col("b").alias("nb")
    )
    dist = _labels(connected_components(edges, "na", "nb", driver_threshold=0))
    drv = _labels(
        connected_components(edges, "na", "nb", driver_threshold=10**6)
    )
    assert dist == drv
    assert {c for c in dist.values()} == {c * 100 for c in range(8)}


def test_star_kernel_handles_string_ids(spark):
    """Doc-id-shaped (string) nodes: component = lexicographic min."""
    pairs = [("doc-b", "doc-a"), ("doc-c", "doc-b"), ("zz", "doc-c"),
             ("q-2", "q-1")]
    labels, _ = _star_components(_oriented(spark, pairs), max_iter=20)
    got = _labels(labels)
    assert got == {
        "doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
        "zz": "doc-a", "q-1": "q-1", "q-2": "q-1",
    }


def test_self_loop_only_nodes_kept_on_both_paths(spark):
    """A node whose only edge is a self-loop must appear (labeled with
    itself) from BOTH strategy paths — the union-find path always kept
    it; the star kernel drops connectivity-free loops, so the
    distributed path re-attaches such nodes explicitly."""
    edges = spark.createDataFrame(
        [(5, 5), (2, 1), (1, 2)], ["na", "nb"]
    )
    want = {1: 1, 2: 1, 5: 5}
    drv = _labels(connected_components(edges, "na", "nb", driver_threshold=10**6))
    dist = _labels(connected_components(edges, "na", "nb", driver_threshold=0))
    assert drv == want
    assert dist == want
