"""Incremental closure maintenance: appending leaves via
extend_closure_with_leaves must equal a full rebuild (minus the display
sort order, which is deferred to the next rebuild by contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.hierarchy import HierarchyDimension

SCHEMA = (
    "node_id string, node_natural_key bigint, node_name string,"
    " level_name string, parent_node_id string"
)

BASE = [
    ("r", 1, "Root", "Top", None),
    ("a", 2, "A", "Mid", "r"),
    ("b", 3, "B", "Mid", "r"),
    ("a1", 4, "A1", "Leaf", "a"),
]
NEW = [
    ("a2", 5, "A2", "Leaf", "a"),
    ("b1", 6, "B1", "Leaf", "b"),
]


def _key(r):
    # is_leaf included: parents gaining their first child must have the
    # flag flipped in the extended closure, exactly as a rebuild would
    return (r.ancestor_node_id, r.descendant_node_id, r.net_level,
            r.ancestor_level_number, r.descendant_level_number,
            r.ancestor_is_leaf, r.descendant_is_leaf)


def test_incremental_matches_full_rebuild(spark):
    base_dim = HierarchyDimension(
        spark.createDataFrame(BASE, SCHEMA),
        sort_key_col="node_natural_key",
        materialize=False,
    )
    extended = base_dim.extend_closure_with_leaves(
        spark.createDataFrame(NEW, SCHEMA)
    )
    full_dim = HierarchyDimension(
        spark.createDataFrame(BASE + NEW, SCHEMA),
        sort_key_col="node_natural_key",
        materialize=False,
    )
    got = {_key(r) for r in extended.collect()}
    want = {_key(r) for r in full_dim.aggregation_dim.collect()}
    assert got == want
    # delta size: each new leaf at depth 3 adds depth(leaf)=3 rows
    assert len(got) == len({_key(r) for r in base_dim.aggregation_dim.collect()}) + 6


def test_incremental_missing_parent_raises(spark):
    import pytest

    base_dim = HierarchyDimension(
        spark.createDataFrame(BASE, SCHEMA),
        sort_key_col="node_natural_key",
        materialize=False,
    )
    orphan = [("z1", 9, "Z1", "Leaf", "nope")]
    with pytest.raises(ValueError, match="parent not in existing closure"):
        base_dim.extend_closure_with_leaves(
            spark.createDataFrame(orphan, SCHEMA)
        ).collect()


def test_incremental_rollup_correct(spark):
    base_dim = HierarchyDimension(
        spark.createDataFrame(BASE, SCHEMA),
        sort_key_col="node_natural_key",
        materialize=False,
    )
    extended = base_dim.extend_closure_with_leaves(
        spark.createDataFrame(NEW, SCHEMA)
    )
    facts = spark.createDataFrame(
        [(4, 1.0), (5, 10.0), (6, 100.0)], "k bigint, v double"
    )
    from ibis_olap_aggregation_spark.rollup import hierarchical_rollup

    out = hierarchical_rollup(
        facts,
        extended,
        "k",
        [F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s")],
        group_keys=("ancestor_node_id",),
        sort=False,
    )
    got = {r.ancestor_node_id: r.s for r in out.collect()}
    assert got == {"r": 111.0, "a": 11.0, "b": 100.0, "a1": 1.0, "a2": 10.0, "b1": 100.0}
