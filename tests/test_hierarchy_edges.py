"""Hierarchy edge-case semantics (SURVEY.md §7.5.6) + metamorphic
properties (§5.3). The reference handles these silently (empty dims,
dropped rows); we pin the same-but-explicit semantics with tests.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.hierarchy import HierarchyDimension
from ibis_olap_aggregation_spark.rollup import hierarchical_rollup

SCHEMA = (
    "node_id string, node_natural_key bigint, node_name string,"
    " level_name string, parent_node_id string"
)


def _dim(spark, rows, **kw):
    return HierarchyDimension(
        spark.createDataFrame(rows, SCHEMA), materialize=False, **kw
    )


def test_no_root_yields_empty_dims(spark):
    """All nodes have parents (broken FK / cycle-free but rootless):
    the walk anchors on is_root and finds nothing — both dims empty,
    matching the reference's silent-empty behavior (ref :118)."""
    d = _dim(spark, [("a", 1, "A", "L", "b"), ("b", 2, "B", "L", "a")])
    assert d.reporting_dim.count() == 0
    assert d.aggregation_dim.count() == 0


def test_orphan_subtree_dropped(spark):
    """Nodes unreachable from any root are not walked (ref :121-131
    drops them the same way): they appear in neither dim."""
    rows = [
        ("r", 1, "Root", "Top", None),
        ("c", 2, "Child", "Leaf", "r"),
        ("orphan", 3, "Orphan", "Leaf", "missing-parent"),
    ]
    d = _dim(spark, rows)
    walked = {r.node_id for r in d.reporting_dim.collect()}
    assert walked == {"r", "c"}
    closure_nodes = {
        r.descendant_node_id for r in d.aggregation_dim.collect()
    }
    assert "orphan" not in closure_nodes


def test_facts_without_leaf_dropped_by_inner_join(spark):
    """Facts keyed to no hierarchy node vanish from the rollup (inner
    join, ref main.py:36) — and total counts prove exactly which."""
    rows = [
        ("r", 1, "Root", "Top", None),
        ("c", 100, "Child", "Leaf", "r"),
    ]
    d = _dim(spark, rows)
    facts = spark.createDataFrame(
        [(100, 5.0), (999, 7.0)], "k bigint, v double"
    )
    out = hierarchical_rollup(
        facts,
        d.aggregation_dim,
        "k",
        [F.count(F.lit(1)).alias("n")],
        group_keys=("ancestor_node_name",),
        sort=False,
    )
    got = {r.ancestor_node_name: r.n for r in out.collect()}
    # fact 999 dropped; fact 100 counted under its leaf and the root
    assert got == {"Root": 1, "Child": 1}


def test_single_node_hierarchy(spark):
    d = _dim(spark, [("r", 1, "Root", "Top", None)])
    rep = d.reporting_dim.collect()
    assert len(rep) == 1 and rep[0].is_root and rep[0].is_leaf
    clo = d.aggregation_dim.collect()
    assert len(clo) == 1 and clo[0].net_level == 0


def test_closure_properties(spark):
    """Metamorphic invariants (SURVEY.md §5.3): closure size = sum of
    depths; self-pairs at net_level 0; net_level >= 0; depth-first sort
    puts every parent before all its descendants."""
    rows = [
        ("r", 1, "Root", "Top", None),
        ("a", 2, "A", "Mid", "r"),
        ("b", 3, "B", "Mid", "r"),
        ("a1", 4, "A1", "Leaf", "a"),
        ("a2", 5, "A2", "Leaf", "a"),
        ("b1", 6, "B1", "Leaf", "b"),
    ]
    d = _dim(spark, rows, sort_key_col="node_natural_key")
    clo = d.aggregation_dim.collect()
    # depths: r=1, a=b=2, a1=a2=b1=3 -> sum = 1+2+2+3+3+3 = 14
    assert len(clo) == 14
    assert sum(1 for r in clo if r.net_level == 0) == 6  # self-pairs
    assert all(r.net_level >= 0 for r in clo)
    rep = {r.node_id: r for r in d.reporting_dim.collect()}
    for r in clo:
        if r.net_level > 0:
            assert (
                rep[r.ancestor_node_id].node_sort_order
                < rep[r.descendant_node_id].node_sort_order
            )


_CYCLE_ROWS = [
    ("r", 1, "Root", "Top", None),
    ("c", 2, "Child", "Leaf", "r"),
    # detached 3-cycle: never root-reachable, so the walk can't loop on
    # it — but a materialized build must NAME it instead of silently
    # shrinking the dim
    ("x", 7, "X", "L", "z"),
    ("y", 8, "Y", "L", "x"),
    ("z", 9, "Z", "L", "y"),
]


@pytest.mark.parametrize("strategy", ["cte", "iterative", "doubling", "local"])
def test_cycle_detected_when_materialized(spark, strategy):
    """A cycle in parent_node_id is data corruption: every strategy
    raises an explicit cycle error on a materialized build (the
    reached-count check classifies unreached nodes; doubling also
    detects the wrapped segment directly)."""
    with pytest.raises(ValueError, match="cycle detected"):
        HierarchyDimension(
            spark.createDataFrame(_CYCLE_ROWS, SCHEMA),
            sort_key_col="node_natural_key",
            strategy=strategy,
            materialize=True,
        )


def test_orphans_still_silent_when_materialized(spark):
    """Orphan subtrees (missing parent id) keep the reference's silent
    drop semantics even under the materialized reach check."""
    rows = [
        ("r", 1, "Root", "Top", None),
        ("c", 2, "Child", "Leaf", "r"),
        ("o1", 3, "O1", "L", "missing"),
        ("o2", 4, "O2", "L", "o1"),
    ]
    d = HierarchyDimension(
        spark.createDataFrame(rows, SCHEMA),
        sort_key_col="node_natural_key",
        materialize=True,
    )
    assert {r.node_id for r in d.reporting_dim.collect()} == {"r", "c"}
    d.unpersist()


def test_deep_tree_raises_depth_not_cycle(spark):
    """A legit depth-5 chain under max_depth=3 must raise the DEPTH
    error (and never claim a cycle)."""
    rows = [("n0", 0, "N0", "L", None)] + [
        (f"n{i}", i, f"N{i}", "L", f"n{i-1}") for i in range(1, 6)
    ]
    for strategy in ("cte", "iterative", "doubling", "local"):
        with pytest.raises(ValueError, match="deeper than max_depth"):
            HierarchyDimension(
                spark.createDataFrame(rows, SCHEMA),
                sort_key_col="node_natural_key",
                strategy=strategy,
                max_depth=3,
                materialize=True,
            )


def test_cte_confs_restored(spark):
    """_walk_cte must not leak session-global recursion limits."""
    keys = ("spark.sql.cteRecursionLevelLimit", "spark.sql.cteRecursionRowLimit")
    before = {k: spark.conf.get(k, None) for k in keys}
    d = _dim(
        spark,
        [("r", 1, "Root", "Top", None), ("a", 2, "A", "Leaf", "r")],
        sort_key_col="node_natural_key",
        strategy="cte",
        max_depth=7,
    )
    d.aggregation_dim.count()
    after = {k: spark.conf.get(k, None) for k in keys}
    assert before == after


@pytest.mark.parametrize("strategy", ["cte", "iterative", "doubling", "local"])
def test_strategies_agree(spark, strategy):
    """The recursive-CTE and iterative walks produce identical dims."""
    rows = [
        ("r", 1, "Root", "Top", None),
        ("a", 2, "A", "Mid", "r"),
        ("a1", 3, "A1", "Leaf", "a"),
        ("b", 4, "B", "Leaf", "r"),
    ]
    d = _dim(spark, rows, sort_key_col="node_natural_key", strategy=strategy)
    rep = sorted(
        (r.node_id, r.level_number, r.node_sort_order)
        for r in d.reporting_dim.collect()
    )
    assert rep == [("a", 2, 2), ("a1", 3, 3), ("b", 2, 4), ("r", 1, 1)]
