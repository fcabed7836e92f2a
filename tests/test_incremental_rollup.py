"""Incremental rollup maintenance: merge(partials per batch) must be
bit-identical to a one-shot recompute, for any batch split and any
merge tree — the property that makes the partial table a safe
materialized view at 100 TB (per-append cost independent of base
size)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.hierarchy import HierarchyDimension
from ibis_olap_aggregation_spark.rollup import (
    finalize_rollup_partials,
    hierarchical_rollup_additive,
    hierarchical_rollup_partials,
    merge_rollup_partials,
)

SUMS = [("amount", "s")]
ALIASES = ["s"]


def _skew_fixture(spark):
    nodes = spark.createDataFrame(
        [
            ("root", None, "Root", "Total", None),
            ("a", None, "A", "Cat", "root"),
            ("b", None, "B", "Cat", "root"),
            ("a1", 1, "A1", "Leaf", "a"),
            ("a2", 2, "A2", "Leaf", "a"),
            ("b1", 3, "B1", "Leaf", "b"),
        ],
        "node_id string, node_natural_key bigint, node_name string,"
        " level_name string, parent_node_id string",
    )
    dim = HierarchyDimension(nodes, dimension_name="incdim")
    # hot leaf (~90% of facts) + fractional amounts exercising the
    # decimal-exactness of the partial sums
    facts = spark.range(60_000).select(
        F.when(F.col("id") < 54_000, F.lit(1))
        .when(F.col("id") < 57_000, F.lit(2))
        .otherwise(F.lit(3))
        .alias("k"),
        ((F.col("id") % 997) / F.lit(4.0)).alias("amount"),
    )
    return dim, facts


def _partials(facts, dim):
    return hierarchical_rollup_partials(
        facts, dim.aggregation_dim, "k", sum_cols=SUMS, count_alias="n"
    )


def _as_pdf(df):
    pdf = df.toPandas()
    pdf["s"] = pdf["s"].astype(str)  # decimal compare as exact strings
    return pdf.sort_values("ancestor_node_id").reset_index(drop=True)


def test_merged_batches_equal_one_shot(spark):
    dim, facts = _skew_fixture(spark)
    one_shot = _as_pdf(_partials(facts, dim))
    # deterministic 4-way split (uneven: hash buckets 0..3 of different sizes)
    b = F.expr("pmod(hash(k, cast(amount as string)), 4)")
    batches = [facts.filter(b == i) for i in range(4)]
    merged = merge_rollup_partials(
        [_partials(x, dim) for x in batches], sum_aliases=ALIASES, count_alias="n"
    )
    pd.testing.assert_frame_equal(_as_pdf(merged), one_shot, check_exact=True)


def test_merge_tree_shape_irrelevant(spark):
    """Pairwise-incremental merging (the steady-state append pattern:
    merge(merge(p0, p1), p2)) equals the all-at-once merge."""
    dim, facts = _skew_fixture(spark)
    b = F.expr("pmod(hash(k, cast(amount as string)), 3)")
    parts = [_partials(facts.filter(b == i), dim) for i in range(3)]
    all_at_once = merge_rollup_partials(parts, sum_aliases=ALIASES, count_alias="n")
    stepwise = merge_rollup_partials(
        [
            merge_rollup_partials(parts[:2], sum_aliases=ALIASES, count_alias="n"),
            parts[2],
        ],
        sum_aliases=ALIASES,
        count_alias="n",
    )
    pd.testing.assert_frame_equal(
        _as_pdf(stepwise), _as_pdf(all_at_once), check_exact=True
    )


def test_sparse_delta_only_touches_its_subtree(spark):
    """A delta landing on ONE leaf changes exactly that leaf's ancestor
    chain in the merged result and leaves every other node's row
    bit-identical — the locality that makes per-batch maintenance cheap."""
    dim, facts = _skew_fixture(spark)
    base = _as_pdf(_partials(facts, dim))
    delta = spark.createDataFrame([(3, 10.25)], "k bigint, amount double")
    merged = _as_pdf(
        merge_rollup_partials(
            [_partials(facts, dim), _partials(delta, dim)],
            sum_aliases=ALIASES,
            count_alias="n",
        )
    )
    # b1's chain: b1 -> b -> root (3 nodes change); a* rows unchanged
    changed = (merged["n"] - base["n"]).astype(int)
    assert changed.sum() == 3 and set(changed) == {0, 1}
    unchanged_mask = changed == 0
    pd.testing.assert_frame_equal(
        merged[unchanged_mask].reset_index(drop=True),
        base[unchanged_mask].reset_index(drop=True),
        check_exact=True,
    )


def test_finalize_matches_additive_rollup(spark):
    """finalize(merge(partials)) renders EXACTLY what the one-shot
    additive rollup emits (same columns, same doubles, same order)."""
    dim, facts = _skew_fixture(spark)
    direct = hierarchical_rollup_additive(
        facts, dim.aggregation_dim, "k", sum_cols=SUMS, count_alias="n"
    ).toPandas()
    b = F.expr("pmod(hash(k), 2)")
    merged = merge_rollup_partials(
        [_partials(facts.filter(b == i), dim) for i in range(2)],
        sum_aliases=ALIASES,
        count_alias="n",
    )
    fin = finalize_rollup_partials(
        merged, dim.aggregation_dim, sum_aliases=ALIASES
    ).toPandas()
    assert list(fin.columns) == list(direct.columns)
    pd.testing.assert_frame_equal(fin, direct, check_exact=True)
