"""Sketch layer: merge-losslessness, error bounds, and set algebra —
the properties that make sketches safe to pre-aggregate at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.functions import sketches as sk
from ibis_olap_aggregation_spark.session import load_table


def test_hll_merge_lossless(spark, sf_small):
    """Rolling up per-nation HLL partials must give the IDENTICAL
    estimate to sketching the whole table directly — merge is lossless,
    so per-segment sketch cubes re-aggregate to any grain."""
    c = load_table(spark, sf_small, "customer")
    partials = sk.hll_partial(c, ["c_nationkey"], "c_custkey")
    rolled = sk.hll_rollup(
        partials.withColumn("all", F.lit(1)), ["all"]
    ).collect()[0].approx_distinct
    direct = sk.hll_rollup(
        sk.hll_partial(c.withColumn("all", F.lit(1)), ["all"], "c_custkey"),
        ["all"],
    ).collect()[0].approx_distinct
    assert rolled == direct


def test_hll_error_bound(spark, sf_small):
    c = load_table(spark, sf_small, "customer")
    exact = c.select("c_custkey").distinct().count()
    est = sk.hll_rollup(
        sk.hll_partial(c.withColumn("g", F.lit(1)), ["g"], "c_custkey"), ["g"]
    ).collect()[0].approx_distinct
    # lgk=12 -> rsd ~1.6%; allow 3 sigma
    assert abs(est - exact) <= max(3, 0.05 * exact), (est, exact)


def test_theta_set_algebra(spark, sf_small):
    """Theta intersection/difference across overlapping segments: for
    segment sizes far below the sketch's exact-mode threshold the
    estimates are exact, so the algebra is checked against set math."""
    c = load_table(spark, sf_small, "customer").select("c_custkey")
    n = c.count()
    a = c.filter(F.col("c_custkey") % 3 != 0)   # ~2/3 of keys
    b = c.filter(F.col("c_custkey") % 2 != 0)   # ~1/2 of keys
    sa = sk.theta_partial(a.withColumn("g", F.lit(1)), ["g"], "c_custkey")
    sb = sk.theta_partial(b.withColumn("g", F.lit(1)), ["g"], "c_custkey")
    j = sa.select(F.col("theta_sketch").alias("ta")).crossJoin(
        sb.select(F.col("theta_sketch").alias("tb"))
    )
    row = sk.theta_overlap(j, "ta", "tb").collect()[0]
    exact_a = {r.c_custkey for r in a.collect()}
    exact_b = {r.c_custkey for r in b.collect()}
    assert row.union_distinct == len(exact_a | exact_b)
    assert row.intersection_distinct == len(exact_a & exact_b)
    assert row.difference_distinct == len(exact_a - exact_b)
    assert n >= row.union_distinct


def test_approx_topk_matches_exact_on_small_cardinality(spark, sf_small):
    d = load_table(spark, sf_small, "documents")
    got = {
        r.item: r.est_count
        for r in sk.approx_topk(d, "source", k=5, max_items=1000).collect()
    }
    exact = {
        r.source: r.n
        for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "source").limit(5).collect()
    }
    # cardinality (20 sources) << max_items: sketch counts are exact;
    # compare as count multisets (ties may order differently)
    assert sorted(got.values()) == sorted(exact.values())


def test_approx_quantiles_bounds(spark, sf_small):
    o = load_table(spark, sf_small, "orders")
    qs = sk.approx_quantiles(o, "o_totalprice", [0.0, 0.5, 1.0])
    exact_min, exact_max = o.agg(
        F.min("o_totalprice"), F.max("o_totalprice")
    ).collect()[0]
    assert qs[0] == exact_min and qs[2] == exact_max
    assert exact_min <= qs[1] <= exact_max


def test_hierarchical_sketch_rollup_equals_direct(spark, sf_small):
    """Sketch-cube rollup: merging LEAF-grain HLL partials up the
    closure must give the identical estimate at every node to sketching
    that node's fact slice directly (HLL union losslessness composed
    with the hierarchy), and land within HLL error of the exact rollup."""
    from ibis_olap_aggregation_spark.queries import _geo_dim
    from ibis_olap_aggregation_spark.rollup import hierarchical_rollup_sketch

    dim = _geo_dim(spark, sf_small).aggregation_dim
    orders = load_table(spark, sf_small, "orders")
    got = {
        r.ancestor_node_name: r.approx_distinct
        for r in hierarchical_rollup_sketch(
            orders, dim, "o_custkey", "o_custkey"
        ).collect()
    }
    # direct per-node sketch: expand facts to ancestors FIRST, sketch per node
    expanded = orders.join(
        dim.select("descendant_node_natural_key", "ancestor_node_id", "ancestor_node_name"),
        orders["o_custkey"] == F.col("descendant_node_natural_key"),
    )
    direct = {
        r.ancestor_node_name: r.est
        for r in expanded.groupBy("ancestor_node_id", "ancestor_node_name")
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(o_custkey, 12))").alias("est"))
        .collect()
    }
    assert got == direct
    exact = {
        r.ancestor_node_name: r.n
        for r in expanded.groupBy("ancestor_node_name")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for name, est in got.items():
        assert abs(est - exact[name]) <= max(3, 0.05 * exact[name]), (
            name, est, exact[name],
        )


def test_topk_verdict_small_vocab_matches_oracle(spark, tmp_path):
    """Degenerate-vocab guard (VERDICT r4/r5 finding #3): with FEWER
    distinct bigrams than K the old rank==K threshold filter matched
    nothing, the crossJoin emptied the result, and a small fixture was
    indistinguishable from a broken sketch (0/null/null vs the oracle's
    hardcoded K/K/TRUE). Both sides now report k_eff = least(K, vocab):
    the verdict query and its DuckDB oracle must agree on a 3-bigram
    corpus."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry_mod
    from ibis_olap_aggregation_spark.operators.sketch_eval import (
        sketch_topk_heavy_hitters_verdict,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["alpha beta alpha", "beta gamma"],
            "lang": ["en", "en"],
            "source": ["fixture", "fixture"],
            "n_chars": [16, 10],
        }
    )
    d = tmp_path / "sfmini"
    d.mkdir()
    docs.to_parquet(d / "documents.parquet")

    sdf = sketch_topk_heavy_hitters_verdict(spark, str(d)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    odf = con.execute(
        entry_mod.oracle_sql()["sketch_topk_heavy_hitters_verdict"]
    ).fetchdf()
    # 3 distinct bigrams (alpha beta / beta alpha / beta gamma) < K=10
    assert odf.iloc[0]["n_returned"] == 3
    s = sdf[sorted(sdf.columns)].reset_index(drop=True)
    o = odf[sorted(odf.columns)].reset_index(drop=True)
    pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
