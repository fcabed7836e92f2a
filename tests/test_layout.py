"""Data-layout operators: z-order skipping, shard export, compaction."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.operators import layout
from ibis_olap_aggregation_spark.session import load_table

TMP = "/tmp/spark_graft_layout_test"


@pytest.fixture(autouse=True)
def _clean_tmp():
    shutil.rmtree(TMP, ignore_errors=True)
    yield


def test_zorder_beats_linear_on_two_dim_probes(spark, sf_small):
    rows = {
        r["layout"]: r
        for r in layout.layout_zorder_file_skipping(spark, sf_small).collect()
    }
    assert set(rows) == {"zorder", "linear"}
    assert rows["zorder"]["n_files"] == rows["linear"]["n_files"] == 64
    # the point of the operator: probes constraining BOTH dims scan
    # fewer files under the z-order layout
    assert rows["zorder"]["avg_files_hit"] < rows["linear"]["avg_files_hit"]
    # and every probe hits at least one candidate region per layout
    assert rows["zorder"]["sum_files_hit"] > 0


def test_zorder_key_is_injective_on_small_grid(spark):
    # bijectivity of the interleave on an 8x8 grid (bits=3 covers 0..7
    # exactly when maxima are 7: normalization is then the identity)
    df = (
        spark.range(8)
        .withColumnRenamed("id", "x")
        .crossJoin(spark.range(8).withColumnRenamed("id", "y"))
        .withColumn("z", layout.zorder_key(["x", "y"], {"x": 7, "y": 7}, 3))
    )
    got = df.select("z").distinct().count()
    assert got == 64
    # locality spot-checks: (0,0)->0; x contributes even bits, y odd
    vals = {(r["x"], r["y"]): r["z"] for r in df.collect()}
    assert vals[(0, 0)] == 0
    assert vals[(1, 0)] == 1
    assert vals[(0, 1)] == 2
    assert vals[(3, 3)] == 15


def test_export_training_shards_manifest_roundtrip(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    path = os.path.join(TMP, "shards")
    manifest = layout.export_training_shards(
        docs, path, "doc_id", n_shards=8, fingerprint_col="text"
    )
    assert manifest["n_shards"] == 8
    assert sum(s["n_rows"] for s in manifest["shards"].values()) == docs.count()
    # reread: per-directory counts and fingerprints match the manifest
    back = spark.read.parquet(path)
    stats = {
        str(r["shard"]): r
        for r in back.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(
                "bit_xor(cast(conv(substr(md5(text), 1, 15), 16, 10) as bigint))"
            ).alias("fingerprint"),
        )
        .collect()
    }
    assert set(stats) == set(manifest["shards"])
    for k, m in manifest["shards"].items():
        assert stats[k]["n_rows"] == m["n_rows"]
        assert stats[k]["fingerprint"] == m["fingerprint"]
    # determinism: a re-export produces the identical manifest
    manifest2 = layout.export_training_shards(
        docs, os.path.join(TMP, "shards2"), "doc_id", n_shards=8,
        fingerprint_col="text",
    )
    assert manifest2 == manifest
    # shard directories exist on disk (partitionBy layout)
    assert len(glob.glob(os.path.join(path, "shard=*"))) == 8
    # saved manifest equals the returned one
    assert layout.read_shard_manifest(path) == manifest


def test_compact_parquet_dir(spark, sf_small):
    src = os.path.join(TMP, "small_files")
    dst = os.path.join(TMP, "compacted")
    li = load_table(spark, sf_small, "lineitem")
    # simulate a small-file mess: 40 files for 6k rows
    li.repartition(40).write.parquet(src)
    assert len(glob.glob(os.path.join(src, "*.parquet"))) == 40
    n_parts = layout.compact_parquet_dir(
        spark, src, dst, ["l_orderkey"], target_rows_per_file=2000
    )
    assert n_parts == 3
    files = glob.glob(os.path.join(dst, "*.parquet"))
    # range boundaries come from sampling, so partitions are only
    # approximately equal: each may split once under maxRecordsPerFile
    assert n_parts <= len(files) <= 2 * n_parts
    # lossless: same multiset of rows
    a = spark.read.parquet(dst)
    # the cap held: no compacted file exceeds the target row count
    per_file = (
        a.withColumn("f", F.input_file_name()).groupBy("f").count().collect()
    )
    assert max(r["count"] for r in per_file) <= 2000
    assert a.count() == li.count()
    assert a.exceptAll(li).count() == 0 and li.exceptAll(a).count() == 0
    # clustered: per-file l_orderkey ranges are disjoint (range layout)
    stats = (
        a.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in stats)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_kmeans_refine_conserves_vectors(spark, sf_small):
    from ibis_olap_aggregation_spark.operators import similarity

    out = similarity.sim_kmeans_refine(spark, sf_small).collect()
    assert sum(r["n_assigned"] for r in out) == sum(r["n_init"] for r in out)
    for r in out:
        if r["n_assigned"] > 0:
            assert r["centroid_shift_l1"] is not None
            assert r["centroid_shift_l1"] >= 0


def test_approx_distinct_rollup_tracks_exact(spark, sf_small):
    """The sketch rollup's tolerance verdict (the oracle-checkable shape:
    exact count + within_bounds at eps=10%) must hold at every node, and
    the exact branch must agree with the flagship exact rollup."""
    from ibis_olap_aggregation_spark import queries as q

    rows = q.QUERIES["agg_approx_distinct_rollup"](spark, sf_small).collect()
    assert all(r["within_bounds"] for r in rows)
    got = {
        (r["node_name"], r["level_number"]): r["exact_distinct_customers"]
        for r in rows
    }
    exact = {
        (r["node_name"], r["level_number"]): r["distinct_customer_count"]
        for r in q.QUERIES["hierarchy_geo_rollup_orders"](spark, sf_small).collect()
    }
    assert got == exact
