"""Blocked pair-join forms vs their all-pairs references.

The shipped dedup pair queries are blocked (pigeonhole chunks / prefix
filtering / block grid / RP-LSH buckets); the O(n^2) theta-join forms
are kept as private helpers purely so this suite can pin:

- simhash pigeonhole, jaccard prefix-filter, cosine block-grid: EXACT —
  identical rows to all-pairs (the blockings are provably lossless);
- cosine RP-LSH: subset of the exact pairs (precision 1.0), recall
  pinned to a floor;
- no CartesianProduct / BroadcastNestedLoopJoin in any default plan.
"""

from __future__ import annotations

import pandas as pd
import pytest

from ibis_olap_aggregation_spark.operators import dedup
from tests.test_entry_oracle import normalize


def _pdf(df) -> pd.DataFrame:
    return normalize(df.toPandas())


@pytest.mark.parametrize(
    "blocked, allpairs",
    [
        (dedup.dedup_simhash_near_pairs, dedup._simhash_near_pairs_allpairs),
        (dedup.dedup_ngram_jaccard_pairs, dedup._ngram_jaccard_allpairs),
        (dedup.dedup_embedding_cosine_pairs, dedup._embedding_cosine_allpairs),
    ],
)
def test_blocked_equals_allpairs(spark, sf_small, blocked, allpairs):
    b = _pdf(blocked(spark, sf_small))
    a = _pdf(allpairs(spark, sf_small))
    pd.testing.assert_frame_equal(b, a, check_dtype=False, check_exact=True)


def test_lsh_cosine_subset_and_recall(spark, sf_small):
    lsh = dedup.dedup_embedding_cosine_lsh_pairs(spark, sf_small).toPandas()
    exact = dedup._embedding_cosine_allpairs(spark, sf_small).toPandas()
    lsh_pairs = set(zip(lsh.vec_a, lsh.vec_b))
    exact_pairs = set(zip(exact.vec_a, exact.vec_b))
    # precision 1.0: every LSH pair passed exact verification
    assert lsh_pairs <= exact_pairs
    # verified cosines agree bit-for-bit with the exact form
    merged = lsh.merge(exact, on=["vec_a", "vec_b"], suffixes=("_l", "_e"))
    assert (merged.cosine_l == merged.cosine_e).all()
    # recall floor for 16 tables x 4 bits at the loose 0.3 threshold
    recall = len(lsh_pairs) / len(exact_pairs)
    assert recall >= 0.80, f"recall {recall:.3f} below floor"


@pytest.mark.parametrize(
    "fn, allow_plane_fanout",
    [
        (dedup.dedup_simhash_near_pairs, False),
        (dedup.dedup_ngram_jaccard_pairs, False),
        (dedup.dedup_embedding_cosine_pairs, False),
        # the LSH query fans every vector out against the broadcast
        # 64-row PLANE table (a map-side crossJoin, cost 64n, not a pair
        # join) — that BroadcastNestedLoopJoin is the intended shape. It
        # PRINTS twice: bucket_pairs self-joins the cached sub-bucket
        # table, and the cached plan's lineage appears under each of the
        # two scan references (the cache executes it once).
        (dedup.dedup_embedding_cosine_lsh_pairs, True),
    ],
)
def test_no_unpartitioned_join_in_plan(spark, sf_small, fn, allow_plane_fanout):
    # cached plans from earlier tests get substituted by plan-equality
    # and reprint their lineage under each InMemoryTableScan, making
    # text counts order-dependent — clear for a deterministic plan
    spark.catalog.clearCache()
    plan = fn(spark, sf_small)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    assert n_bnlj <= (2 if allow_plane_fanout else 0), plan[:2000]
