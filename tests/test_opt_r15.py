"""Round-15 optimization pins.

sim_kmeans_refine's assignment counts now fall out of the SAME
(cluster, dim) aggregate that re-estimates the centroids (one corpus
score pass instead of two — ADVICE r14). The equivalence argument
covers inputs the shipped fixtures never exercise: a NULL vector and
an empty vector still count toward n_assigned (posexplode_outer keeps
one NULL-dim row per such vector; the old shape counted every assigned
row directly), and their NULL-dim groups must never leak into the
centroid-shift join. This file pins exactly that input class.
"""

from __future__ import annotations

import pandas as pd
import pytest

from ibis_olap_aggregation_spark.operators.similarity import sim_kmeans_refine


@pytest.fixture(scope="module")
def degenerate_emb_dir(tmp_path_factory):
    """Embeddings fixture with a NULL vector and an empty vector mixed
    into two normal 4-dim clusters (64 dims not required — the ops read
    the array as-is)."""
    d = tmp_path_factory.mktemp("degenerate_emb")
    emb = pd.DataFrame(
        {
            "vec_id": list(range(8)),
            "embedding": [
                [1.0, 0.0, 0.0, 0.0],
                [0.9, 0.1, 0.0, 0.0],
                [0.0, 0.0, 1.0, 0.0],
                [0.0, 0.1, 0.9, 0.0],
                [1.0, 0.1, 0.1, 0.0],
                [0.1, 0.0, 1.0, 0.1],
                None,  # NULL vector
                [],  # empty vector
            ],
            "label": [0, 0, 1, 1, 0, 1, 0, 1],
        }
    )
    emb.to_parquet(str(d / "embeddings.parquet"), index=False)
    return str(d)


def test_kmeans_one_pass_counts_null_and_empty_vectors(
    spark, degenerate_emb_dir
):
    out = {r.cluster_label: r for r in sim_kmeans_refine(spark, degenerate_emb_dir).collect()}
    # every input vector — including the NULL and the empty one — is
    # assigned to exactly one cluster: the assignment counts must sum
    # to the corpus size (the old two-pass shape counted assign rows
    # directly; the one-pass dim-1-or-NULL partials must reproduce it)
    assert sum(r.n_assigned for r in out.values()) == 8
    # n_init is the raw label histogram
    assert {k: r.n_init for k, r in out.items()} == {0: 4, 1: 4}
    # the NULL-dim groups of the degenerate vectors must not poison the
    # shift join: every cluster that kept members reports a finite,
    # non-NULL centroid shift
    for r in out.values():
        if r.n_assigned > 0:
            assert r.centroid_shift_l1 is not None
            assert r.centroid_shift_l1 == r.centroid_shift_l1  # not NaN
