"""Consistency of dedup_incremental_new_docs with ground truth.

The oracle mirror (test_entry_oracle) already pins Spark == DuckDB; this
suite pins both against FIRST PRINCIPLES at sf0.001 — brute-force
all-pairs, no LSH:

- every `exact_dup` verdict has an identical-normalized-text corpus doc,
  and the matched id is the smallest such;
- every `near_dup` verdict's matched pair really has shingle Jaccard >=
  the threshold;
- RECALL: every new-corpus pair with true Jaccard >= threshold is
  flagged (deterministic here: with r=1 b=16 banding a J>=0.5 pair
  collides on >=1 band w.p. ~1-2^-16, and the corpus is fixed);
- `unique` verdicts have NO corpus doc at or above the threshold and no
  exact copy.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.functions.idioms import tokens_col
from ibis_olap_aggregation_spark.functions.minhash_sql import JACCARD_THRESHOLD
from ibis_olap_aggregation_spark.operators.dedup import (
    INCREMENTAL_NEW_PCT,
    dedup_incremental_new_docs,
    hashed_shingles_col,
)
from ibis_olap_aggregation_spark.queries import QUERIES
from ibis_olap_aggregation_spark.session import load_table


@pytest.fixture(scope="module")
def truth(spark, sf_small):
    out = dedup_incremental_new_docs(spark, sf_small).toPandas()
    d = load_table(spark, sf_small, "documents").withColumn("t", tokens_col())
    rows = d.select(
        "doc_id",
        hashed_shingles_col().alias("hs"),
        F.md5(F.lower(F.trim("text"))).alias("ch"),
    ).collect()
    hs = {r["doc_id"]: set(r["hs"]) for r in rows}
    ch = {r["doc_id"]: r["ch"] for r in rows}
    new_ids = set(out.doc_id)
    corpus_ids = set(hs) - new_ids
    return out, hs, ch, new_ids, corpus_ids


def _jac(a: set, b: set) -> float:
    if not a and not b:
        return 0.0
    i = len(a & b)
    return i / (len(a) + len(b) - i)


def test_split_fraction(truth):
    out, hs, _, new_ids, corpus_ids = truth
    assert len(new_ids) + len(corpus_ids) == len(hs)
    frac = len(new_ids) / len(hs)
    assert 0.5 * INCREMENTAL_NEW_PCT / 100 < frac < 2 * INCREMENTAL_NEW_PCT / 100


def test_exact_verdicts_are_exact(truth):
    out, _, ch, _, corpus_ids = truth
    by_hash: dict[str, list[int]] = {}
    for cid in corpus_ids:
        by_hash.setdefault(ch[cid], []).append(cid)
    for row in out[out.verdict == "exact_dup"].itertuples():
        matches = by_hash.get(ch[row.doc_id], [])
        assert matches, f"doc {row.doc_id}: no exact corpus copy"
        assert int(row.matched_doc_id) == min(matches)


def test_near_verdicts_verify(truth):
    out, hs, _, _, _ = truth
    for row in out[out.verdict == "near_dup"].itertuples():
        j = _jac(hs[row.doc_id], hs[int(row.matched_doc_id)])
        assert j >= JACCARD_THRESHOLD, (row.doc_id, row.matched_doc_id, j)


def test_recall_against_all_pairs(truth):
    out, hs, ch, new_ids, corpus_ids = truth
    flagged = {
        int(r.doc_id) for r in out[out.verdict != "unique"].itertuples()
    }
    for nid in new_ids:
        true_dup = any(
            ch[nid] == ch[cid] or _jac(hs[nid], hs[cid]) >= JACCARD_THRESHOLD
            for cid in corpus_ids
        )
        if true_dup:
            assert nid in flagged, f"missed true duplicate {nid}"
        else:
            assert nid not in flagged, f"false positive {nid}"


def test_registered(spark):
    assert "dedup_incremental_new_docs" in QUERIES
