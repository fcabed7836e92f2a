"""Independent oracles for round-11 operators (the round-9 ladder rule:
every new operator gets a plain-python derivation beside the DuckDB
differential, so a shared misreading cannot survive).

The truncation-recall oracle replicates the SEQUENTIAL left-to-right
fold both engines use for per-row array math (idioms contract:
evaluation order fixed -> bit-identical doubles), so the rounded
cosines and therefore the rank boundaries match exactly — no tolerance
needed.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from ibis_olap_aggregation_spark import queries as q
from ibis_olap_aggregation_spark.session import release_query_caches


def _r6(x: float) -> float:
    return float(Decimal(str(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _fold_dot(a, b, d):
    acc = 0.0
    for i in range(d):
        acc = acc + a[i] * b[i]
    return acc


def _fold_norm(a, d):
    acc = 0.0
    for i in range(d):
        acc = acc + a[i] * a[i]
    return acc**0.5


def _topk_ids(vecs, qid, d, k):
    qv = vecs[qid]
    scored = []
    for nid, v in vecs.items():
        if nid == qid:
            continue
        cos = _r6(_fold_dot(qv, v, d) / (_fold_norm(qv, d) * _fold_norm(v, d)))
        scored.append((-cos, nid))
    scored.sort()
    return [nid for _negcos, nid in scored[:k]]


def test_emb_truncation_recall_matches_python(spark, sf_small):
    rows = [
        tuple(r)
        for r in q.QUERIES["emb_truncation_recall"](spark, sf_small).collect()
    ]
    release_query_caches()
    emb = pd.read_parquet(f"{sf_small}/embeddings.parquet")
    vecs = {
        int(vid): [float(x) for x in v]
        for vid, v in emb[["vec_id", "embedding"]].itertuples(index=False)
    }
    want = []
    for qid in range(10):
        gt = set(_topk_ids(vecs, qid, 64, 10))
        for d in (8, 16, 32):
            overlap = len(gt & set(_topk_ids(vecs, qid, d, 10)))
            want.append((qid, d, overlap, _r6(overlap / 10.0)))
    assert sorted(rows) == sorted(want)
    # sanity: truncation must actually cost something somewhere at d=8,
    # else the eval is vacuous on this fixture
    assert any(r[1] == 8 and r[2] < 10 for r in rows)
