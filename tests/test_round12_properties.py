"""Round-12 independent oracles (plain python/numpy third derivations,
the test_round9_properties / shared-misreading-sweep pattern): the
DuckDB differential gate cannot see a reading BOTH engines share, so
every new operator also gets a from-scratch re-derivation here.

Covers: sim_range_search (md5 hyperplanes + buckets + cosine radius
recomputed with hashlib/numpy), sim_ndcg_eval (DCG folds from exact
numpy cosines + python-derived LSH candidates), and
events_survival_kaplan_meier (product-limit estimator from pandas)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from ibis_olap_aggregation_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

RP_TABLES, RP_BITS = 4, 4
RP_PLANES = RP_TABLES * RP_BITS
N_QUERIES, TOP_K, TAU = 10, 5, 0.25


def _planes() -> np.ndarray:
    w = np.zeros((RP_PLANES, 64))
    for p in range(RP_PLANES):
        for i in range(1, 65):
            h = int(hashlib.md5(f"{p}|{i}".encode()).hexdigest()[:15], 16)
            w[p, i - 1] = ((h % 2001) - 1000) / 1000.0
    return w


def _emb_np():
    df = pd.read_parquet(f"{SF}/embeddings.parquet")
    ids = df["vec_id"].to_numpy()
    v = np.stack(df["embedding"].to_numpy()).astype("float64")
    return ids, v, df["label"].to_numpy()


def _buckets(ids, v):
    """vec_id -> {(table_id, bucket)} exactly per the rp_lsh construction."""
    w = _planes()
    dots = v @ w.T  # (n, planes)
    out: dict[int, set] = {}
    for r, vid in enumerate(ids):
        sigs: dict[int, int] = {}
        for p in range(RP_PLANES):
            if dots[r, p] > 0:
                t = p // RP_BITS
                sigs[t] = sigs.get(t, 0) | (1 << (p % RP_BITS))
            else:
                sigs.setdefault(p // RP_BITS, sigs.get(p // RP_BITS, 0))
        out[int(vid)] = {(t, b) for t, b in sigs.items()}
    return out


def _cosines(v):
    n = v / np.linalg.norm(v, axis=1, keepdims=True)
    return n @ n.T


@pytest.fixture(scope="module")
def lsh_world():
    ids, v, labels = _emb_np()
    order = np.argsort(ids)
    ids, v, labels = ids[order], v[order], labels[order]
    return ids, v, labels, _buckets(ids, v), _cosines(v)


def _candidates(ids, buckets):
    cand: dict[int, set] = {q: set() for q in range(N_QUERIES)}
    inv: dict[tuple, list] = {}
    for vid, bs in buckets.items():
        for tb in bs:
            inv.setdefault(tb, []).append(vid)
    for q in range(N_QUERIES):
        for tb in buckets[q]:
            for vid in inv[tb]:
                if vid != q:
                    cand[q].add(vid)
    return cand


def test_range_search_matches_numpy_rederivation(spark, lsh_world):
    ids, v, labels, buckets, cos = lsh_world
    cand = _candidates(ids, buckets)
    want = set()
    pos = {int(vid): i for i, vid in enumerate(ids)}
    for q, ns in cand.items():
        for n in ns:
            c = round(cos[pos[q], pos[n]], 6)
            if c >= TAU:
                want.add((q, n, int(labels[pos[n]]), c))
    got = {
        (r.query_id, r.neighbor_id, r.neighbor_label, float(r.cosine))
        for r in QUERIES["sim_range_search"](spark, SF).collect()
    }
    assert got == want and len(got) > 0


def test_ndcg_matches_numpy_rederivation(spark, lsh_world):
    ids, v, labels, buckets, cos = lsh_world
    cand = _candidates(ids, buckets)
    pos = {int(vid): i for i, vid in enumerate(ids)}

    def dcg(ranked):
        return sum(
            c / (math.log(rk + 2) / math.log(2))  # rk 0-based here
            for rk, (c, _) in enumerate(ranked[:TOP_K])
        )

    rows = {}
    for q in range(N_QUERIES):
        allc = sorted(
            ((round(cos[pos[q], pos[int(n)]], 6), int(n)) for n in ids if n != q),
            key=lambda t: (-t[0], t[1]),
        )
        idcg = dcg(allc)
        approx = sorted(
            ((round(cos[pos[q], pos[n]], 6), n) for n in cand[q]),
            key=lambda t: (-t[0], t[1]),
        )
        d = dcg(approx)
        rows[q] = (round(d, 6), round(idcg, 6), round(d / idcg, 6))
    got = {
        r.query_id: (r.dcg_at_5, r.idcg_at_5, r.ndcg_at_5)
        for r in QUERIES["sim_ndcg_eval"](spark, SF).collect()
    }
    assert set(got) == set(rows)
    for q in rows:
        for a, b in zip(got[q], rows[q]):
            assert a == pytest.approx(b, abs=2e-6), (q, got[q], rows[q])


def test_kaplan_meier_matches_pandas_rederivation(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["ts"] = pd.to_datetime(ev["ts"])
    s0 = (
        ev[ev.event_type == "signup"].groupby("user_id")["ts"].min().rename("t0")
    )
    m = ev[ev.event_type == "purchase"].merge(s0, on="user_id")
    m = m[m.ts > m.t0]
    tp = m.groupby("user_id")["ts"].min().rename("tp")
    horizon = ev["ts"].max()
    d = pd.concat([s0, tp], axis=1)
    # force the µs unit: pandas surfaces these parquet timestamps as
    # datetime64[us] (NOT ns), so a blind //1000 would produce ms
    us = lambda s: s.astype("datetime64[us]").astype("int64")  # noqa: E731
    end = d["tp"].fillna(horizon)
    d["day"] = (us(end) - us(d["t0"])) // 86_400_000_000
    d["observed"] = d["tp"].notna().astype(int)

    by = (
        d.groupby("day")
        .agg(n_events=("observed", "sum"), n_censored=("observed", lambda s: (1 - s).sum()))
        .sort_index()
    )
    total = len(d)
    surv, rows, removed = 1.0, {}, 0
    for day, r in by.iterrows():
        n_at_risk = total - removed
        if r.n_events > 0:
            surv *= 1.0 - r.n_events / n_at_risk
        rows[int(day)] = (
            n_at_risk,
            int(r.n_events),
            int(r.n_censored),
            round(surv, 6),
        )
        removed += int(r.n_events) + int(r.n_censored)

    got = {
        r.day: (r.n_at_risk, r.n_events, r.n_censored, r.survival)
        for r in QUERIES["events_survival_kaplan_meier"](spark, SF).collect()
    }
    assert set(got) == set(rows)
    for day in rows:
        assert got[day][:3] == rows[day][:3], (day, got[day], rows[day])
        assert got[day][3] == pytest.approx(rows[day][3], abs=2e-6)
    # KM invariants: survival non-increasing, within [0, 1], at-risk
    # strictly decreasing over days
    days = sorted(got)
    s_vals = [got[d][3] for d in days]
    assert all(a >= b for a, b in zip(s_vals, s_vals[1:]))
    assert all(0.0 <= s <= 1.0 for s in s_vals)
    n_vals = [got[d][0] for d in days]
    assert all(a > b for a, b in zip(n_vals, n_vals[1:]))


def test_rrf_fusion_matches_python_fusion_of_components(spark):
    """Independent derivation of the FUSION math: collect the two
    component retrievers' own outputs (each independently verified —
    rp_lsh by the numpy bucket re-derivation above, ivf by the driver
    oracle) and fuse them in plain python; the registered query must
    agree on scores, list counts and fused order."""
    lsh = QUERIES["sim_rp_lsh_topk"](spark, SF).collect()
    ivf = QUERIES["sim_ivf_topk"](spark, SF).collect()
    pool: dict[tuple, list] = {}
    for rows in (lsh, ivf):
        for r in rows:
            pool.setdefault((r.query_id, r.neighbor_id), []).append(r.rk)
    fused = {
        k: (len(rks), sum(1.0 / (60 + rk) for rk in rks))
        for k, rks in pool.items()
    }
    want = {}
    for q in {k[0] for k in fused}:
        ranked = sorted(
            ((v[1], k[1], v[0]) for k, v in fused.items() if k[0] == q),
            key=lambda t: (-t[0], t[1]),
        )
        for i, (score, nid, nl) in enumerate(ranked[:5], start=1):
            want[(q, nid)] = (nl, round(score, 6), i)
    got = {
        (r.query_id, r.neighbor_id): (r.n_lists, r.rrf_score, r.rk)
        for r in QUERIES["sim_rrf_fusion"](spark, SF).collect()
    }
    assert got == want and len(got) > 0
    # fusion sanity: a neighbor in BOTH lists outranks one with the
    # same best rank in a single list
    assert any(v[0] == 2 for v in got.values())
