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


def test_kaplan_meier_censoring_path_on_synthetic_fixture(spark, tmp_path):
    """The real fixtures have ZERO censored users at every SF (all
    signup users purchase afterward), so the censoring branch —
    horizon-censored durations, censored removals shrinking the risk
    set WITHOUT moving the survival curve, and the strictly-after-t0
    filter — never executes against them. This synthetic events table
    exercises it with a hand-computed product-limit expectation,
    verified THREE ways: hand math == Spark == the registered DuckDB
    oracle on the same parquet.

    6 users sign up at day 0; u1 purchases day 0, u2+u3 day 2, u4+u6
    never, u5 only BEFORE signup (must count as censored); horizon =
    day 10 (a view event). KM: S(0)=5/6, S(2)=5/6*3/5=1/2, day 10 has
    d=0/c=3 so S stays 1/2 while n_at_risk drops to 3."""
    import duckdb

    from ibis_olap_aggregation_spark.queries import ORACLES

    base = pd.Timestamp("2024-03-01 00:00:00")

    def ts(days, hours=0):
        return base + pd.Timedelta(days=days, hours=hours)

    rows, eid = [], 0

    def ev(user, etype, when):
        nonlocal eid
        eid += 1
        rows.append((eid, when, user, etype, 1.0, "{}"))

    for u in range(1, 7):
        ev(u, "signup", ts(0))
    ev(1, "purchase", ts(0, hours=1))   # day 0
    ev(2, "purchase", ts(2, hours=12))  # day 2
    ev(3, "purchase", ts(2, hours=20))  # day 2
    ev(5, "purchase", ts(-1))           # BEFORE signup: not an event
    ev(1, "view", ts(10))               # horizon = day 10
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf_dir = str(tmp_path / "km_fixture")
    spark.createDataFrame(pdf).repartition(4).write.parquet(
        f"{sf_dir}/events.parquet"
    )

    expected = {
        0: (6, 1, 0, round(5 / 6, 6)),
        2: (5, 2, 0, 0.5),
        10: (3, 0, 3, 0.5),
    }
    got = {
        r.day: (r.n_at_risk, r.n_events, r.n_censored, r.survival)
        for r in QUERIES["events_survival_kaplan_meier"](spark, sf_dir).collect()
    }
    assert got == expected

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    want = {
        int(r[0]): (int(r[1]), int(r[2]), int(r[3]), float(r[4]))
        for r in con.execute(ORACLES["events_survival_kaplan_meier"]).fetchall()
    }
    assert want == expected


def test_ndcg_zero_candidate_query_scores_zero(spark, tmp_path):
    """The coalesce-0 branch: on the real fixtures every query has LSH
    candidates, so 'approx list empty -> dcg 0 -> ndcg 0' never
    executes. Synthetic corpus: v0 = all +1, v1/v2 = near all -1.
    Sign signatures of -v are the bitwise complement of +v in every
    table (never equal), so query 0 collides with NOTHING and its
    fused row must come back dcg=0, ndcg=0 from BOTH engines."""
    import duckdb

    from ibis_olap_aggregation_spark.queries import ORACLES

    vecs = {
        0: [1.0] * 64,
        1: [-1.0] * 64,
        2: [-1.0] * 63 + [-0.9],
    }
    pdf = pd.DataFrame(
        [(i, [float(x) for x in v], i) for i, v in vecs.items()],
        columns=["vec_id", "embedding", "label"],
    )
    sf_dir = str(tmp_path / "ndcg_fixture")
    spark.createDataFrame(pdf).write.parquet(f"{sf_dir}/embeddings.parquet")

    got = {
        r.query_id: (r.dcg_at_5, r.idcg_at_5, r.ndcg_at_5)
        for r in QUERIES["sim_ndcg_eval"](spark, sf_dir).collect()
    }
    assert set(got) == {0, 1, 2}
    assert got[0][0] == 0.0 and got[0][2] == 0.0  # isolated: no candidates
    assert got[0][1] != 0.0  # the ideal still exists
    assert got[1][2] > 0 and got[2][2] > 0  # the -1 pair find each other

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
    )
    want = {
        int(r[0]): (float(r[1]), float(r[2]), float(r[3]))
        for r in con.execute(ORACLES["sim_ndcg_eval"]).fetchall()
    }
    assert want == got
