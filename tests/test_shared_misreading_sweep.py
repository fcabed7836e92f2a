"""Shared-misreading sweep (VERDICT r10 item 2): recompute the
highest-risk r≤7 operators in PLAIN PYTHON from the raw parquet and
compare against the registered Spark queries at sf0.001.

Why this exists: the DuckDB differential gate proves Spark and DuckDB
agree, but both sides are written by the same author from the same
reading of the semantics — a shared misreading sails through (the
round-9 interval-pair id-collision bug did exactly that; the
brute-force oracle caught it). These tests are the third, independent
derivation: no Spark, no DuckDB, no shared SQL text — just hashlib,
sets, dicts and floats implementing the operator's published math
(MinHash: Broder '97; b-bit: Li & Koenig '10; item-item CF: Sarwar
'01; cosine projection: standard bipartite-projection similarity).

Constants (shingle k, hash coefficients, thresholds) ARE imported from
the package — they are the spec being implemented, not the math being
double-checked. Every formula, join shape, filter and rounding step is
re-derived here from scratch.
"""

from __future__ import annotations

import hashlib
import itertools
import re
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from ibis_olap_aggregation_spark import queries as q
from ibis_olap_aggregation_spark.functions.minhash_sql import (
    JACCARD_THRESHOLD,
    MH_MOD,
    MINHASH_SHINGLE_K,
    N_MINHASH,
)
from ibis_olap_aggregation_spark.session import release_query_caches

_BBIT = 4  # mirror of dedup._BBIT (b = 2 bits)


def _r6(x: float) -> float:
    """Spark ROUND(double, 6): HALF_UP on the shortest decimal repr
    (BigDecimal.valueOf == Double.toString == python str())."""
    return float(Decimal(str(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _md5int32(s: str) -> int:
    """First 15 md5 hex chars as int, masked to 32 bits (idioms.SPARK_MD5INT
    & 4294967295) — reimplemented from the definition, not the SQL."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) & 0xFFFFFFFF


def _tokens(text: str) -> list[str]:
    return re.split(r"\s+", text.strip())


def _hashed_shingles(text: str) -> frozenset[int]:
    t = _tokens(text)
    k = MINHASH_SHINGLE_K
    if len(t) < k:
        return frozenset()
    return frozenset(
        _md5int32(" ".join(t[i : i + k])) for i in range(len(t) - k + 1)
    )


def _minhash_sig(hs: frozenset[int]) -> list[int] | None:
    if not hs:
        return None
    return [
        min(((1000003 + 7919 * i) * h + (12345 + 271 * i)) % MH_MOD for h in hs)
        for i in range(N_MINHASH)
    ]


def _docs_pdf(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _sig_table(sf_dir: str) -> dict[int, tuple[frozenset[int], list[int] | None]]:
    out = {}
    for doc_id, text in _docs_pdf(sf_dir)[["doc_id", "text"]].itertuples(index=False):
        hs = _hashed_shingles(text)
        out[int(doc_id)] = (hs, _minhash_sig(hs))
    return out


def _band_matches(sig_tab) -> dict[tuple[int, int], int]:
    """pair -> number of matching signature slots, via bucket grouping
    (a pair is a candidate iff ≥1 band bucket contains both)."""
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, (_hs, sig) in sig_tab.items():
        if sig is None:
            continue
        for band_id, h in enumerate(sig):
            buckets.setdefault((band_id, h), []).append(doc_id)
    matches: dict[tuple[int, int], int] = {}
    for members in buckets.values():
        for a, b in itertools.combinations(sorted(members), 2):
            matches[(a, b)] = matches.get((a, b), 0) + 1
    return matches


def _collect(df):
    rows = [tuple(r) for r in df.collect()]
    release_query_caches()
    return rows


# --------------------------------------------------------------------------
# dedup family: jaccard / containment / b-bit math
# --------------------------------------------------------------------------


def test_minhash_lsh_candidates_matches_python(spark, sf_small):
    got = {
        (a, b): (n, est)
        for a, b, n, est in _collect(
            q.QUERIES["dedup_minhash_lsh_candidates"](spark, sf_small)
        )
    }
    matches = _band_matches(_sig_table(sf_small))
    want = {
        p: (n, _r6(n / float(N_MINHASH))) for p, n in matches.items()
    }
    assert got == want and len(want) > 0


def test_minhash_containment_matches_python(spark, sf_small):
    rows = _collect(q.QUERIES["dedup_minhash_containment"](spark, sf_small))
    got = {(a, b): (n, ca, cb) for a, b, n, ca, cb in rows}
    sig_tab = _sig_table(sf_small)
    want = {}
    for (a, b) in _band_matches(sig_tab):
        ha, hb = sig_tab[a][0], sig_tab[b][0]
        n_common = len(ha & hb)
        ca, cb = n_common / len(ha), n_common / len(hb)
        if ca >= 0.8 or cb >= 0.8:
            want[(a, b)] = (n_common, _r6(ca), _r6(cb))
    assert got == want and len(want) > 0


def test_minhash_jaccard_error_matches_python(spark, sf_small):
    rows = _collect(q.QUERIES["dedup_minhash_jaccard_error"](spark, sf_small))
    got = {(a, b): rest for a, b, *rest in rows}
    sig_tab = _sig_table(sf_small)
    want = {}
    for (a, b), nbm in _band_matches(sig_tab).items():
        ha, hb = sig_tab[a][0], sig_tab[b][0]
        i = len(ha & hb)
        tj = i / (len(ha) + len(hb) - i)
        est = nbm / float(N_MINHASH)
        want[(a, b)] = [nbm, _r6(est), _r6(tj), _r6(abs(est - tj))]
    assert {k: list(v) for k, v in got.items()} == want and len(want) > 0


def test_minhash_bbit_error_matches_python(spark, sf_small):
    rows = _collect(q.QUERIES["dedup_minhash_bbit_error"](spark, sf_small))
    got = {(a, b): rest for a, b, *rest in rows}
    sig_tab = _sig_table(sf_small)
    want = {}
    for (a, b), nbm in _band_matches(sig_tab).items():
        ha, hb = sig_tab[a][0], sig_tab[b][0]
        sa, sb = sig_tab[a][1], sig_tab[b][1]
        bbm = sum(1 for x, y in zip(sa, sb) if x % _BBIT == y % _BBIT)
        i = len(ha & hb)
        tj = i / (len(ha) + len(hb) - i)
        est_b = (bbm / float(N_MINHASH) - 0.25) / 0.75
        est_f = nbm / float(N_MINHASH)
        want[(a, b)] = [
            bbm, _r6(est_b), _r6(est_f), _r6(tj),
            _r6(abs(est_b - tj)), _r6(abs(est_f - tj)),
        ]
    assert {k: list(v) for k, v in got.items()} == want and len(want) > 0


def test_ngram_jaccard_pairs_matches_python(spark, sf_small):
    """The PREFIX-FILTERED production plan vs a from-scratch set-math
    brute force (k=3 string shingles, no hashing)."""
    rows = _collect(q.QUERIES["dedup_ngram_jaccard_pairs"](spark, sf_small))
    got = {(a, b): (n, j) for a, b, n, j in rows}
    docs = _docs_pdf(sf_small)
    sh = {}
    for doc_id, text in docs[["doc_id", "text"]].itertuples(index=False):
        t = _tokens(text)
        sh[int(doc_id)] = (
            frozenset(" ".join(t[i : i + 3]) for i in range(len(t) - 2))
            if len(t) >= 3
            else frozenset()
        )
    want = {}
    ids = sorted(sh)
    for a, b in itertools.combinations(ids, 2):
        if not sh[a] or not sh[b]:
            continue
        i = len(sh[a] & sh[b])
        if i == 0:
            continue
        j = i / (len(sh[a]) + len(sh[b]) - i)
        if j >= JACCARD_THRESHOLD:
            want[(a, b)] = (i, _r6(j))
    assert got == want and len(want) > 0


# --------------------------------------------------------------------------
# sketch tolerance verdicts
# --------------------------------------------------------------------------


def test_theta_segment_overlap_exacts_match_python(spark, sf_small):
    """Exact union/intersection/difference per segment pair recomputed
    with python sets; the three verdict booleans must all be True (the
    sketch math is the DataSketches library's — the VERDICT LOGIC and
    the exact branch are what this repo wrote and what gets checked)."""
    rows = _collect(q.QUERIES["sketch_theta_segment_overlap"](spark, sf_small))
    ev = pd.read_parquet(f"{sf_small}/events.parquet")[["event_type", "user_id"]]
    users = {
        t: set(g["user_id"].tolist()) for t, g in ev.groupby("event_type")
    }
    want = {}
    for a, b in itertools.combinations(sorted(users), 2):
        inter = len(users[a] & users[b])
        want[(a, b)] = (
            len(users[a] | users[b]),
            inter,
            len(users[a]) - inter,
        )
    got = {}
    for seg_a, seg_b, eu, ei, ed, vu, vi, vd in rows:
        got[(seg_a, seg_b)] = (eu, ei, ed)
        assert vu and vi and vd, (seg_a, seg_b, vu, vi, vd)
    assert got == want and len(want) > 0


def test_topk_heavy_hitters_verdict_matches_python(spark, sf_small):
    """Exact-regime approx_top_k: k_eff = min(K, distinct bigrams), all
    at/above the k_eff-th exact count, all counts exact."""
    rows = _collect(
        q.QUERIES["sketch_topk_heavy_hitters_verdict"](spark, sf_small)
    )
    assert len(rows) == 1
    n_returned, n_at_or_above, all_exact = rows[0]
    bigrams: dict[str, int] = {}
    for text in _docs_pdf(sf_small)["text"]:
        t = _tokens(text)
        for i in range(len(t) - 1):
            bg = f"{t[i]} {t[i + 1]}"
            bigrams[bg] = bigrams.get(bg, 0) + 1
    k_eff = min(10, len(bigrams))
    assert n_returned == k_eff and n_at_or_above == k_eff and bool(all_exact)


def test_quantile_rank_verdict_matches_python(spark, sf_small):
    """n_rows recomputed per event_type; every GK verdict must be True
    (the guarantee holds by the sketch's construction — a False means
    the rank-check math, not the sketch, is broken)."""
    rows = _collect(q.QUERIES["sketch_quantile_rank_verdict"](spark, sf_small))
    ev = pd.read_parquet(f"{sf_small}/events.parquet")
    n_by_type = ev.groupby("event_type").size().to_dict()
    seen = set()
    for event_type, probability, n_rows, within in rows:
        assert n_rows == n_by_type[event_type]
        assert bool(within), (event_type, probability)
        seen.add((event_type, probability))
    assert seen == {
        (t, p) for t in n_by_type for p in (0.5, 0.9, 0.99)
    }


# --------------------------------------------------------------------------
# graph: cosine projection + item-item CF
# --------------------------------------------------------------------------


def _order_items_pdf(sf_dir: str) -> pd.DataFrame:
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    return li.drop_duplicates()


def _pair_weights(items: pd.DataFrame) -> dict[tuple[int, int], int]:
    w: dict[tuple[int, int], int] = {}
    for _ok, grp in items.groupby("l_orderkey"):
        parts = sorted(set(grp["l_partkey"].tolist()))
        for a, b in itertools.combinations(parts, 2):
            w[(a, b)] = w.get((a, b), 0) + 1
    return w


def test_copurchase_cosine_matches_python(spark, sf_small):
    rows = _collect(q.QUERIES["graph_copurchase_cosine"](spark, sf_small))
    items = _order_items_pdf(sf_small)
    w = _pair_weights(items)
    supp = items.groupby("l_partkey").size().to_dict()
    scored = [
        (pa, pb, n, _r6(n / (supp[pa] * supp[pb]) ** 0.5))
        for (pa, pb), n in w.items()
        if n >= 3
    ]
    scored.sort(key=lambda r: (-r[3], r[0], r[1]))
    want = [(pa, pb, n, c) for pa, pb, n, c in scored[:20]]
    assert [tuple(r) for r in rows] == want and len(want) > 0


def test_cf_recommendations_matches_python(spark, sf_small):
    rows = _collect(q.QUERIES["graph_cf_recommendations"](spark, sf_small))
    items = _order_items_pdf(sf_small)
    w = _pair_weights(items)
    # symmetrized adjacency
    adj: dict[int, dict[int, int]] = {}
    for (a, b), n in w.items():
        adj.setdefault(a, {})[b] = n
        adj.setdefault(b, {})[a] = n
    orders = pd.read_parquet(
        f"{sf_small}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    owned_df = items.merge(
        orders, left_on="l_orderkey", right_on="o_orderkey"
    )[["o_custkey", "l_partkey"]].drop_duplicates()
    owned: dict[int, set[int]] = {}
    for cust, part in owned_df.itertuples(index=False):
        owned.setdefault(int(cust), set()).add(int(part))
    want = []
    for cust in sorted(owned):
        if cust > 200:
            continue
        scores: dict[int, int] = {}
        for part in owned[cust]:
            for rec, wt in adj.get(part, {}).items():
                scores[rec] = scores.get(rec, 0) + wt
        novel = [
            (rec, s) for rec, s in scores.items() if rec not in owned[cust]
        ]
        novel.sort(key=lambda r: (-r[1], r[0]))
        for rk, (rec, s) in enumerate(novel[:3], 1):
            want.append((cust, rec, s, rk))
    got = sorted(tuple(r) for r in rows)
    assert got == sorted(want) and len(want) > 0


# ---------------------------------------------------------------------------
# Round-12 cohort: the highest-risk r8-r11 statistics operators (same
# rationale as above — the DuckDB gate can't see a reading both engines
# share; these are from-scratch pandas/numpy/python derivations of the
# published math: Spearman rho, OLS normal equations, lagged
# cross-correlation, Benford/Nigrini digit test, PSI, Zipf log-log fit,
# ratio-to-average seasonal indexes).
# ---------------------------------------------------------------------------

import math as _math

import numpy as _np

_SF = "/root/testdata/sf0.001"


def _pq(name):
    return pd.read_parquet(f"{_SF}/{name}.parquet")


def _cents(s):
    # exact half-up cents, mirroring ROUND(x*100) on positive prices
    return (s * 100).round().astype("int64")


def test_spearman_matches_pandas(spark):
    c, n, o = _pq("customer"), _pq("nation"), _pq("orders")
    spend = o.groupby("o_custkey")["o_totalprice"].apply(
        lambda s: int(_cents(s).sum())
    )
    df = c.merge(n, left_on="c_nationkey", right_on="n_nationkey")
    df["y"] = df["c_custkey"].map(spend).fillna(0).astype("int64")
    want = {}
    for nation, g in df.groupby("n_name"):
        ra = g["c_acctbal"].rank(method="average")
        rb = g["y"].rank(method="average")
        rho = _np.corrcoef(ra, rb)[0, 1]
        want[nation] = (len(g), round(float(rho), 6))
    got = {
        r.nation: (r.n_customers, r.spearman_rho)
        for r in q.QUERIES["agg_spearman_rank_corr"](spark, _SF).collect()
    }
    release_query_caches()
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6), (k, got[k], want[k])


def test_ols_daily_trend_matches_numpy(spark):
    o, c, n, r = _pq("orders"), _pq("customer"), _pq("nation"), _pq("region")
    df = (
        o.merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
        .merge(r, left_on="n_regionkey", right_on="r_regionkey")
    )
    df["x"] = (
        pd.to_datetime(df["o_orderdate"]).dt.normalize()
        - pd.Timestamp("1992-01-01")
    ).dt.days
    df["yc"] = _cents(df["o_totalprice"])
    daily = df.groupby(["r_name", "x"])["yc"].sum().reset_index()
    want = {}
    for region, g in daily.groupby("r_name"):
        slope_c, intercept_c = _np.polyfit(g["x"], g["yc"], 1)
        r2 = float(_np.corrcoef(g["x"], g["yc"])[0, 1]) ** 2
        want[region] = (
            len(g),
            round(slope_c / 100, 6),
            round(intercept_c / 100, 6),
            round(r2, 6),
        )
    got = {
        row.region: (row.n_days, row.slope_usd_per_day, row.intercept_usd, row.r2)
        for row in q.QUERIES["agg_ols_daily_trend"](spark, _SF).collect()
    }
    release_query_caches()
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        for a, b in zip(got[k][1:], want[k][1:]):
            assert a == pytest.approx(b, rel=1e-6, abs=2e-6), (k, got[k], want[k])


def test_cross_correlation_matches_numpy(spark):
    ev = _pq("events")
    daily = (
        ev.assign(d=pd.to_datetime(ev["ts"]).dt.normalize())
        .groupby("d")
        .agg(
            x=("event_type", lambda s: int((s == "click").sum())),
            y=("event_type", lambda s: int((s == "purchase").sum())),
        )
    )
    mx, my = daily["x"].mean(), daily["y"].mean()
    s2x = float(((daily["x"] - mx) ** 2).sum())
    s2y = float(((daily["y"] - my) ** 2).sum())
    want = {}
    for lag in range(-3, 4):
        b = daily.copy()
        b.index = b.index - pd.Timedelta(days=lag)  # b.d == a.d + lag
        m = daily.join(b, how="inner", rsuffix="_b").dropna()
        num = float(((m["x"] - mx) * (m["y_b"] - my)).sum())
        want[lag] = (len(m), round(num / _math.sqrt(s2x * s2y), 6))
    got = {
        r.lag: (r.n_pairs, r.xcorr)
        for r in q.QUERIES["events_cross_correlation"](spark, _SF).collect()
    }
    release_query_caches()
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], (k, got[k], want[k])
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6), (k, got[k], want[k])


def test_benford_matches_python(spark):
    o = _pq("orders")
    digits = _cents(o["o_totalprice"]).astype(str).str[0].astype(int)
    counts = digits.value_counts().to_dict()
    t = float(sum(counts.values()))
    chi2_q = {}
    for d in range(1, 10):
        nd, e = counts.get(d, 0), _math.log10(1 + 1 / d)
        chi2_q[d] = int(
            Decimal((nd - t * e) ** 2 / (t * e) * 1e9).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )
    total6 = round(sum(chi2_q.values()) / 1e9, 6)
    got = {
        r.first_digit: r
        for r in q.QUERIES["quality_benford_digit_test"](spark, _SF).collect()
    }
    release_query_caches()
    assert set(got) == set(d for d in range(1, 10) if counts.get(d, 0) > 0)
    for d, r in got.items():
        assert r.n == counts[d]
        assert r.obs_share == pytest.approx(counts[d] / t, abs=2e-6)
        assert r.benford_share == pytest.approx(_math.log10(1 + 1 / d), abs=2e-6)
        assert r.chi2_term == pytest.approx(chi2_q[d] / 1e9, abs=2e-6)
        assert r.chi2_total == pytest.approx(total6, abs=2e-6)


def test_psi_matches_python(spark):
    from ibis_olap_aggregation_spark.operators.quality import (
        PSI_BUCKET_WIDTH,
        PSI_N_BUCKETS,
    )

    ev = _pq("events")
    ev = ev[ev.event_type.isin(["view", "purchase"])]
    bucket = _np.minimum(
        _np.floor(ev["value"] / PSI_BUCKET_WIDTH).astype("int64"),
        PSI_N_BUCKETS - 1,
    )
    base = bucket[ev.event_type == "view"].value_counts().to_dict()
    cur = bucket[ev.event_type == "purchase"].value_counts().to_dict()
    tb, tc = sum(base.values()), sum(cur.values())
    got = {
        r.bucket: r for r in q.QUERIES["quality_psi_drift"](spark, _SF).collect()
    }
    release_query_caches()
    assert set(got) == set(base) | set(cur)
    for b, r in got.items():
        nb, nc = base.get(b, 0), cur.get(b, 0)
        assert (r.n_base, r.n_cur) == (nb, nc)
        sa, sc = nb / tb, nc / tc
        assert r.share_base == pytest.approx(sa, abs=2e-6)
        assert r.share_cur == pytest.approx(sc, abs=2e-6)
        if nb > 0 and nc > 0:
            assert r.psi_term == pytest.approx(
                (sa - sc) * _math.log(sa / sc), abs=2e-6
            )
        else:
            assert r.psi_term is None


def test_zipf_slope_matches_python(spark):
    docs = _pq("documents")
    freq: dict[str, int] = {}
    for text in docs["text"]:
        for tok in re.split(r"\s+", str(text).strip()):
            if tok:
                freq[tok] = freq.get(tok, 0) + 1
    ranked = sorted(freq.items(), key=lambda t: (-t[1], t[0]))
    xs = [_math.log(i + 1) for i in range(len(ranked))]
    ys = [_math.log(f) for _, f in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    r = q.QUERIES["text_zipf_slope"](spark, _SF).collect()[0]
    release_query_caches()
    assert r.vocab_size == n
    assert r.zipf_slope == pytest.approx(round(slope, 6), abs=2e-6)
    assert r.zipf_intercept == pytest.approx(round(intercept, 6), abs=2e-6)
    assert r.r_squared == pytest.approx(round(r2, 6), abs=2e-6)


def test_dow_seasonality_matches_pandas(spark):
    ev = _pq("events")
    daily = (
        ev.assign(d=pd.to_datetime(ev["ts"]).dt.normalize())
        .groupby("d")
        .size()
        .rename("x")
        .reset_index()
    )
    overall = daily["x"].sum() / len(daily)
    daily["dow"] = daily["d"].dt.dayofweek + 1  # 1 = Monday (ISO)
    want = {}
    for dow, g in daily.groupby("dow"):
        want[int(dow)] = (
            len(g),
            int(g["x"].sum()),
            round((g["x"].sum() / len(g)) / overall, 6),
        )
    got = {
        r.dow_iso: (r.n_days, r.n_events, r.seasonal_index)
        for r in q.QUERIES["events_seasonality_dow_index"](spark, _SF).collect()
    }
    release_query_caches()
    assert set(got) == set(want)
    for k in want:
        assert got[k][:2] == want[k][:2], (k, got[k], want[k])
        assert got[k][2] == pytest.approx(want[k][2], abs=2e-6)
