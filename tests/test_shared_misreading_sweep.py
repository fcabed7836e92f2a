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
