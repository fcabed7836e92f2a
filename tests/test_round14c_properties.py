"""Round-14c independent oracles (plain python/pandas third
derivations, the test_round9_properties pattern): the DuckDB
differential gate cannot see a reading BOTH engines share, so every new
operator also gets a from-scratch re-derivation, plus the structural
invariants the SQL cannot state.

Covers: join_asof_backward (brute-force per-probe scan over the raw
events — no window functions, no joins — plus the exactly-one-row-per-
probe and match-dominance invariants), sketch_cms_heavy_hitters (the
hash, counters, and min-estimate re-derived in pure python, plus the
CMS linearity/merge property the query can't observe),
privacy_entropy_l_diversity (numpy entropy re-derivation plus the
exp(H) <= distinct-l Jensen bound), and pipeline_epoch_shard_plan
(hashlib md5 re-derivation plus the between-epoch reshuffle property).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from ibis_olap_aggregation_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

_P = 2147483647
_CMS_W = 512
_CMS_ROWS = ((0, 1103515245, 12345), (1, 1588635695, 54321),
             (2, 1117695901, 98765), (3, 1727346581, 24680))
_TOL_US = 30 * 86_400 * 1_000_000


def _events() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    return ev


# ---------------------------------------------------------------------------
# join_asof_backward
# ---------------------------------------------------------------------------


def _python_asof(ev: pd.DataFrame) -> pd.DataFrame:
    """Brute force: for each click, linearly scan ALL purchases of the
    same user at-or-before it and keep the (ts, event_id)-max one."""
    clicks = ev[ev.event_type == "click"]
    purch = ev[ev.event_type == "purchase"]
    rows = []
    for _, c in clicks.iterrows():
        cand = purch[(purch.user_id == c.user_id) & (purch.ts_us <= c.ts_us)]
        row = {
            "click_event_id": c.event_id,
            "user_id": c.user_id,
            "click_ts_us": c.ts_us,
            "purchase_event_id": None,
            "purchase_value": None,
            "gap_us": None,
        }
        if len(cand):
            best = cand.sort_values(["ts_us", "event_id"]).iloc[-1]
            gap = int(c.ts_us - best.ts_us)
            if gap <= _TOL_US:
                row.update(
                    purchase_event_id=int(best.event_id),
                    purchase_value=best.value,
                    gap_us=gap,
                )
        rows.append(row)
    return pd.DataFrame(rows)


def test_asof_matches_bruteforce_and_invariants(spark):
    got = QUERIES["join_asof_backward"](spark, SF).toPandas()
    ref = _python_asof(_events())
    assert len(got) == len(ref)
    # exactly one output row per click, keyed by the probe PK
    assert got.click_event_id.is_unique
    g = got.sort_values("click_event_id").reset_index(drop=True)
    r = ref.sort_values("click_event_id").reset_index(drop=True)
    for col in ("click_event_id", "user_id", "click_ts_us"):
        assert (g[col].to_numpy() == r[col].to_numpy()).all(), col
    for col in ("purchase_event_id", "gap_us", "purchase_value"):
        assert g[col].astype("float64").equals(r[col].astype("float64")), col
    matched = g[g.purchase_event_id.notna()]
    assert (matched.gap_us >= 0).all()
    assert (matched.gap_us <= _TOL_US).all()
    # some clicks match AND some don't — the strict upper bound pins
    # that the 30-day tolerance path actually rejects stale matches on
    # this fixture (code-review r14c: <= was a tautology)
    assert 0 < len(matched) < len(g)


# ---------------------------------------------------------------------------
# sketch_cms_heavy_hitters
# ---------------------------------------------------------------------------


def _cms_bucket(key: int, a: int, b: int) -> int:
    x = (a * (key % _P) + b) % _P
    sq = (x * x) % _P
    return (sq ^ (sq >> 15)) % _CMS_W


def _python_cms(keys: np.ndarray) -> dict[tuple[int, int], int]:
    counters: dict[tuple[int, int], int] = {}
    for k in keys:
        for i, a, b in _CMS_ROWS:
            c = (i, _cms_bucket(int(k), a, b))
            counters[c] = counters.get(c, 0) + 1
    return counters


def test_cms_matches_python_rederivation(spark):
    got = QUERIES["sketch_cms_heavy_hitters"](spark, SF).toPandas()
    keys = pd.read_parquet(f"{SF}/lineitem.parquet")["l_partkey"].to_numpy()
    counters = _python_cms(keys)
    exact = pd.Series(keys, name="l_partkey").value_counts()
    top = (
        exact.rename("n")
        .reset_index()
        .sort_values(["n", "l_partkey"], ascending=[False, True])
        .head(10)
    )
    assert list(got.l_partkey) == list(top.l_partkey)
    assert list(got.exact_count) == list(top.n)
    for _, row in got.iterrows():
        est = min(
            counters[(i, _cms_bucket(int(row.l_partkey), a, b))]
            for i, a, b in _CMS_ROWS
        )
        assert est == row.cms_estimate, row.l_partkey
        assert est >= row.exact_count  # structural overestimate
    assert got.never_underestimates.all()
    assert list(got["rank"]) == list(range(1, len(got) + 1))


def test_cms_counters_are_linear():
    """Merge = elementwise ADD: the property that makes CMS partials a
    thing a 100 TB frequency store keeps (split the stream anywhere,
    add the counter tables, get the whole-stream sketch)."""
    keys = pd.read_parquet(f"{SF}/lineitem.parquet")["l_partkey"].to_numpy()
    whole = _python_cms(keys)
    a, b = _python_cms(keys[: len(keys) // 2]), _python_cms(keys[len(keys) // 2 :])
    merged: dict[tuple[int, int], int] = dict(a)
    for c, n in b.items():
        merged[c] = merged.get(c, 0) + n
    assert merged == whole


# ---------------------------------------------------------------------------
# privacy_entropy_l_diversity
# ---------------------------------------------------------------------------


def test_entropy_l_matches_numpy(spark):
    got = QUERIES["privacy_entropy_l_diversity"](spark, SF).toPandas()
    c = pd.read_parquet(f"{SF}/customer.parquet")
    c["band"] = np.floor(c.c_acctbal / 1000).astype("int64")
    for _, row in got.iterrows():
        cls = c[
            (c.c_nationkey == row.c_nationkey)
            & (c.c_mktsegment == row.c_mktsegment)
        ]
        counts = cls.band.value_counts().to_numpy()
        k = counts.sum()
        assert k == row.k_anonymity
        assert len(counts) == row.distinct_l
        # quantized-term entropy, exactly the engine's arithmetic
        s_q = sum(round(int(kj) * math.log(kj) * 1e9) for kj in counts)
        ent = round(math.exp(math.log(k) - (s_q / 1e9) / k), 4)
        assert abs(ent - row.entropy_l) < 5e-5, (row.c_nationkey, row.c_mktsegment)
        assert row.meets_entropy_2 == (row.entropy_l >= 2.0)
        r1 = counts.max()
        assert row.recursive_2_2_ok == (r1 < 2 * (k - r1))
        # Jensen: effective number of values never exceeds the count
        assert row.entropy_l <= row.distinct_l + 1e-9
        assert row.entropy_l >= 1.0 - 1e-9


# ---------------------------------------------------------------------------
# pipeline_epoch_shard_plan
# ---------------------------------------------------------------------------


def _shard(doc_id: int, epoch: int) -> int:
    h = hashlib.md5(f"{doc_id}:{epoch}".encode()).hexdigest()
    return int(h[:15], 16) % 8


def test_shard_plan_matches_hashlib(spark):
    got = QUERIES["pipeline_epoch_shard_plan"](spark, SF).toPandas()
    d = pd.read_parquet(f"{SF}/documents.parquet")
    total = int(d.n_chars.sum())
    for epoch in (0, 1, 2):
        sh = d.doc_id.map(lambda i, e=epoch: _shard(int(i), e))
        grp = d.assign(shard=sh).groupby("shard").agg(
            n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum")
        )
        sub = got[got.epoch == epoch].set_index("shard")
        assert grp.n_docs.to_dict() == sub.n_docs.to_dict()
        assert {k: int(v) for k, v in grp.sum_chars.to_dict().items()} == {
            k: int(v) for k, v in sub.sum_chars.to_dict().items()
        }
        # every document lands in exactly one shard per epoch
        assert int(sub.n_docs.sum()) == len(d)
        assert int(sub.sum_chars.sum()) == total
        for _, row in sub.iterrows():
            assert row.within_25pct == (
                abs(int(row.sum_chars) * 8 - total) * 4 <= total
            )
    # the reshuffle property: epochs permute docs DIFFERENTLY
    s0 = d.doc_id.map(lambda i: _shard(int(i), 0))
    s1 = d.doc_id.map(lambda i: _shard(int(i), 1))
    assert (s0 != s1).any()


def test_asof_carries_intact_build_row_with_null_value(spark, tmp_path):
    """The frankenrow pin (code-review r14c): a purchase whose VALUE is
    NULL must be carried INTACT — event_id AND its NULL value together —
    not have the value back-filled from an older purchase. The shipped
    fixtures contain no NULL purchase values, so this builds its own
    events table: P1(value 5.0) then P2(value NULL) then a click."""
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-20"]
            ).astype("datetime64[us]"),
            "user_id": [7, 7, 7, 7],
            "event_type": ["purchase", "purchase", "click", "click"],
            "value": [5.0, None, None, None],
            "props": ["", "", "", ""],
        }
    )
    ev.to_parquet(tmp_path / "events.parquet", index=False)
    got = (
        QUERIES["join_asof_backward"](spark, str(tmp_path))
        .toPandas()
        .set_index("click_event_id")
    )
    # both clicks match P2 (latest), and P2's NULL value rides along —
    # never P1's 5.0 paired with P2's id
    for cid in (3, 4):
        assert got.loc[cid, "purchase_event_id"] == 2
        assert pd.isna(got.loc[cid, "purchase_value"])


# ---------------------------------------------------------------------------
# sketch_hdr_quantiles
# ---------------------------------------------------------------------------


def _hdr_code(v: int) -> int:
    if v < 16:
        return v
    e = v.bit_length() - 1
    return (e - 4) * 16 + (v >> (e - 4))


def _hdr_lo(code: int) -> int:
    if code < 16:
        return code
    return (((code % 16) + 16)) << ((code // 16) + 3 - 4)


def test_hdr_matches_python_rederivation(spark):
    got = QUERIES["sketch_hdr_quantiles"](spark, SF).toPandas()
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["v"] = (o.o_totalprice * 100).round().astype("int64")
    groups = {g: gd.v.to_numpy() for g, gd in o.groupby("o_orderpriority")}
    groups["ALL"] = o.v.to_numpy()
    for _, row in got.iterrows():
        vs = np.sort(groups[row.grp])
        n = len(vs)
        assert n == row.n_rows
        qn, qd = {"p50": (1, 2), "p90": (9, 10), "p99": (99, 100)}[row.label]
        target = (n * qn + qd - 1) // qd
        assert target == row.target_rank
        # register + cumulative pick, re-derived from scratch
        codes = np.sort(np.array([_hdr_code(int(v)) for v in vs]))
        est_code = int(codes[target - 1])  # sorted codes: rank target
        assert est_code == row.est_code
        assert _hdr_lo(est_code) == row.est_lo_cents
        # percentile_disc = value at rank ceil(q*n) in sorted order
        exact = int(vs[target - 1])
        assert exact == row.exact_cents
        # structural guarantee: exact inside the estimated bucket,
        # bucket width <= lo/16
        assert row.est_lo_cents <= exact < row.est_lo_cents + row.bucket_width
        assert row.bucket_width * 16 <= row.est_lo_cents or row.est_code < 16


def test_hdr_coder_is_monotone_and_merge_is_add():
    """The two properties the query can't state: code(v) is monotone
    (so register cumsums ARE rank counts), and the register table
    merges by elementwise ADD (split the stream anywhere)."""
    vals = sorted(set(range(1, 2048)) | {10**k for k in range(2, 12)})
    codes = [_hdr_code(v) for v in vals]
    assert codes == sorted(codes)
    # decode lower bound brackets every value to <= 1/16 relative width
    for v in vals:
        lo = _hdr_lo(_hdr_code(v))
        assert lo <= v
        if v >= 16:
            assert (v - lo) * 16 < lo + 16  # width = lo//16 rounded up
    keys = pd.read_parquet(f"{SF}/orders.parquet")
    v = (keys.o_totalprice * 100).round().astype("int64").to_numpy()
    def regs(arr):
        out: dict[int, int] = {}
        for x in arr:
            c = _hdr_code(int(x))
            out[c] = out.get(c, 0) + 1
        return out
    whole = regs(v)
    a, b = regs(v[: len(v) // 2]), regs(v[len(v) // 2 :])
    merged = dict(a)
    for c, n in b.items():
        merged[c] = merged.get(c, 0) + n
    assert merged == whole


# ---------------------------------------------------------------------------
# streaming_asof_enrich_twin
# ---------------------------------------------------------------------------


def test_streaming_asof_equals_batch_and_state_is_user_bounded(spark):
    """stream == batch: the eleventh twin's drained output must equal
    join_asof_backward row-for-row (same schema, same oracle). The
    drain's progress reports additionally prove the state store holds
    at most one row per purchase-active user — constant-width state,
    the 100 TB property the operator claims."""
    from ibis_olap_aggregation_spark.streaming.replay_queries import (
        last_drain_progress,
    )

    got = (
        QUERIES["streaming_asof_enrich_twin"](spark, SF)
        .toPandas()
        .sort_values("click_event_id")
        .reset_index(drop=True)
    )
    progress = last_drain_progress()
    batch = (
        QUERIES["join_asof_backward"](spark, SF)
        .toPandas()
        .sort_values("click_event_id")
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(batch.columns)
    assert got.astype(str).equals(batch.astype(str))
    # 8 rate-limited micro-batches actually ran
    assert len([p for p in progress if p.get("numInputRows", 0) > 0]) == 8
    # state rows <= users that have at least one purchase
    ev = _events()
    n_purchase_users = ev[ev.event_type == "purchase"].user_id.nunique()
    state_rows = max(
        op.get("numRowsTotal", 0)
        for p in progress
        for op in p.get("stateOperators", [])
    )
    assert 0 < state_rows <= n_purchase_users
