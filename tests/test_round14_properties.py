"""Round-14 independent oracles (plain python/pandas third derivations,
the test_round9_properties pattern): the DuckDB differential gate cannot
see a reading BOTH engines share, so every new operator also gets a
from-scratch re-derivation, plus the structural invariants the SQL
cannot state.

Covers: scd2_late_arriving_update_merge (from-scratch python run-length
SCD2 over the corrected history + the interval-tiling and merge==rebuild
invariants), layout_hilbert_vs_zorder_skipping (the Hilbert fold
re-derived in pure python + the bijectivity and unit-step LOCALITY
properties that define the curve — the property Morton order lacks),
and pipeline_curriculum_mixture_schedule (numpy re-derivation over the
pandas-side survivor election + per-stage normalization and monotone-
flattening invariants).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ibis_olap_aggregation_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    key = df.astype(str).agg("|".join, axis=1)
    return df.loc[key.sort_values().index].reset_index(drop=True)


def _assert_frames_equal(sdf: pd.DataFrame, ref: pd.DataFrame) -> None:
    s, r = _norm(sdf), _norm(ref)
    assert len(s) == len(r), (len(s), len(r))
    assert list(s.columns) == list(r.columns)
    assert s.astype(str).equals(r.astype(str)), (
        s.head(10).to_string(),
        r.head(10).to_string(),
    )


# ---------------------------------------------------------------------------
# scd2_late_arriving_update_merge
# ---------------------------------------------------------------------------


def _python_scd2(ev: pd.DataFrame) -> list[dict]:
    """From-scratch SCD2: per-user run-length compression of the tier
    sequence ordered by (ts, event_id) — no window functions, a plain
    sequential scan."""

    def tier(v: float) -> str:
        return "low" if v < 60 else ("mid" if v < 140 else "high")

    rows: list[dict] = []
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        version = 0
        run: dict | None = None
        for _, r in g.iterrows():
            t = tier(r["value"])
            if run is None or run["tier"] != t:
                if run is not None:
                    run["valid_to_us"] = r["ts"].value // 1000
                    rows.append(run)
                version += 1
                run = {
                    "user_id": int(uid),
                    "version": version,
                    "tier": t,
                    "valid_from_us": r["ts"].value // 1000,
                    "valid_to_us": None,
                    "n_events": 0,
                }
            run["n_events"] += 1
        rows.append(run)
    return rows


def test_scd2_late_merge_equals_python_rebuild_and_tiles(spark):
    """The incremental merge must equal the from-scratch python SCD2
    over the FULL corrected history, and the intervals must tile each
    user's span: contiguous 1-based versions, valid_to == next
    valid_from, exactly one open version per user."""
    from ibis_olap_aggregation_spark.operators.temporal import (
        _LATE_MOD,
        _LATE_REM,
    )

    sdf = QUERIES["scd2_late_arriving_update_merge"](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")[
        ["user_id", "ts", "event_id", "value"]
    ]
    ref = pd.DataFrame(_python_scd2(ev))
    ref["rebuilt"] = (
        ref["user_id"]
        .isin(ev.loc[ev["event_id"] % _LATE_MOD == _LATE_REM, "user_id"])
        .astype(bool)
    )
    ref = ref.astype(
        {"user_id": "int64", "version": "int64", "n_events": "int64"}
    )
    _assert_frames_equal(sdf, ref)
    # tiling invariants per user
    for uid, g in sdf.sort_values("version").groupby("user_id"):
        assert list(g["version"]) == list(range(1, len(g) + 1)), uid
        opens = g["valid_to_us"].isna().sum()
        assert opens == 1, (uid, opens)
        froms = g["valid_from_us"].tolist()
        tos = g["valid_to_us"].tolist()
        for i in range(len(g) - 1):
            assert tos[i] == froms[i + 1], uid
    # the late slice is non-trivial and so is the untouched remainder:
    # both merge paths are actually exercised by the fixture
    assert sdf["rebuilt"].any() and (~sdf["rebuilt"]).any()


def test_scd2_late_merge_matches_full_dim_rows(spark):
    """merge == rebuild, stated against the ENGINE's own full-history
    dim (scd2_user_tier_dim): dropping the rebuilt flag must reproduce
    it exactly — the incremental path may never invent or lose a
    version."""
    merged = (
        QUERIES["scd2_late_arriving_update_merge"](spark, SF)
        .drop("rebuilt")
        .toPandas()
    )
    full = QUERIES["scd2_user_tier_dim"](spark, SF).toPandas()
    _assert_frames_equal(merged, full)


# ---------------------------------------------------------------------------
# layout_hilbert_vs_zorder_skipping
# ---------------------------------------------------------------------------


def _py_xy2d(n: int, x: int, y: int) -> int:
    """Textbook Hilbert xy->d (the same algorithm the SQL unrolls),
    written independently here as the third derivation."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_fold_is_bijective_and_unit_step(spark):
    """The defining properties of the Hilbert curve, checked over the
    WHOLE 32x32 grid against the engine's unrolled SQL fold:
    (a) the engine fold equals the independent python xy2d cell by
    cell, (b) d is a bijection onto 0..1023, and (c) LOCALITY —
    consecutive d values are always grid-adjacent cells (|dx|+|dy| ==
    1), the property Morton order lacks and the reason hilbert files
    prune better."""
    from ibis_olap_aggregation_spark.operators.layout import (
        HILBERT_BITS_PER_DIM,
        hilbert_key_layers,
    )

    n = 1 << HILBERT_BITS_PER_DIM
    grid = spark.range(n * n).selectExpr(
        "CAST(id AS BIGINT) AS pk",
        "CAST(id AS BIGINT) AS sk",
        f"CAST(id DIV {n} AS BIGINT) AS x",
        f"CAST(id % {n} AS BIGINT) AS y",
    )
    out = (
        hilbert_key_layers(grid, HILBERT_BITS_PER_DIM)
        .selectExpr(f"pk DIV {n} AS cx", f"pk % {n} AS cy", "d")
        .toPandas()
    )
    # (a) cell-by-cell equality with the independent implementation
    expected = {
        (cx, cy): _py_xy2d(n, cx, cy) for cx in range(n) for cy in range(n)
    }
    got = {(r.cx, r.cy): r.d for r in out.itertuples()}
    assert got == expected
    # (b) bijection
    assert sorted(got.values()) == list(range(n * n))
    # (c) unit-step locality along the whole curve
    by_d = {d: xy for xy, d in got.items()}
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = by_d[d], by_d[d + 1]
        assert abs(x1 - x0) + abs(y1 - y0) == 1, d


def test_hilbert_layout_beats_linear_and_zorder_here(spark):
    """The measured ordering the query exists to demonstrate, pinned on
    the fixture: hilbert prunes at least as well as zorder, and both
    space-filling curves beat the linear sort."""
    sdf = (
        QUERIES["layout_hilbert_vs_zorder_skipping"](spark, SF)
        .toPandas()
        .set_index("layout")
    )
    assert set(sdf.index) == {"hilbert", "zorder", "linear"}
    assert (sdf["n_files"] == 64).all()
    h, z, lin = (
        sdf.loc["hilbert", "avg_files_hit"],
        sdf.loc["zorder", "avg_files_hit"],
        sdf.loc["linear", "avg_files_hit"],
    )
    assert h <= z < lin, (h, z, lin)
    # every probe hits at least one file per layout (rectangles cover
    # data regions), so the averages are meaningful
    assert (sdf["sum_files_hit"] >= 32).all()


# ---------------------------------------------------------------------------
# pipeline_curriculum_mixture_schedule
# ---------------------------------------------------------------------------


def test_curriculum_schedule_matches_numpy(spark):
    """Numpy re-derivation over a pandas-side survivor election, plus
    the invariants the SQL cannot state: per-stage weights sum to ~1,
    per-stage allocations sum to ~the stage budget, and lower alpha
    flattens — the minority language's weight is monotonically
    nondecreasing from warmup to anneal."""
    from ibis_olap_aggregation_spark.operators.pipeline import (
        CURRICULUM_STAGES,
    )

    sdf = QUERIES["pipeline_curriculum_mixture_schedule"](spark, SF).toPandas()

    d = pd.read_parquet(f"{SF}/documents.parquet")[
        ["doc_id", "lang", "n_chars", "text"]
    ]
    import hashlib

    d["h"] = d["text"].map(
        lambda t: hashlib.md5(t.strip().lower().encode()).hexdigest()
    )
    d = d[d["doc_id"] == d.groupby("h")["doc_id"].transform("min")]
    d["tok"] = (d["n_chars"] + 3) // 4
    lt = d.groupby("lang").agg(
        n_surviving_docs=("doc_id", "size"), n_tokens=("tok", "sum")
    )
    p = lt["n_tokens"].to_numpy(dtype="float64") / float(lt["n_tokens"].sum())
    total = int(lt["n_tokens"].sum())
    rows = []
    for sid, stage, alpha, frac in CURRICULUM_STAGES:
        qw = np.round(np.power(p, alpha) * 1e15).astype("int64")
        w = qw.astype("float64") / float(qw.sum())
        budget = np.round(frac * float(total))
        rows.append(
            lt.reset_index().assign(
                stage_id=np.int32(sid),
                stage=stage,
                p_raw=np.round(p, 6),
                weight=np.round(w, 6),
                alloc_tokens=np.round(w * budget).astype("int64"),
                epochs=np.round(
                    w * budget / lt["n_tokens"].to_numpy(dtype="float64"), 6
                ),
            )
        )
    ref = pd.concat(rows, ignore_index=True)[list(sorted(sdf.columns))]
    _assert_frames_equal(sdf, ref[list(sdf.columns)])
    # per-stage closure invariants
    for sid, g in sdf.groupby("stage_id"):
        assert abs(g["weight"].sum() - 1.0) < 1e-4, sid
        frac = dict(
            (s[0], s[3]) for s in CURRICULUM_STAGES
        )[sid]
        total_tok = int(g["n_tokens"].sum())
        assert (
            abs(g["alloc_tokens"].sum() - frac * total_tok)
            <= len(g)  # one rounding unit per language
        ), sid
    # monotone flattening: the smallest language's weight never falls
    # as alpha drops across warmup -> core -> anneal
    minority = sdf.loc[sdf["n_tokens"].idxmin(), "lang"]
    ws = (
        sdf[sdf["lang"] == minority]
        .sort_values("stage_id")["weight"]
        .tolist()
    )
    assert ws == sorted(ws), ws


# ---------------------------------------------------------------------------
# sketch_hll_portable_registers
# ---------------------------------------------------------------------------

_P = 2147483647
_A = 1103515245
_B = 12345
_M = 256


def _mix(k: int) -> int:
    """The portable hash, re-derived in arbitrary-precision python ints
    (no numpy int64 — an accidental overflow DIFFERENCE from the SQL
    path is exactly what this guards)."""
    x = (_A * (k % _P) + _B) % _P
    x = (x * x) % _P
    x ^= x >> 15
    x = (_A * x + _B) % _P
    x = (x * x) % _P
    x ^= x >> 13
    return x


def _python_hll(keys) -> tuple[list[int], float, int]:
    regs = [0] * _M
    for k in keys:
        v = _mix(int(k))
        b = v % _M
        w = v // _M
        rho = 24 - w.bit_length()
        regs[b] = max(regs[b], rho)
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    s = sum(2.0 ** -r for r in regs)
    raw = alpha * _M * _M / s
    v_zero = regs.count(0)
    est = (
        _M * float(np.log(_M / v_zero))
        if raw <= 2.5 * _M and v_zero > 0
        else raw
    )
    return regs, est, v_zero


def test_hll_matches_python_rederivation(spark):
    out = (
        QUERIES["sketch_hll_portable_registers"](spark, SF)
        .toPandas()
        .set_index("grp")
    )
    orders = pd.read_parquet(f"{SF}/orders.parquet")[
        ["o_orderpriority", "o_custkey"]
    ].drop_duplicates()
    all_regs = None
    merged_from_groups = [0] * _M
    for grp, g in orders.groupby("o_orderpriority"):
        regs, est, v_zero = _python_hll(g["o_custkey"])
        merged_from_groups = [
            max(a, b) for a, b in zip(merged_from_groups, regs)
        ]
        row = out.loc[grp]
        assert row["exact_distinct"] == g["o_custkey"].nunique()
        assert row["n_zero_registers"] == v_zero
        assert abs(row["hll_estimate"] - est) < 1e-4, (grp, est, row)
    regs_all, est_all, v_all = _python_hll(
        orders["o_custkey"].drop_duplicates()
    )
    row = out.loc["ALL"]
    assert row["exact_distinct"] == orders["o_custkey"].nunique()
    assert row["n_zero_registers"] == v_all
    assert abs(row["hll_estimate"] - est_all) < 1e-4
    # MERGEABILITY: the union sketch is the elementwise max of the
    # group sketches — the property that makes HLL partials storable
    assert merged_from_groups == regs_all


def test_hll_merge_is_associative_and_order_free():
    """Splitting any key set arbitrarily and max-merging the partial
    registers reproduces the whole-set registers — the distributed
    combine the 100 TB path relies on."""
    rng = np.random.default_rng(7)
    keys = rng.integers(1, 10**9, size=4000)
    whole, _, _ = _python_hll(keys)
    for n_parts in (2, 3, 7):
        parts = np.array_split(rng.permutation(keys), n_parts)
        merged = [0] * _M
        for p in parts:
            r, _, _ = _python_hll(p)
            merged = [max(a, b) for a, b in zip(merged, r)]
        assert merged == whole, n_parts


def test_hll_mixed_hash_estimate_quality_on_contiguous_keys():
    """The adversarial input for the hash: CONTIGUOUS keys (the lattice
    that biased a bare affine LCG +35%). The mixed hash must estimate
    within 3 sigma across two orders of magnitude."""
    for n in (500, 5000, 50000):
        _, est, _ = _python_hll(range(1, n + 1))
        assert abs(est - n) / n <= 0.195, (n, est)


def test_hll_both_estimator_branches_covered(spark):
    """At sf0.001 the per-group rows sit in the linear-counting regime;
    at sf0.01 the ALL row crosses into the raw harmonic-mean regime —
    so the driver gate exercises BOTH branches of the estimator."""
    small = (
        QUERIES["sketch_hll_portable_registers"](spark, SF)
        .toPandas()
        .set_index("grp")
    )
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    # linear-counting at sf0.001: estimate == 256*ln(256/V) for groups
    for grp in small.index:
        if grp == "ALL":
            continue
        v = small.loc[grp, "n_zero_registers"]
        assert v > 0
        lc = _M * float(np.log(_M / v))
        assert abs(small.loc[grp, "hll_estimate"] - lc) < 1e-4
    big = (
        QUERIES["sketch_hll_portable_registers"](
            spark, "/root/testdata/sf0.01"
        )
        .toPandas()
        .set_index("grp")
    )
    # raw branch at sf0.01 ALL: estimate != the linear-counting value
    v = big.loc["ALL", "n_zero_registers"]
    if v > 0:
        lc = _M * float(np.log(_M / v))
        assert abs(big.loc["ALL", "hll_estimate"] - lc) > 1.0


# ---------------------------------------------------------------------------
# privacy_t_closeness_audit
# ---------------------------------------------------------------------------


def _python_t_closeness(cust: pd.DataFrame) -> pd.DataFrame:
    cust = cust.assign(
        band=np.floor(cust["c_acctbal"] / 1000).astype("int64")
    )
    bands = np.sort(cust["band"].unique())
    m = len(bands)
    g_total = len(cust)
    g_dist = cust.groupby("band").size().reindex(bands, fill_value=0)
    rows = []
    for (nat, seg), cl in cust.groupby(["c_nationkey", "c_mktsegment"]):
        k = len(cl)
        c_dist = cl.groupby("band").size().reindex(bands, fill_value=0)
        # exact-integer cumulative numerators over denominator K*G
        num = (c_dist.values * g_total - g_dist.values * k).cumsum()
        emd = float(np.abs(num).sum()) / (k * g_total * max(m - 1, 1))
        rows.append(
            {
                "c_nationkey": nat,
                "c_mktsegment": seg,
                "k_anonymity": k,
                "t_closeness": round(emd, 6),
                "violates_t": emd > 0.2,
            }
        )
    return pd.DataFrame(rows)


def test_t_closeness_matches_numpy(spark):
    out = QUERIES["privacy_t_closeness_audit"](spark, SF).toPandas()
    cust = pd.read_parquet(f"{SF}/customer.parquet")[
        ["c_nationkey", "c_mktsegment", "c_acctbal"]
    ]
    ref = _python_t_closeness(cust)
    _assert_frames_equal(out, ref)


def test_t_closeness_bounds_and_degenerate_cases():
    """EMD over the normalized ordered distance is bounded [0, 1]; a
    class distributed exactly like the global table scores 0; a class
    concentrated at one extreme band of a two-band table scores the
    max distance its share allows."""
    rng = np.random.default_rng(11)
    cust = pd.DataFrame(
        {
            "c_nationkey": rng.integers(0, 5, 500),
            "c_mktsegment": rng.choice(["A", "B"], 500),
            "c_acctbal": rng.uniform(-999, 9999, 500).round(2),
        }
    )
    ref = _python_t_closeness(cust)
    assert (ref["t_closeness"] >= 0).all()
    assert (ref["t_closeness"] <= 1).all()
    # self-distance is zero: one class == whole table
    solo = cust.assign(c_nationkey=0, c_mktsegment="A")
    ref0 = _python_t_closeness(solo)
    assert (ref0["t_closeness"] == 0).all()
    # two bands, class entirely in the far band, global 50/50:
    # cum|p-q| at band 0 is 0.5, m-1 = 1 -> EMD exactly 0.5
    two = pd.DataFrame(
        {
            "c_nationkey": [0] * 50 + [1] * 50,
            "c_mktsegment": ["A"] * 100,
            "c_acctbal": [500.0] * 50 + [1500.0] * 50,
        }
    )
    ref2 = _python_t_closeness(two).set_index("c_nationkey")
    assert ref2.loc[0, "t_closeness"] == 0.5
    assert ref2.loc[1, "t_closeness"] == 0.5
    assert bool(ref2.loc[0, "violates_t"])
