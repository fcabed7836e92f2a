"""Round-13 independent oracles (plain python/pandas third derivations,
the test_round9_properties pattern): the DuckDB differential gate cannot
see a reading BOTH engines share, so every new operator also gets a
from-scratch re-derivation, plus the structural invariants the SQL
cannot state.

Covers: multimodal_audio_features_spectral (WAV bytes re-decoded with
the stdlib wave module directly, features re-derived in numpy),
privacy_generalization_ladder (pandas re-derivation + the
risk-monotonicity invariant the nested-band ladder guarantees), and
events_funnel_conversion_rate (per-user sequential scan + the funnel
ordering invariant n_purchased <= n_clicked <= n_viewed <= n_users),
multimodal_audio_vad_segments (pure-python run-length islands + the
segments<=voiced invariant), and events_rfm_segments (a from-scratch
NTILE implementation over the tie-broken total order + the quintile
balance invariant).
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


def _pcm(doc_id: int, n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.int64)
    return (doc_id * 7919 + i * 104729) % 65536 - 32768


def test_audio_spectral_matches_numpy_rederivation(spark):
    from ibis_olap_aggregation_spark.operators.multimodal import (
        AUDIO_FRAMES,
        AUDIO_WINDOW,
    )

    sdf = (
        QUERIES["multimodal_audio_features_spectral"](spark, SF)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    doc_ids = sorted(
        int(d)
        for d in pd.read_parquet(f"{SF}/documents.parquet")["doc_id"]
        if d % 3 == 1
    )
    rows = []
    for d in doc_ids:
        v = _pcm(d, AUDIO_FRAMES)
        e = (v * v).reshape(-1, AUDIO_WINDOW).sum(axis=1)
        rows.append(
            {
                "doc_id": d,
                "n_frames": AUDIO_FRAMES,
                "total_energy": int(e.sum()),
                "max_window_energy": int(e.max()),
                "dominant_window": int(e.argmax()),
                "zero_crossings": int(((v[:-1] * v[1:]) < 0).sum()),
            }
        )
    _assert_frames_equal(sdf, pd.DataFrame(rows))


def test_synth_wav_is_a_real_wav_container(spark):
    """The binary column must hold genuine WAV files: re-open a sample
    with the stdlib wave module DIRECTLY (not through decode_media) and
    check container metadata + exact frame bytes."""
    import io
    import wave

    from ibis_olap_aggregation_spark.operators.multimodal import (
        AUDIO_FRAMES,
        synth_wav_media,
    )
    from ibis_olap_aggregation_spark.session import load_table

    docs = load_table(spark, SF, "documents")
    rows = synth_wav_media(docs).orderBy("doc_id").limit(5).collect()
    assert rows, "no audio-typed documents found"
    for r in rows:
        with wave.open(io.BytesIO(bytes(r["wav"]))) as w:
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
            assert w.getframerate() == 8000
            assert w.getnframes() == AUDIO_FRAMES
            frames = w.readframes(AUDIO_FRAMES)
        expected = _pcm(int(r["doc_id"]), AUDIO_FRAMES).astype("<i2").tobytes()
        assert frames == expected


def test_generalization_ladder_matches_pandas_and_is_monotone(spark):
    sdf = (
        QUERIES["privacy_generalization_ladder"](spark, SF)
        .toPandas()
        .sort_values("band_width")
        .reset_index(drop=True)
    )
    c = pd.read_parquet(f"{SF}/customer.parquet")[
        ["c_nationkey", "c_mktsegment", "c_acctbal"]
    ]
    rows = []
    for width in (100, 1000, 10000):
        g = c.assign(band=np.floor(c["c_acctbal"] / width).astype("int64"))
        k = g.groupby(["c_nationkey", "c_mktsegment", "band"]).size()
        rows.append(
            {
                "band_width": width,
                "n_classes": int(len(k)),
                "n_small_classes": int((k < 5).sum()),
                "n_records_at_risk": int(k[k < 5].sum()),
                "risk_rate": round(float(k[k < 5].sum()) / float(k.sum()), 6),
            }
        )
    ref = pd.DataFrame(rows).astype(
        {"band_width": "int32", "n_classes": "int64",
         "n_small_classes": "int64", "n_records_at_risk": "int64"}
    )
    _assert_frames_equal(sdf, ref)
    # nested-band invariant: each 10x-wider class is a UNION of narrower
    # classes (floor(floor(x/w)/10) == floor(x/10w)), so a record at
    # risk at the wider width is at risk at the narrower one too —
    # n_records_at_risk never increases up the ladder
    at_risk = sdf.sort_values("band_width")["n_records_at_risk"].tolist()
    assert at_risk == sorted(at_risk, reverse=True)


def test_funnel_conversion_matches_sequential_scan(spark):
    import re

    sdf = (
        QUERIES["events_funnel_conversion_rate"](spark, SF)
        .toPandas()
        .sort_values("cohort_k")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")[
        ["user_id", "event_id", "ts", "event_type", "props"]
    ].sort_values(["user_id", "ts", "event_id"])
    rows = []
    for uid, g in ev.groupby("user_id", sort=True):
        k = int(re.search(r"\d+", g.iloc[0]["props"]).group())
        v_ts = g.loc[g["event_type"] == "view", "ts"].min()
        c_ts = p_ts = pd.NaT
        if pd.notna(v_ts):
            clicks = g[(g["event_type"] == "click") & (g["ts"] > v_ts)]
            c_ts = clicks["ts"].min()
        if pd.notna(c_ts):
            purch = g[(g["event_type"] == "purchase") & (g["ts"] > c_ts)]
            p_ts = purch["ts"].min()
        rows.append(
            {"cohort_k": k, "viewed": pd.notna(v_ts),
             "clicked": pd.notna(c_ts), "purchased": pd.notna(p_ts)}
        )
    u = pd.DataFrame(rows)
    ref = (
        u.groupby("cohort_k")
        .agg(
            n_users=("viewed", "size"),
            n_viewed=("viewed", "sum"),
            n_clicked=("clicked", "sum"),
            n_purchased=("purchased", "sum"),
        )
        .reset_index()
    )
    ref["view_to_click"] = (
        ref["n_clicked"] / ref["n_viewed"].replace(0, np.nan)
    ).round(6)
    ref["click_to_purchase"] = (
        ref["n_purchased"] / ref["n_clicked"].replace(0, np.nan)
    ).round(6)
    ref = ref.astype(
        {"cohort_k": "int32", "n_users": "int64", "n_viewed": "int64",
         "n_clicked": "int64", "n_purchased": "int64"}
    )
    _assert_frames_equal(sdf, ref)
    # funnel ordering invariant per cohort
    assert (sdf["n_purchased"] <= sdf["n_clicked"]).all()
    assert (sdf["n_clicked"] <= sdf["n_viewed"]).all()
    assert (sdf["n_viewed"] <= sdf["n_users"]).all()


def test_vad_segments_match_python_islands(spark):
    from ibis_olap_aggregation_spark.operators.multimodal import (
        AUDIO_FRAMES,
        AUDIO_WINDOW,
        VAD_ENERGY_THRESHOLD,
    )

    sdf = (
        QUERIES["multimodal_audio_vad_segments"](spark, SF)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    doc_ids = sorted(
        int(d)
        for d in pd.read_parquet(f"{SF}/documents.parquet")["doc_id"]
        if d % 3 == 1
    )
    rows = []
    for d in doc_ids:
        v = _pcm(d, AUDIO_FRAMES)
        e = (v * v).reshape(-1, AUDIO_WINDOW).sum(axis=1)
        voiced = e > VAD_ENERGY_THRESHOLD
        segs = []
        run = 0
        first = None
        for i, on in enumerate(voiced):
            if on:
                if run == 0 and first is None:
                    first = i
                run += 1
            elif run:
                segs.append(run)
                run = 0
        if run:
            segs.append(run)
        # first voiced window = index of the first True, not first run
        first = int(np.argmax(voiced)) if voiced.any() else None
        rows.append(
            {
                "doc_id": d,
                "n_segments": len(segs),
                "voiced_windows": int(voiced.sum()),
                "longest_segment": max(segs) if segs else 0,
                "first_voiced_window": first,
            }
        )
    ref = pd.DataFrame(rows).astype(
        {"doc_id": "int64", "n_segments": "int64",
         "voiced_windows": "int64", "longest_segment": "int64"}
    )
    ref["first_voiced_window"] = ref["first_voiced_window"].astype("Int32")
    sdf["first_voiced_window"] = sdf["first_voiced_window"].astype("Int32")
    _assert_frames_equal(sdf, ref)
    # islands invariant: segments never exceed voiced windows, and a doc
    # with any voiced window has a first index inside the window range
    assert (sdf["n_segments"] <= sdf["voiced_windows"]).all()
    has = sdf["voiced_windows"] > 0
    assert sdf.loc[has, "first_voiced_window"].between(0, 3).all()
    assert sdf.loc[~has, "first_voiced_window"].isna().all()


def _ntile(order: pd.DataFrame, by: list, asc: list, n: int) -> pd.Series:
    """SQL NTILE(n) over a TOTAL order: first (len % n) buckets get the
    extra row — matches both engines given the user_id tiebreak."""
    idx = order.sort_values(by, ascending=asc).index
    total = len(idx)
    base, extra = divmod(total, n)
    out = pd.Series(0, index=idx, dtype="int64")
    pos = 0
    for b in range(1, n + 1):
        size = base + (1 if b <= extra else 0)
        out.iloc[:] = out.iloc[:]  # keep dtype
        out.loc[idx[pos:pos + size]] = b
        pos += size
    return out


def test_rfm_segments_match_pandas(spark):
    sdf = (
        QUERIES["events_rfm_segments"](spark, SF)
        .toPandas()
        .sort_values(["r_score", "f_score", "m_score"])
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")[
        ["user_id", "ts", "event_type", "value"]
    ]
    max_day = ev["ts"].max().normalize()
    pur = ev["event_type"] == "purchase"
    # decimal-exact monetary: round each value to cents first (the
    # engine casts to decimal(18,2)), sum in integer cents
    cents = (ev["value"] * 100).round().astype("int64").where(pur, 0)
    u = (
        ev.assign(cents=cents, is_p=pur)
        .groupby("user_id")
        .agg(
            last_ts=("ts", "max"),
            frequency=("is_p", "sum"),
            cents=("cents", "sum"),
        )
        .reset_index()
    )
    u["recency_days"] = (max_day - u["last_ts"].dt.normalize()).dt.days
    u["monetary"] = u["cents"] / 100.0
    u["r_score"] = _ntile(u, ["recency_days", "user_id"], [False, True], 5)
    u["f_score"] = _ntile(u, ["frequency", "user_id"], [True, True], 5)
    u["m_score"] = _ntile(u, ["monetary", "user_id"], [True, True], 5)
    ref = (
        u.groupby(["r_score", "f_score", "m_score"])
        .agg(
            n_users=("user_id", "size"),
            total_purchases=("frequency", "sum"),
            total_cents=("cents", "sum"),
        )
        .reset_index()
    )
    ref["total_monetary"] = (ref.pop("total_cents") / 100.0).round(2)
    ref = ref.astype(
        {"r_score": "int64", "f_score": "int64", "m_score": "int64",
         "n_users": "int64", "total_purchases": "int64"}
    )
    _assert_frames_equal(sdf, ref)
    # quintile invariant: each axis's user total splits into 5 buckets
    for axis in ("r_score", "f_score", "m_score"):
        per = sdf.groupby(axis)["n_users"].sum()
        assert set(per.index) <= {1, 2, 3, 4, 5}
        assert per.max() - per.min() <= 1


def test_jaccard_neighbors_match_python_sets(spark):
    """From-scratch re-derivation with explicit python set algebra over
    the same signal graph (weight floor + hub cap), plus the exact
    integer strong_link contract: the flag must equal the
    cross-multiplied comparison, never a rounded-float one."""
    from ibis_olap_aggregation_spark.operators.graph import (
        AA_CENTER_DEGREE_CAP,
        AA_MIN_EDGE_WEIGHT,
    )

    sdf = (
        QUERIES["graph_jaccard_neighbors"](spark, SF)
        .toPandas()
        .sort_values(["part_a", "part_b"])
        .reset_index(drop=True)
    )
    li = (
        pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
        .drop_duplicates()
    )
    pairs = li.merge(li, on="l_orderkey")
    pairs = pairs[pairs["l_partkey_x"] < pairs["l_partkey_y"]]
    w = pairs.groupby(["l_partkey_x", "l_partkey_y"]).size()
    und = [k for k, v in w.items() if v >= AA_MIN_EDGE_WEIGHT]
    adj: dict[int, set] = {}
    for a, b in und:
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    rows = []
    nonhub = {n for n, ns in adj.items() if len(ns) <= AA_CENTER_DEGREE_CAP}
    seen = set()
    for center in nonhub:
        ns = sorted(adj[center])
        for i, a in enumerate(ns):
            for c in ns[i + 1:]:
                seen.add((a, c))
    for a, c in sorted(seen):
        common = len({b for b in adj[a] & adj[c] if b in nonhub})
        union = len(adj[a]) + len(adj[c]) - common
        rows.append(
            {"part_a": a, "part_b": c, "n_common": common,
             "union_size": union,
             "jaccard": round(common / union, 6),
             "strong_link": 4 * common >= len(adj[a]) + len(adj[c])}
        )
    ref = pd.DataFrame(rows).astype(
        {"part_a": "int64", "part_b": "int64", "n_common": "int64",
         "union_size": "int64"}
    )
    _assert_frames_equal(sdf, ref)
    # set-algebra invariants
    assert (sdf["n_common"] >= 1).all()
    assert (sdf["n_common"] <= sdf["union_size"]).all()
    assert (sdf["jaccard"] <= 1.0).all()


def test_interval_coverage_matches_python_merge(spark):
    """From-scratch python interval merge (the textbook sweep) over the
    same 7-day shipment intervals, plus the containment invariants the
    SQL cannot state: covered <= span always, and coverage_ratio == 1
    exactly when the islands count is 1 and covered == span."""
    from ibis_olap_aggregation_spark.operators.temporal import _SHIP_DAYS

    sdf = (
        QUERIES["interval_coverage_fraction"](spark, SF)
        .toPandas()
        .sort_values("l_suppkey")
        .reset_index(drop=True)
    )
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_suppkey", "l_shipdate"]
    ]
    li["s"] = (
        li["l_shipdate"].dt.normalize() - pd.Timestamp("1970-01-01")
    ).dt.days
    rows = []
    for supp, g in li.groupby("l_suppkey", sort=True):
        starts = sorted(set(int(x) for x in g["s"]))
        merged = []
        for s in starts:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], s + _SHIP_DAYS)
            else:
                merged.append([s, s + _SHIP_DAYS])
        covered = sum(e - b for b, e in merged)
        span = starts[-1] + _SHIP_DAYS - starts[0]
        rows.append(
            {"l_suppkey": int(supp), "n_islands": len(merged),
             "covered_days": covered, "span_days": span,
             "coverage_ratio": round(covered / span, 6)}
        )
    ref = pd.DataFrame(rows).astype(
        {"l_suppkey": "int64", "n_islands": "int64",
         "covered_days": "int64", "span_days": "int64"}
    )
    _assert_frames_equal(sdf, ref)
    assert (sdf["covered_days"] <= sdf["span_days"]).all()
    full = sdf["coverage_ratio"] == 1.0
    assert (full == ((sdf["n_islands"] == 1)
                     & (sdf["covered_days"] == sdf["span_days"]))).all()


def test_pca_power_iteration_matches_numpy(spark):
    """numpy third derivation: the same two power-iteration steps in
    float64 over the numpy covariance — the engine's per-term 1e-12
    quantization must stay within 1e-5 of it — plus the algebraic
    invariants (unit loading vector, positive dominant eigenvalue,
    eigenvalue <= trace)."""
    sdf = (
        QUERIES["emb_pca_power_iteration"](spark, SF)
        .toPandas()
        .sort_values("dim")
        .reset_index(drop=True)
    )
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")["embedding"]
    M = np.array([np.asarray(v, dtype=np.float64) for v in emb])
    C = np.cov(M, rowvar=False, bias=True)
    d = C.shape[0]
    assert len(sdf) == d
    x = np.full(d, round(1.0 / np.sqrt(d), 9))
    for _ in range(2):
        y = C @ x
        nrm = float(np.sqrt((y * y).sum()))
        x = np.round(y / nrm, 9)
    ref_loading = np.round(y / nrm, 6)
    got = sdf["loading"].to_numpy()
    assert np.max(np.abs(got - ref_loading)) <= 1e-5, (
        got[:8], ref_loading[:8]
    )
    ev = float(sdf["eigenvalue_est"].iloc[0])
    assert (sdf["eigenvalue_est"] == ev).all()
    assert abs(ev - nrm) <= 1e-4
    assert 0 < ev <= np.trace(C) + 1e-9
    assert abs(float((got * got).sum()) - 1.0) <= 1e-4
