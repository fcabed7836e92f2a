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
ordering invariant n_purchased <= n_clicked <= n_viewed <= n_users).
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
