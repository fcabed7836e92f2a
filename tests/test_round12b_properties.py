"""Round-12 second-batch independent oracles (plain python/pandas third
derivations, the test_round9_properties / shared-misreading-sweep
pattern): the DuckDB differential gate cannot see a reading BOTH engines
share, so every new operator also gets a from-scratch re-derivation.

Covers: pipeline_pack_sequences (cumsum packing in pandas),
graph_adamic_adar (wedge scores from explicit adjacency dicts),
events_attribution_lookback (per-user sequential scan),
text_mixture_temperature_weights (numpy), and the bloom-pruned
semi-join's exactness under a FORCED-tiny filter (maximum false
positives — the confirm join must still make the output exact).
"""

from __future__ import annotations

import math

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


def test_pack_sequences_matches_pandas_cumsum(spark):
    from ibis_olap_aggregation_spark.operators.pipeline import (
        PACK_CTX,
        PACK_SHARDS,
    )

    d = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "n_chars"]]
    d["shard"] = d["doc_id"] % PACK_SHARDS
    d["n_tok"] = ((d["n_chars"] + 3) // 4).clip(lower=1)
    d = d.sort_values(["shard", "doc_id"])
    d["cum"] = d.groupby("shard")["n_tok"].cumsum()
    d["pack_id"] = (d["cum"] - d["n_tok"]) // PACK_CTX
    d["straddle"] = ((d["cum"] - 1) // PACK_CTX > d["pack_id"]).astype(int)
    ref = (
        d.groupby(["shard", "pack_id"])
        .agg(
            n_docs=("doc_id", "size"),
            sum_tokens=("n_tok", "sum"),
            n_straddlers=("straddle", "sum"),
        )
        .reset_index()
    )
    sdf = QUERIES["pipeline_pack_sequences"](spark, SF).toPandas()
    # fill_ratio is NOT independently re-rounded in pandas: .round(6)
    # rounds half-to-even while Spark F.round is half-up, and
    # sum_tokens/2048 lands on an exact 1e-6 halfway tie whenever
    # sum_tokens % 32 == 16 (ADVICE r12 #1). Instead derive it from the
    # engine's own already-compared sum_tokens with an explicit half-up
    # rule, so the only asserted fact is the rounding contract itself.
    from decimal import ROUND_HALF_UP, Decimal

    expected_fill = sdf["sum_tokens"].map(
        lambda t: float(
            (Decimal(int(t)) / Decimal(PACK_CTX)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
    )
    assert (sdf["fill_ratio"] == expected_fill).all()
    _assert_frames_equal(
        sdf.drop(columns=["fill_ratio"]),
        ref.astype({"shard": "int64", "pack_id": "int64"}),
    )


def test_adamic_adar_matches_python_wedges(spark):
    from ibis_olap_aggregation_spark.operators.graph import (
        AA_CENTER_DEGREE_CAP,
        AA_MIN_EDGE_WEIGHT,
    )

    li = (
        pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
        .drop_duplicates()
    )
    pairs = li.merge(li, on="l_orderkey")
    pairs = pairs[pairs["l_partkey_x"] < pairs["l_partkey_y"]]
    wcount = (
        pairs.groupby(["l_partkey_x", "l_partkey_y"]).size().reset_index(name="w")
    )
    wcount = wcount[wcount["w"] >= AA_MIN_EDGE_WEIGHT]
    und = set(zip(wcount["l_partkey_x"], wcount["l_partkey_y"]))
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores: dict[tuple[int, int], int] = {}
    for center, nbrs in adj.items():
        d = len(nbrs)
        if d < 2 or d > AA_CENTER_DEGREE_CAP:
            continue
        u = round(1e12 / math.log(d))
        sn = sorted(nbrs)
        for i, a in enumerate(sn):
            for c in sn[i + 1 :]:
                scores[(a, c)] = scores.get((a, c), 0) + u
    cand = [
        (a, c, s) for (a, c), s in scores.items() if (a, c) not in und
    ]
    cand.sort(key=lambda t: (-t[2], t[0], t[1]))
    ref = pd.DataFrame(
        [(a, c, round(s / 1e12, 6)) for a, c, s in cand[:20]],
        columns=["part_a", "part_b", "aa_score"],
    )
    sdf = QUERIES["graph_adamic_adar"](spark, SF).toPandas()
    _assert_frames_equal(sdf, ref)


def test_bloom_prune_exact_under_forced_false_positives(spark, monkeypatch):
    """BLOOM_M=8 makes nearly every probe row a bloom survivor — the
    confirm join alone must deliver exactness. Compare against the
    no-bloom semi-join computed in pandas."""
    import ibis_olap_aggregation_spark.operators.relational as rel

    monkeypatch.setattr(rel, "BLOOM_M", 8)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    urgent = set(
        orders.loc[orders["o_orderpriority"] == "1-URGENT", "o_orderkey"]
    )
    hit = li[li["l_orderkey"].isin(urgent)].copy()
    # exact decimal twin: quantize to cents like the decimal(18,2) casts
    cents = (
        (hit["l_extendedprice"] * 100).round().astype("int64")
        * (100 - (hit["l_discount"] * 100).round().astype("int64"))
    )
    ref = (
        hit.assign(rev_c=cents)
        .groupby("l_returnflag")
        .agg(n_items=("l_orderkey", "size"), rev_c=("rev_c", "sum"))
        .reset_index()
    )
    ref["revenue"] = ref["rev_c"] / 1e4
    ref = ref.drop(columns=["rev_c"])
    sdf = QUERIES["join_bloom_pruned_semi"](spark, SF).toPandas()
    _assert_frames_equal(sdf, ref)


def test_attribution_matches_sequential_scan(spark):
    from ibis_olap_aggregation_spark.operators.events import (
        ATTR_TOUCH_TYPES,
        ATTR_WINDOW_DAYS,
    )

    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    horizon = pd.Timedelta(days=ATTR_WINDOW_DAYS)
    rows = []
    for _, g in ev.groupby("user_id", sort=False):
        lt, lts = None, None
        for r in g.itertuples():
            if r.event_type in ATTR_TOUCH_TYPES:
                lt, lts = r.event_type, r.ts
            elif r.event_type == "purchase":
                if lt is not None and lts >= r.ts - horizon:
                    lat = (r.ts - lts) // pd.Timedelta(microseconds=1)
                    rows.append((lt, r.value, lat))
                else:
                    rows.append(("direct", r.value, 0))
    f = pd.DataFrame(rows, columns=["credited_type", "value", "lat"])
    cents = (f["value"] * 100).round().astype("int64")
    ref = (
        f.assign(cents=cents)
        .groupby("credited_type")
        .agg(
            n_purchases=("value", "size"),
            cents=("cents", "sum"),
            lat=("lat", "sum"),
        )
        .reset_index()
    )
    ref["attributed_value"] = ref["cents"] / 100.0
    ref["avg_latency_sec"] = (
        ref["lat"] / ref["n_purchases"] / 1e6
    ).round(6)
    ref = ref.drop(columns=["cents", "lat"])
    sdf = QUERIES["events_attribution_lookback"](spark, SF).toPandas()
    _assert_frames_equal(sdf, ref)


def test_mixture_weights_match_numpy(spark):
    from ibis_olap_aggregation_spark.operators.text import MIX_ALPHA

    d = pd.read_parquet(f"{SF}/documents.parquet")
    d["tok"] = (d["n_chars"] + 3) // 4
    lt = d.groupby("lang").agg(
        n_docs=("doc_id", "size"), n_tokens=("tok", "sum")
    )
    p = lt["n_tokens"].to_numpy(dtype="float64") / float(
        lt["n_tokens"].sum()
    )
    q = np.round(np.power(p, MIX_ALPHA) * 1e15).astype("int64")
    w = q.astype("float64") / float(q.sum())
    ref = lt.reset_index().assign(
        p_raw=np.round(p, 6),
        weight=np.round(w, 6),
        epochs=np.round(w / p, 6),
    )
    sdf = QUERIES["text_mixture_temperature_weights"](spark, SF).toPandas()
    _assert_frames_equal(sdf, ref)


def test_running_totals_twin_state_is_user_sized(spark):
    """The custom-state twin's production bound: after the full 8-batch
    drain the state store holds exactly one fixed-width row per user
    ever seen — key-sized, never event-sized. Also re-derives the final
    output from pandas (count + per-element-rounded cents)."""
    import pandas as pd

    from ibis_olap_aggregation_spark.streaming.replay_queries import (
        last_drain_progress,
    )

    sdf = QUERIES["streaming_running_totals_twin"](spark, SF).toPandas()
    prog = last_drain_progress()
    assert prog, "drain produced no progress reports"
    state_rows = max(
        op["numRowsTotal"] for p in prog for op in p.get("stateOperators", [])
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    n_users = ev["user_id"].nunique()
    assert state_rows == n_users, (state_rows, n_users)
    u = ev.assign(cents=(ev["value"] * 100).round().astype("int64")).groupby(
        "user_id"
    ).agg(n_events=("value", "size"), cents=("cents", "sum"))
    ref = (
        u.groupby("n_events")
        .agg(n_users=("cents", "size"), cents=("cents", "sum"))
        .reset_index()
    )
    ref["total_value"] = ref["cents"] / 100.0
    ref = ref.drop(columns=["cents"])
    _assert_frames_equal(sdf, ref)


def test_attribution_tie_on_ts_breaks_by_event_id(spark):
    """Two touches at the SAME timestamp: the (ts, event_id) ordering
    must credit the higher event_id — hand-built fixture, hand-computed
    expectation, checked on BOTH the Spark op and the DuckDB oracle
    (the tie is the one case the real fixture never exercises)."""
    import os
    import tempfile

    import duckdb
    import pandas as pd

    import __spark_entry__ as entry_mod

    pdf = pd.DataFrame(
        [
            # user 1: click and view at the SAME ts (event_id 1 < 2),
            # then a purchase - credit goes to the view (later event_id)
            (1, "2024-01-01 10:00:00", 1, "click", 0.0, "{}"),
            (2, "2024-01-01 10:00:00", 1, "view", 0.0, "{}"),
            (3, "2024-01-01 11:00:00", 1, "purchase", 10.0, "{}"),
            # user 2: touch 8 days before purchase -> outside the 7-day
            # lookback -> 'direct'
            (4, "2024-01-01 00:00:00", 2, "click", 0.0, "{}"),
            (5, "2024-01-09 00:00:01", 2, "purchase", 5.0, "{}"),
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    work = tempfile.mkdtemp(prefix="attr_tie_")
    pdf.to_parquet(os.path.join(work, "events.parquet"))
    sdf = (
        entry_mod.queries()["events_attribution_lookback"](spark, work)
        .toPandas()
        .set_index("credited_type")
    )
    assert sdf.loc["view", "n_purchases"] == 1  # the tie-break
    assert sdf.loc["direct", "n_purchases"] == 1  # the horizon
    assert "click" not in sdf.index
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{work}/events.parquet'")
    odf = (
        con.execute(entry_mod.oracle_sql()["events_attribution_lookback"])
        .fetchdf()
        .set_index("credited_type")
    )
    assert odf.loc["view", "n_purchases"] == 1
    assert odf.loc["direct", "n_purchases"] == 1


def test_pack_sequences_tiny_docs_floor_and_straddle(spark):
    """Synthetic corpus pinning the two pack edges no real fixture hits:
    a 0-char doc still costs 1 token (the floor), and a doc bigger than
    the window straddles multiple boundaries but is assigned to its
    FIRST token's window."""
    import os
    import tempfile

    import pandas as pd

    import __spark_entry__ as entry_mod
    from ibis_olap_aggregation_spark.operators.pipeline import PACK_CTX

    docs = pd.DataFrame(
        {
            "doc_id": [0, 16, 32],  # all shard 0, packed in this order
            "text": ["", "", ""],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            # 0 chars (-> 1 token via the floor), one full window, a
            # 2.5-window giant
            "n_chars": [0, PACK_CTX * 4, PACK_CTX * 10],
        }
    )
    work = tempfile.mkdtemp(prefix="pack_edge_")
    docs.to_parquet(os.path.join(work, "documents.parquet"))
    out = (
        entry_mod.queries()["pipeline_pack_sequences"](spark, work)
        .toPandas()
        .sort_values("pack_id")
        .reset_index(drop=True)
    )
    assert (out["shard"] == 0).all()
    assert out.loc[0, "pack_id"] == 0
    assert out.loc[0, "n_docs"] == 2  # the 1-token doc + the full window
    assert out.loc[0, "sum_tokens"] == 1 + PACK_CTX
    assert out.loc[0, "n_straddlers"] == 1
    assert out.loc[1, "pack_id"] == 1
    assert out.loc[1, "n_docs"] == 1  # the giant, assigned by its start
    assert out.loc[1, "n_straddlers"] == 1


def test_running_totals_twin_is_replay_order_invariant(spark, tmp_path):
    """The twin's stated contract, exercised rather than asserted:
    replay the same events with file mtimes REVERSED (the file source
    drains oldest-mtime first, so the stream arrives in reverse
    event-time order) and the final output must be identical — the
    state transition is commutative and the final-state selection is a
    monotone max_by, so no ordering assumption may leak in."""
    import os
    import shutil

    import pandas as pd
    from pyspark.sql import functions as F

    from ibis_olap_aggregation_spark.session import load_table
    from ibis_olap_aggregation_spark.streaming.engine import (
        run_to_memory,
        stream_events,
        user_running_totals,
    )

    # time-range-partitioned copy with REVERSED mtimes
    out = str(tmp_path / "replay_rev")
    (
        load_table(spark, SF, "events")
        .repartitionByRange(8, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(out)
    )
    parts = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    base = os.stat(out).st_mtime
    for i, f in enumerate(reversed(parts)):
        p = os.path.join(out, f)
        os.utime(p, (base + i + 1, base + i + 1))

    ev = stream_events(spark, out, max_files_per_trigger=1)
    rt = user_running_totals(ev)
    ckpt = str(tmp_path / "ckpt")
    run_to_memory(rt, "rev_totals", checkpoint_dir=ckpt, output_mode="update")
    sunk = spark.table("rev_totals")
    final = (
        sunk.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value_cents", "n_events").alias("cents"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ev_pd = pd.read_parquet(f"{SF}/events.parquet")
    ref = (
        ev_pd.assign(
            cents=(ev_pd["value"] * 100).round().astype("int64")
        )
        .groupby("user_id", as_index=False)
        .agg(n_events=("value", "size"), cents=("cents", "sum"))
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    spark.catalog.dropTempView("rev_totals")
    shutil.rmtree(ckpt, ignore_errors=True)
    assert final["n_events"].tolist() == ref["n_events"].tolist()
    assert final["cents"].tolist() == ref["cents"].tolist()


import pytest as _pytest


@_pytest.mark.parametrize(
    "name",
    [
        "streaming_file_replay_rate_limited",
        "streaming_dedup_within_watermark_twin",
        "streaming_interval_join_twin",
        "streaming_upsert_latest_state_twin",
        "streaming_running_totals_twin",
        # round 13: complete-mode session/tumbling windows — state
        # merges regardless of arrival order under the span-covering
        # horizon, so the final state is order-free
        "streaming_session_window_twin",
        "streaming_tumbling_window_twin",
        "streaming_sliding_window_twin",
    ],
)
def test_streaming_twins_survive_reversed_replay(
    spark, monkeypatch, tmp_path_factory, name
):
    """Every replay twin documents replay-order independence as its
    contract (span-covering watermarks / commutative state / conflict-
    re-merging upserts). Exercise it: monkeypatch _replay_dir to a copy
    whose file mtimes are REVERSED (the file source drains oldest-mtime
    first, so micro-batches arrive in reverse event-time order) and the
    twin must still match its DuckDB oracle exactly.

    streaming_interval_join_eviction is deliberately NOT here: its
    bounded lateness horizon makes late arrivals genuinely
    order-sensitive — that is the operator's semantics, not a bug.
    streaming_asof_enrich_twin (r14c) is excluded for the same reason:
    as-of enrichment is event-time-ordered by nature (a click is
    enriched once, when processed) — its ordering contract is the
    replay engine's contiguous oldest-first delivery, documented in
    its docstring.
    """
    import os

    import ibis_olap_aggregation_spark.streaming.replay_queries as rq
    from ibis_olap_aggregation_spark.session import load_table
    from tests.test_entry_oracle import normalize, run_oracle

    import __spark_entry__ as entry_mod

    base_dir = tmp_path_factory.getbasetemp() / "replay_reversed_shared"
    out = str(base_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            load_table(spark, SF, "events")
            .repartitionByRange(8, "ts")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(out)
        )
        parts = sorted(f for f in os.listdir(out) if f.startswith("part-"))
        base = os.stat(out).st_mtime
        for i, f in enumerate(reversed(parts)):
            p = os.path.join(out, f)
            os.utime(p, (base + i + 1, base + i + 1))
    monkeypatch.setattr(rq, "_replay_dir", lambda s, sf: out)

    sdf = entry_mod.queries()[name](spark, SF).toPandas()
    odf = run_oracle(entry_mod.oracle_sql()[name], SF)
    s, o = normalize(sdf), normalize(odf)
    assert len(s) == len(o), (len(s), len(o))
    assert list(s.columns) == list(o.columns)
    assert s.astype(str).equals(o.astype(str)), (
        s.head(8).to_string(),
        o.head(8).to_string(),
    )
