"""Independent semantic oracles for the round-9 operators: each Spark
result is recomputed with plain pandas/numpy/python over the same
parquet rows. The DuckDB gate proves engine parity; these prove both
engines implement the INTENDED statistics (same estimator, same
quantization, same tie rules) — a shared misreading of the semantics
would pass the differential check but fail here."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ibis_olap_aggregation_spark.queries import QUERIES


def _events_pdf(sf_small: str) -> pd.DataFrame:
    pdf = pd.read_parquet(f"{sf_small}/events.parquet")
    pdf["d"] = pdf["ts"].dt.date
    return pdf


def _lineitem_pdf(sf_small: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_small}/lineitem.parquet")


def test_autocorrelation_matches_numpy(spark, sf_small):
    got = {
        r["lag"]: r["acf"]
        for r in QUERIES["events_autocorrelation"](spark, sf_small).collect()
    }
    daily = _events_pdf(sf_small).groupby("d").size()
    x = {d: int(n) for d, n in daily.items()}
    nn, s1 = len(x), sum(x.values())
    s2 = sum(v * v for v in x.values())
    m = s1 / nn
    den = s2 - nn * m * m
    for lag, acf in got.items():
        pairs = [
            (x[d], x[d + pd.Timedelta(days=lag)])
            for d in x
            if d + pd.Timedelta(days=lag) in x
        ]
        sxy = sum(a * b for a, b in pairs)
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        want = (sxy - m * sx - m * sy + len(pairs) * m * m) / den
        assert abs(acf - round(want, 6)) < 1e-9, (lag, acf, want)


def test_changepoint_matches_bruteforce(spark, sf_small):
    got = QUERIES["events_changepoint_binary_seg"](spark, sf_small).first()
    ev = _events_pdf(sf_small)
    ev = ev[ev["event_type"] == "purchase"]
    cents = (
        (ev["value"] * 100).round().astype("int64").groupby(ev["d"]).sum()
    ).sort_index()
    days, vals = list(cents.index), list(cents.values)
    st, nt = int(sum(vals)), len(vals)
    best = None
    for i in range(1, nt):  # split AFTER days[i-1]
        sl, nl = int(sum(vals[:i])), i
        sr, nr = st - sl, nt - nl
        gain = (sl * sl / nl + sr * sr / nr - st * st / nt) / 10000
        if best is None or gain > best[0] + 1e-12:
            best = (gain, days[i - 1], nl, nr)
    assert got.split_after.date() == best[1]
    assert (got.n_left, got.n_right) == (best[2], best[3])
    assert abs(got.gain - round(best[0], 4)) < 1e-6


def test_weighted_median_matches_python(spark, sf_small):
    got = {
        r["l_returnflag"]: r["weighted_median_price"]
        for r in QUERIES["agg_weighted_median"](spark, sf_small).collect()
    }
    li = _lineitem_pdf(sf_small)
    li["price_c"] = (li["l_extendedprice"] * 100).round().astype("int64")
    li["qw"] = (li["l_quantity"] * 100).round().astype("int64")
    for flag, grp in li.groupby("l_returnflag"):
        w = grp.groupby("price_c")["qw"].sum().sort_index()
        tot = int(w.sum())
        cum = 0
        for price_c, wt in w.items():
            cum += int(wt)
            if 2 * cum >= tot:
                assert got[flag] == round(price_c / 100, 2), flag
                break


def test_interval_ops_match_bruteforce(spark, sf_small):
    li = _lineitem_pdf(sf_small)
    li["s"] = (
        pd.to_datetime(li["l_shipdate"]).dt.normalize()
        - pd.Timestamp("1970-01-01")
    ).dt.days.astype("int64")
    li["iid"] = li["l_orderkey"] * 10 + li["l_linenumber"]
    SHIP = 7
    # overlap pairs: O(n^2) per supplier brute force
    got = {
        r["l_suppkey"]: (r["n_overlapping_pairs"], r["sum_overlap_days"])
        for r in QUERIES["interval_overlap_pairs"](spark, sf_small).collect()
    }
    for supp, grp in li.groupby("l_suppkey"):
        rows = sorted(zip(grp["iid"], grp["s"]))
        n_pairs = sum_ov = 0
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                (ia, sa), (ib, sb) = rows[i], rows[j]
                if sa < sb + SHIP and sb < sa + SHIP:
                    n_pairs += 1
                    sum_ov += min(sa + SHIP, sb + SHIP) - max(sa, sb)
        if n_pairs:
            assert got[supp] == (n_pairs, sum_ov), supp
        else:
            assert supp not in got
    # max concurrency: brute-force day stabbing (half-open windows)
    got_c = {
        r["l_suppkey"]: r["max_concurrent"]
        for r in QUERIES["interval_max_concurrency"](spark, sf_small).collect()
    }
    for supp, grp in li.groupby("l_suppkey"):
        starts = sorted(grp["s"])
        peak = max(
            sum(1 for s in starts if s <= t < s + SHIP) for t in starts
        )
        assert got_c[supp] == peak, supp


def test_assortativity_matches_numpy(spark, sf_small):
    got = QUERIES["graph_degree_assortativity"](spark, sf_small).first()
    li = _lineitem_pdf(sf_small)[["l_orderkey", "l_partkey"]].drop_duplicates()
    m = li.merge(li, on="l_orderkey")
    und = (
        m[m["l_partkey_x"] < m["l_partkey_y"]][["l_partkey_x", "l_partkey_y"]]
        .drop_duplicates()
        .to_numpy()
    )
    deg: dict = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    du = np.array([deg[a] for a, b in und] + [deg[b] for a, b in und], float)
    dv = np.array([deg[b] for a, b in und] + [deg[a] for a, b in und], float)
    n = len(du)
    sa, saa, sab = du.sum(), (du * du).sum(), (du * dv).sum()
    want = (n * sab - sa * sa) / (n * saa - sa * sa)
    assert got.n_edges == len(und)
    assert abs(got.degree_assortativity - round(want, 6)) < 1e-6


def test_neyman_allocation_properties(spark, sf_small):
    """Allocation sums to ~budget and is ordered like N_h * S_h."""
    rows = QUERIES["sample_neyman_allocation"](spark, sf_small).collect()
    total = sum(r["neyman_alloc"] for r in rows)
    # per-stratum rounding drifts at most 0.5 each way
    assert abs(total - 1000) <= len(rows) / 2 + 1
    w = [(r["n_docs"] * r["std_chars"], r["neyman_alloc"]) for r in rows]
    w.sort()
    allocs = [a for _, a in w]
    # monotone up to rounding: larger weight never gets 2+ fewer samples
    assert all(b >= a - 1 for a, b in zip(allocs, allocs[1:]))


def test_phash_histogram_matches_python(spark, sf_small):
    import hashlib

    got = {
        r["hamming"]: r["n_pairs"]
        for r in QUERIES["multimodal_phash_neardup"](spark, sf_small).collect()
    }
    docs = pd.read_parquet(f"{sf_small}/documents.parquet")
    ph = {
        int(d): int.from_bytes(
            hashlib.md5(t.encode()).digest()[:8], "big", signed=True
        )
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    bands: dict = {}
    for doc, h in ph.items():
        for b in range(4):
            key = (b, (h >> ((3 - b) * 16)) & 0xFFFF)
            bands.setdefault(key, []).append(doc)
    cand = set()
    for members in bands.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                cand.add((members[i], members[j]))
    hist: dict = {}
    for a, b in cand:
        hd = bin((ph[a] ^ ph[b]) & ((1 << 64) - 1)).count("1")
        hist[hd] = hist.get(hd, 0) + 1
    assert got == hist


def test_holt_forecast_matches_python_recursion(spark, sf_small):
    got = QUERIES["events_forecast_holt"](spark, sf_small).first()
    daily = _events_pdf(sf_small).groupby("d").size().sort_index()
    xs = [float(v) for v in daily.values]
    a, b = 0.5, 0.3
    level, trend = xs[0], 0.0
    for v in xs[1:]:
        new_level = a * v + (1 - a) * (level + trend)
        trend = b * (new_level - level) + (1 - b) * trend
        level = new_level
    assert got.n_days == len(xs)
    assert abs(got.level - round(level, 6)) < 1e-9
    assert abs(got.trend - round(trend, 6)) < 1e-9
    assert abs(got.forecast_7d - round(level + 7 * trend, 6)) < 1e-9


def test_rolling_corr_matches_numpy(spark, sf_small):
    got = {
        r["day"].date(): r["rolling_corr"]
        for r in QUERIES["window_rolling_corr"](spark, sf_small).collect()
    }
    ev = _events_pdf(sf_small)
    daily = (
        ev.groupby("d")
        .agg(
            x=("event_type", lambda s: int((s == "click").sum())),
            y=("event_type", lambda s: int((s == "purchase").sum())),
        )
        .sort_index()
    )
    days = list(daily.index)
    for d in days:
        win = daily[(daily.index > d - pd.Timedelta(days=7)) & (daily.index <= d)]
        n = len(win)
        sx, sy = int(win["x"].sum()), int(win["y"].sum())
        sxx = int((win["x"] ** 2).sum())
        syy = int((win["y"] ** 2).sum())
        sxy = int((win["x"] * win["y"]).sum())
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if n < 3 or vx <= 0 or vy <= 0:
            assert d not in got
            continue
        want = (n * sxy - sx * sy) / np.sqrt(vx * float(vy))
        assert abs(got[d] - round(want, 6)) < 1e-9, d


def test_importance_reweighting_conserves_mass(spark, sf_small):
    """sum over strata of n_h * w_h == N (the reweighted corpus has the
    original total mass) up to weight quantization, and ESS <= N."""
    rows = QUERIES["sample_importance_reweighting"](spark, sf_small).collect()
    docs = pd.read_parquet(f"{sf_small}/documents.parquet")
    n = len(docs)
    mass = sum(r["n_docs"] * r["weight"] for r in rows)
    assert abs(mass - n) < 1e-3 * n
    ess = rows[0]["effective_sample_size"]
    assert 0 < ess <= n + 1e-6


def test_runs_test_matches_python(spark, sf_small):
    got = QUERIES["quality_runs_test"](spark, sf_small).first()
    daily = _events_pdf(sf_small).groupby("d").size().sort_index()
    xs = [int(v) for v in daily.values]
    nn, s1 = len(xs), sum(xs)
    signs = [x * nn > s1 for x in xs if x * nn != s1]
    n1, n2 = sum(signs), len(signs) - sum(signs)
    r = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert (got.n_above, got.n_below) == (n1, n2)
    # the operator counts boundaries with the first row contributing 1
    # (lag NULL != sign), i.e. exactly r
    assert got.n_runs == r
    assert abs(got.z_statistic - round((r - mu) / np.sqrt(var), 6)) < 1e-9


def test_peak_over_threshold_matches_numpy(spark, sf_small):
    got = {
        r["event_type"]: r
        for r in QUERIES["quality_peak_over_threshold"](spark, sf_small).collect()
    }
    ev = _events_pdf(sf_small)
    for et, grp in ev.groupby("event_type"):
        u = float(np.percentile(grp["value"], 95))  # linear == CONT
        exc = grp["value"][grp["value"] > u]
        exq = ((exc - u) * 1e6).round().astype("int64")
        row = got[et]
        assert abs(row["threshold_p95"] - round(u, 6)) < 1e-9
        assert row["n_exceedances"] == len(exc)
        assert abs(row["mean_excess"] - round(exq.sum() / len(exc) / 1e6, 6)) < 1e-9
        assert abs(row["max_excess"] - round(exq.max() / 1e6, 6)) < 1e-9


def test_interval_overlap_boundary_and_skew_cases(spark, tmp_path):
    """Adversarial shapes for the bucketed overlap join:
    - half-open boundary: starts exactly 7 days apart do NOT overlap;
      6 days apart overlap exactly 1 day;
    - bucket boundary: a pair straddling a 14-day bucket edge is found
      once (the cross-bucket dedup);
    - same-start skew: a large identical-start group pairs
      ARITHMETICALLY (C(c,2) with full 7-day overlap), never through a
      join fan-out."""
    import datetime as dt

    from ibis_olap_aggregation_spark.operators.temporal import (
        interval_overlap_pairs,
    )

    base = dt.datetime(1995, 1, 1)  # epoch day 9131; 9131 % 14 != 0
    rows = []
    # supplier 1: starts at day 0 and day 7 (no overlap), day 20 & 26
    # (overlap 1); day 27/28 straddle a bucket edge relative to 13/14
    for off in (0, 7, 20, 26):
        rows.append((1, base + dt.timedelta(days=off)))
    # supplier 2: 50 shipments all on one day (same-start skew)
    rows += [(2, base)] * 50
    df = spark.createDataFrame(
        [(s, 9, 9, 1, ts) for s, ts in rows],
        "l_suppkey long, l_orderkey long, l_linenumber int,"
        " l_quantity int, l_shipdate timestamp",
    )
    path = str(tmp_path / "lineitem.parquet")
    df.write.parquet(path)
    got = {
        r["l_suppkey"]: (r["n_overlapping_pairs"], r["sum_overlap_days"])
        for r in interval_overlap_pairs(spark, str(tmp_path)).collect()
    }
    # supplier 1: only (20, 26) overlap, by exactly 1 day
    assert got[1] == (1, 1)
    # supplier 2: C(50,2)=1225 pairs, each the full 7-day window
    assert got[2] == (1225, 1225 * 7)


def test_sum_wide_product_survives_bigint_product_wrap(spark):
    """ADVICE r9: sum_wide widened the SUM but a bigint PRODUCT passed
    into it has already wrapped past |a*b| ~ 2^63 (a ~ 3.04e9 for a*a).
    sum_wide_product casts the operands first — pin that it returns the
    exact mathematical value on inputs where the naive bigint product
    wraps negative."""
    from pyspark.sql import functions as F

    from ibis_olap_aggregation_spark.queries import sum_wide, sum_wide_product

    vals = [4_000_000_000, 3_100_000_000]  # each square > 2^63
    df = spark.createDataFrame([(v,) for v in vals], "x bigint")
    exact = sum(v * v for v in vals)
    wide = df.agg(
        sum_wide_product(F.col("x"), F.col("x"), check_in=df).alias("s")
    ).collect()[0].s
    assert int(wide) == exact
    # the naive bigint product FAILS: raises under ANSI (this session's
    # config), wraps silently under non-ANSI — never the exact value
    try:
        naive = df.agg(sum_wide(F.col("x") * F.col("x")).alias("s")).collect()[0].s
    except Exception:
        naive = None
    assert naive is None or int(naive) != exact


def test_sum_wide_product_rejects_fractional_operands(spark):
    """VERDICT r11 item 5: the decimal(20,0) operand cast ROUNDS
    fractional values before the multiply — the integrality
    precondition is now CHECKED against the required ``check_in``
    frame at construction time (no job), raising a loud TypeError
    instead of silently changing the product."""
    import pytest
    from pyspark.sql import functions as F

    from ibis_olap_aggregation_spark.queries import sum_wide_product

    df = spark.createDataFrame([(2, 1.5)], "i bigint, d double")
    with pytest.raises(TypeError, match="fractional"):
        sum_wide_product(F.col("i"), F.col("d"), check_in=df)
    with pytest.raises(TypeError, match="fractional"):
        # derived fractional expression over integral inputs
        sum_wide_product(F.col("i") / 2, F.col("i"), check_in=df)
    # integral expressions (bigint, int literal arithmetic, scale-0
    # decimal) pass and the sum is exact
    got = df.agg(
        sum_wide_product(
            F.col("i"), F.col("i").cast("decimal(20,0)"), check_in=df
        ).alias("s")
    ).collect()[0].s
    assert int(got) == 4


def test_emb_covariance_ragged_lengths_match_oracle(spark, tmp_path):
    """ADVICE r9: the emb-covariance oracle built its dimension grid
    from MAX(len(v)) and counted n per dimension as COUNT(*), so
    ragged-length embeddings silently diverged from the Spark side
    (which iterates only each vector's own dims). The oracle now guards
    with i <= len(v); pin parity on a corpus where lengths 2/3/4 mix —
    per-dimension n must count only the vectors carrying the dim."""
    import pandas as pd

    import __spark_entry__ as entry_mod
    from tests.test_entry_oracle import normalize, run_oracle

    emb = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3, 4, 5],
            "embedding": [
                [0.5, -0.25],
                [1.0, 0.75, 0.5],
                [-0.5, 0.25, 1.25, 2.0],
                [0.125, 0.0, -1.0],
                [2.0, 1.5],
                [0.25, -0.75, 0.5, 1.0],
            ],
            "label": [0, 1, 0, 1, 0, 1],
        }
    )
    d = tmp_path / "ragged"
    d.mkdir()
    emb.to_parquet(str(d / "embeddings.parquet"), index=False)
    name = "emb_covariance_top_pairs"
    sdf = entry_mod.queries()[name](spark, str(d)).toPandas()
    odf = run_oracle(entry_mod.oracle_sql()[name], str(d), tables=("embeddings",))
    # dims 3/4 exist in only a subset: n_vectors must reflect that
    assert set(sdf["n_vectors"]) != {len(emb)}
    pd.testing.assert_frame_equal(normalize(sdf), normalize(odf))
