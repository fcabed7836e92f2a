"""Round-7 operators: property tests against INDEPENDENT oracles.

The driver's DuckDB differential gate runs the SAME query semantics in
SQL; these tests cross-check against a second, structurally different
implementation — brute-force dominance for the skyline, a numpy
power-iteration for PageRank, algebraic invariants for SCD2/TWAP/
Markov — so a shared misconception between the Spark code and its
oracle SQL cannot pass silently.
"""

from __future__ import annotations

import duckdb
import numpy as np

from ibis_olap_aggregation_spark.queries import QUERIES


def test_pareto_frontier_matches_bruteforce(spark, sf_small):
    """O(n^2) dominance scan over the raw parquet == the linear
    running-max rewrite's survivor set."""
    out = QUERIES["pareto_frontier_parts"](spark, sf_small).toPandas()
    parts = duckdb.sql(
        f"SELECT p_partkey, p_retailprice, p_size FROM "
        f"'{sf_small}/part.parquet'"
    ).df()
    price = parts.p_retailprice.to_numpy()
    size = parts.p_size.to_numpy()
    dominated = np.zeros(len(parts), dtype=bool)
    for i in range(len(parts)):
        dom = (
            (price <= price[i])
            & (size >= size[i])
            & ((price < price[i]) | (size > size[i]))
        )
        dominated[i] = dom.any()
    expect = set(parts.p_partkey[~dominated])
    assert set(out.p_partkey) == expect
    assert len(out) == len(expect)


def test_scd2_intervals_tile_and_runs_are_maximal(spark, sf_small):
    """Per user: versions are 1..k contiguous, intervals are ordered,
    gap-free ([from, to) tiles), exactly one open version, consecutive
    versions CHANGE tier (runs maximal), and event counts conserve."""
    dim = (
        QUERIES["scd2_user_tier_dim"](spark, sf_small)
        .toPandas()
        .sort_values(["user_id", "version"])
    )
    ev_per_user = duckdb.sql(
        f"SELECT user_id, COUNT(*) AS n FROM '{sf_small}/events.parquet' "
        f"GROUP BY 1"
    ).df()
    counts = dim.groupby("user_id").n_events.sum()
    for _, row in ev_per_user.iterrows():
        assert counts[row.user_id] == row.n
    for _, g in dim.groupby("user_id"):
        assert list(g.version) == list(range(1, len(g) + 1))
        assert g.valid_to_us.isna().sum() == 1 and np.isnan(
            g.valid_to_us.iloc[-1]
        )
        # tiling: each version's end is the next version's start
        assert (
            g.valid_to_us.iloc[:-1].to_numpy()
            == g.valid_from_us.iloc[1:].to_numpy()
        ).all()
        # maximality: consecutive runs differ in tier
        tiers = list(g.tier)
        assert all(a != b for a, b in zip(tiers, tiers[1:]))


def test_scd2_pit_join_conserves_purchases(spark, sf_small):
    """Every purchase matches exactly one dimension version: the tier
    breakdown sums back to the raw purchase count and value total."""
    out = QUERIES["scd2_point_in_time_join"](spark, sf_small).toPandas()
    raw = duckdb.sql(
        f"SELECT COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS s "
        f"FROM '{sf_small}/events.parquet' WHERE event_type = 'purchase'"
    ).df()
    assert out.n_purchases.sum() == raw.n[0]
    assert abs(out.sum_value.sum() - float(raw.s[0])) < 1e-6


def test_pagerank_matches_numpy_power_iteration(spark, sf_small):
    """Dense numpy power iteration over the same co-purchase edge list
    reproduces the distributed ranks (tolerance covers the engine's
    per-row round(,15) quantization and float-order differences)."""
    out = QUERIES["graph_pagerank_copurchase"](spark, sf_small).toPandas()
    edges = duckdb.sql(
        f"""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM '{sf_small}/lineitem.parquet'),
        und AS (
          SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS w
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2)
        SELECT pa, pb, w FROM und
        """
    ).df()
    nodes = sorted(set(edges.pa) | set(edges.pb))
    idx = {pk: i for i, pk in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for _, e in edges.iterrows():
        W[idx[e.pa], idx[e.pb]] += e.w
        W[idx[e.pb], idx[e.pa]] += e.w
    outw = W.sum(axis=1)
    P = W / outw[:, None]
    pr = np.full(n, 1.0 / n)
    for _ in range(3):
        pr = 0.15 / n + 0.85 * (P.T @ pr)
    # full-vector ranks sum to 1 (no dangling mass: graph symmetrized)
    assert abs(pr.sum() - 1.0) < 1e-9
    ref = {pk: pr[idx[pk]] for pk in nodes}
    for _, row in out.iterrows():
        assert abs(ref[row.p_partkey] - row.pagerank) < 1e-8, row
    # top-20 really is the top of the full vector
    top = sorted(ref.values(), reverse=True)[19]
    assert (out.pagerank >= top - 1e-8).all()


def test_twap_within_value_range_and_differs_from_avg(spark, sf_small):
    """A step-function average lies inside [min, max] of the user's
    values; and TWAP is NOT just AVG (the weighting must matter for at
    least some users, else the operator is vacuous)."""
    out = QUERIES["events_time_weighted_avg"](spark, sf_small).toPandas()
    rng = duckdb.sql(
        f"SELECT user_id, MIN(value) AS lo, MAX(value) AS hi, "
        f"AVG(value) AS avg_v FROM '{sf_small}/events.parquet' GROUP BY 1"
    ).df()
    m = out.merge(rng, on="user_id")
    assert len(m) == len(out)
    assert (m.twap >= m.lo - 1e-9).all() and (m.twap <= m.hi + 1e-9).all()
    assert (np.abs(m.twap - m.avg_v) > 1e-6).any()


def test_markov_rows_normalize_and_conserve(spark, sf_small):
    """Each source row of the transition matrix sums to 1; total
    transition count is n_events - n_users (one lead() loss per user)."""
    out = QUERIES["events_markov_transitions"](spark, sf_small).toPandas()
    tot = duckdb.sql(
        f"SELECT COUNT(*) AS n, COUNT(DISTINCT user_id) AS u "
        f"FROM '{sf_small}/events.parquet'"
    ).df()
    assert out.n_transitions.sum() == int(tot.n[0]) - int(tot.u[0])
    for src, g in out.groupby("src_type"):
        assert abs(g.p_transition.sum() - 1.0) < 5e-6 * len(g), src


def test_gini_bounds_and_degenerate_equality(spark, sf_small):
    """Gini in [0, 1); and the rank formula hits ~0 on a constant
    distribution (computed locally as the degenerate witness)."""
    out = QUERIES["agg_gini_concentration"](spark, sf_small).toPandas()
    assert (out.gini >= 0).all() and (out.gini < 1).all()
    # degenerate witness: equal values => G = (n+1)/n*(…)=0 by formula
    x = np.full(7, 3.25)
    i = np.arange(1, 8)
    g = 2 * (i * x).sum() / (7 * x.sum()) - 8 / 7
    assert abs(g) < 1e-12


def test_linkage_pairs_share_block_and_are_near(spark, sf_small):
    out = QUERIES["linkage_blocked_levenshtein"](spark, sf_small).toPandas()
    assert len(out) > 0
    for _, r in out.iterrows():
        assert r.name_a.split()[-1] == r.block == r.name_b.split()[-1]
        assert 1 <= r.edit_distance <= 3
        assert r.name_a < r.name_b


def test_triangle_counts_match_bruteforce(spark, sf_small):
    """Dense numpy trace-based triangle count per node over the same
    distinct edge list == the distributed ordered-wedge enumeration."""
    out = QUERIES["graph_triangle_clustering"](spark, sf_small).toPandas()
    edges = duckdb.sql(
        f"""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM '{sf_small}/lineitem.parquet')
        SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        FROM li x JOIN li y
          ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        """
    ).df()
    nodes = sorted(set(edges.a) | set(edges.b))
    idx = {pk: i for i, pk in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    for _, e in edges.iterrows():
        A[idx[e.a], idx[e.b]] = 1
        A[idx[e.b], idx[e.a]] = 1
    tri_per_node = np.diag(A @ A @ A) // 2
    deg = A.sum(axis=1)
    for _, r in out.iterrows():
        i = idx[r.p_partkey]
        assert tri_per_node[i] == r.n_triangles, r
        assert deg[i] == r.degree, r
        expect_cc = 2.0 * tri_per_node[i] / (deg[i] * (deg[i] - 1))
        assert abs(expect_cc - r.clustering_coeff) < 1e-6, r
    # top-20 really is the top of the full per-node vector
    if len(out) == 20:
        assert out.n_triangles.min() >= np.sort(tri_per_node)[-20]


def test_trimmed_mean_is_robust_between_bounds(spark, sf_small):
    """trimmed <= winsorized ordering is not guaranteed in general, but
    both must sit strictly inside [min, max] and the trimmed mean must
    ignore a synthetic outlier that shifts the plain mean."""
    out = QUERIES["agg_trimmed_mean"](spark, sf_small).toPandas()
    rng = duckdb.sql(
        f"SELECT l_returnflag, MIN(l_extendedprice) lo, "
        f"MAX(l_extendedprice) hi, AVG(l_extendedprice) m "
        f"FROM '{sf_small}/lineitem.parquet' GROUP BY 1"
    ).df()
    m = out.merge(rng, on="l_returnflag")
    assert (m.trimmed_mean > m.lo).all() and (m.trimmed_mean < m.hi).all()
    assert (m.winsorized_mean > m.lo).all() and (m.winsorized_mean < m.hi).all()
    # numpy witness for the trimming semantics on one group
    vals = duckdb.sql(
        f"SELECT l_extendedprice v FROM '{sf_small}/lineitem.parquet' "
        f"WHERE l_returnflag = 'N'"
    ).df().v.to_numpy()
    lo, hi = np.quantile(vals, [0.1, 0.9])
    expect = vals[(vals >= lo) & (vals <= hi)].mean()
    got = float(out[out.l_returnflag == "N"].trimmed_mean.iloc[0])
    assert abs(expect - got) < 1e-4, (expect, got)


def test_lift_identities(spark, sf_small):
    """lift == confidence / P(b); min-support respected; symmetric in
    its support arguments (lift(a,b) uses both supports)."""
    out = QUERIES["affinity_rules_lift"](spark, sf_small).toPandas()
    n_orders = duckdb.sql(
        f"SELECT COUNT(DISTINCT l_orderkey) n FROM "
        f"'{sf_small}/lineitem.parquet'"
    ).df().n[0]
    assert (out.n_both >= 5).all()
    for _, r in out.iterrows():
        assert abs(r.confidence_a_to_b - r.n_both / r.n_a) < 1e-6
        assert abs(r.lift - r.n_both * n_orders / (r.n_a * r.n_b)) < 1e-4


def test_recency_weighting_moves_toward_latest(spark, sf_small):
    """The recency-weighted mean must (a) stay within the user's value
    range and (b) sit closer to the user's LATEST value than the plain
    mean does, on average — that's what the decay is for."""
    out = QUERIES["events_recency_weighted_value"](spark, sf_small).toPandas()
    last = duckdb.sql(
        f"""SELECT user_id, MIN(value) lo, MAX(value) hi,
                   arg_max(value, ts) last_v
            FROM '{sf_small}/events.parquet' GROUP BY 1"""
    ).df()
    m = out.merge(last, on="user_id")
    assert len(m) == len(out)
    assert (m.recency_weighted_value >= m.lo - 1e-9).all()
    assert (m.recency_weighted_value <= m.hi + 1e-9).all()
    d_w = np.abs(m.recency_weighted_value - m.last_v).mean()
    d_p = np.abs(m.plain_avg - m.last_v).mean()
    assert d_w < d_p


def test_bm25_matches_local_reference(spark, sf_small):
    """Plain-python BM25 over pandas tokens reproduces the distributed
    scores (tolerance for float assembly order inside numpy)."""
    import math

    out = QUERIES["text_bm25_topk"](spark, sf_small).toPandas()
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_small}/documents.parquet'"
    ).df()
    toks = {r.doc_id: r.text.strip().split() for _, r in docs.iterrows()}
    terms = ("join", "vector", "stream")
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {
        t: sum(1 for tk in toks.values() if t in tk) for t in terms
    }
    k1, b = 1.2, 0.75

    def score(doc):
        tk = toks[doc]
        s = 0.0
        for t in terms:
            tf = tk.count(t)
            if not tf:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(tk) / avgdl)
            )
        return s

    all_scores = sorted(
        ((score(d), d) for d in toks), key=lambda x: (-x[0], x[1])
    )
    for (_, r), (ref_s, ref_d) in zip(out.iterrows(), all_scores[:10]):
        assert r.doc_id == ref_d, (r.doc_id, ref_d)
        assert abs(r.bm25_score - ref_s) < 1e-5, (r.bm25_score, ref_s)


def test_moving_median_matches_pandas_rolling(spark, sf_small):
    out = (
        QUERIES["window_moving_median"](spark, sf_small)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    ref_med = out.revenue.rolling(7, min_periods=1).median()
    ref_avg = out.revenue.rolling(7, min_periods=1).mean()
    assert np.allclose(out.moving_median_7d, ref_med, atol=1e-4)
    assert np.allclose(out.moving_avg_7d, ref_avg, atol=1e-4)


def test_trigram_share_conserves(spark, sf_small):
    out = QUERIES["events_path_trigrams"](spark, sf_small).toPandas()
    per_user = duckdb.sql(
        f"SELECT COUNT(*) n FROM '{sf_small}/events.parquet' GROUP BY user_id"
    ).df()
    total = int(np.maximum(per_user.n - 2, 0).sum())
    assert out.n.sum() <= total
    assert (out.share <= 1).all() and (out.share > 0).all()
    assert out.n.is_monotonic_decreasing


def test_funnel_latency_ordering_and_bounds(spark, sf_small):
    out = QUERIES["events_funnel_latency"](spark, sf_small).toPandas()
    r = out.iloc[0]
    assert r.n_converted > 0
    assert 0 < r.p50_latency_s <= r.p90_latency_s
    assert 0 < r.avg_latency_s
    users = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) u FROM '{sf_small}/events.parquet' "
        f"WHERE event_type = 'purchase'"
    ).df()
    assert r.n_converted <= int(users.u[0])


def test_entropy_bounds_and_extremes(spark, sf_small):
    """0 <= H <= ln(n_types) per user; single-type users hit exactly 0;
    pandas reference within rounding."""
    out = QUERIES["events_user_entropy"](spark, sf_small).toPandas()
    assert (out.type_entropy >= -1e-9).all()
    assert (out.type_entropy <= np.log(out.n_types) + 1e-9).all()
    assert (out.loc[out.n_types == 1, "type_entropy"] == 0).all()
    counts = duckdb.sql(
        f"SELECT user_id, event_type, COUNT(*) c FROM "
        f"'{sf_small}/events.parquet' GROUP BY 1, 2"
    ).df()
    for uid, g in counts.groupby("user_id"):
        p = g.c / g.c.sum()
        ref = float(-(p * np.log(p)).sum())
        got = float(out.loc[out.user_id == uid, "type_entropy"].iloc[0])
        assert abs(ref - got) < 1e-5, (uid, ref, got)


def test_chi2_matches_pandas_contingency(spark, sf_small):
    out = QUERIES["quality_chi2_independence"](spark, sf_small).toPandas()
    df = duckdb.sql(
        f"""SELECT event_type,
               CASE WHEN value < 60 THEN 'low'
                    WHEN value < 140 THEN 'mid' ELSE 'high' END AS tier,
               COUNT(*) AS obs
            FROM '{sf_small}/events.parquet' GROUP BY 1, 2"""
    ).df()
    pivot = df.pivot_table(
        index="event_type", columns="tier", values="obs", fill_value=0
    ).to_numpy(dtype=float)
    # cells with obs=0 don't exist in the grouped table: mirror that
    row = pivot.sum(axis=1, keepdims=True)
    col = pivot.sum(axis=0, keepdims=True)
    exp = row @ col / pivot.sum()
    mask = pivot > 0
    ref = float(((pivot - exp) ** 2 / exp)[mask].sum())
    r = out.iloc[0]
    assert abs(r.chi2 - ref) < 1e-4, (r.chi2, ref)
    assert r.n_cells == int(mask.sum())
    n_types = (pivot.sum(axis=1) > 0).sum()
    n_tiers = (pivot.sum(axis=0) > 0).sum()
    assert r.dof == (n_types - 1) * (n_tiers - 1)


def test_salted_join_equals_plain_join(spark, sf_small):
    """The salt must never change results: salted output == a plain
    pandas join+aggregate over the raw parquet."""
    out = (
        QUERIES["skew_salted_join"](spark, sf_small)
        .toPandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    ref = duckdb.sql(
        f"""SELECT l_returnflag, COUNT(*) n_items,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE sum_price
            FROM '{sf_small}/lineitem.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    assert list(out.l_returnflag) == list(ref.l_returnflag)
    assert list(out.n_items) == list(ref.n_items)
    assert np.allclose(out.sum_price, ref.sum_price)


def test_compaction_plan_bins_are_contiguous_and_bounded(spark, sf_small):
    """Next-fit invariants: target_file ordinals per source are
    non-decreasing in shard order, start at 0, and every bin except
    possibly the last holds >= the target once it closes (next-fit
    closes a bin only when the running total passes the target)."""
    out = (
        QUERIES["layout_compaction_plan"](spark, sf_small)
        .toPandas()
        .sort_values(["source", "lang"])
    )
    for src, g in out.groupby("source"):
        tf = g.target_file.to_numpy()
        assert tf[0] == 0
        assert (np.diff(tf) >= 0).all()
        # bin k closed means cumulative bytes before its successor
        # crossed (k+1) * target
        cum = g.bytes_est.cumsum().to_numpy()
        for i in range(1, len(tf)):
            if tf[i] > tf[i - 1]:
                assert cum[i - 1] >= tf[i] * 30000 - 30000  # crossed into bin
        assert (g.groupby("target_file").bytes_est.count() >= 1).all()


def test_bootstrap_ci_brackets_the_mean_sanely(spark, sf_small):
    out = QUERIES["sample_bootstrap_ci"](spark, sf_small).toPandas()
    r = out.iloc[0]
    true_mean = duckdb.sql(
        f"SELECT AVG(o_totalprice) m FROM '{sf_small}/orders.parquet'"
    ).df().m[0]
    assert r.n_replicas == 32
    assert r.ci_lo < r.ci_hi
    assert bool(r.covers)
    # CI should be a plausible neighborhood of the true mean: within
    # ~6 standard errors on either side
    sd = duckdb.sql(
        f"SELECT stddev_samp(o_totalprice) s, COUNT(*) n "
        f"FROM '{sf_small}/orders.parquet'"
    ).df()
    se = float(sd.s[0]) / np.sqrt(float(sd.n[0]))
    assert abs(r.point_mean - true_mean) < 1e-6
    assert r.ci_lo > true_mean - 6 * se and r.ci_hi < true_mean + 6 * se


def test_dp_counts_reproducible_and_laplace_shaped(spark, sf_small):
    """The DP release must be (a) reproducible across runs — that's the
    budget argument — and (b) actually noisy: dp_count differs from
    true_count by exactly the reported |noise|, which follows the
    Laplace inverse transform recomputed locally from the same md5
    uniform."""
    import hashlib
    import math

    out = QUERIES["privacy_dp_laplace_counts"](spark, sf_small).toPandas()
    again = QUERIES["privacy_dp_laplace_counts"](spark, sf_small).toPandas()
    assert out.sort_values("event_type").reset_index(drop=True).equals(
        again.sort_values("event_type").reset_index(drop=True)
    )
    for _, r in out.iterrows():
        u = int(hashlib.md5(f"dp-{r.event_type}".encode()).hexdigest()[:15], 16) / 2.0**60
        sign = 1.0 if u < 0.5 else -1.0
        noise = sign * math.log(max(1e-18, 1.0 - 2.0 * abs(u - 0.5)))
        assert abs(r.abs_noise - abs(noise)) < 1e-5, (r.event_type, noise)
        assert abs(r.dp_count - (r.true_count + noise)) < 1e-5
        assert r.abs_noise > 0


def test_attribution_conserves_purchases(spark, sf_small):
    out = QUERIES["events_attribution_last_touch"](spark, sf_small).toPandas()
    tot = duckdb.sql(
        f"SELECT COUNT(*) n, SUM(CAST(value AS DECIMAL(18,2))) s "
        f"FROM '{sf_small}/events.parquet' WHERE event_type = 'purchase'"
    ).df()
    assert out.n_purchases.sum() == int(tot.n[0])
    assert abs(out.attributed_value.sum() - float(tot.s[0])) < 1e-6
    assert abs(out.share.sum() - 1.0) < 5e-6 * len(out)
    assert set(out.channel) <= {"view", "click", "signup", "error", "(none)"}


def test_winnow_matches_local_reference(spark, sf_small):
    """Plain-python winnowing (k=3, w=4, packed 40|20-bit keys) over the
    raw text reproduces the distributed selection per document; also
    asserts no 40-bit hash collision corrupted the packing (exact
    equality of min/max fingerprints IS that check)."""
    import hashlib

    out = (
        QUERIES["text_winnow_fingerprints"](spark, sf_small)
        .toPandas()
        .set_index("doc_id")
    )
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_small}/documents.parquet'"
    ).df()
    checked = 0
    for _, row in docs.head(60).iterrows():
        toks = row.text.strip().split()
        grams = [
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ]
        if len(grams) < 4:
            assert row.doc_id not in out.index
            continue
        keys = [
            (int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % 2**40)
            * 2**20
            + (i + 1)
            for i, g in enumerate(grams)
        ]
        fps = {min(keys[i - 3 : i + 1]) for i in range(3, len(keys))}
        r = out.loc[row.doc_id]
        assert r.n_grams == len(grams)
        assert r.n_fingerprints == len(fps), row.doc_id
        assert r.min_fp == min(fps) and r.max_fp == max(fps)
        checked += 1
    assert checked >= 50


def test_cf_recommendations_exclude_owned_and_match_local(spark, sf_small):
    """Recommendations never include already-owned parts; scores for a
    handful of customers match a local pandas recompute of the
    item-item CF sum."""
    out = QUERIES["graph_cf_recommendations"](spark, sf_small).toPandas()
    owned = duckdb.sql(
        f"""SELECT DISTINCT o.o_custkey AS cust, li.l_partkey AS part
            FROM (SELECT DISTINCT l_orderkey, l_partkey
                  FROM '{sf_small}/lineitem.parquet') li
            JOIN '{sf_small}/orders.parquet' o
              ON o.o_orderkey = li.l_orderkey"""
    ).df()
    pairs = duckdb.sql(
        f"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM '{sf_small}/lineitem.parquet')
            SELECT a.l_partkey pa, b.l_partkey pb, COUNT(*) w
            FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2"""
    ).df()
    own_map = owned.groupby("cust").part.apply(set).to_dict()
    wmap: dict = {}
    for _, e in pairs.iterrows():
        wmap.setdefault(e.pa, {})[e.pb] = e.w
        wmap.setdefault(e.pb, {})[e.pa] = e.w
    for _, r in out.iterrows():
        assert r.p_partkey not in own_map[r.c_custkey], r
    for cust in list(out.c_custkey.unique())[:5]:
        scores: dict = {}
        for p in own_map[cust]:
            for q, w in wmap.get(p, {}).items():
                scores[q] = scores.get(q, 0) + w
        scores = {q: s for q, s in scores.items() if q not in own_map[cust]}
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        got = out[out.c_custkey == cust].sort_values("rk")
        assert [(r.p_partkey, r.score) for _, r in got.iterrows()] == top, cust


def test_max_drawdown_matches_pandas_cummax(spark, sf_small):
    out = QUERIES["events_max_drawdown"](spark, sf_small).toPandas()
    ev = duckdb.sql(
        f"SELECT user_id, ts, event_id, value FROM "
        f"'{sf_small}/events.parquet' ORDER BY user_id, ts, event_id"
    ).df()
    for uid, g in ev.groupby("user_id"):
        run_max = g.value.cummax()
        dd = (run_max - g.value).max()
        frac = ((run_max - g.value) / run_max).max()
        r = out[out.user_id == uid].iloc[0]
        assert abs(r.max_drawdown - dd) < 1e-5, uid
        assert abs(r.max_drawdown_frac - frac) < 1e-5, uid
        assert 0 <= r.max_drawdown_frac < 1


def test_cosine_bounds_and_local_recompute(spark, sf_small):
    out = QUERIES["graph_copurchase_cosine"](spark, sf_small).toPandas()
    assert (out.cosine > 0).all() and (out.cosine <= 1).all()
    assert (out.w >= 3).all()
    supp = duckdb.sql(
        f"""SELECT l_partkey, COUNT(*) n FROM (
              SELECT DISTINCT l_orderkey, l_partkey
              FROM '{sf_small}/lineitem.parquet') GROUP BY 1"""
    ).df().set_index("l_partkey").n
    for _, r in out.iterrows():
        ref = r.w / np.sqrt(float(supp[r.pa]) * supp[r.pb])
        assert abs(ref - r.cosine) < 1e-5, r


def test_g2_keywords_positive_and_overrepresented(spark, sf_small):
    """G2 top keywords must actually be OVER-represented in their
    source (rate in source > rate elsewhere) — the directional check
    the raw statistic (two-sided) doesn't impose but top-k practically
    guarantees; plus a scipy-free local G2 recompute."""
    import math

    out = QUERIES["text_loglikelihood_keywords"](spark, sf_small).toPandas()
    assert (out.g2 > 0).all()
    tot = duckdb.sql(
        f"""SELECT source, COUNT(*) c FROM (
              SELECT source, unnest(string_split_regex(trim(text), '\\s+')) t
              FROM '{sf_small}/documents.parquet') GROUP BY 1"""
    ).df().set_index("source").c
    nd = int(tot.sum())
    for _, r in out.head(20).iterrows():
        c = int(tot[r.source])
        a, b, d = int(r.n_in_source), int(r.n_elsewhere), nd - int(tot[r.source])
        e1 = c * (a + b) / nd
        e2 = d * (a + b) / nd
        g2 = 2.0 * (a * math.log(a / e1) + (0.0 if b == 0 else b * math.log(b / e2)))
        assert abs(g2 - r.g2) < 1e-4, r


def test_cusum_matches_local_fold(spark, sf_small):
    """Recompute the clamped CUSUM recursion locally with the engines'
    shared seed semantics (fold seeded with the FIRST deviate, clamp
    applied from step 2 on)."""
    out = QUERIES["quality_cusum_drift"](spark, sf_small).toPandas().iloc[0]
    daily = duckdb.sql(
        f"""SELECT CAST(ts AS DATE) d,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) m
            FROM '{sf_small}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    ms = daily.m.to_list()
    target = float(
        duckdb.sql(
            f"""SELECT CAST(SUM(CAST(m AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*) t
                FROM (SELECT CAST(ts AS DATE) d,
                        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) m
                      FROM '{sf_small}/events.parquet' GROUP BY 1)"""
        ).df().t[0]
    )

    def fold(devs):
        acc = devs[0]
        for x in devs[1:]:
            acc = max(0.0, acc + x)
        return acc

    hi = fold([x - target - 2.0 for x in ms])
    lo = fold([(target - 2.0) - x for x in ms])
    assert out.n_days == len(ms)
    assert abs(out.cusum_hi - hi) < 1e-5, (out.cusum_hi, hi)
    assert abs(out.cusum_lo - lo) < 1e-5, (out.cusum_lo, lo)


def test_quantile_normalize_preserves_order_and_support(spark, sf_small):
    """Within each segment the transform is monotone (rank-preserving),
    every normalized value is an actual global revenue value, and the
    segment extremes map to the global extremes."""
    out = QUERIES["sample_quantile_normalize"](spark, sf_small).toPandas()
    gvals = set(np.round(out.revenue, 6))
    assert set(np.round(out.normalized_revenue, 6)) <= gvals
    for seg, g in out.groupby("segment"):
        g = g.sort_values(["revenue", "o_custkey"])
        assert g.normalized_revenue.is_monotonic_increasing
        assert abs(g.normalized_revenue.iloc[0] - out.revenue.min()) < 1e-4
        assert abs(g.normalized_revenue.iloc[-1] - out.revenue.max()) < 1e-4
