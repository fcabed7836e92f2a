"""Brute-force cross-checks for the round-3 batch operators: each Spark
result is recomputed with plain Python over the same rows. The DuckDB
oracle gate proves engine parity; these prove both engines implement
the INTENDED semantics on adversarial shapes (single-hour users, all
docs identical, doc shorter than one span/pack length)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.operators import events as ev_ops  # noqa: F401
from ibis_olap_aggregation_spark.operators import pipeline as pl_ops  # noqa: F401
from ibis_olap_aggregation_spark.queries import QUERIES


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_islands_brute_force(spark, tmp_path):
    import datetime as dt
    import itertools

    base = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    # user 1: hours 0,1,2, 5, 9,10 -> islands (3,1,2); user 2: one hour;
    # user 3: duplicate events in the same hour (must count once)
    spec = {1: [0, 1, 2, 5, 9, 10], 2: [4], 3: [7, 7, 7]}
    for u, hours in spec.items():
        for h in hours:
            rows.append((eid, base + dt.timedelta(hours=h, minutes=eid % 60),
                         u, "click", 1.0, "{}"))
            eid += 1
    sf = str(tmp_path / "sf")
    _events_df(spark, rows).write.parquet(sf + "/events.parquet")
    out = {
        r.user_id: (r.n_active_hours, r.n_islands, r.max_island_len)
        for r in QUERIES["events_activity_islands"](spark, sf).collect()
    }

    def brute(hours):
        hs = sorted(set(hours))
        islands = [
            len(list(g))
            for _, g in itertools.groupby(enumerate(hs), lambda p: p[1] - p[0])
        ]
        return (len(hs), len(islands), max(islands))

    assert out == {u: brute(hs) for u, hs in spec.items()}


def test_pack_sequences_brute_force(spark, tmp_path):
    docs = [
        # source A: 600 + 20 + 500 tokens -> 1120 total, 3 examples
        (0, " ".join(["w"] * 600), "en", "A", 0),
        (1, " ".join(["w"] * 20), "en", "A", 0),
        (2, " ".join(["w"] * 500), "en", "A", 0),
        # source B: single short doc -> 1 example, fill 10/512
        (3, " ".join(["w"] * 10), "en", "B", 0),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf + "/documents.parquet")
    out = {r.source: r for r in QUERIES["sample_pack_sequences"](spark, sf).collect()}

    a = out["A"]
    assert (a.n_docs, a.n_tokens, a.n_examples) == (3, 1120, 3)
    # doc0 spans examples 0->1 (600 tokens), doc2 spans 1->2: 2 boundary docs
    assert a.n_boundary_docs == 2
    assert abs(a.last_fill_fraction - (1120 - 2 * 512) / 512) < 1e-6
    b = out["B"]
    assert (b.n_docs, b.n_examples, b.n_boundary_docs) == (1, 1, 0)
    assert abs(b.last_fill_fraction - 10 / 512) < 1e-6


def test_span_dedup_identical_and_short_docs(spark, tmp_path):
    text = " ".join(f"t{i}" for i in range(20))  # 20 tokens -> 3 spans
    docs = [
        (0, text, "en", "A", 0),
        (1, text, "en", "A", 0),        # exact duplicate: every span dup
        (2, " ".join(["u"] * 5), "en", "A", 0),  # shorter than one span
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf + "/documents.parquet")
    out = {
        r.doc_id: r
        for r in QUERIES["dedup_exact_substring_spans"](spark, sf).collect()
    }
    for d in (0, 1):
        assert out[d].n_segments == 3
        assert out[d].n_dup_segments == 3
        assert out[d].dup_token_fraction == 1.0
    # the lone 5-token doc has one partial span, nothing duplicated
    assert out[2].n_segments == 1
    assert out[2].n_dup_segments == 0
    assert out[2].dup_token_fraction == 0.0


def test_results_invariant_to_shuffle_partitioning(spark, sf_small):
    """Partitioning-determinism probe: results must not depend on
    spark.sql.shuffle.partitions (at 100 TB the partition count is a
    tuning knob, never a semantics knob). Exercises the ops whose
    implementations touch partition structure most: range-partitioned
    global ntiles (RFM), per-partition rank offsets (top-k), window
    cumsum (packing), bucket-grouped pair generation (LSH candidates),
    and the islands window."""
    names = [
        "customer_rfm_segments",
        "hierarchy_topk_descendants",
        "sample_pack_sequences",
        "dedup_minhash_lsh_candidates",
        "events_activity_islands",
        # round 12: the NDCG fold collects per-query term lists
        # (collect_list is partition-order-nondeterministic; sort_array
        # must fully fix the fold order) and the KM estimator's global
        # day-grain cumulative windows must not see partition count
        "sim_ndcg_eval",
        "events_survival_kaplan_meier",
        # round-12 second batch: the pack manifest's shard windows and
        # the attribution carry-forward must not see partition count;
        # the mixture normalizer is an integer window sum (order-free)
        "pipeline_pack_sequences",
        "events_attribution_lookback",
        "text_mixture_temperature_weights",
    ]
    conf = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(conf)
    results = {}
    try:
        for parts in ("32", "7"):
            spark.conf.set(conf, parts)
            for n in names:
                pdf = QUERIES[n](spark, sf_small).toPandas()
                pdf = pdf[sorted(pdf.columns)]
                key = sorted(pdf.astype(str).itertuples(index=False, name=None))
                results.setdefault(n, []).append(key)
    finally:
        spark.conf.set(conf, orig)
    for n, (a, b) in results.items():
        assert a == b, f"{n} result depends on shuffle partitioning"


def test_results_invariant_to_aqe_toggle(spark, sf_small):
    """AQE determinism probe: adaptive execution re-plans shuffles and
    joins at runtime (coalesced partitions, demoted broadcasts) — it
    must never change RESULTS. Exercises the join-strategy-sensitive ops:
    the flagship rollup (broadcast closure), the basket self-join, and
    the gap-fill's broadcast grid."""
    names = [
        "hierarchy_geo_rollup_orders",
        "affinity_part_pairs_topk",
        "events_gapfill_hourly",
        # round 12: bucket equi-join + broadcast query sides (range
        # search) and the two-retriever fusion must survive AQE's
        # runtime join re-selection unchanged
        "sim_range_search",
        "sim_rrf_fusion",
        # round-12 second batch: the bloom prune's broadcast-semi chain
        # and the wedge equi-join must survive AQE join re-selection
        "join_bloom_pruned_semi",
        "graph_adamic_adar",
    ]
    conf = "spark.sql.adaptive.enabled"
    orig = spark.conf.get(conf)
    results = {}
    try:
        for flag in ("true", "false"):
            spark.conf.set(conf, flag)
            for n in names:
                pdf = QUERIES[n](spark, sf_small).toPandas()
                pdf = pdf[sorted(pdf.columns)]
                key = sorted(pdf.astype(str).itertuples(index=False, name=None))
                results.setdefault(n, []).append(key)
    finally:
        spark.conf.set(conf, orig)
    for n, (a, b) in results.items():
        assert a == b, f"{n} result depends on AQE"


def test_leakage_safe_split_never_straddles_clusters(spark, sf_small):
    """The cluster-canonical split keeps every near-dup cluster on ONE
    side of the train/eval fence; the naive per-doc hash split (same
    buckets, doc_id key) demonstrably does not on this corpus — the
    difference IS the operator's reason to exist."""
    from ibis_olap_aggregation_spark.operators import dedup

    comp = dedup._near_dup_components(spark, sf_small).cache()

    def split_col(key_col):
        bk = F.expr(
            dedup._SPARK_MD5INT.format(x=f"cast({key_col} as string)") + " % 10000"
        )
        return (
            F.when(bk < 8000, "train")
            .when(bk < 9000, "validation")
            .otherwise("test")
        )

    def straddled(assignment):
        return (
            assignment.groupBy("component")
            .agg(F.countDistinct("split").alias("ns"))
            .filter("ns > 1")
            .count()
        )

    safe = comp.withColumn("split", split_col("component"))
    naive = comp.withColumn("split", split_col("node"))
    assert straddled(safe) == 0
    assert straddled(naive) > 0  # the leak the operator prevents
    # and the registry query's totals cover the whole corpus
    rows = QUERIES["sample_leakage_safe_split"](spark, sf_small).collect()
    from ibis_olap_aggregation_spark.session import load_table

    assert sum(r["n_docs"] for r in rows) == load_table(
        spark, sf_small, "documents"
    ).count()
    comp.unpersist()


def test_ivf_array_scorer_equals_exploded(spark, sf_small):
    """FLOAT array scorer vs the DECIMAL-exact exploded witness (VERDICT
    r5 task #6): the library default scores with plain-double sequential
    folds (order-fixed, IEEE-deterministic); the exploded scorer keeps
    per-term DECIMAL(28,14) exactness as the family's parity witness.
    Their 6-rounded cosines and therefore ranks must agree on the real
    corpus — the empirical proof that the float path's <=1e-15 relative
    error never crosses a 6th-decimal rounding boundary here, which is
    what keeps every IVF query's DuckDB oracle green while scoring runs
    the 100 TB shape (no decimal arithmetic in the |vectors| x k hot
    loop)."""
    from ibis_olap_aggregation_spark.operators.similarity import (
        _emb,
        _ivf_centroids,
        _ivf_exploded,
        _ivf_score_rank,
        _ivf_score_rank_array,
    )

    e = _emb(spark, sf_small)
    ex = _ivf_exploded(e)
    cent = _ivf_centroids(ex)
    cols = ["vec_id", "label", "c_label", "cosine", "rk"]
    arr = _ivf_score_rank_array(e, cent).select(*cols)
    expl = _ivf_score_rank(ex, cent).select(*cols)
    assert arr.exceptAll(expl).count() == 0
    assert expl.exceptAll(arr).count() == 0


def test_global_row_number_is_permutation_multipartition(spark, sf_small):
    """Regression pin for the cross-job range-partitioning race (round
    4): with multiple range partitions, the offset-collect pass and the
    final consumer are separate jobs, and un-pinned partitioning let
    AQE shift the sampled boundaries between them — producing
    duplicate/gapped ranks. The ranker must always emit exactly
    1..n, each once, and agree with a driver-side sort."""
    from ibis_olap_aggregation_spark.operators.ranking import global_row_number
    from ibis_olap_aggregation_spark.session import load_table

    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    n = li.count()
    ranked = global_row_number(
        li, ["l_orderkey", "l_linenumber"], "rk", num_partitions=7
    )
    rows = ranked.collect()
    ranks = sorted(r["rk"] for r in rows)
    assert ranks == list(range(1, n + 1))
    by_rank = sorted(rows, key=lambda r: r["rk"])
    by_key = sorted(rows, key=lambda r: (r["l_orderkey"], r["l_linenumber"]))
    assert [
        (r["l_orderkey"], r["l_linenumber"]) for r in by_rank
    ] == [(r["l_orderkey"], r["l_linenumber"]) for r in by_key]


def test_global_row_number_leaves_no_cached_plans(spark, sf_small):
    """Sweep-scale storage hygiene (VERDICT r4/r5 finding #2): the
    two-pass ranker must not accumulate pinned datasets across repeated
    calls. Dataset.persist registers in the CacheManager, where entries
    live until an explicit unpersist a lazily-consumed return value has
    no safe place to issue — the fix is an eager localCheckpoint
    (MEMORY_AND_DISK by measurement, see ranking.py), whose blocks are
    RDD-scoped (ContextCleaner-freed) and never enter the CacheManager.
    Repeated multi-partition rankings must stay correct AND leave the
    CacheManager exactly as empty as it started."""
    from ibis_olap_aggregation_spark.operators.ranking import global_row_number
    from ibis_olap_aggregation_spark.session import load_table

    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    # other suites legitimately cache tiny fixtures (kmeans centroids,
    # semdedup assignments) — the invariant is zero GROWTH, not empty
    baseline = cache_mgr.numCachedEntries()

    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    n = li.count()
    for _ in range(5):  # a mini-sweep: each call fully consumed
        ranked = global_row_number(
            li, ["l_orderkey", "l_linenumber"], "rk", num_partitions=5
        )
        assert ranked.count() == n
        assert cache_mgr.numCachedEntries() == baseline, (
            "ranking registered a cached plan"
        )


def test_dec_dot_overflow_raises_loudly(spark):
    """Overflow visibility for the decimal-exact dot product (VERDICT
    r4/r5 finding #5): under non-ANSI mode a DECIMAL cast overflow
    yields NULL, which used to silently null the cosine and corrupt
    ranks. Large-magnitude vectors must now raise with a message naming
    the bound; in-bound vectors stay exact; NULL whole-vector inputs
    stay NULL (legitimate missing data)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from ibis_olap_aggregation_spark.operators.similarity import _DEC_DOT

    expr = F.expr(_DEC_DOT.format(a="a", b="b")).alias("dot")
    schema = "a array<double>, b array<double>"

    # per-term product 1e16 >= 1e14: DECIMAL(28,14) cast overflow.
    # Under ANSI (the session default) the cast itself raises; under
    # non-ANSI the cast NULLs and the ifnull(raise_error) wrapper fires
    # — EITHER way the failure is loud, never a silent NULL cosine.
    big = spark.createDataFrame([([1e8] * 4, [1e8] * 4)], schema)
    with _pytest.raises(
        Exception, match="decimal overflow|cannot be represented"
    ):
        big.select(expr).collect()
    ansi_conf = "spark.sql.ansi.enabled"
    orig = spark.conf.get(ansi_conf)
    try:
        spark.conf.set(ansi_conf, "false")  # the silent-NULL regime
        with _pytest.raises(Exception, match="decimal overflow"):
            big.select(expr).collect()
    finally:
        spark.conf.set(ansi_conf, orig)

    # a NULL element inside a vector is corruption, not missing data
    holey = spark.createDataFrame([([1.0, None], [1.0, 1.0])], schema)
    with _pytest.raises(Exception, match="decimal overflow or NULL"):
        holey.select(expr).collect()

    # in-bound magnitudes: exact, no false trips (term 1e12 < 1e14)
    ok = spark.createDataFrame([([1e6] * 4, [1e6] * 4)], schema)
    assert ok.select(expr).collect()[0]["dot"] == 4e12

    # NULL whole-vector input propagates NULL, never raises
    nul = spark.createDataFrame([(None, [1.0])], schema)
    assert nul.select(expr).collect()[0]["dot"] is None


def test_query_scoped_caches_do_not_accumulate(spark, sf_small):
    """Sweep hygiene extended beyond the ranker: every query that
    previously cache()d a multi-referenced intermediate with no
    unpersist point (kmeans centroids, semdedup assignments, shingle
    sets, LSH bucket groups, z-order inputs/stats) now registers via
    session.query_cache, and the registry wrapper drains the previous
    query's caches at each invocation — so a 182-query sweep holds at
    most ONE query's caches at a time, and cache counts are FLAT across
    repeated rounds instead of growing. (An eager-localCheckpoint
    alternative held zero entries but measured 2.4-3.4x slower on the
    corpus-sized intermediates — tracked cache+drain is the measured
    design; see session.query_cache.)"""
    from ibis_olap_aggregation_spark.queries import QUERIES
    from ibis_olap_aggregation_spark.session import release_query_caches

    names = (
        "sim_kmeans_refine",
        "dedup_semantic_ivf",
        "layout_zorder_file_skipping",
        "dedup_ngram_jaccard_pairs",
        "dedup_minhash_lsh_candidates",
    )
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    release_query_caches()
    baseline = cache_mgr.numCachedEntries()
    per_query: dict[str, list[int]] = {n: [] for n in names}
    for _round in range(2):
        for name in names:
            QUERIES[name](spark, sf_small).write.format("noop").mode(
                "overwrite"
            ).save()
            per_query[name].append(cache_mgr.numCachedEntries())
    for name, counts in per_query.items():
        assert counts[0] == counts[1], (
            f"{name}: cache count grew across rounds {counts}"
        )
    # explicit release restores the pre-sweep state exactly
    release_query_caches()
    assert cache_mgr.numCachedEntries() == baseline


def test_ewma_matches_reference_fold(spark, tmp_path):
    """events_ewma_user_value == a plain Python fold (bit-exact): the
    sequence is ordered by (ts, event_id), the accumulator SEEDS with
    the first value (regression pin: Spark's `arr[i]` is 0-based while
    slice/element_at are 1-based — a vals[1] seed silently drops the
    first value and double-counts the second), and a single-event user
    returns that value unchanged."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    # user 1: out-of-insertion-order timestamps; user 2: single event;
    # user 3: a ts tie broken by event_id
    rows = [
        (10, base + dt.timedelta(hours=2), 1, "click", 7.5, "{}"),
        (11, base + dt.timedelta(hours=0), 1, "click", 1.25, "{}"),
        (12, base + dt.timedelta(hours=1), 1, "click", -3.5, "{}"),
        (13, base, 2, "view", 42.0, "{}"),
        (15, base, 3, "view", 2.0, "{}"),
        (14, base, 3, "view", 8.0, "{}"),
    ]
    sf = str(tmp_path / "sf")
    _events_df(spark, rows).write.parquet(sf + "/events.parquet")
    out = {
        r.user_id: (r.n_events, r.last_value, r.ewma_value)
        for r in QUERIES["events_ewma_user_value"](spark, sf).collect()
    }

    def fold(vals):
        acc = vals[0]
        for x in vals[1:]:
            acc = 0.3 * x + 0.7 * acc
        return acc

    u1 = [1.25, -3.5, 7.5]          # sorted by ts
    u3 = [8.0, 2.0]                 # ts tie -> event_id order
    assert out[1] == (3, 7.5, fold(u1))
    assert out[2] == (1, 42.0, 42.0)
    assert out[3] == (2, 2.0, fold(u3))


def test_weighted_sample_overrepresents_heavy_rows(spark, sf_small):
    """Efraimidis-Spirakis with weight=n_chars must pull the sample's
    mean length above the corpus mean (the whole point of weighting),
    return exactly k distinct docs, and rank them 1..k."""
    out = QUERIES["sample_weighted_without_replacement"](spark, sf_small).toPandas()
    assert len(out) == 50 and out.doc_id.nunique() == 50
    assert sorted(out.sample_rank) == list(range(1, 51))
    corpus = (
        spark.read.parquet(sf_small + "/documents.parquet")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    assert out.n_chars.mean() > corpus, (out.n_chars.mean(), corpus)


def test_backlog_sweepline_matches_direct_stab(spark, sf_small):
    """interval_backlog_daily == the direct interval-stab count
    (start <= d < end) on sampled days, and cumulative_distinct_users
    in events_daily_new_cumulative is monotone, ends at the true total
    distinct-user count, and actives always >= news."""
    out = QUERIES["interval_backlog_daily"](spark, sf_small).toPandas()
    li = spark.read.parquet(sf_small + "/lineitem.parquet")
    o = spark.read.parquet(sf_small + "/orders.parquet")
    iv = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.least(F.to_date("o_orderdate"), F.to_date("l_shipdate")).alias("s"),
            F.greatest(F.to_date("o_orderdate"), F.to_date("l_shipdate")).alias("e"),
        )
        .toPandas()
    )
    days = out.day.iloc[[0, len(out) // 3, 2 * len(out) // 3, -1]]
    for d in days:
        dd = d.date()
        want = int(((iv.s <= dd) & (dd < iv.e)).sum())
        got = int(out.loc[out.day == d, "open_backlog"].iloc[0])
        assert got == want, (d, got, want)

    dn = QUERIES["events_daily_new_cumulative"](spark, sf_small).toPandas()
    assert (dn.cumulative_distinct_users.diff().dropna() >= 0).all()
    total = (
        spark.read.parquet(sf_small + "/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert dn.cumulative_distinct_users.iloc[-1] == total
    assert (dn.active_users >= dn.new_users).all()


def test_topdown_allocation_conserves_budget(spark, sf_small):
    """Per region, allocated budgets must sum back to ~100k (the spread
    conserves the whole) and shares to ~1; every share in (0, 1]."""
    out = QUERIES["hierarchy_topdown_allocation"](spark, sf_small).toPandas()
    assert (out.revenue_share > 0).all() and (out.revenue_share <= 1).all()
    per_region = out.groupby("region_name").agg(
        share=("revenue_share", "sum"), alloc=("allocated_budget", "sum")
    )
    # 6-digit per-row rounding bounds the drift at n_rows * 5e-7
    for _, row in per_region.iterrows():
        assert abs(row.share - 1.0) < 5e-4, row
        assert abs(row.alloc - 100000.0) < 50, row


def test_event_id_unique_per_event(spark, sf_small):
    """events_ewma_user_value's struct sort uses (ts, event_id, v) while
    the DuckDB oracle orders by (ts, event_id) only — the engines agree
    only while event_id is unique (v tiebreak inert). Pin the invariant
    the cross-engine determinism rests on; if this ever fails, mirror
    the tiebreak explicitly in the oracle instead."""
    ev = spark.read.parquet(sf_small + "/events.parquet")
    n = ev.count()
    assert ev.select("event_id").distinct().count() == n


def test_kcore_peel_matches_python_peeling(spark, sf_small):
    """Independent oracle for graph_kcore_peel: plain-Python peeling to
    FIXPOINT over the same thresholded co-purchase edges. The registry
    query runs 8 fixed rounds; when it reports converged=True its
    counts must equal the true k-core, and the true k-core must satisfy
    the closure property (every member keeps >= k neighbors inside)."""
    from ibis_olap_aggregation_spark.operators.graph import (
        _CC_MIN_W,
        _KCORE_K,
        copurchase_pairs,
        order_items,
    )

    got = QUERIES["graph_kcore_peel"](spark, sf_small).first()
    edges = {
        (r.pa, r.pb)
        for r in copurchase_pairs(order_items(spark, sf_small))
        .filter(F.col("w") >= _CC_MIN_W)
        .select("pa", "pb")
        .collect()
    }
    while True:
        deg: dict = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= _KCORE_K}
        nxt = {(a, b) for a, b in edges if a in keep and b in keep}
        if nxt == edges:
            break
        edges = nxt
    # closure property of the fixpoint core
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert all(d >= _KCORE_K for d in deg.values())
    if got.converged:
        assert (got.n_core_nodes, got.n_core_edges) == (len(keep), len(edges))
