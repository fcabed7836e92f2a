"""Iterative graph analytics over relational inputs: weighted PageRank
on the part co-purchase graph.

The iterative join-aggregate is the canonical Spark graph pattern
(GraphX/Pregel degenerate to exactly this for PageRank): each iteration
is one equi-join of the edge list with the current rank vector on src
plus one aggregation on dst — both shuffle on a part key, and AQE
handles the skewed-hub case. Fixed iteration count (3) keeps the
computation a pure dataflow the DuckDB oracle can mirror as unrolled
CTEs — the differential check then covers the whole iteration chain.

Cross-engine determinism: the per-row contribution pr*w/out_w is plain
double (one fixed expression tree, identical operands -> identical IEEE
result in both engines); the CROSS-ROW sum per dst is made order-free
by QUANTIZING each contribution to integer 1e-15 units (round-parity is
established between the engines; contributions per dst sum to <= 1, so
the bigint total is <= ~1e15 with enormous headroom) and summing exact
BIGINTs. Measured 2x faster than a DECIMAL(28,15) sum at sf0.1 — wide
decimal agg buffers defeat the hash-agg fast path (the round-6
centroid finding) — with the same determinism guarantee.

Scale notes (100 TB): edge construction self-joins lineitem on
l_orderkey — the shuffle key is the order key and pair fan-out is
bounded by order size (O(k^2) per order, k = lineitems/order, small and
bounded in practice). The rank vector is node-sized (dimension-scale);
each iteration's join shuffles edges once on src and the aggregate
shuffles contributions once on dst. Nothing is ever quadratic in nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.queries import register, sum_wide, sum_wide_product
from ibis_olap_aggregation_spark.session import load_table, query_cache

_DAMP = 0.85
_ITERS = 3

# Above this many distinct ordered co-purchase edges the forward
# adjacency (edge-list-sized in total payload) stops being broadcast
# and the triangle enumeration switches to sort-merge joins. ~5M edges
# x ~16 bytes/entry ~ 80 MB serialized — comfortably under executor
# memory as a broadcast but near the practical ceiling; a module
# constant so tests can force either regime.
TRIANGLE_BROADCAST_EDGE_CAP = 5_000_000

# Above this many nodes the PageRank rank vector (and the node-sized
# part-name attach) stops being broadcast and the per-iteration join
# runs as a sort-merge join on src instead. The rank vector is
# ~16 B/row, but the broadcast re-serializes per iteration (x3) and
# per decorate; at a 20M-part scale that is ~320 MB per broadcast —
# past the practical ceiling. The probe is FREE here: n_nodes is
# already collected for the damping constants. Module constant so
# tests can force either regime.
PAGERANK_BROADCAST_NODE_CAP = 5_000_000


def order_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (l_orderkey, l_partkey) pairs — the basket item set the
    whole co-purchase family (PageRank, triangles, association rules)
    derives from."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )


def order_items_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_orderkey, l_partkey) projection WITHOUT the distinct: the
    basket pair builders dedup inside their collect_set anyway, so the
    distinct's exchange is pure cost on that path (one full shuffle of
    the item stream). Consumers that need the distinct pair set itself
    (per-part order-support counts, per-customer ownership) keep
    order_items."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )


def copurchase_pairs(items: DataFrame) -> DataFrame:
    """Weighted ordered co-purchase pairs (pa < pb, w = co-order
    count): the ONE basket pair build every graph/basket operator
    shares. Kept as the single copy so the ordering predicate (the
    triangle skew cut) cannot drift between consumers (pagerank/
    triangles here, affinity lift in analytic.py).

    Shape: groupBy(order) -> sorted basket array -> map-side pair
    explode -> groupBy(pair). TWO shuffles total (order key, then pair
    key) — the previous self-join form paid three (the distinct, the
    join re-shuffle, the pair aggregation) for identical output
    (collect_set dedups the (order, part) pairs the old distinct did;
    sort_array fixes pa < pb). Pair fan-out stays bounded by basket
    size (O(k²) per order, k small) and happens map-side between the
    two exchanges.

    The order-key exchange is an EXPLICIT same-key repartition at the
    configured shuffle width (shared with the groupBy — one exchange,
    guide §2.4 idiom): AQE's byte-based partition coalescing sees only
    the small basket payload and squeezed the stage that EXPLODES each
    basket into O(k²) pairs onto a handful of tasks (4 of 32 cores at
    sf0.1 — fan-out work is invisible to byte heuristics). Pinning the
    width measured 1.45s -> 0.90s for the und build. Cost: the
    pre-exchange partial collect_set is skipped, but baskets rarely
    contain repeated parts, so the partials deduped almost nothing —
    raw (order, part) rows and partial sets are the same bytes."""
    p = int(
        items.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    baskets = (
        items.repartition(p, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps) - i - 1),"
                " y -> struct(x as pa, y as pb))))"
            )
        ).alias("p")
    )
    return pairs.groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb")).agg(
        F.count(F.lit(1)).alias("w")
    )


def signal_pairs(items: DataFrame, min_w: int) -> DataFrame:
    """Weight-floored ("signal") co-purchase pairs: copurchase_pairs
    with single-co-occurrence noise edges dropped. ONE definition for
    every consumer of the floored graph (connected components and
    k-core at _CC_MIN_W, Adamic-Adar at AA_MIN_EDGE_WEIGHT, cosine at
    its own w >= 3) so the floor predicate cannot drift between them —
    the same single-copy rationale as copurchase_pairs itself."""
    return copurchase_pairs(items).filter(F.col("w") >= min_w)


# one iteration of the oracle chain: contributions quantized to 1e-15
# units -> exact bigint sum per dst -> damped update. Every node has
# in-edges (the edge list is symmetrized), so the aggregate covers the
# full node set.
_IT_SQL = """
agg{i} AS (
  SELECT e.dst AS pk,
         SUM(CAST(ROUND(p.pr * e.w / o.out_w * 1e15, 0) AS BIGINT)) AS s
  FROM edges e
  JOIN pr{prev} p ON p.pk = e.src
  JOIN outw o ON o.src = e.src
  GROUP BY 1
),
pr{i} AS (
  SELECT pk, 0.15 / nd + 0.85 * (CAST(s AS DOUBLE) / 1e15) AS pr FROM agg{i}, n
)"""

_PAGERANK_SQL = (
    """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
und AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS w
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
edges AS (
  SELECT pa AS src, pb AS dst, w FROM und
  UNION ALL
  SELECT pb AS src, pa AS dst, w FROM und
),
outw AS (
  SELECT src, SUM(w) AS out_w, CAST(COUNT(*) AS BIGINT) AS degree
  FROM edges GROUP BY 1
),
nodes AS (SELECT DISTINCT src AS pk FROM edges),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM nodes),
pr0 AS (SELECT pk, 1.0 / nd AS pr FROM nodes, n),"""
    + ",".join(_IT_SQL.format(i=i, prev=i - 1) for i in range(1, _ITERS + 1))
    + f"""
SELECT r.pk AS p_partkey, p.p_name, o.degree,
       ROUND(r.pr, 8) AS pagerank
FROM pr{_ITERS} r
JOIN part p ON p.p_partkey = r.pk
JOIN outw o ON o.src = r.pk
ORDER BY ROUND(r.pr, 8) DESC, r.pk
LIMIT 20
"""
)


@register("graph_pagerank_copurchase", _PAGERANK_SQL)
def graph_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 3 iterations from uniform) on
    the part co-purchase graph: parts are nodes, an edge's weight is the
    number of orders containing both parts (symmetrized). Returns the
    top 20 hub parts with their degree — the classic 'influential item'
    query a recommendations pipeline derives from transaction logs.

    The oracle unrolls the identical 3 iterations as CTEs, so the
    differential check verifies the full iterative dataflow, not one
    step. See module docstring for the determinism and scale story."""
    # cache the pair build itself: outw's materialization and ew's build
    # are SEPARATE actions, and without this pin the O(k^2) basket
    # explode + pair aggregate ran once for each (measured 2.0s per
    # extra pass at sf0.1 — the two downstream caches only deduped
    # consumers *after* their own builds)
    und = query_cache(copurchase_pairs(order_items_raw(spark, sf_dir)))
    edges = und.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst"), "w"
    ).unionAll(und.select(F.col("pb").alias("src"), F.col("pa").alias("dst"), "w"))
    # tracked query-scoped caches (session.query_cache; Spark does not
    # dedupe common subplans across a lazily unrolled loop — measured
    # 15.2s first cut, see PARITY round-7):
    # - outw (NODE-sized): feeds the join below, the node set / N, AND
    #   the final degree attach — without its own cache that last
    #   attach re-ran the whole O(k^2) pair build one extra time;
    # - ew (edge + out-weight): read by all three iteration joins.
    outw = query_cache(
        edges.groupBy("src").agg(
            F.sum("w").alias("out_w"),
            F.count(F.lit(1)).cast("bigint").alias("degree"),
        )
    )
    ew = query_cache(edges.join(outw.select("src", "out_w"), "src"))
    # one row per src in outw == the node set (the edge list is
    # symmetrized, so every node appears as a source)
    nodes = outw.select(F.col("src").alias("pk"))
    # single-row scalar collect (the repo's bounded-probe convention):
    # N rides in the damping constants of every iteration, and attaching
    # it as a broadcast single-row crossJoin instead costs one broadcast
    # JOB per reference (4 of them). Python floats are IEEE doubles, so
    # 1.0/n and 0.15/n are bit-identical to the oracle's in-engine
    # divisions on the same exact integer.
    n_nodes = nodes.count()
    # Join-regime switch (the triangle/closure pattern): BELOW the node
    # cap, broadcast the node-sized rank vector so the edge stream (the
    # fact-scale side) is never shuffled — the only per-iteration
    # shuffle is the contribution aggregate on dst. ABOVE the cap (a
    # 20M-part graph: ~320 MB serialized, re-shipped per iteration and
    # per decorate) every node-sized attach runs as a sort-merge join
    # instead — identical semantics, no executor-memory cliff. The
    # probe is free: n_nodes is already collected for the damping
    # constants. Both regimes are plan- and output-pinned
    # (tests/test_plans.py::test_pagerank_join_regime_switch).
    small_nodes = n_nodes < PAGERANK_BROADCAST_NODE_CAP

    def _node_side(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small_nodes else df.hint("merge")

    pr = nodes.select("pk", F.lit(1.0 / n_nodes).alias("pr"))
    for _ in range(_ITERS):
        contrib = ew.join(_node_side(pr), ew.src == pr.pk).select(
            F.col("dst"),
            F.round(F.col("pr") * F.col("w") / F.col("out_w") * F.lit(1e15), 0)
            .cast("bigint")
            .alias("c_q"),
        )
        agg = contrib.groupBy("dst").agg(F.sum("c_q").alias("s"))
        pr = agg.select(
            F.col("dst").alias("pk"),
            (
                F.lit(0.15 / n_nodes)
                + F.lit(0.85) * (F.col("s").cast("double") / F.lit(1e15))
            ).alias("pr"),
        )
        # PIN each iteration (tracked query-scoped cache): without a
        # cache the broadcast for iteration i+1 — its own job — would
        # re-execute every prior iteration's aggregate from scratch,
        # O(iters^2) passes over the edge list. The cache alone
        # suffices: its first consumer (that very broadcast job, or the
        # final sort-merge decorate) populates it, so each iteration's
        # aggregate runs exactly once with NO explicit count() action —
        # dropping the three count jobs measured 5.71s -> 5.21s median
        # at sf0.1 (interleaved A/B, identical output). Node-sized,
        # registry-drained like every query cache.
        pr = query_cache(pr)
    # the part-name decorate is node-sized too — same regime switch
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    out = (
        pr.join(_node_side(part), pr.pk == part.p_partkey)
        .join(outw.select(F.col("src"), "degree"), pr.pk == F.col("src"))
        .select(
            F.col("pk").alias("p_partkey"),
            "p_name",
            "degree",
            F.round("pr", 8).alias("pagerank"),
        )
    )
    return out.orderBy(F.col("pagerank").desc(), F.col("p_partkey")).limit(20)


@register(
    "graph_triangle_clustering",
    """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
und AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM li x
  JOIN li y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
),
tri AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
per_node AS (
  SELECT pk, COUNT(*) AS n_triangles FROM (
    SELECT a AS pk FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY 1
),
deg AS (
  SELECT pk, COUNT(*) AS degree FROM (
    SELECT a AS pk FROM und UNION ALL SELECT b FROM und
  ) GROUP BY 1
)
SELECT d.pk AS p_partkey, CAST(d.degree AS BIGINT) AS degree,
       CAST(t.n_triangles AS BIGINT) AS n_triangles,
       ROUND(2.0 * t.n_triangles / (d.degree * (d.degree - 1)), 6)
         AS clustering_coeff
FROM per_node t JOIN deg d ON d.pk = t.pk
ORDER BY t.n_triangles DESC, d.pk
LIMIT 20
""",
)
def graph_triangle_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + local clustering coefficient on the part
    co-purchase graph — the standard cohesion metrics (Watts-Strogatz
    clustering; triangle enumeration per Schank-Wagner's ordered-wedge
    method). Each triangle a<b<c is enumerated ONCE by joining ordered
    edges (a,b)x(b,c) and closing with (a,c); per-node counts explode
    the triangle's three corners; clustering = 2*t / (deg*(deg-1)).

    Scale: the wedge join shuffles the DISTINCT edge list on its
    endpoints (edge-list sized, bounded by co-purchase fan-out), and the
    ordering constraint a<b<c means no triangle is generated three
    times and the heaviest hub only ever anchors wedges from its
    HIGHER-id neighbors — the classic skew cut for triangle counting.
    Top 20 by triangle count via distributed TakeOrdered."""
    # shared pair build (already pair-distinct via its groupBy); the
    # weight is irrelevant to triangle existence
    und = query_cache(
        copurchase_pairs(order_items_raw(spark, sf_dir)).select(
            F.col("pa").alias("a"), F.col("pb").alias("b")
        )
    )
    # Array-intersection enumeration instead of the literal 3-way wedge
    # join: the triangle a<b<c lives on edge (a,b) as c in
    # N+(a) INTERSECT N+(b) (forward adjacency under the < ordering).
    # The wedge join materializes EVERY path a->b->c before the closing
    # probe — ~70M wedge rows on the sf0.1 graph (avg degree 120),
    # measured 32.6s — where the intersection touches each edge once
    # against two adjacency arrays and emits only ACTUAL triangles:
    # measured ~6x faster, identical output.
    #
    # Join-strategy switch (the connected_components pattern,
    # dedup.py): the adjacency table's total payload is EDGE-LIST
    # sized (sum of forward degrees), not node-sized — broadcasting it
    # is only right while the edge list itself is broadcast-small.
    # Past TRIANGLE_BROADCAST_EDGE_CAP edges the two attaches become
    # sort-merge joins (edge stream shuffled on a, then b; adjacency
    # shuffled on n) — the same enumeration, never a wedge
    # materialization, no executor-memory cliff. The size probe rides
    # the already-cached edge list (one bounded count, reused by the
    # cache for every downstream pass).
    fwd = und.groupBy(F.col("a").alias("n")).agg(
        F.sort_array(F.collect_list("b")).alias("nbrs")
    )
    na = fwd.select(F.col("n").alias("na_n"), F.col("nbrs").alias("nbrs_a"))
    nb = fwd.select(F.col("n").alias("nb_n"), F.col("nbrs").alias("nbrs_b"))
    if und.limit(TRIANGLE_BROADCAST_EDGE_CAP).count() < TRIANGLE_BROADCAST_EDGE_CAP:
        na, nb = F.broadcast(na), F.broadcast(nb)
    else:
        na, nb = na.hint("merge"), nb.hint("merge")
    # ONE pass over the intersection join. The first cut stacked the
    # three triangle corners as a 3-branch union over the exploded
    # triangle stream — Spark does not dedupe common subplans, so the
    # adjacency joins + intersection ran THREE times (3x
    # explode(array_intersect) in the executed plan). Instead each edge
    # (a,b) whose forward neighborhoods share k vertices contributes k
    # triangles to a and to b and one to each closing vertex c; the
    # weighted corner stream aggregates to the identical per-node
    # triangle counts with the join executed once, and shuffles 2+k
    # rows per edge instead of 3k exploded corners.
    inter = (
        und.join(na, und.a == F.col("na_n"))
        .join(nb, und.b == F.col("nb_n"))
        .select("a", "b", F.array_intersect("nbrs_a", "nbrs_b").alias("cs"))
    )
    corners = inter.select(
        F.explode(
            F.concat(
                F.array(
                    F.struct(F.col("a").alias("pk"), F.size("cs").alias("cnt")),
                    F.struct(F.col("b").alias("pk"), F.size("cs").alias("cnt")),
                ),
                F.expr("transform(cs, c -> struct(c AS pk, 1 AS cnt))"),
            )
        ).alias("t")
    )
    # zero-triangle edges are dropped HERE, after the generate, not as a
    # size(cs) > 0 pre-filter: Catalyst pushes that filter into the join
    # condition, re-evaluating the O(da+db) sorted-array intersection a
    # second time for every edge — the dominant per-row cost of the
    # whole query. A cnt > 0 predicate on the generated column cannot be
    # pushed below the Generate, so the intersection runs exactly once
    # per edge; the price is two soon-filtered rows per triangle-free
    # edge, noise next to the recompute it avoids.
    per_node = (
        corners.filter(F.col("t.cnt") > 0)
        .groupBy(F.col("t.pk").alias("pk"))
        .agg(F.sum("t.cnt").cast("bigint").alias("n_triangles"))
    )
    ends = und.select(F.col("a").alias("dk")).unionAll(
        und.select(F.col("b").alias("dk"))
    )
    deg = ends.groupBy("dk").agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    out = per_node.join(deg, per_node.pk == deg.dk).select(
        F.col("pk").alias("p_partkey"),
        "degree",
        "n_triangles",
        F.round(
            F.lit(2.0)
            * F.col("n_triangles")
            / (F.col("degree") * (F.col("degree") - 1)),
            6,
        ).alias("clustering_coeff"),
    )
    return out.orderBy(F.col("n_triangles").desc(), F.col("p_partkey")).limit(20)


@register(
    "graph_cf_recommendations",
    """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
und AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS w
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
edges AS (
  SELECT pa AS src, pb AS dst, w FROM und
  UNION ALL
  SELECT pb AS src, pa AS dst, w FROM und
),
owned AS (
  SELECT DISTINCT o.o_custkey AS cust, li.l_partkey AS part
  FROM li JOIN orders o ON o.o_orderkey = li.l_orderkey
),
scored AS (
  SELECT ow.cust, e.dst AS rec, CAST(SUM(e.w) AS BIGINT) AS score
  FROM owned ow JOIN edges e ON e.src = ow.part
  GROUP BY 1, 2
),
novel AS (
  SELECT s.cust, s.rec, s.score
  FROM scored s
  LEFT JOIN owned o2 ON o2.cust = s.cust AND o2.part = s.rec
  WHERE o2.part IS NULL
),
ranked AS (
  SELECT cust, rec, score,
         ROW_NUMBER() OVER (PARTITION BY cust
                            ORDER BY score DESC, rec) AS rk
  FROM novel
)
SELECT cust AS c_custkey, rec AS p_partkey, score,
       CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 3 AND cust <= 200
""",
)
def graph_cf_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering (Sarwar et al., WWW'01; the
    Amazon-style recommender): a customer's score for a candidate part
    is the summed co-purchase weight between the candidate and
    everything the customer already bought; parts already owned are
    anti-joined away; top 3 per customer. Output bounded to the first
    200 customers so the registry row stays hash-stable at every sf.

    Scale shape: the scoring join fans each owned item out to its
    co-purchase neighbors — cost = sum over owned items of their
    degree, the classic item-based CF bound (degree-capped in real
    deployments; the co-purchase degree here is order-size bounded by
    construction). The exclusion is a keyed LEFT ANTI join and the
    top-3 a per-customer window, never a global sort. Integer scores
    (exact sums of co-order counts) keep the ranking bit-stable across
    engines."""
    und = copurchase_pairs(order_items_raw(spark, sf_dir))
    edges = und.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst"), "w"
    ).unionAll(und.select(F.col("pb").alias("src"), F.col("pa").alias("dst"), "w"))
    li = order_items(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    owned = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    scored = (
        owned.join(edges, owned.part == edges.src)
        .groupBy("cust", F.col("dst").alias("rec"))
        .agg(F.sum("w").cast("bigint").alias("score"))
    )
    novel = scored.join(
        owned.select(F.col("cust").alias("oc"), F.col("part").alias("opart")),
        (scored.cust == F.col("oc")) & (scored.rec == F.col("opart")),
        "left_anti",
    )
    wr = Window.partitionBy("cust").orderBy(F.col("score").desc(), F.col("rec"))
    return (
        novel.withColumn("rk", F.row_number().over(wr).cast("bigint"))
        .filter((F.col("rk") <= 3) & (F.col("cust") <= 200))
        .select(
            F.col("cust").alias("c_custkey"),
            F.col("rec").alias("p_partkey"),
            "score",
            "rk",
        )
    )


_CC_MIN_W = 2  # affinity floor: singleton co-occurrences are noise edges

_CC_SQL = f"""
WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
und AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS w
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
filt AS (SELECT pa, pb FROM und WHERE w >= {_CC_MIN_W}),
edges AS (
  SELECT pa AS src, pb AS dst FROM filt
  UNION ALL
  SELECT pb AS src, pa AS dst FROM filt
),
nodes AS (SELECT DISTINCT src AS pk FROM edges),
cc(pk, lbl) AS (
  SELECT pk, pk FROM nodes
  UNION
  SELECT e.dst, c.lbl
  FROM cc c JOIN edges e ON e.src = c.pk
  WHERE c.lbl < e.dst
),
comp AS (SELECT pk, MIN(lbl) AS component_id FROM cc GROUP BY 1),
tot AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_total,
         CAST(COUNT(DISTINCT component_id) AS BIGINT) AS n_components
  FROM comp
)
SELECT component_id, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       ROUND(CAST(COUNT(*) AS DOUBLE) / t.n_total, 6) AS node_share,
       t.n_components
FROM comp, tot t
GROUP BY component_id, t.n_total, t.n_components
ORDER BY n_nodes DESC, component_id
LIMIT 10
"""


@register("graph_connected_components", _CC_SQL)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the part co-purchase graph — min-label
    FIXPOINT semantics (component id = smallest member): unlike
    PageRank's fixed unrolled iteration count, this is a genuinely
    data-dependent loop that runs until labels stop changing, the one
    Pregel primitive the registry lacked. Returns the
    10 largest components (id = smallest member part key) with node
    counts, share of all connected nodes, and the total component
    count. Edges need co-purchase weight >= _CC_MIN_W: thresholding the
    projection is what makes component structure appear at all (the
    unthresholded co-purchase graph is one giant blob), the same reason
    the affinity queries floor their supports.

    Runs on the SHARED connected_components kernel (operators/dedup.py)
    — the probed strategy switch: a post-threshold edge set under 2M
    edges answers in one driver union-find collect (iterating a few
    thousand edges through distributed rounds is pure task overhead —
    a first cut here spent ~1.2s/round on a 3.5k-edge graph), larger
    graphs run the distributed alternating large-star/small-star loop
    (O(log n) rounds on any graph shape, including chains) whose
    parallelism is sized to the GRAPH, not the session shuffle width.

    The DuckDB oracle computes the same fixpoint DECLARATIVELY: a
    recursive CTE propagates every label downhill (lbl < node admits
    exactly the paths that matter, since a component's minimum reaches
    every member through nodes that are all larger), and MIN per node
    is that fixpoint — so the differential check covers the whole
    dynamic computation, not a fixed unrolling."""
    from ibis_olap_aggregation_spark.operators.dedup import connected_components

    und = query_cache(
        signal_pairs(order_items_raw(spark, sf_dir), _CC_MIN_W)
        .select("pa", "pb")
    )
    labels = connected_components(und, "pa", "pb")
    labels = query_cache(labels)
    n_total = labels.count()
    n_components = labels.select("component").distinct().count()
    out = labels.groupBy(F.col("component").alias("component_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )
    out = out.select(
        "component_id",
        "n_nodes",
        F.round(F.col("n_nodes").cast("double") / F.lit(float(n_total)), 6).alias(
            "node_share"
        ),
        F.lit(n_components).cast("bigint").alias("n_components"),
    )
    return out.orderBy(F.col("n_nodes").desc(), "component_id").limit(10)


@register(
    "graph_copurchase_cosine",
    """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
und AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS w
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
supp AS (SELECT l_partkey, COUNT(*) AS n FROM li GROUP BY 1)
SELECT pa, pb, w,
       ROUND(w / sqrt(CAST(sa.n AS DOUBLE) * sb.n), 6) AS cosine
FROM und
JOIN supp sa ON sa.l_partkey = pa
JOIN supp sb ON sb.l_partkey = pb
WHERE w >= 3
ORDER BY ROUND(w / sqrt(CAST(sa.n AS DOUBLE) * sb.n), 6) DESC, pa, pb
LIMIT 20
""",
)
def graph_copurchase_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-normalized co-purchase affinity — the bipartite-projection
    similarity cos(a,b) = |A∩B| / sqrt(|A||B|) over order sets: the
    GEOMETRIC normalization that complements lift's probabilistic one
    (lift rewards rarity; cosine rewards overlap share). sqrt is a
    correctly-rounded IEEE operation, so the score is bit-identical
    cross-engine with no decimal routing; min co-count 3 keeps
    singleton-pair cosines (trivially high) out of the top-k.

    Same join graph as the lift query: one pair build (shared helper),
    two NODE-sized support attaches, distributed TakeOrdered. The
    support side is one row per distinct part — SF-linear, the same
    shape as PageRank's rank vector — so it broadcasts only below
    PAGERANK_BROADCAST_NODE_CAP (bounded probe on the query-cached
    aggregate; the probe populates the cache both attaches then read)
    and attaches as a sort-merge join above it. Both regimes are plan-
    and output-pinned (test_plans.py::
    test_copurchase_cosine_support_regime_switch)."""
    und = signal_pairs(order_items_raw(spark, sf_dir), 3)
    supp = query_cache(
        order_items(spark, sf_dir).groupBy("l_partkey").agg(
            F.count(F.lit(1)).alias("n")
        )
    )
    cap = PAGERANK_BROADCAST_NODE_CAP
    small_nodes = supp.limit(cap).count() < cap

    def _node_side(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small_nodes else df.hint("merge")

    sa = supp.select(F.col("l_partkey").alias("pa"), F.col("n").alias("na"))
    sb = supp.select(F.col("l_partkey").alias("pb"), F.col("n").alias("nb"))
    out = (
        und.join(_node_side(sa), "pa")
        .join(_node_side(sb), "pb")
        .select(
            "pa",
            "pb",
            "w",
            F.round(
                F.col("w") / F.sqrt(F.col("na").cast("double") * F.col("nb")), 6
            ).alias("cosine"),
        )
    )
    return out.orderBy(F.col("cosine").desc(), "pa", "pb").limit(20)


@register(
    "graph_degree_assortativity",
    """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
und AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM li x
  JOIN li y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
),
deg AS (
  SELECT pk, COUNT(*) AS d FROM (
    SELECT a AS pk FROM und UNION ALL SELECT b FROM und
  ) GROUP BY 1
),
sym AS (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und
),
st AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(da.d) AS DOUBLE) AS sa,
         CAST(SUM(CAST(da.d * da.d AS HUGEINT)) AS DOUBLE) AS saa,
         CAST(SUM(CAST(da.d * db.d AS HUGEINT)) AS DOUBLE) AS sab
  FROM sym s
  JOIN deg da ON da.pk = s.u
  JOIN deg db ON db.pk = s.v
)
SELECT CAST(n / 2 AS BIGINT) AS n_edges,
       ROUND((n * sab - sa * sa) / (n * saa - sa * sa), 6)
         AS degree_assortativity
FROM st
""",
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over all edges — positive means hubs attach to
    hubs (social-network-like), negative means hub-and-spoke
    (technological). Computed over the SYMMETRIZED edge list, where the
    two endpoint-degree marginals coincide (sum over u of deg(u) across
    incident edges), so one sa/saa pair serves both margins and the
    estimator reduces to (n*sab - sa^2) / (n*saa - sa^2).

    Sufficient statistics are exact: degrees are bigints; the
    second-order sums route through decimal(38,0) (HUGEINT on the
    oracle) — sum(d^2) over edges is degree-cubed-scale and would wrap
    a silent non-ANSI bigint on a hub-heavy graph (the Spearman
    lesson). Two equi-joins of the edge list against the node-sized
    degree table and one aggregate: edge-list-bounded, never
    quadratic."""
    und = query_cache(
        copurchase_pairs(order_items_raw(spark, sf_dir)).select(
            F.col("pa").alias("a"), F.col("pb").alias("b")
        )
    )
    ends = und.select(F.col("a").alias("pk")).unionAll(
        und.select(F.col("b").alias("pk"))
    )
    # deg is NODE-sized (one row per distinct part) — the same shape as
    # the cosine op's support table, and like it worth a probed
    # broadcast: a plain join here shuffled the 2x-edge sym list TWICE
    # against a table ~100x smaller. Above the cap the node table is
    # itself huge and the sort-merge join is right.
    deg = query_cache(
        ends.groupBy("pk").agg(F.count(F.lit(1)).alias("d"))
    )
    small_nodes = deg.limit(PAGERANK_BROADCAST_NODE_CAP).count() < (
        PAGERANK_BROADCAST_NODE_CAP
    )

    def _node_side(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small_nodes else df.hint("merge")

    # The symmetrized sums fold back onto the UNDIRECTED edge list
    # (sym is und + its flip, and every statistic is flip-symmetric):
    # n = 2E, sa = Σ(da+db), saa = Σ(da²+db²), sab = 2·Σ(da·db) — so
    # the edge list is scanned ONCE at half the rows, with no sym
    # union. Each identity is exact-integer; the double casts commute
    # with the ×2 (a power-of-two scale), so the emitted r is
    # bit-identical to the oracle's full-sym formulation.
    # sa/saa/sab are deg²-to-deg³ scale — all route through wide sums.
    da = deg.select(F.col("pk").alias("a"), F.col("d").alias("da_d"))
    db = deg.select(F.col("pk").alias("b"), F.col("d").alias("db_d"))
    joined = und.join(_node_side(da), "a").join(_node_side(db), "b")
    st = joined.agg(
        (F.count(F.lit(1)) * 2).cast("double").alias("n"),
        sum_wide(F.col("da_d") + F.col("db_d")).cast("double").alias("sa"),
        (
            sum_wide_product(F.col("da_d"), F.col("da_d"), check_in=joined)
            + sum_wide_product(F.col("db_d"), F.col("db_d"), check_in=joined)
        )
        .cast("double")
        .alias("saa"),
        (
            sum_wide_product(
                F.col("da_d"), F.col("db_d"), check_in=joined
            ).cast("double")
            * 2
        ).alias("sab"),
    )
    n, sa = F.col("n"), F.col("sa")
    r = (n * F.col("sab") - sa * sa) / (n * F.col("saa") - sa * sa)
    return st.select(
        (n / 2).cast("bigint").alias("n_edges"),
        F.round(r, 6).alias("degree_assortativity"),
    )


# k-core peeling: fixed unrolled rounds, same contract as the 3-iteration
# PageRank — a FIXED round count keeps the computation a pure dataflow
# the oracle can mirror as unrolled CTEs, and the emitted `converged`
# flag reports whether the fixpoint (the true k-core) was reached.
_KCORE_K = 3
_KCORE_ROUNDS = 8

# AS MATERIALIZED: each stage references its predecessor several times,
# and CTE inlining would otherwise expand the 8-stage chain into ~3^8
# scans of the base table (measured: "too many open files")
_KCORE_STAGE = """
d{i} AS MATERIALIZED (
  SELECT pk, COUNT(*) AS c FROM (
    SELECT a AS pk FROM e{prev} UNION ALL SELECT b FROM e{prev}
  ) GROUP BY 1
),
k{i} AS MATERIALIZED (SELECT pk FROM d{i} WHERE c >= {k}),
e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{prev} e
  JOIN k{i} x ON x.pk = e.a
  JOIN k{i} y ON y.pk = e.b
)"""

_KCORE_SQL = (
    f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
und AS (
  SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS w
  FROM li x
  JOIN li y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2
),
e0 AS MATERIALIZED (SELECT a, b FROM und WHERE w >= {_CC_MIN_W}),"""
    + ",".join(
        _KCORE_STAGE.format(i=i, prev=i - 1, k=_KCORE_K)
        for i in range(1, _KCORE_ROUNDS + 1)
    )
    + f"""
SELECT {_KCORE_K} AS k, {_KCORE_ROUNDS} AS rounds,
       (SELECT COUNT(*) FROM k{_KCORE_ROUNDS}) AS n_core_nodes,
       (SELECT COUNT(*) FROM e{_KCORE_ROUNDS}) AS n_core_edges,
       ((SELECT COUNT(*) FROM k{_KCORE_ROUNDS})
          = (SELECT COUNT(*) FROM k{_KCORE_ROUNDS - 1})
        AND (SELECT COUNT(*) FROM e{_KCORE_ROUNDS})
          = (SELECT COUNT(*) FROM e{_KCORE_ROUNDS - 1})) AS converged
"""
)


@register("graph_kcore_peel", _KCORE_SQL)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983; the
    Batagelj-Zaversnik loop distributed): repeatedly drop nodes with
    degree < k and the edges touching them — the surviving subgraph is
    the k-core, the standard cohesive-subgraph / spam-farm detector.
    Fixed 8 unrolled rounds (the PageRank contract: a pure
    dataflow the oracle mirrors stage for stage) with a `converged`
    flag comparing the last two rounds — True means the true fixpoint
    k-core was reached within the budget.

    Scale: each round is one degree aggregate plus two semi-join
    filters, all keyed on the node id; the edge set only ever SHRINKS,
    and each round is localCheckpointed so per-round cost stays flat
    (the star-components lesson: an unpersisted parent otherwise grows
    the lineage with the round number)."""
    und = signal_pairs(order_items_raw(spark, sf_dir), _CC_MIN_W)
    edges = und.select("pa", "pb").localCheckpoint(eager=True)
    prev_counts = None
    counts = None
    # early-exit once a round removes nothing: every later round is a
    # no-op, so the 8-round output is already in hand (identical to the
    # oracle's full unrolling) and converged is True by definition —
    # measured 9.8s -> ~4s at sf0.1 (the graph fixpoints in 2-3 rounds)
    for _ in range(_KCORE_ROUNDS):
        ends = edges.select(F.col("pa").alias("pk")).unionAll(
            edges.select(F.col("pb").alias("pk"))
        )
        # cache keep for the round: it feeds BOTH edge filters and the
        # node count — uncached, the count re-ran the degree aggregate
        # as its own job every round
        keep = (
            ends.groupBy("pk")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= _KCORE_K)
            .select("pk")
            .cache()
        )
        # node count = the KEPT node set (matches the oracle's k_i: a
        # kept node may lose its last edge this round yet still counts)
        n_keep = keep.count()
        edges = (
            edges.join(keep.withColumnRenamed("pk", "pa"), "pa")
            .join(keep.withColumnRenamed("pk", "pb"), "pb")
            .select("pa", "pb")
            .localCheckpoint(eager=True)
        )
        keep.unpersist()
        prev_counts = counts
        counts = (n_keep, edges.count())
        if counts == prev_counts:
            break
    converged = counts == prev_counts
    return spark.createDataFrame(
        [(_KCORE_K, _KCORE_ROUNDS, counts[0], counts[1], converged)],
        "k int, rounds int, n_core_nodes bigint, n_core_edges bigint, "
        "converged boolean",
    )


# ---------------------------------------------------------------------------
# Link prediction: Adamic-Adar over the co-purchase graph
# ---------------------------------------------------------------------------

# Skew cut for the Adamic-Adar wedge enumeration: a center of degree d
# fans out d*(d-1)/2 neighbor pairs, so one hub can dominate the whole
# stage. Centers past the cap are EXCLUDED (not truncated): their
# per-wedge contribution 1/ln(d) is already the smallest in the graph,
# and an exclusion (unlike a top-d truncation) keeps the score a pure
# function of the degree-capped graph — identically expressible in the
# oracle. Module constant so tests can force the cut.
AA_CENTER_DEGREE_CAP = 4096

# Affinity floor (the _CC_MIN_W / copurchase-cosine precedent): pairs
# that co-occur in a single order are noise edges, and for LINK
# PREDICTION they are fatal at scale — the w>=1 co-purchase graph is
# near-complete (sf0.1: avg degree 120 over 20k parts -> 148M wedges,
# ~100M distinct 2-hop pairs; measured 168s), while the w>=2 signal
# graph is 7k edges / 1.4k wedges at the same SF. Predicting links from
# repeated co-occurrence is also the semantically defensible contract.
AA_MIN_EDGE_WEIGHT = 2

_AA_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
und0 AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS w
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
und AS (SELECT pa, pb FROM und0 WHERE w >= {AA_MIN_EDGE_WEIGHT}),
edges AS (
  SELECT pa AS src, pb AS dst FROM und
  UNION ALL
  SELECT pb AS src, pa AS dst FROM und
),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
ctr AS (
  SELECT e.src, e.dst,
         CAST(ROUND(1e12 / LN(d.d), 0) AS BIGINT) AS u
  FROM edges e JOIN deg d ON d.src = e.src
  WHERE d.d >= 2 AND d.d <= {AA_CENTER_DEGREE_CAP}
),
aa AS (
  SELECT x.dst AS a, y.dst AS c, SUM(x.u) AS s
  FROM ctr x JOIN ctr y ON x.src = y.src AND x.dst < y.dst
  GROUP BY 1, 2
),
cand AS (
  SELECT aa.a, aa.c, aa.s
  FROM aa LEFT JOIN und ON und.pa = aa.a AND und.pb = aa.c
  WHERE und.pa IS NULL
)
SELECT a AS part_a, c AS part_b,
       ROUND(CAST(s AS DOUBLE) / 1e12, 6) AS aa_score
FROM cand
ORDER BY s DESC, a, c
LIMIT 20
"""


@register("graph_adamic_adar", _AA_SQL)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003): score every
    NON-edge pair (a, c) by sum over common neighbors b of 1/ln(deg(b))
    — low-degree shared neighbors are stronger evidence of a missing
    link than hubs — and return the top-20 predicted links.

    Scale shape: the graph is the REPEATED co-purchase graph
    (w >= AA_MIN_EDGE_WEIGHT — see constant note: the w>=1 graph is
    near-complete and its 2-hop closure is quadratic in parts; the
    signal graph's wedge volume is ~1e-5 of it at sf0.1). The wedge
    enumeration self-joins the center-keyed edge list on src (ONE
    shuffle on the high-cardinality center key) with the a < c ordering
    emitting each pair once; the degree attach routes through
    session.dim_side (node-sized, SF-linear — checked broadcast). Skew:
    hub centers are excluded past AA_CENTER_DEGREE_CAP (defense in
    depth behind the weight floor, since 1/ln(d) makes hub evidence
    negligible anyway), bounding per-center fan-out at cap². Determinism: contributions quantized to 1e-12
    units -> exact decimal sum (repo wide-sum convention; the final
    ranking orders on the EXACT integer sum, never a rounded double);
    ln() parity is the empirically-pinned SURVEY §7.5.2 contract.
    """
    from ibis_olap_aggregation_spark.session import dim_side

    und = query_cache(
        signal_pairs(order_items_raw(spark, sf_dir), AA_MIN_EDGE_WEIGHT).select(
            "pa", "pb"
        )
    )
    edges = und.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionAll(und.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # the center-keyed edge list is TRACKED-CACHED: the wedge
    # self-join's two sides are projections of the SAME frame, but
    # their differing aliases defeat ReuseExchange, so uncached each
    # side re-ran the union + degree join (Exchange 58/73 subtrees in
    # the before plan). The cache builds it once; the two src
    # exchanges remain (an AQE-wrapped cached plan does not expose its
    # output partitioning, so pre-partitioning inside the cache cannot
    # remove them — measured, not assumed).
    ctr = query_cache(
        # derived aggregate: cache on memo-miss so the probe's execution
        # feeds the wedge join instead of running twice (ADVICE r11 #4)
        edges.join(dim_side(deg, cache_if_probing=True), "src")
        .filter((F.col("d") >= 2) & (F.col("d") <= AA_CENTER_DEGREE_CAP))
        .select(
            "src",
            "dst",
            F.round(F.lit(1e12) / F.log("d"), 0).cast("bigint").alias("u"),
        )
    )
    x = ctr.select("src", F.col("dst").alias("a"), "u")
    y = ctr.select(F.col("src").alias("src_y"), F.col("dst").alias("c"))
    aa = (
        x.join(y, (F.col("src") == F.col("src_y")) & (F.col("a") < F.col("c")))
        .groupBy("a", "c")
        .agg(sum_wide(F.col("u")).alias("s"))
    )
    cand = aa.join(
        und,
        (F.col("a") == F.col("pa")) & (F.col("c") == F.col("pb")),
        "left_anti",
    )
    return (
        cand.orderBy(F.col("s").desc(), "a", "c")
        .limit(20)
        .select(
            F.col("a").alias("part_a"),
            F.col("c").alias("part_b"),
            F.round(F.col("s").cast("double") / 1e12, 6).alias("aa_score"),
        )
    )


_JACCARD_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
und0 AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS w
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
und AS (SELECT pa, pb FROM und0 WHERE w >= {AA_MIN_EDGE_WEIGHT}),
edges AS (
  SELECT pa AS src, pb AS dst FROM und
  UNION ALL
  SELECT pb AS src, pa AS dst FROM und
),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
ctr AS (
  SELECT e.src, e.dst FROM edges e JOIN deg ON deg.src = e.src
  WHERE deg.d <= {AA_CENTER_DEGREE_CAP}
),
common AS (
  SELECT x.dst AS a, y.dst AS c, COUNT(*) AS n_common
  FROM ctr x JOIN ctr y ON x.src = y.src AND x.dst < y.dst
  GROUP BY 1, 2
)
SELECT common.a AS part_a, common.c AS part_b,
       CAST(n_common AS BIGINT) AS n_common,
       CAST(da.d + dc.d - n_common AS BIGINT) AS union_size,
       ROUND(CAST(n_common AS DOUBLE) / (da.d + dc.d - n_common), 6)
         AS jaccard,
       4 * n_common >= da.d + dc.d AS strong_link
FROM common
JOIN deg da ON da.src = common.a
JOIN deg dc ON dc.src = common.c
ORDER BY 1, 2
"""


@register("graph_jaccard_neighbors", _JACCARD_SQL)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-set Jaccard similarity over the repeated-co-purchase
    signal graph: for every pair (a, c) sharing at least one non-hub
    common neighbor, |N(a) ∩ N(c)| / |N(a) ∪ N(c)| — the set-overlap
    complement to [graph_adamic_adar]'s weighted link prediction
    (same wedge machinery, unweighted intersection, full-degree
    union). Hub centers past AA_CENTER_DEGREE_CAP are excluded from
    the INTERSECTION count exactly as in adamic (a hub co-neighbor
    carries no similarity signal and its fan-out is the quadratic
    term); degrees in the union stay uncapped. strong_link flags
    J >= 1/3 via the exact integer cross-multiplication
    4*common >= da+dc (J = n/(da+dc-n) >= 1/3 iff 4n >= da+dc) — the
    float never decides membership.

    Scale shape: identical to adamic — one shuffle on the center key,
    per-center fan-out bounded at cap², degree attach through the
    probed dim_side, output ordered by the integer pair key (no float
    ranking)."""
    from ibis_olap_aggregation_spark.session import dim_side

    und = query_cache(
        signal_pairs(order_items_raw(spark, sf_dir), AA_MIN_EDGE_WEIGHT).select(
            "pa", "pb"
        )
    )
    edges = und.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionAll(und.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
    deg = query_cache(edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")))
    # same cached center frame as adamic (see there): the degree join
    # builds once instead of once per self-join side
    ctr = query_cache(
        edges.join(dim_side(deg, cache_if_probing=True), "src")
        .filter(F.col("d") <= AA_CENTER_DEGREE_CAP)
        .select("src", "dst")
    )
    x = ctr.select("src", F.col("dst").alias("a"))
    y = ctr.select(F.col("src").alias("src_y"), F.col("dst").alias("c"))
    common = (
        x.join(y, (F.col("src") == F.col("src_y")) & (F.col("a") < F.col("c")))
        .groupBy("a", "c")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    da = deg.select(F.col("src").alias("a"), F.col("d").alias("da"))
    dc = deg.select(F.col("src").alias("c"), F.col("d").alias("dc"))
    u = F.col("da") + F.col("dc") - F.col("n_common")
    return (
        common.join(dim_side(da, cache_if_probing=True), "a")
        .join(dim_side(dc, cache_if_probing=True), "c")
        .select(
            F.col("a").alias("part_a"),
            F.col("c").alias("part_b"),
            "n_common",
            u.alias("union_size"),
            F.round(F.col("n_common") / u, 6).alias("jaccard"),
            (4 * F.col("n_common") >= F.col("da") + F.col("dc")).alias(
                "strong_link"
            ),
        )
        .orderBy("part_a", "part_b")
    )
