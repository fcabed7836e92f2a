"""Hierarchical rollup: facts x closure join + one flat GROUP BY.

The flagship pattern of the reference (reference main.py:35-55): join
the fact table to the aggregation dim (transitive closure) on the
DESCENDANT's natural key, then group by ANCESTOR — every node of the
hierarchy gets correctly rolled-up measures, including non-additive
COUNT(DISTINCT), with zero recursion at query time.

Spark plan shape: Parquet scan (filters/columns pushed down) ->
broadcast hash join (closure is dim-sized) -> partial hash agg ->
shuffle on ``ancestor_node_id`` ONLY -> final hash agg -> broadcast
join of the node-attribute columns onto the per-node result ->
optional sort. Aggregating on the compact id and attaching the wide
string attributes (node_name, level_name, ...) AFTER the aggregate
matters at scale twice over: the broadcast side of the fact join
carries two columns instead of six, and the shuffle rows carry an
id instead of repeating every display string (measured 8.1s -> ~3s
for the sf0.1 part rollup's sums on local[32]). The closure is
broadcast by default; for hierarchies too large to broadcast, pass
``broadcast_dim=False`` (every dim attach becomes a sort-merge join —
plan-pinned broadcast-free) or ``"auto"`` (row-count probe against
CLOSURE_BROADCAST_ROW_CAP picks the regime).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hierarchical_rollup",
    "hierarchical_rollup_additive",
    "hierarchical_rollup_partials",
    "hierarchical_rollup_sketch",
    "merge_rollup_partials",
    "finalize_rollup_partials",
]

DEFAULT_GROUP_KEYS = (
    "ancestor_node_name",
    "ancestor_level_name",
    "ancestor_level_number",
    "ancestor_node_sort_order",
)

_ID = "ancestor_node_id"

# "auto" switches the closure join off broadcast past this many closure
# rows (closure rows ~ nodes x avg depth; 2M rows x ~32 B of key+id is
# ~64 MB serialized — at the practical broadcast ceiling). A module
# constant so tests can force either regime.
CLOSURE_BROADCAST_ROW_CAP = 2_000_000


def _resolve_broadcast(dim_slim: DataFrame, broadcast_dim) -> bool:
    """Resolve the join strategy for the rollup's dim-derived sides.

    True  -> broadcast hints (the default: closures are dim-sized).
    False -> SHUFFLE_MERGE hints: every dim attach in the rollup becomes
             a sort-merge join — the 10M-node-hierarchy path where the
             closure (nodes x depth rows) is past broadcast reach
             (SURVEY §7.3 design note; the reference's flagship closure
             join, ref main.py:36, at the scale the brief names).
    "auto" -> probe the closure row count once (one bounded count; dims
             are cached after build, so this reads the cache) and pick.
    """
    if broadcast_dim is True or broadcast_dim is False:
        return broadcast_dim
    if broadcast_dim == "auto":
        from .session import probe_small

        return probe_small(dim_slim, CLOSURE_BROADCAST_ROW_CAP)
    raise ValueError(f"broadcast_dim must be True, False or 'auto': {broadcast_dim!r}")


def _dim_side(df: DataFrame, bcast: bool) -> DataFrame:
    return F.broadcast(df) if bcast else df.hint("merge")


def hierarchical_rollup(
    facts: DataFrame,
    aggregation_dim: DataFrame,
    fact_key_col: str,
    measures: Sequence[Column],
    *,
    descendant_key_col: str = "descendant_node_natural_key",
    group_keys: Sequence[str] = DEFAULT_GROUP_KEYS,
    broadcast_dim: bool | str = True,
    sort: bool = True,
) -> DataFrame:
    """Roll facts up to every hierarchy node via the closure join.

    measures: already-aliased aggregate Columns, e.g.
    ``[F.sum("sales_amount").alias("sum_sales_amount"),
       F.countDistinct("customer_id").alias("distinct_customer_count")]``.

    Output columns: ``group_keys`` (those present in the dim) in the
    given order, then the measures.
    """
    dim = aggregation_dim
    keys = [k for k in group_keys if k in dim.columns]
    if _ID not in dim.columns or _ID in keys:
        # no compact id to pivot on (custom closure) — single wide groupBy
        dim_slim = dim.select(descendant_key_col, *keys)
        bcast = _resolve_broadcast(dim_slim, broadcast_dim)
        dim_slim = _dim_side(dim_slim, bcast)
        joined = facts.join(
            dim_slim, facts[fact_key_col] == dim_slim[descendant_key_col], "inner"
        )
        out = joined.groupBy(*keys).agg(*measures)
    else:
        # aggregate on the id, decorate after: the expanded fact only
        # ever carries (fact columns + ancestor_node_id)
        dim_slim = dim.select(descendant_key_col, _ID)
        bcast = _resolve_broadcast(dim_slim, broadcast_dim)
        dim_slim = _dim_side(dim_slim, bcast)
        joined = facts.join(
            dim_slim, facts[fact_key_col] == dim_slim[descendant_key_col], "inner"
        )
        per_node = joined.groupBy(_ID).agg(*measures)
        # one attribute row per node: the closure's self-pairs are unique
        # per ancestor; fall back to distinct when net_level is absent.
        # attrs is node-sized (smaller than the closure by the depth
        # factor) but follows the same regime: past broadcast reach for
        # the closure usually means a 10M-node attr table too.
        if "net_level" in dim.columns:
            attrs = dim.filter(F.col("net_level") == 0).select(_ID, *keys)
        else:
            attrs = dim.select(_ID, *keys).distinct()
        out = per_node.join(_dim_side(attrs, bcast), _ID).select(
            *keys, *[c for c in per_node.columns if c != _ID]
        )
    if sort and "ancestor_node_sort_order" in keys:
        # the result is dim-sized (one row per hierarchy node), so a
        # single-partition sort is right at any fact scale — and unlike
        # a global orderBy it needs no range-sampling pass, which would
        # execute the whole aggregation subplan a second time (measured
        # 14.3s -> 9.8s on the sf0.1 part rollup). repartition(1), not
        # coalesce(1): the shuffle boundary keeps the aggregation
        # parallel upstream.
        out = out.repartition(1).sortWithinPartitions("ancestor_node_sort_order")
    return out


def hierarchical_rollup_additive(
    facts: DataFrame,
    aggregation_dim: DataFrame,
    fact_key_col: str,
    *,
    sum_cols: Sequence[tuple[str, str]] = (),
    count_alias: str | None = None,
    distinct_cols: Sequence[tuple[str, str]] = (),
    descendant_key_col: str = "descendant_node_natural_key",
    group_keys: Sequence[str] = DEFAULT_GROUP_KEYS,
    broadcast_dim: bool | str = True,
    sort: bool = True,
    keep_node_id: bool = False,
) -> DataFrame:
    """Closure rollup for STRUCTURED measures, aggregated at leaf grain
    first — the 100 TB shape of :func:`hierarchical_rollup`.

    The generic function expands every fact row by its ~depth ancestors
    before the first shuffle, so the shuffle carries |facts| x depth
    rows. Declaring the measure structure lets the plan exploit
    decomposability instead:

    - additive measures (``sum_cols``, decimal-exact pre-aggregate, and
      ``count_alias``) collapse to ONE partial row per leaf key before
      the closure join — the shuffle carries |leaf keys| x depth rows,
      independent of fact count (measured 5.9s -> 2.0s on the sf0.1
      part rollup; at 1000x facts the leaf-partial table is unchanged).
    - exact COUNT(DISTINCT) (``distinct_cols``) is not additive, but its
      (leaf key, value) pairs dedup AT FACT GRAIN with map-side combine
      before expanding — the expansion input shrinks to the distinct
      pair count and the heavy double-shuffle Expand plan Spark uses
      for countDistinct-with-other-aggs disappears (each branch is a
      single-purpose aggregate).

    Branches join back on the compact node id (dim-sized, broadcast).
    Results are bit-identical to the generic path: decimal partial sums
    re-summed are associativity-proof, and distinct-of-distinct is
    distinct. Measures referencing multiple columns or non-decomposable
    aggregates stay on :func:`hierarchical_rollup`.
    """
    dim = aggregation_dim
    keys = [k for k in group_keys if k in dim.columns]
    if _ID not in dim.columns or _ID in keys:
        raise ValueError(
            "hierarchical_rollup_additive requires the closure's "
            f"{_ID} column — use hierarchical_rollup for custom closures"
        )
    dim_slim = dim.select(descendant_key_col, _ID)
    bcast = _resolve_broadcast(dim_slim, broadcast_dim)
    dim_slim = _dim_side(dim_slim, bcast)

    branches: list[DataFrame] = []
    if sum_cols or count_alias:
        partial_aggs = [
            F.sum(F.col(c).cast("decimal(18,2)")).alias(f"_p_{a}")
            for c, a in sum_cols
        ]
        if count_alias:
            partial_aggs.append(F.count(F.lit(1)).alias("_p_n"))
        leaf = facts.groupBy(fact_key_col).agg(*partial_aggs)
        rolled = [
            F.sum(f"_p_{a}").cast("double").alias(a) for _, a in sum_cols
        ]
        if count_alias:
            rolled.append(F.sum("_p_n").alias(count_alias))
        branches.append(
            leaf.join(
                dim_slim, leaf[fact_key_col] == dim_slim[descendant_key_col]
            )
            .groupBy(_ID)
            .agg(*rolled)
        )
    for c, a in distinct_cols:
        pair_cols = [fact_key_col] if c == fact_key_col else [fact_key_col, c]
        pairs = facts.select(*pair_cols).distinct()
        branches.append(
            pairs.join(
                dim_slim, pairs[fact_key_col] == dim_slim[descendant_key_col]
            )
            .groupBy(_ID)
            .agg(F.countDistinct(c).alias(a))
        )
    if not branches:
        raise ValueError("no measures declared")
    per_node = branches[0]
    for b in branches[1:]:
        # branch merges are node-sized x node-sized; they follow the
        # closure's regime so the non-broadcast plan has no broadcast
        # anywhere (every side is dim-derived)
        per_node = per_node.join(b if bcast else b.hint("merge"), _ID)

    if "net_level" in dim.columns:
        attrs = dim.filter(F.col("net_level") == 0).select(_ID, *keys)
    else:
        attrs = dim.select(_ID, *keys).distinct()
    # keep_node_id=True retains the compact node id for consumers that
    # self-join the rolled table (share-of-parent, drill paths)
    out = per_node.join(_dim_side(attrs, bcast), _ID).select(
        *([_ID] if keep_node_id else []),
        *keys,
        *[c for c in per_node.columns if c != _ID],
    )
    if sort and "ancestor_node_sort_order" in keys:
        out = out.repartition(1).sortWithinPartitions("ancestor_node_sort_order")
    return out


def hierarchical_rollup_sketch(
    facts: DataFrame,
    aggregation_dim: DataFrame,
    fact_key_col: str,
    distinct_col: str,
    *,
    lgk: int = 12,
    group_keys: Sequence[str] = DEFAULT_GROUP_KEYS,
    descendant_key_col: str = "descendant_node_natural_key",
    out: str = "approx_distinct",
) -> DataFrame:
    """Distinct-count rollup via MERGEABLE HLL sketches at leaf grain —
    the sketch-cube form of the flagship for hierarchies where even the
    dedup-at-leaf-grain exact path (`hierarchical_rollup_additive`) is
    too heavy: one sketch per leaf key (fact shuffle at leaf grain,
    map-side combined), then the closure join ships CONSTANT-size
    binaries (~2^lgk bytes) instead of distinct value sets, and
    `hll_union_agg` merges them per ancestor.

    HLL union at fixed lgk is LOSSLESS w.r.t. sketching the merged set
    directly, so every ancestor's estimate is bit-identical to what a
    per-ancestor re-scan would produce (pinned in tests/
    test_sketches.py::test_hierarchical_sketch_rollup_equals_direct) —
    the pre-aggregated leaf sketches can be stored and re-rolled to any
    grain without touching facts again. Estimates carry the standard
    HLL error (~1.04/sqrt(2^lgk)); exact paths remain the default."""
    dim = aggregation_dim
    keys = [k for k in group_keys if k in dim.columns]
    leaf = facts.groupBy(fact_key_col).agg(
        F.expr(f"hll_sketch_agg({distinct_col}, {lgk})").alias("_sk")
    )
    dim_slim = dim.select(descendant_key_col, _ID)
    dim_slim = _dim_side(dim_slim, _resolve_broadcast(dim_slim, "auto"))
    per_node = (
        leaf.join(dim_slim, leaf[fact_key_col] == dim_slim[descendant_key_col])
        .groupBy(_ID)
        .agg(F.expr("hll_union_agg(_sk)").alias("_u"))
    )
    if "net_level" in dim.columns:
        attrs = dim.filter(F.col("net_level") == 0).select(_ID, *keys)
    else:
        attrs = dim.select(_ID, *keys).distinct()
    return per_node.join(_dim_side(attrs, _resolve_broadcast(attrs, "auto")), _ID).select(
        *keys, F.expr("hll_sketch_estimate(_u)").alias(out)
    )


# ---------------------------------------------------------------------------
# Incremental maintenance: mergeable per-node partials
# ---------------------------------------------------------------------------
#
# The materialized-view form of the flagship rollup. A 100 TB fact table
# grows by appends; recomputing every node's totals from scratch per
# batch rescans the world. Additive measures decompose instead:
#
#     partials(base ∪ delta) == merge(partials(base), partials(delta))
#
# so the steady state is: keep ONE node-sized partial table (exact
# decimals, never the lossy double rendering), and per batch aggregate
# ONLY the delta (|delta leaf keys| x depth shuffle rows) and merge —
# cost is independent of the base fact count. `finalize` renders the
# partial table to the same shape/types the one-shot rollup emits, and
# the registry query `hierarchy_rollup_incremental` pins
# merge-then-finalize bit-equal to a full recompute via the DuckDB
# oracle over the WHOLE fact table.
#
# COUNT(DISTINCT) is deliberately absent here: it is not additive, and
# pretending otherwise is how incremental cubes go wrong. Its exact
# incremental form is the (leaf key, value) pair table
# (hierarchical_rollup_additive's dedup-at-fact-grain input, itself
# mergeable by union+distinct) or the mergeable-sketch path
# (hierarchical_rollup_sketch — HLL unions are the textbook
# incremental distinct).


def hierarchical_rollup_partials(
    facts: DataFrame,
    aggregation_dim: DataFrame,
    fact_key_col: str,
    *,
    sum_cols: Sequence[tuple[str, str]] = (),
    count_alias: str | None = None,
    descendant_key_col: str = "descendant_node_natural_key",
    broadcast_dim: bool | str = True,
) -> DataFrame:
    """Per-node ADDITIVE partials for a batch of facts: one row per
    ancestor_node_id carrying exact-decimal sums (decimal(38,2) — no
    double cast, so merged partials re-sum associativity-proof) and the
    contributing fact count. Same leaf-grain pre-aggregation as
    hierarchical_rollup_additive: the closure join and shuffle see one
    row per leaf key, not per fact."""
    if not sum_cols and not count_alias:
        raise ValueError("no measures declared")
    dim_slim = aggregation_dim.select(descendant_key_col, _ID)
    dim_slim = _dim_side(dim_slim, _resolve_broadcast(dim_slim, broadcast_dim))
    partial_aggs = [
        F.sum(F.col(c).cast("decimal(18,2)")).alias(a) for c, a in sum_cols
    ]
    if count_alias:
        partial_aggs.append(F.count(F.lit(1)).alias(count_alias))
    leaf = facts.groupBy(fact_key_col).agg(*partial_aggs)
    rolled = [
        F.sum(a).cast("decimal(38,2)").alias(a) for _, a in sum_cols
    ]
    if count_alias:
        rolled.append(F.sum(count_alias).cast("bigint").alias(count_alias))
    return (
        leaf.join(dim_slim, leaf[fact_key_col] == dim_slim[descendant_key_col])
        .groupBy(_ID)
        .agg(*rolled)
    )


def merge_rollup_partials(
    partials: Sequence[DataFrame],
    *,
    sum_aliases: Sequence[str] = (),
    count_alias: str | None = None,
) -> DataFrame:
    """Merge per-node partial tables (union + re-sum per node). Nodes
    absent from a batch (no facts under them) are simply absent from
    that batch's partials — union semantics handle sparsity for free.
    Exact: decimal + bigint sums are associative/commutative, so any
    merge tree (per-batch, pairwise, all-at-once) yields identical
    bits. The shuffle is node-table-sized regardless of how many
    batches merged."""
    if not partials:
        raise ValueError("no partials to merge")
    merged = partials[0]
    for p in partials[1:]:
        merged = merged.unionByName(p)
    aggs = [F.sum(a).cast("decimal(38,2)").alias(a) for a in sum_aliases]
    if count_alias:
        aggs.append(F.sum(count_alias).cast("bigint").alias(count_alias))
    return merged.groupBy(_ID).agg(*aggs)


def finalize_rollup_partials(
    merged: DataFrame,
    aggregation_dim: DataFrame,
    *,
    sum_aliases: Sequence[str] = (),
    group_keys: Sequence[str] = DEFAULT_GROUP_KEYS,
    sort: bool = True,
) -> DataFrame:
    """Render a merged partial table to the one-shot rollup's output
    shape: decorate node attributes (one row per node — broadcast under
    the closure cap, sort-merge past it, probed like every dim attach),
    cast the exact-decimal sums to the presentation double, sort by the
    hierarchy's display order. Keeping this a separate step is the
    point: the STORED partials stay exact and mergeable; only the
    query-time view pays the lossy cast."""
    dim = aggregation_dim
    keys = [k for k in group_keys if k in dim.columns]
    if "net_level" in dim.columns:
        attrs = dim.filter(F.col("net_level") == 0).select(_ID, *keys)
    else:
        attrs = dim.select(_ID, *keys).distinct()
    out = merged.join(_dim_side(attrs, _resolve_broadcast(attrs, "auto")), _ID).select(
        *keys,
        *[
            (F.col(c).cast("double").alias(c) if c in sum_aliases else F.col(c))
            for c in merged.columns
            if c != _ID
        ],
    )
    if sort and "ancestor_node_sort_order" in keys:
        out = out.repartition(1).sortWithinPartitions("ancestor_node_sort_order")
    return out
