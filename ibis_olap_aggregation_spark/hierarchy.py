"""Hierarchy dimension engine: adjacency list -> reporting dim + closure.

Spark-first reimplementation of the reference's ``HierarchyDimension``
(reference classes/hierarchy_dimension_table.py:46-223), which generates
two DuckDB recursive CTEs. Differences by design:

- ONE depth-bounded iterative walk (plain broadcast-join + union per
  level) materializes each node's root-to-self path as
  ``array<struct>``; the transitive closure ("aggregation dim") is then
  derived by ``posexplode`` of that path — the reference's *second*
  recursive CTE (ref :167-223) is unnecessary.
- Sibling order is DETERMINISTIC: a sort-key path (array of the sibling
  sort key at each level) replaces the reference's ``row_number`` over a
  stringified UUID path (ref :133-139), which is non-deterministic per
  build and a single-partition window besides. The dense
  ``node_sort_order`` integer is computed scalably (range-partition +
  per-partition row_number + offsets), not with a global window.
- Cycle/orphan semantics (uniform across strategies): a cycle in
  parent_node_id can never be root-reachable (every node has ONE parent
  pointer, so walking down from roots cannot enter a cycle) — cycles are
  always detached islands. Builds with ``materialize=True`` detect them
  (reached-count check + chain classification) and raise ValueError;
  orphan subtrees (parent id absent from the table) are dropped
  silently, matching the reference CTE's start-at-roots semantics.
  Over-deep hierarchies raise instead of looping forever.

Output column contract mirrors the reference:

reporting dim (ref :156-160): node_id, <attr columns...>,
  parent_node_id, is_root, is_leaf, level_number, node_sort_order,
  node_json struct, level_{i}_{col} flattened path columns.
aggregation dim / closure (ref :197-218): ancestor_<col> +
  descendant_<col> for every reporting column except parent_node_id and
  the struct/path columns, plus net_level = descendant_level_number -
  ancestor_level_number. Self-pairs included (net_level = 0).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ibis_olap_aggregation_spark.operators.ranking import global_row_number
from ibis_olap_aggregation_spark.session import dim_side

__all__ = ["HierarchyDimension", "prepare_nodes"]

_INTERNAL_COLS = ("node_json", "node_json_path", "_sort_path")


def _known_size_side(df: DataFrame, n_rows: int | None) -> DataFrame:
    """dim_side twin for sides whose row count is ALREADY KNOWN (e.g.
    bounded by a completed driver-local walk): applies the same
    cap-based regime decision — broadcast under ``DIM_BROADCAST_ROW_CAP``
    (read at call time so forced-regime tests still flip paths), merge
    hint at/above it — without the probe's count job. Falls back to the
    probing ``dim_side`` when the count is unknown."""
    from ibis_olap_aggregation_spark import session as _session

    if n_rows is None:
        return dim_side(df)
    if n_rows < _session.DIM_BROADCAST_ROW_CAP:
        return F.broadcast(df)
    return df.hint("merge")


def prepare_nodes(
    nodes: DataFrame,
    node_id_col: str = "node_id",
    parent_node_id_col: str = "parent_node_id",
    *,
    with_leaf: bool = True,
    known_rows: int | None = None,
) -> DataFrame:
    """Normalize an adjacency-list dimension (ref :83-96).

    Renames the id columns to ``node_id`` / ``parent_node_id``, keeps all
    other columns as node attributes, and derives:

    - ``is_root``: parent id IS NULL (ref :89-90)
    - ``is_leaf`` (when ``with_leaf``): node id never appears as anyone's
      parent — the reference uses ``NOT IN (subquery)`` (ref :91-93); we
      use a left-anti join against the distinct parent ids, which
      Catalyst plans as a (broadcast) anti hash join instead of a
      correlated subquery. ``with_leaf=False`` skips the distinct+join
      (a full shuffle of the node table) for consumers that compute the
      flag themselves — the driver-local walk derives it from the same
      collected rows for free.

    ``known_rows``: pass an already-known node count to resolve the
    leaf join's regime without the bounded count-probe job (the probe
    cost one Spark job per dim build even when the prepared frame was
    never executed — the local-walk path knows the count from its own
    fetch).
    """
    attrs = [c for c in nodes.columns if c not in (node_id_col, parent_node_id_col)]
    df = nodes.select(
        F.col(node_id_col).alias("node_id"),
        *attrs,
        F.col(parent_node_id_col).alias("parent_node_id"),
    ).withColumn("is_root", F.col("parent_node_id").isNull())
    if not with_leaf:
        return df
    parents = (
        df.filter(F.col("parent_node_id").isNotNull())
        .select(F.col("parent_node_id").alias("node_id"))
        .distinct()
        .withColumn("_is_parent", F.lit(True))
    )
    # one node-sized left join marks interior nodes; unmatched = leaves
    # (bounded probe: broadcast for ordinary dims, sort-merge past the
    # cap — a 10M-node hierarchy's parent set is past broadcast reach)
    return (
        df.join(_known_size_side(parents, known_rows), "node_id", "left")
        .withColumn("is_leaf", F.col("_is_parent").isNull())
        .drop("_is_parent")
    )


class HierarchyDimension:
    """Build reporting + aggregation (closure) dims from an adjacency list.

    Parameters
    ----------
    nodes : DataFrame with one row per node.
    node_id_col / parent_node_id_col : adjacency columns (self-FK).
    sort_key_col : column ordering SIBLINGS deterministically. Defaults
        to ``node_natural_key`` when present else the node id. (The
        reference orders by stringified UUID paths — non-deterministic;
        SURVEY.md §7.5.1.)
    max_depth : recursion guard; a frontier still non-empty at this
        depth (cycle, or genuinely deeper) raises ValueError.
    flatten_levels : number of ``level_{i}_*`` column groups in the
        reporting dim (the reference hardcodes 10; ref :147).
    materialize : cache the walk result (it feeds both dims), mirroring
        the reference's CTAS-then-reread (ref :162-173).
    strategy : ``"local"`` = driver-side DFS, bounded at 250k nodes —
        dimension hierarchies are dim-sized, and below that bound every
        distributed walk pays per-round job-scheduling costs that dwarf
        the actual pointer chasing; ``"doubling"`` = pointer-jumping
        path doubling, O(log depth) self-joins — ceil(log2 depth)+1
        rounds regardless of node count, each round localCheckpointed so
        the plan stays O(1); ``"cte"`` = Spark >= 4.0 native WITH
        RECURSIVE — the whole walk is ONE query (one scheduling
        round-trip per build) but O(depth) internal iterations;
        ``"iterative"`` = portable driver loop, one join+union per level
        (the path for engines without recursive CTEs). ``"auto"`` =
        local when the (materialized) node count is under the bound,
        else doubling — measured on local[32] doubling wins at BOTH
        distributed ends: 4.6s vs 14.7s (cte) on a 15k-node depth-4 geo
        dim at sf0.1, and 7.7s vs 46.8s (cte) on a 65k-node depth-16
        binary tree, because wall time is dominated by scheduling rounds
        and re-analysis. All four produce identical output
        (agreement-tested).
    """

    def __init__(
        self,
        nodes: DataFrame,
        node_id_col: str = "node_id",
        parent_node_id_col: str = "parent_node_id",
        *,
        dimension_name: str = "dim",
        sort_key_col: str | None = None,
        max_depth: int = 32,
        flatten_levels: int = 10,
        materialize: bool = True,
        strategy: str = "auto",
        compute_sort_order: bool = True,
    ):
        self.dimension_name = dimension_name
        self.max_depth = max_depth
        self.flatten_levels = flatten_levels
        self.strategy = strategy
        # compute_sort_order=False skips the ranking passes entirely
        # (node_sort_order comes back NULL): rollup correctness never
        # depends on display order, so pure-aggregation consumers of big
        # dims shouldn't pay the extra count/sample/shuffle rounds.
        self.compute_sort_order = compute_sort_order
        self._nodes_base = None
        self._n_nodes: int | None = None
        self._local_rows = None
        self._walked_local_count: int | None = None
        # compact-path artifacts of the columnar local walk (r14): the
        # checkpointed frame with integer ancestor-index paths and the
        # single-row broadcast attribute table. When set, the closure and
        # reporting builders read THESE directly — one element_at per
        # ancestor reference — instead of re-assembling the full
        # node_json_path struct array per walked row only to explode or
        # index it (measured 0.35 -> 2.59s on the 983k-pair deep-binary
        # closure when the explode ran over the reconstructing view).
        self._compact = None
        self._attr_row = None
        if materialize and strategy in ("auto", "local"):
            # ONE bounded collect doubles as the size probe and the
            # local-walk input: dim-sized tables (the common case) never
            # pay a cache-fill + count + repartition round-trip at all.
            # The collect reads the NARROW prepared form (no is_leaf
            # anti-join — that's a distinct+shuffle of the node table)
            # and derives both flags on the driver from the same rows.
            narrow = prepare_nodes(
                nodes, node_id_col, parent_node_id_col, with_leaf=False
            )
            # Size guard WITHOUT a job: the optimizer's sizeInBytes
            # estimate (parquet file sizes for scans) bounds what a
            # direct Arrow fetch can pull to the driver. Under the bound
            # we fetch immediately and use len() as the row probe — one
            # job total. (A count-then-fetch runs the node-table plan
            # twice — measured 1.6s extra per sf0.1 geo build; a bounded
            # limit().collect() is worse still: CollectLimit's serial
            # scale-up rounds measured 3.1s.) The fast path is gated
            # THREE ways — the estimate must exist, must be produced by
            # a plan whose default size estimation cannot UNDER-estimate
            # (no Generate/Join/Window/Expand: e.g. Generate reports its
            # pre-explosion child size, so an exploded node table looks
            # tiny), and must imply a ROW count under the walk limit at
            # a conservative per-row width (on-disk bytes vastly
            # understate in-memory Python row cost: a narrow 2-column
            # table near the byte bound alone can be tens of millions
            # of rows). Anything else counts first — one extra job, only
            # for inputs that were never dim-shaped to begin with.
            n = None
            fetch_direct = False
            if self._plan_estimate_is_safe(narrow):
                try:
                    approx_bytes = int(
                        narrow._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
                    )
                except Exception:  # noqa: BLE001 - stats unavailable (e.g. connect)
                    approx_bytes = None
                if approx_bytes is not None and approx_bytes <= self._LOCAL_FETCH_MAX_BYTES:
                    est_rows = approx_bytes // self._est_row_width(narrow.schema)
                    fetch_direct = est_rows <= self._LOCAL_WALK_LIMIT
            if not fetch_direct:
                n = narrow.count()
            if n is None or n <= self._LOCAL_WALK_LIMIT:
                tbl = self._fetch_local_table(narrow)
                if tbl is not None and tbl.num_rows <= self._LOCAL_WALK_LIMIT:
                    # columnar is_leaf derivation — single-column
                    # to_pylist, no per-row dicts (guide §4)
                    import pyarrow as pa

                    pid = tbl.column("parent_node_id").to_pylist()
                    nid = tbl.column("node_id").to_pylist()
                    pset = {p for p in pid if p is not None}
                    self._local_rows = tbl.append_column(
                        "is_leaf", pa.array([v not in pset for v in nid], pa.bool_())
                    )
                    self._n_nodes = tbl.num_rows
                elif tbl is None:
                    dicts = self._fetch_local(narrow)
                    if len(dicts) <= self._LOCAL_WALK_LIMIT:
                        parent_ids = {
                            d["parent_node_id"]
                            for d in dicts
                            if d["parent_node_id"] is not None
                        }
                        for d in dicts:
                            d["is_leaf"] = d["node_id"] not in parent_ids
                        self._local_rows = dicts
                        self._n_nodes = len(dicts)
                    else:
                        dicts = None  # larger than the bound: distributed walk
        # prepared AFTER the local-fetch block so that when the walk is
        # local the leaf join's regime resolves from the just-learned
        # node count instead of a probe job (the probe ran at
        # construction even though the prepared frame is never executed
        # on the local path — one count job per dim build, measured
        # ~0.7s on the sf0.1 geo build). The walk re-joins nodes once
        # per level on the distributed paths, and derived node tables
        # (e.g. DISTINCT-built brand/type levels) would otherwise
        # re-shuffle on every iteration — hence the cache below.
        self.nodes = prepare_nodes(
            nodes, node_id_col, parent_node_id_col, known_rows=self._n_nodes
        )
        if materialize and self._local_rows is None:
            # distributed path: cache the (possibly expensive)
            # source-derived node table while we count it; released after
            # the walk is materialized (the repartitioned cache takes over)
            self._nodes_base = self.nodes.cache()
            # Size the walk's parallelism to the DIMENSION, not to the
            # partitioning the source scans happened to leave behind:
            # each recursion level is a job over these partitions, so a
            # 15k-node dim spread over 32+ scan partitions pays pure
            # task-scheduling overhead per level (measured 2.4x slower).
            # ~250k nodes/partition, floor 4 (cluster-safe: dims are
            # dim-sized), cap at the session shuffle width.
            n = self._nodes_base.count()  # also materializes the cache
            self._n_nodes = n
            cap = int(
                self.nodes.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
            )
            parts = min(cap, max(4, n // 250_000 + 1))
            self.nodes = self._nodes_base.repartition(parts).cache()
        if sort_key_col is None:
            sort_key_col = (
                "node_natural_key" if "node_natural_key" in self.nodes.columns else "node_id"
            )
        self.sort_key_col = sort_key_col
        # struct carries every nodes column (ref _create_struct_literal
        # iterates the nodes query's columns; ref :25-43,102-109)
        self._struct_cols = list(self.nodes.columns)

        strat = strategy
        if strat == "auto":
            # dim-sized node tables walk on the DRIVER: a 1.5k-node geo
            # dim costs ~4.5s of pure job-scheduling overhead through the
            # distributed walk (3+ self-join rounds, each an eager
            # checkpoint + isEmpty probe) vs milliseconds of BFS. Same
            # bounded-driver-compute pattern as the union-find probe in
            # dedup: explicit row limit, distributed path above it.
            strat = "local" if self._local_rows is not None else "doubling"
        walkers = {
            "cte": self._walk_cte,
            "iterative": self._walk,
            "doubling": self._walk_doubling,
            "local": self._walk_local,
        }
        self._walked = walkers[strat]()
        if materialize:
            if self._walked_local_count is not None:
                # the local walk already knows its row count AND is
                # eagerly checkpointed (executor-side blocks) — a
                # cache()+count() on top would re-scan and double-store
                walked_n = self._walked_local_count
            else:
                self._walked = self._walked.cache()
                walked_n = self._walked.count()  # materialize; enables reach check
            if self._nodes_base is not None:
                self._nodes_base.unpersist()
                self._nodes_base = None
            if walked_n < (self._n_nodes or 0):
                # some nodes never reached a root: orphan subtrees are
                # dropped silently (reference CTE semantics); a cycle is
                # data corruption and raises
                self._classify_unreached()
        self.reporting_dim = self._build_reporting_dim()
        self.aggregation_dim = self._build_aggregation_dim()
        if materialize:
            # dims are ETL artifacts queried many times (the reference
            # CTAS-materializes both; ref :162,220) — without this every
            # consumer re-runs the path-explode + sort-order join
            self.reporting_dim = self.reporting_dim.cache()
            self.aggregation_dim = self.aggregation_dim.cache()

    # -- unreached-node classification (cycle vs orphan) -----------------
    _UNREACHED_DRIVER_LIMIT = 100_000
    _PEEL_MAX_ROUNDS = 200
    _LOCAL_WALK_LIMIT = 250_000  # driver BFS above this is a collect() smell
    # plan-stats bound for fetching the node table without a count probe:
    # 512 MB of estimated input is far above any dim-sized table and far
    # below anything that could hurt a driver
    _LOCAL_FETCH_MAX_BYTES = 512 * 1024 * 1024

    @staticmethod
    def _plan_estimate_is_safe(df: DataFrame) -> bool:
        """True when the optimized plan contains no operator whose
        default (non-CBO) size estimation can UNDER-estimate output.
        Scan/Project/Filter/Union/Aggregate estimates are conservative
        (file sizes, width scaling, no selectivity discounts), but
        Generate reports its pre-explosion child size, and Join/Window/
        Expand estimates are similarly untrustworthy — a fetch gated on
        them is unbounded. Unreadable plans count as unsafe."""
        import re as _re

        try:
            plan = df._jdf.queryExecution().optimizedPlan().toString()
        except Exception:  # noqa: BLE001 - plan unavailable (e.g. connect)
            return False
        return not _re.search(r"\b(Join|Generate|Window|Expand)\b", plan)

    @staticmethod
    def _est_row_width(schema) -> int:
        """Conservatively SMALL per-row byte width (strings/nested at 20,
        scalars at 8): dividing the plan's size estimate by it biases the
        row estimate HIGH, which can only route a fetch to the count
        probe, never skip the guard."""
        width = 0
        for f in schema.fields:
            s = f.dataType.simpleString()
            width += 20 if (s == "string" or "<" in s) else 8
        return max(width, 8)

    @staticmethod
    def _fetch_local(df: DataFrame) -> list[dict]:
        """Fetch a (pre-bounded) node table to driver dicts via Arrow —
        one parallel job; falls back to row collect for types Arrow
        can't convert."""
        try:
            return df.toArrow().to_pylist()
        except Exception:  # noqa: BLE001 - exotic type unsupported by Arrow
            return [r.asDict(recursive=False) for r in df.collect()]

    @staticmethod
    def _fetch_local_table(df: DataFrame):
        """Fetch a (pre-bounded) node table as a driver Arrow TABLE —
        the columnar fast path's input (no per-row dict construction at
        all; guide §4). None for types Arrow can't convert — callers
        fall back to the dict fetch + dict walk."""
        try:
            return df.toArrow()
        except Exception:  # noqa: BLE001 - exotic type unsupported by Arrow
            return None

    # -- stage 1d: driver-local walk for dim-sized node tables -----------
    def _walk_local(self) -> DataFrame:
        """Driver-side DFS producing the identical walked schema
        (attrs + level_number + node_json_path + _sort_path +
        node_sort_order).

        Dimension hierarchies are dim-sized by definition; under
        ``_LOCAL_WALK_LIMIT`` nodes the adjacency list fits trivially in
        driver memory and the walk is pointer chasing — every distributed
        strategy pays per-ROUND scheduling costs that dwarf it. Two
        further constants fall out for free:

        - siblings are visited in sort-key order, so the DFS preorder IS
          the dense depth-first rank — ``node_sort_order`` is a counter,
          and the distributed 3-pass ranker (count + per-partition rank +
          offset join) is skipped entirely;
        - rows ship to the JVM as ONE Arrow table
          (``pa.Table.from_pylist`` against the exact Spark schema) —
          measured 2.8s vs 10.4s for the pickle path on the 65k-node
          binary tree, whose paths hold ~1M struct entries.

        Output parallelism is restored via createDataFrame (the dims
        derived from it are joined/broadcast exactly as with the other
        walkers). Orphans are dropped (start-at-roots semantics) and
        cycles are left unreached for the uniform reach-check to
        classify; depth overflow raises the same error as every other
        strategy.
        """
        rows = self._local_rows
        if rows is None:
            if self.nodes.count() > self._LOCAL_WALK_LIMIT:
                raise ValueError(
                    f"strategy='local' is bounded at {self._LOCAL_WALK_LIMIT} "
                    "nodes — use 'doubling' (or 'auto') for larger hierarchies"
                )
            # self.nodes (prepared WITH is_leaf) feeds either path
            rows = self._fetch_local_table(self.nodes)
            if rows is None:
                rows = self._fetch_local(self.nodes)
        self._local_rows = None  # walked carries the data from here on
        if not isinstance(rows, list):
            if rows.num_rows > 0:
                return self._walk_local_columnar(rows)
            rows = rows.to_pylist()  # empty table: trivial dict path
        cols = self._struct_cols
        sort_key = self.sort_key_col
        children: dict = {}
        roots = []
        for r in rows:
            d = r if isinstance(r, dict) else r.asDict(recursive=False)
            if d["is_root"]:
                roots.append(d)
            else:
                children.setdefault(d["parent_node_id"], []).append(d)

        # sibling order = the ranker's lexicographic-_sort_path order:
        # nulls first (Spark ASC semantics), then key, node_id tiebreak
        def skey(d):
            v = d[sort_key]
            return (v is not None, v, d["node_id"]) if v is not None else (False,)

        roots.sort(key=skey)
        for lst in children.values():
            lst.sort(key=skey)
        rank = self.compute_sort_order
        out: list[dict] = []
        # iterative DFS (explicit stack: no recursion limit on deep chains)
        stack = [(d, 1, (), ()) for d in reversed(roots)]
        while stack:
            d, level, path, sort_path = stack.pop()
            if level > self.max_depth:
                raise ValueError(
                    f"hierarchy deeper than max_depth={self.max_depth} "
                    "(raise max_depth)"
                )
            entry = {c: d[c] for c in cols}
            entry["level_number"] = level
            path = path + (entry,)
            sort_path = sort_path + (d[sort_key],)
            row = {c: d[c] for c in cols}
            row["level_number"] = level
            row["node_json_path"] = list(path)
            row["_sort_path"] = list(sort_path)
            row["node_sort_order"] = len(out) + 1 if rank else None
            out.append(row)
            for ch in reversed(children.get(d["node_id"], ())):
                stack.append((ch, level + 1, path, sort_path))
        node_schema = self.nodes.schema
        path_struct = T.StructType(
            [node_schema[c] for c in cols]
            + [T.StructField("level_number", T.IntegerType(), False)]
        )
        walked_schema = T.StructType(
            [node_schema[c] for c in cols]
            + [
                T.StructField("level_number", T.IntegerType(), False),
                T.StructField("node_json_path", T.ArrayType(path_struct), False),
                T.StructField(
                    "_sort_path",
                    T.ArrayType(node_schema[sort_key].dataType),
                    False,
                ),
                T.StructField("node_sort_order", T.IntegerType(), True),
            ]
        )
        spark = self.nodes.sparkSession
        try:
            import pyarrow as pa
            from pyspark.sql.pandas.types import to_arrow_schema

            tbl = pa.Table.from_pylist(out, schema=to_arrow_schema(walked_schema))
            walked = spark.createDataFrame(tbl)
        except Exception:  # noqa: BLE001 - exotic type unsupported by Arrow
            walked = spark.createDataFrame(out, walked_schema)
        self._levels = []
        self._walked_local_count = len(out)
        # Eagerly checkpoint OFF the driver: a local relation embeds its
        # rows in every task that scans it, so each downstream job that
        # misses the (evictable) cache re-ships the full path table from
        # the driver — measured 16s for a 127MB deep-tree walk inside a
        # loaded session vs 6s isolated. localCheckpoint truncates the
        # lineage to MEMORY_AND_DISK executor blocks: evictions spill to
        # disk instead of re-shipping.
        return walked.localCheckpoint(eager=True)

    def _walk_local_columnar(self, tbl) -> DataFrame:
        """Columnar form of :meth:`_walk_local`: the DFS runs over row
        INDICES of the fetched Arrow table and the walked table is
        assembled with vectorized ``take`` gathers — no per-row Python
        dicts on either side (guide §4; the dict path built two dicts
        per node plus one dict per path entry, and ``from_pylist``
        re-parsed them all). The path column falls out for free: a
        node's path is its ancestor index chain, so the flattened
        struct children are a single take of each attribute column.
        Identical output schema, values, and checkpoint behavior to the
        dict path (agreement-pinned in tests); sibling order, orphan
        and cycle semantics are the same code shape line for line."""
        import numpy as np
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        cols = self._struct_cols
        sort_key = self.sort_key_col
        tbl = tbl.combine_chunks()
        n = tbl.num_rows
        node_id = tbl.column("node_id").to_pylist()
        parent_id = tbl.column("parent_node_id").to_pylist()
        is_root = tbl.column("is_root").to_pylist()
        skv = tbl.column(sort_key).to_pylist()
        children: dict = {}
        roots: list[int] = []
        for i in range(n):
            if is_root[i]:
                roots.append(i)
            else:
                children.setdefault(parent_id[i], []).append(i)

        # sibling order = the ranker's lexicographic-_sort_path order:
        # nulls first (Spark ASC semantics), then key, node_id tiebreak
        def skey(i):
            v = skv[i]
            return (True, v, node_id[i]) if v is not None else (False,)

        roots.sort(key=skey)
        for lst in children.values():
            lst.sort(key=skey)
        order: list[int] = []
        levels: list[int] = []
        path_flat: list[int] = []
        path_off: list[int] = [0]
        max_depth = self.max_depth
        # iterative DFS (explicit stack: no recursion limit on deep chains)
        stack = [(i, 1, ()) for i in reversed(roots)]
        while stack:
            i, level, path = stack.pop()
            if level > max_depth:
                raise ValueError(
                    f"hierarchy deeper than max_depth={max_depth} "
                    "(raise max_depth)"
                )
            path = path + (i,)
            order.append(i)
            levels.append(level)
            path_flat.extend(path)
            path_off.append(len(path_flat))
            for ch in reversed(children.get(node_id[i], ())):
                stack.append((ch, level + 1, path))
        node_schema = self.nodes.schema
        # r14 compact transfer: the path column used to ship every
        # ancestor's FULL attribute struct per descendant — sum(depth(n))
        # structs through createDataFrame AND the eager checkpoint (the
        # dominant cost of a deep dim build; a 65k-node binary tree
        # carries ~1M path entries). Ship each node's attributes ONCE
        # instead: the checkpointed frame stores the path as ancestor
        # ROW-INDEX arrays (ints), a single-row side frame broadcasts the
        # attribute structs in original row order, and the returned view
        # rebuilds node_json_path/_sort_path per row from the broadcast —
        # same values from the same Arrow arrays, identical walked schema
        # downstream (agreement-pinned against the dict walk in
        # tests/test_opt_r14.py).
        attr_struct_t = T.StructType([node_schema[c] for c in cols])
        compact_schema = T.StructType(
            [node_schema[c] for c in cols]
            + [
                T.StructField("level_number", T.IntegerType(), False),
                T.StructField(
                    "_path_idx", T.ArrayType(T.LongType(), False), False
                ),
                T.StructField("node_sort_order", T.IntegerType(), True),
            ]
        )
        col_arr = {c: tbl.column(c).chunk(0) for c in cols}
        take_o = pa.array(order, type=pa.int64())
        take_p = pa.array(path_flat, type=pa.int64())
        off = np.asarray(path_off, dtype=np.int32)
        list_off = pa.array(off, type=pa.int32())
        n_out = len(order)
        compact_arrays = [col_arr[c].take(take_o) for c in cols] + [
            pa.array(np.asarray(levels, dtype=np.int32), type=pa.int32()),
            pa.ListArray.from_arrays(list_off, take_p),
            pa.array(np.arange(1, n_out + 1, dtype=np.int32), type=pa.int32())
            if self.compute_sort_order
            else pa.nulls(n_out, pa.int32()),
        ]
        spark = self.nodes.sparkSession
        compact = spark.createDataFrame(
            pa.Table.from_arrays(
                compact_arrays, schema=to_arrow_schema(compact_schema)
            )
        ).localCheckpoint(eager=True)  # same eager off-driver checkpoint
        # one row holding ALL n attribute structs in original row order
        # (node-count-sized, the same bound as the local walk itself);
        # _path_idx entries are 0-based positions into it
        attr_fields = list(to_arrow_schema(attr_struct_t))
        attr_struct = pa.StructArray.from_arrays(
            [col_arr[c] for c in cols], fields=attr_fields
        )
        attr_row = spark.createDataFrame(
            pa.Table.from_arrays(
                [
                    pa.ListArray.from_arrays(
                        pa.array([0, tbl.num_rows], type=pa.int32()), attr_struct
                    )
                ],
                schema=to_arrow_schema(
                    T.StructType(
                        [T.StructField("_attrs", T.ArrayType(attr_struct_t), False)]
                    )
                ),
            )
        )
        anc = "transform(_path_idx, x -> element_at(_attrs, cast(x + 1 as int)))"
        entry = ", ".join(f"'{c}', s.`{c}`" for c in cols)
        path_expr = (
            f"transform({anc}, (s, i) -> "
            f"named_struct({entry}, 'level_number', cast(i + 1 as int)))"
        )
        sort_expr = f"transform({anc}, s -> s.`{sort_key}`)"
        walked = compact.crossJoin(F.broadcast(attr_row)).select(
            *[F.col(c) for c in cols],
            F.col("level_number"),
            F.expr(path_expr).alias("node_json_path"),
            F.expr(sort_expr).alias("_sort_path"),
            F.col("node_sort_order"),
        )
        self._levels = []
        self._walked_local_count = n_out
        self._compact = compact
        self._attr_row = attr_row
        return walked

    def _classify_unreached(self) -> None:
        """Nodes absent from the walk either hang off a MISSING parent
        (orphan subtree — dropped silently) or sit in/under a detached
        CYCLE (raise). Small sets classify on the driver with a colored
        chain walk; larger sets run a distributed peel — repeatedly
        semi-join away nodes whose parent already left the set; a
        non-shrinking non-empty fixpoint proves a cycle."""
        un = self.nodes.select("node_id", "parent_node_id").join(
            self._walked.select("node_id"), "node_id", "left_anti"
        )
        rows = un.limit(self._UNREACHED_DRIVER_LIMIT + 1).collect()
        if len(rows) <= self._UNREACHED_DRIVER_LIMIT:
            parent = {r["node_id"]: r["parent_node_id"] for r in rows}
            done: dict[str, bool] = {}
            for start in parent:
                if done.get(start):
                    continue
                chain: list = []
                x = start
                while x in parent and not done.get(x):
                    if done.get(x) is False:  # in the CURRENT chain
                        cyc = chain[chain.index(x):]
                        raise ValueError(
                            f"cycle detected in parent_node_id: "
                            f"{' -> '.join(str(c) for c in cyc[:6])}"
                            f"{' -> ...' if len(cyc) > 6 else ''}"
                        )
                    done[x] = False
                    chain.append(x)
                    x = parent[x]
                for c in chain:
                    done[c] = True
            return  # every chain exits the set: orphans only
        un = un.cache()
        prev = un.count()
        for _ in range(self._PEEL_MAX_ROUNDS):
            in_set = un.select(F.col("node_id").alias("_p"))
            nxt = un.join(
                in_set, un["parent_node_id"] == in_set["_p"], "left_semi"
            ).cache()
            cur = nxt.count()
            un.unpersist()
            un = nxt
            if cur == 0:
                return  # peeled to nothing: orphan chains only
            if cur == prev:
                raise ValueError(
                    f"cycle detected in parent_node_id ({cur} nodes in or "
                    "under detached cycles)"
                )
            prev = cur
        # rounds exhausted while still shrinking: pathologically long
        # orphan chains — treat as orphans (no fixpoint was reached)
        un.unpersist()


    def _rank(self, walked):
        """Dense depth-first order, or a NULL column when the consumer
        opted out of display ordering (compute_sort_order=False)."""
        if not self.compute_sort_order:
            return walked.withColumn(
                "node_sort_order", F.lit(None).cast("int")
            ).drop("_x_never")
        # the node count (known when materialized) sizes the ranker's
        # range partitioning up front, sparing it its own count pass
        return global_row_number(
            walked, ["_sort_path"], "node_sort_order", row_count=self._n_nodes
        )

    def _supports_recursive_cte(self) -> bool:
        try:
            return int(self.nodes.sparkSession.version.split(".")[0]) >= 4
        except Exception:
            return False

    # -- stage 1a: one-shot walk via native recursive CTE (Spark >= 4) ---
    def _walk_cte(self) -> DataFrame:
        """Same output as _walk() but as a single WITH RECURSIVE query —
        Catalyst runs the whole fixpoint in one execution (one driver
        round-trip instead of one per level). Depth guard via
        spark.sql.cteRecursionLevelLimit; row limit raised so closures of
        large dims don't trip the 1M default (SURVEY.md §7.5.5)."""
        spark = self.nodes.sparkSession
        view = f"_hier_nodes_{self.dimension_name}"
        self.nodes.createOrReplaceTempView(view)
        struct_sql = ", ".join(f"'{c}', n.{c}" for c in self._struct_cols)
        cols = ", ".join(f"n.{c}" for c in self._struct_cols)
        sql = f"""
        WITH RECURSIVE walk AS (
          SELECT {cols}, 1 AS level_number,
                 array(named_struct({struct_sql}, 'level_number', 1)) AS node_json_path,
                 array(n.{self.sort_key_col}) AS _sort_path
          FROM {view} n WHERE n.is_root
          UNION ALL
          SELECT {cols}, w.level_number + 1,
                 array_append(w.node_json_path,
                              named_struct({struct_sql}, 'level_number', w.level_number + 1)),
                 array_append(w._sort_path, n.{self.sort_key_col})
          FROM {view} n JOIN walk w ON n.parent_node_id = w.node_id
        )
        SELECT * FROM walk
        """
        # Recursion-limit confs are session-global and read at EXECUTION
        # time, so: (1) save/restore them around the build; (2) force the
        # fixpoint via an EAGER localCheckpoint — the result is
        # materialized with truncated lineage, so later consumers (or
        # cache eviction) can never re-run the recursion under someone
        # else's limits.
        conf = spark.conf
        saved = {
            k: conf.get(k, None)
            for k in (
                "spark.sql.cteRecursionLevelLimit",
                "spark.sql.cteRecursionRowLimit",
            )
        }
        try:
            conf.set("spark.sql.cteRecursionLevelLimit", str(self.max_depth))
            conf.set("spark.sql.cteRecursionRowLimit", str(1_000_000_000))
            walked = spark.sql(sql).localCheckpoint(eager=True)
        except Exception as e:  # noqa: BLE001 - map recursion-limit to our contract
            if "RECURSION_LEVEL_LIMIT" in str(e):
                # the walk only expands root-REACHABLE nodes (a cycle is
                # never root-reachable — see module docstring), so
                # tripping the limit means the tree is genuinely deeper
                raise ValueError(
                    f"hierarchy deeper than max_depth={self.max_depth} "
                    "(raise max_depth)"
                ) from e
            raise
        finally:
            for k, v in saved.items():
                if v is None:
                    conf.unset(k)
                else:
                    conf.set(k, v)
        self._levels = [walked]
        return self._rank(walked)

    # -- stage 1b: level-bounded walk -----------------------------------
    def _level_struct(self, level: Column) -> Column:
        return F.struct(
            *[F.col(c) for c in self._struct_cols], level.alias("level_number")
        )

    def _walk(self) -> DataFrame:
        """Root-down walk carrying level_number, node_json_path and the
        deterministic sort-key path.

        Equivalent to the reference's first recursive CTE (ref :111-131)
        but as an explicit loop: each iteration is one broadcast-able
        equi-join child.parent_node_id = frontier.node_id plus a union.
        Iteration count = hierarchy depth (not data size), so lineage
        stays shallow; each frontier is cached and the loop stops on an
        empty frontier.
        """
        nodes = self.nodes
        sort_key = F.col(self.sort_key_col)
        frontier = nodes.filter(F.col("is_root")).select(
            *nodes.columns,
            F.lit(1).alias("level_number"),
            F.array(self._level_struct(F.lit(1))).alias("node_json_path"),
            F.array(sort_key).alias("_sort_path"),
        )
        levels = [frontier.cache()]
        depth = 1
        while True:
            parent = levels[-1].select(
                F.col("node_id").alias("_p_id"),
                F.col("level_number").alias("_p_level"),
                F.col("node_json_path").alias("_p_path"),
                F.col("_sort_path").alias("_p_sort"),
            )
            lvl = F.col("_p_level") + F.lit(1)
            child = (
                nodes.join(parent, nodes["parent_node_id"] == parent["_p_id"], "inner")
                .select(
                    *nodes.columns,
                    lvl.alias("level_number"),
                    F.array_append(
                        F.col("_p_path"), self._level_struct(lvl)
                    ).alias("node_json_path"),
                    F.array_append(F.col("_p_sort"), sort_key).alias("_sort_path"),
                )
            )
            if child.isEmpty():
                break
            depth += 1
            if depth > self.max_depth:
                # frontier only ever holds root-reachable nodes (cycles
                # are never root-reachable), so this is genuine depth
                raise ValueError(
                    f"hierarchy deeper than max_depth={self.max_depth} "
                    "(raise max_depth)"
                )
            levels.append(child.cache())

        walked = levels[0]
        for lv in levels[1:]:
            walked = walked.unionByName(lv)
        # dense depth-first order without a single-partition window
        ranked = self._rank(walked)
        self._levels = levels  # unpersisted via unpersist()
        return ranked

    # -- stage 1c: path-doubling walk (O(log depth) rounds) --------------
    def _walk_doubling(self) -> DataFrame:
        """Same output as _walk()/_walk_cte() in O(log depth) self-joins
        (pointer jumping): each round concatenates a node's known path
        segment with its 2^i-th ancestor's segment and squares the jump
        pointer. A depth-1000 hierarchy needs 10 rounds instead of 1000
        — the difference between a feasible and an infeasible build when
        each round is a full shuffle stage on a cluster.

        State per node: seg = array<struct> covering the 2^i nodes ending
        at the node; jump = the ancestor just above seg (null once seg
        reaches the root). Total data volume matches the closure size —
        identical asymptotics to the level walk, fewer rounds.
        """
        nodes = self.nodes
        sort_key = F.col(self.sort_key_col)
        base_struct = F.struct(*[F.col(c) for c in self._struct_cols])
        # localCheckpoint (not cache) after every round: the self-join
        # references `state` TWICE, so with plain caching the LOGICAL
        # plan doubles every round — Catalyst re-analyzes a 2^rounds-node
        # tree and the build stalls in the optimizer long before any data
        # moves. Checkpointing truncates lineage to the materialized
        # result; each round's plan stays O(1).
        state = nodes.select(
            F.col("node_id").alias("_v"),
            F.array(base_struct).alias("_seg"),
            F.array(sort_key).alias("_sort_seg"),
            F.col("parent_node_id").alias("_jump"),
        ).localCheckpoint()
        self._levels = []
        rounds = max(1, (self.max_depth - 1).bit_length())
        for _ in range(rounds + 1):
            if state.filter(F.col("_jump").isNotNull()).isEmpty():
                break
            anc = state.select(
                F.col("_v").alias("_a_v"),
                F.col("_seg").alias("_a_seg"),
                F.col("_sort_seg").alias("_a_sort"),
                F.col("_jump").alias("_a_jump"),
            )
            state = (
                state.join(anc, state["_jump"] == anc["_a_v"], "left")
                .select(
                    "_v",
                    F.when(
                        F.col("_a_v").isNotNull(),
                        F.concat(F.col("_a_seg"), F.col("_seg")),
                    )
                    .otherwise(F.col("_seg"))
                    .alias("_seg"),
                    F.when(
                        F.col("_a_v").isNotNull(),
                        F.concat(F.col("_a_sort"), F.col("_sort_seg")),
                    )
                    .otherwise(F.col("_sort_seg"))
                    .alias("_sort_seg"),
                    F.col("_a_jump").alias("_jump"),
                )
                .localCheckpoint()
            )
        else:
            # jumps still pending after ceil(log2 max_depth)+1 rounds:
            # either members of a detached cycle (their segment wraps, so
            # node_ids repeat once it outgrows the cycle length — dropped
            # silently here, exactly like the level walks never visit
            # them; the materialized reach-check is the uniform raise
            # point for cycles) or genuinely deeper nodes (raise: a
            # silent drop would truncate a legitimate tree).
            pending = state.filter(F.col("_jump").isNotNull())
            too_deep = pending.filter(
                F.expr(
                    "size(_seg) = size(array_distinct(transform(_seg, s -> s.node_id)))"
                )
            )
            if not too_deep.isEmpty():
                raise ValueError(
                    f"hierarchy deeper than max_depth={self.max_depth} "
                    "(raise max_depth)"
                )
            state = state.filter(F.col("_jump").isNull())
        # nodes with a parent missing from the table (orphans) never
        # terminate at a root: their first seg element is not a root.
        # The level walks drop them; do the same here.
        done = state.filter(
            F.element_at("_seg", 1).getField("is_root")
        )
        # max_depth is a semantic contract, not just a rounds budget: the
        # rounds bound has slack (2^(rounds+1) >= 2*max_depth), so a tree
        # the level walks would reject could complete here — enforce it
        if not done.filter(F.size("_seg") > self.max_depth).isEmpty():
            raise ValueError(
                f"hierarchy deeper than max_depth={self.max_depth} "
                "(raise max_depth)"
            )
        lvl = F.size("_seg")
        walked = done.select(
            *[
                F.element_at("_seg", -1).getField(c).alias(c)
                for c in self._struct_cols
            ],
            lvl.alias("level_number"),
            F.expr(
                "transform(_seg, (s, i) -> named_struct("
                + ", ".join(f"'{c}', s.{c}" for c in self._struct_cols)
                + ", 'level_number', i + 1))"
            ).alias("node_json_path"),
            F.col("_sort_seg").alias("_sort_path"),
        )
        walked = walked.cache()
        self._levels.append(walked)
        return self._rank(walked)

    # -- stage 2: reporting dim -----------------------------------------
    def _build_reporting_dim(self) -> DataFrame:
        """Flattened reporting dim (ref :133-160): node columns +
        level_number + node_sort_order + rebuilt node_json + the
        level_{1..N}_{col} root-to-self path columns."""
        node_json = F.struct(
            *[F.col(c) for c in self._struct_cols],
            F.col("level_number"),
            F.col("node_sort_order"),
        )
        flat_fields = [
            c for c in self._struct_cols if c not in ("is_root", "is_leaf")
        ] + ["level_number"]
        level_cols = []
        for i in range(1, self.flatten_levels + 1):
            # 1-based like DuckDB list_extract; try_ variant for NULL
            # (not error) past the path end under Spark 4 ANSI mode
            if self._compact is not None:
                # compact-path fast branch (r14): one broadcast struct
                # fetch per flattened level — past the path end the
                # inner try_element_at yields a NULL index, which the
                # outer lookup must propagate as NULL. try_ on the
                # outer lookup too (ADVICE r14): indexes are always
                # in-bounds (+1 of a valid 0-based ancestor index), so
                # behavior is unchanged, but the non-try form read as
                # an ANSI-error hazard relying on element_at's
                # NULL-index propagation
                elem = F.expr(
                    "try_element_at(_attrs,"
                    f" cast(try_element_at(_path_idx, {i}) + 1 as int))"
                )
                lvl_num = F.when(
                    F.try_element_at("_path_idx", F.lit(i)).isNotNull(),
                    F.lit(i),
                ).cast("int")
            else:
                elem = F.try_element_at(F.col("node_json_path"), F.lit(i))
                lvl_num = elem.getField("level_number")
            for c in flat_fields:
                level_cols.append(
                    lvl_num.alias(f"level_{i}_{c}")
                    if c == "level_number"
                    else elem.getField(c).alias(f"level_{i}_{c}")
                )
        w = (
            self._compact.crossJoin(F.broadcast(self._attr_row))
            if self._compact is not None
            else self._walked
        )
        return w.select(
            *self.nodes.columns,
            "level_number",
            "node_sort_order",
            node_json.alias("node_json"),
            *level_cols,
        )

    # -- stage 3: aggregation dim (transitive closure) -------------------
    def _build_aggregation_dim(self) -> DataFrame:
        """Closure of the hierarchy: one row per (ancestor, descendant)
        pair including self-pairs, net_level = depth delta (ref :167-218).

        Derivation: every ancestor of a node already sits in the node's
        materialized root-to-self path, so ``posexplode(node_json_path)``
        yields exactly the closure — sum(depth(n)) skinny rows, no second
        recursion. Ancestor node_sort_order (computed after the walk) is
        filled by a broadcast self-join on ancestor node_id.
        """
        if self._compact is not None:
            # compact-path fast branch (r14): explode the INT ancestor
            # indices and fetch each ancestor's attribute struct once
            # from the broadcast row — never materializing the per-node
            # struct-path array the view would rebuild just to explode
            exploded = (
                self._compact.crossJoin(F.broadcast(self._attr_row))
                .select(
                    *[
                        F.col(c).alias(f"descendant_{c}")
                        for c in self._attr_out_cols()
                    ],
                    F.col("level_number").alias("descendant_level_number"),
                    F.col("node_sort_order").alias(
                        "descendant_node_sort_order"
                    ),
                    "_attrs",
                    F.posexplode("_path_idx").alias("_pos", "_aidx"),
                )
            )
            anc = F.expr("element_at(_attrs, cast(_aidx + 1 as int))")
        else:
            w = self._walked
            exploded = w.select(
                *[F.col(c).alias(f"descendant_{c}") for c in self._attr_out_cols()],
                F.col("level_number").alias("descendant_level_number"),
                F.col("node_sort_order").alias("descendant_node_sort_order"),
                F.posexplode("node_json_path").alias("_pos", "_anc"),
            )
            anc = F.col("_anc")
        closure = exploded.select(
            *[anc.getField(c).alias(f"ancestor_{c}") for c in self._attr_out_cols()],
            (F.col("_pos") + 1).alias("ancestor_level_number"),
            *[F.col(f"descendant_{c}") for c in self._attr_out_cols()],
            F.col("descendant_level_number"),
            F.col("descendant_node_sort_order"),
        )
        sort_orders = (
            self._compact if self._compact is not None else self._walked
        ).select(
            F.col("node_id").alias("ancestor_node_id"),
            F.col("node_sort_order").alias("ancestor_node_sort_order"),
        )
        # walked-derived and node-sized: on the local-walk path the row
        # count is already known, so the regime resolves probe-free
        closure = closure.join(
            _known_size_side(sort_orders, self._walked_local_count),
            "ancestor_node_id",
            "left",
        )
        anc_cols = [f"ancestor_{c}" for c in self._attr_out_cols()] + [
            "ancestor_level_number",
            "ancestor_node_sort_order",
        ]
        desc_cols = [f"descendant_{c}" for c in self._attr_out_cols()] + [
            "descendant_level_number",
            "descendant_node_sort_order",
        ]
        return closure.select(
            *anc_cols,
            *desc_cols,
            (F.col("descendant_level_number") - F.col("ancestor_level_number")).alias(
                "net_level"
            ),
        )

    def _attr_out_cols(self) -> list[str]:
        # closure columns exclude parent_node_id (ref :199,207)
        return [c for c in self._struct_cols if c != "parent_node_id"]

    # -- incremental maintenance -----------------------------------------
    def extend_closure_with_leaves(self, new_nodes: DataFrame) -> DataFrame:
        """Closure rows for NEW LEAF nodes without re-walking the tree:
        a new leaf's ancestor set = its parent's ancestor set + itself,
        so the delta is one broadcast join of the new rows against the
        existing closure at the parent + the new self-pairs. Returns the
        extended aggregation dim (existing ∪ delta).

        Scope: leaf APPENDS only (the overwhelmingly common dimension
        change — new customer/product/file arrives). Moves or interior
        inserts change descendants' paths and sort orders → full rebuild.
        node_sort_order for appended leaves is NULL (a display concern;
        rollup correctness never depends on it) until the next rebuild.

        Flag maintenance: parents receiving their first child stop being
        leaves, so their pre-existing closure rows get is_leaf flipped to
        false (both as ancestor and as descendant). New nodes whose
        parent is absent from the existing closure raise (an interior /
        orphan insert is outside this method's contract, and silently
        dropping it would corrupt the rollup).
        """
        prepared = prepare_nodes(new_nodes)
        attr = self._attr_out_cols()
        anc_cols = [f"ancestor_{c}" for c in attr] + [
            "ancestor_level_number",
            "ancestor_node_sort_order",
        ]
        new = prepared.select(
            *[F.col(c).alias(f"new_{c}") for c in prepared.columns]
        )
        # guard: every new node's parent must already be in the closure
        known = self.aggregation_dim.filter("net_level = 0").select(
            F.col("descendant_node_id").alias("_k")
        )
        missing = [
            r["new_node_id"]
            for r in new.join(
                # known = EVERY node id (dim-sized): bounded probe, not
                # an unconditional broadcast (10M-node dims)
                dim_side(known), new["new_parent_node_id"] == known["_k"], "left_anti"
            )
            .select("new_node_id")
            .limit(5)
            .collect()
        ]
        if missing:
            raise ValueError(
                "extend_closure_with_leaves: parent not in existing closure "
                f"for new nodes {missing} (leaf appends only — rebuild for "
                "interior inserts)"
            )
        # parents gaining their first child are no longer leaves: flip
        # is_leaf on their existing rows (tiny parent set -> broadcast)
        base = self.aggregation_dim
        if "is_leaf" in attr:
            new_parents = prepared.select(
                F.col("parent_node_id").alias("_np")
            ).distinct()
            for side in ("ancestor", "descendant"):
                hit = new_parents.select(
                    F.col("_np").alias(f"_hit_{side}")
                ).withColumn(f"_flip_{side}", F.lit(True))
                base = (
                    base.join(
                        F.broadcast(hit),
                        base[f"{side}_node_id"] == hit[f"_hit_{side}"],
                        "left",
                    )
                    .withColumn(
                        f"{side}_is_leaf",
                        F.when(F.col(f"_flip_{side}"), F.lit(False)).otherwise(
                            F.col(f"{side}_is_leaf")
                        ),
                    )
                    .drop(f"_hit_{side}", f"_flip_{side}")
                )
        # ancestors of the parent (including the parent itself = self-pair
        # rows of the parent) -> become ancestors of the new leaf
        parent_anc = base.select(
            *anc_cols, F.col("descendant_node_id").alias("_parent_id"),
            F.col("descendant_level_number").alias("_parent_level"),
        )
        inherited = new.join(
            # parent_anc is CLOSURE-sized (ancestor rows of every node):
            # bounded probe — sort-merge past the cap
            dim_side(parent_anc),
            F.col("new_parent_node_id") == F.col("_parent_id"),
        ).select(
            *anc_cols,
            *[F.col(f"new_{c}").alias(f"descendant_{c}") for c in attr],
            (F.col("_parent_level") + 1).alias("descendant_level_number"),
            F.lit(None).cast("int").alias("descendant_node_sort_order"),
            (F.col("_parent_level") + 1 - F.col("ancestor_level_number")).alias(
                "net_level"
            ),
        )
        # depth of the new leaf = parent's depth + 1 (distinct per parent)
        parent_depth = base.filter("net_level = 0").select(
            F.col("descendant_node_id").alias("_parent_id"),
            F.col("descendant_level_number").alias("_parent_level"),
        )
        self_pairs = new.join(
            # node-count-sized (one depth row per node): bounded probe
            dim_side(parent_depth),
            F.col("new_parent_node_id") == F.col("_parent_id"),
        ).select(
            *[F.col(f"new_{c}").alias(f"ancestor_{c}") for c in attr],
            (F.col("_parent_level") + 1).alias("ancestor_level_number"),
            F.lit(None).cast("int").alias("ancestor_node_sort_order"),
            *[F.col(f"new_{c}").alias(f"descendant_{c}") for c in attr],
            (F.col("_parent_level") + 1).alias("descendant_level_number"),
            F.lit(None).cast("int").alias("descendant_node_sort_order"),
            F.lit(0).alias("net_level"),
        )
        return base.unionByName(inherited).unionByName(self_pairs)

    def remove_subtree_from_closure(self, node_id: str) -> DataFrame:
        """Closure rows after deleting ``node_id`` and its ENTIRE subtree
        — the churn/retirement twin of :meth:`extend_closure_with_leaves`
        (retired product line, closed account, revoked license).

        Every closure row touching the subtree has its DESCENDANT inside
        it (descendants of subtree members are subtree members, and a
        doomed ancestor's rows all point at doomed descendants), so ONE
        anti-join against the doomed id set removes exactly the right
        rows. The doomed set is the removed node's own descendant list —
        subtree-sized, broadcast.

        Flag maintenance mirrors the append path: the removed node's
        parent becomes a leaf again iff it has no remaining direct
        children. ``node_sort_order`` keeps its original (now gapped)
        values — relative depth-first order is deletion-invariant, dense
        renumbering waits for the next rebuild.

        Scope: whole-subtree deletes. An interior delete that REPARENTS
        surviving children changes their paths → full rebuild. Unknown
        node ids raise (a silent no-op would mask an upstream id bug).
        """
        base = self.aggregation_dim
        doomed = base.filter(F.col("ancestor_node_id") == node_id).select(
            F.col("descendant_node_id").alias("_gone")
        )
        if doomed.limit(1).count() == 0:
            raise ValueError(
                f"remove_subtree_from_closure: node {node_id!r} not in closure"
            )
        kept = base.join(
            # the doomed set is SUBTREE-sized — near-dim-sized for a
            # near-root delete: bounded probe, not a blind broadcast
            dim_side(doomed),
            base["descendant_node_id"] == doomed["_gone"],
            "left_anti",
        )
        if "ancestor_is_leaf" in base.columns:
            parent = base.filter(
                (F.col("descendant_node_id") == node_id) & (F.col("net_level") == 1)
            ).select(F.col("ancestor_node_id").alias("_p"))
            still_parents = kept.filter(F.col("net_level") == 1).select(
                F.col("ancestor_node_id").alias("_p")
            )
            newly_leaf = parent.join(still_parents, "_p", "left_anti")
            for side in ("ancestor", "descendant"):
                hit = newly_leaf.select(
                    F.col("_p").alias(f"_hit_{side}")
                ).withColumn(f"_flip_{side}", F.lit(True))
                kept = (
                    kept.join(
                        F.broadcast(hit),
                        kept[f"{side}_node_id"] == hit[f"_hit_{side}"],
                        "left",
                    )
                    .withColumn(
                        f"{side}_is_leaf",
                        F.when(F.col(f"_flip_{side}"), F.lit(True)).otherwise(
                            F.col(f"{side}_is_leaf")
                        ),
                    )
                    .drop(f"_hit_{side}", f"_flip_{side}")
                )
        return kept

    def move_subtree_in_closure(
        self, node_id: str, new_parent_id: str
    ) -> DataFrame:
        """Closure rows after REPARENTING ``node_id`` (with its entire
        subtree) under ``new_parent_id`` — the reorg twin completing the
        incremental-maintenance trio (append / delete / move): category
        recut, org change, folder move. The reference rebuilds its dim
        tables from scratch on any node change (ref
        classes/hierarchy_dimension_table.py:162,220); at 100 TB-dim
        scale a move touching one subtree must not re-walk the tree.

        Closure algebra: with S = the moved subtree's member set,
        * rows with descendant IN S and ancestor NOT IN S are exactly
          the old outside-links — dropped (one broadcast membership
          join; descendants of S-members are S-members, so no other row
          touches S),
        * rows WITHIN S keep their shape; both absolute level numbers
          shift by delta = level(new_parent) + 1 - level(node),
        * new rows = (ancestors of new_parent, incl. its self-pairs) x
          (members of S at their shifted levels) — both sides are
          path/subtree-sized, so the cross join is broadcast-tiny.

        Flag maintenance mirrors delete/append: the old parent becomes
        a leaf again iff the move removed its last direct child; the
        new parent stops being one. Moved rows' ``node_sort_order``
        becomes NULL (display-only, deferred to the next rebuild, same
        contract as leaf appends). Raises on an unknown node, an
        unknown new parent, or a new parent inside the moved subtree
        (which would create a cycle).
        """
        base = self.aggregation_dim
        attr = self._attr_out_cols()
        members = (
            base.filter(F.col("ancestor_node_id") == node_id)
            .select(F.col("descendant_node_id").alias("_m"))
            .distinct()
        )
        # three limit-bounded driver probes (levels + guards), all tiny
        old = (
            base.filter(
                (F.col("descendant_node_id") == node_id)
                & (F.col("net_level") == 0)
            )
            .select("descendant_level_number")
            .limit(1)
            .collect()
        )
        if not old:
            raise ValueError(
                f"move_subtree_in_closure: node {node_id!r} not in closure"
            )
        new_parent = (
            base.filter(
                (F.col("descendant_node_id") == new_parent_id)
                & (F.col("net_level") == 0)
            )
            .select("descendant_level_number")
            .limit(1)
            .collect()
        )
        if not new_parent:
            raise ValueError(
                f"move_subtree_in_closure: new parent {new_parent_id!r} "
                "not in closure"
            )
        if members.filter(F.col("_m") == new_parent_id).limit(1).count():
            raise ValueError(
                f"move_subtree_in_closure: new parent {new_parent_id!r} is "
                f"inside the subtree of {node_id!r} (would create a cycle)"
            )
        delta = new_parent[0][0] + 1 - old[0][0]

        memb_d = members.select(F.col("_m").alias("_md"))
        memb_a = members.select(F.col("_m").alias("_ma"))
        in_d, in_a = F.col("_md").isNotNull(), F.col("_ma").isNotNull()
        # subtree membership is near-dim-sized for a near-root move:
        # bounded probes on both attaches
        kept = (
            base.join(
                dim_side(memb_d), base["descendant_node_id"] == F.col("_md"), "left"
            )
            .join(
                dim_side(memb_a), base["ancestor_node_id"] == F.col("_ma"), "left"
            )
            # drop old outside-links; keep outside-outside + within-S rows
            .filter(~(in_d & ~in_a))
            .withColumn(
                "ancestor_level_number",
                F.when(in_a, F.col("ancestor_level_number") + delta).otherwise(
                    F.col("ancestor_level_number")
                ),
            )
            .withColumn(
                "descendant_level_number",
                F.when(in_d, F.col("descendant_level_number") + delta).otherwise(
                    F.col("descendant_level_number")
                ),
            )
            .withColumn(
                "ancestor_node_sort_order",
                F.when(in_a, F.lit(None).cast("int")).otherwise(
                    F.col("ancestor_node_sort_order")
                ),
            )
            .withColumn(
                "descendant_node_sort_order",
                F.when(in_d, F.lit(None).cast("int")).otherwise(
                    F.col("descendant_node_sort_order")
                ),
            )
            .drop("_md", "_ma")
        )

        anc_cols = [f"ancestor_{c}" for c in attr] + [
            "ancestor_level_number",
            "ancestor_node_sort_order",
        ]
        new_anc = base.filter(
            F.col("descendant_node_id") == new_parent_id
        ).select(*anc_cols)
        memb_rows = (
            base.filter("net_level = 0")
            .join(dim_side(members), F.col("descendant_node_id") == F.col("_m"))
            .select(
                *[F.col(f"descendant_{c}") for c in attr],
                (F.col("descendant_level_number") + delta).alias(
                    "descendant_level_number"
                ),
                F.lit(None).cast("int").alias("descendant_node_sort_order"),
            )
        )
        # broadcast the DEPTH-bounded side (ancestors of ONE node, ≤ tree
        # depth rows), never the subtree-sized member rows
        cross = memb_rows.crossJoin(F.broadcast(new_anc)).withColumn(
            "net_level",
            F.col("descendant_level_number") - F.col("ancestor_level_number"),
        )
        out = kept.unionByName(cross)

        if "ancestor_is_leaf" in base.columns:
            old_parent = base.filter(
                (F.col("descendant_node_id") == node_id) & (F.col("net_level") == 1)
            ).select(F.col("ancestor_node_id").alias("_p"))
            still_parents = out.filter(F.col("net_level") == 1).select(
                F.col("ancestor_node_id").alias("_p")
            )
            flips = (
                old_parent.join(still_parents, "_p", "left_anti")
                .withColumn("_leaf", F.lit(True))
                .unionByName(
                    base.filter(
                        (F.col("descendant_node_id") == new_parent_id)
                        & (F.col("net_level") == 0)
                    )
                    .select(F.col("descendant_node_id").alias("_p"))
                    .withColumn("_leaf", F.lit(False))
                )
            )
            for side in ("ancestor", "descendant"):
                hit = flips.select(
                    F.col("_p").alias(f"_hit_{side}"),
                    F.col("_leaf").alias(f"_leaf_{side}"),
                )
                out = (
                    out.join(
                        F.broadcast(hit),
                        out[f"{side}_node_id"] == hit[f"_hit_{side}"],
                        "left",
                    )
                    .withColumn(
                        f"{side}_is_leaf",
                        F.when(
                            F.col(f"_leaf_{side}").isNotNull(),
                            F.col(f"_leaf_{side}"),
                        ).otherwise(F.col(f"{side}_is_leaf")),
                    )
                    .drop(f"_hit_{side}", f"_leaf_{side}")
                )
        return out


    def update_node_attributes(self, updates: DataFrame) -> DataFrame:
        """Closure rows with DISPLAY attributes replaced for the given
        nodes — SCD-1 at closure grain, completing the incremental
        maintenance quartet (append / delete / move / update): renames
        and relabels happen constantly in real dimensions and change no
        structure, so rebuilding (or re-walking) for them is pure waste.

        ``updates`` carries ``node_id`` plus any subset of
        {node_name, level_name}: the NON-structural attributes. A
        structural column (parent_node_id, node_natural_key,
        level_number, sort order) in ``updates`` raises — parent changes
        are :meth:`move_subtree_in_closure`, natural-key changes alter
        fact joinability and need an explicit rebuild decision.

        One broadcast join per closure side (updates are change-sized);
        every row mentioning an updated node — as ancestor AND as
        descendant — gets the new values, exactly like a rebuild from
        the edited node table.
        """
        allowed = {"node_name", "level_name"}
        extra = set(updates.columns) - allowed - {"node_id"}
        if "node_id" not in updates.columns or extra:
            raise ValueError(
                "update_node_attributes: updates must carry node_id plus "
                f"a subset of {sorted(allowed)}; got {sorted(updates.columns)}"
            )
        attrs = [c for c in updates.columns if c != "node_id"]
        out = self.aggregation_dim
        for side in ("ancestor", "descendant"):
            u = updates.select(
                F.col("node_id").alias(f"_uid_{side}"),
                *[F.col(c).alias(f"_u_{side}_{c}") for c in attrs],
            )
            out = out.join(
                F.broadcast(u),
                out[f"{side}_node_id"] == u[f"_uid_{side}"],
                "left",
            )
            for c in attrs:
                out = out.withColumn(
                    f"{side}_{c}",
                    F.coalesce(F.col(f"_u_{side}_{c}"), F.col(f"{side}_{c}")),
                )
            out = out.drop(f"_uid_{side}", *[f"_u_{side}_{c}" for c in attrs])
        return out

    # -- persistence: the reference's CTAS materialization, cross-session --
    def save(self, base_path: str, *, fmt: str = "parquet") -> None:
        """Persist both dims (the reference materializes them as DuckDB
        tables via CTAS, ref :162-163,220-222; here: parquet/orc
        directories under base_path). The closure is written partitioned
        by ancestor_level_number — rollup queries that target one level
        (or slice net_level ranges) prune whole directories."""
        self.reporting_dim.write.mode("overwrite").format(fmt).save(
            f"{base_path}/reporting_dim"
        )
        self.aggregation_dim.write.mode("overwrite").format(fmt).partitionBy(
            "ancestor_level_number"
        ).save(f"{base_path}/aggregation_dim")
        # a re-save to the same base_path (e.g. after maintenance ops
        # grew the closure) must drop broadcast-probe verdicts taken
        # against the previous contents
        from ibis_olap_aggregation_spark.sources.io import _invalidate_probe_memo

        _invalidate_probe_memo()

    @staticmethod
    def load(spark, base_path: str, *, fmt: str = "parquet"):
        """Re-open persisted dims WITHOUT rebuilding (no walk, no source
        scan): returns (reporting_dim, aggregation_dim) DataFrames ready
        for hierarchical_rollup — a new session pays only the read."""
        rep = spark.read.format(fmt).load(f"{base_path}/reporting_dim")
        agg = spark.read.format(fmt).load(f"{base_path}/aggregation_dim")
        return rep, agg

    def unpersist(self) -> None:
        self._walked.unpersist()
        self.nodes.unpersist()
        self.reporting_dim.unpersist()
        self.aggregation_dim.unpersist()
        if self._nodes_base is not None:
            self._nodes_base.unpersist()
            self._nodes_base = None
        for lv in getattr(self, "_levels", ()):
            lv.unpersist()
