"""Incremental-warehouse demo: the engine's MAINTENANCE surface composed
the way a continuously-loaded 100 TB warehouse runs it.

    day-0 facts
      -> per-node rollup PARTIALS (exact decimals, mergeable)
      -> VersionedParquetTable snapshot (manifest-flip commit)
    day-1 delta
      -> partials of the DELTA ONLY (cost ~ delta, not base)
      -> merge + new table version (old version still readable)
      -> optimistic-concurrency: a stale writer loses the CAS
    verification
      -> merged partials == one-shot rollup over (day0 UNION day1)

Every step is the library API (no registry/driver machinery), so this
doubles as an executable doc of the incremental path. The same
merge-not-recompute design carries the streaming dedup store
(streaming/dedup_stream.py) and the sketch cube (rollup sketch
partials).

Run:  PYTHONPATH=. python examples/incremental_warehouse_demo.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from ibis_olap_aggregation_spark import get_spark, load_tables
from ibis_olap_aggregation_spark.fixtures import geo_nodes
from ibis_olap_aggregation_spark.hierarchy import HierarchyDimension
from ibis_olap_aggregation_spark.rollup import (
    finalize_rollup_partials,
    hierarchical_rollup_additive,
    hierarchical_rollup_partials,
    merge_rollup_partials,
)
from ibis_olap_aggregation_spark.sources.io import (
    ConcurrentWriteError,
    VersionedParquetTable,
)

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("incremental_warehouse_demo")
    t = load_tables(spark, SF_DIR, ("region", "nation", "customer", "orders"))
    dim = HierarchyDimension(
        geo_nodes(t["region"], t["nation"], t["customer"]),
        dimension_name="geo",
        sort_key_col="node_id",
        flatten_levels=4,
    )
    agg_dim = dim.aggregation_dim

    # split orders into a "day 0" base load and a "day 1" delta
    base = t["orders"].filter("o_orderkey % 7 != 0")
    delta = t["orders"].filter("o_orderkey % 7 = 0")
    print(f"base={base.count()} rows, delta={delta.count()} rows")

    with tempfile.TemporaryDirectory() as td:
        # day 0: partials of the base, committed as table version 0
        p0 = hierarchical_rollup_partials(
            base, agg_dim, "o_custkey",
            sum_cols=[("o_totalprice", "sum_totalprice")],
            count_alias="n_orders",
        )
        table = VersionedParquetTable.create(spark, f"{td}/rollup", p0)
        print("committed v0:", table.read().count(), "node partials")

        # day 1: partials of the DELTA ONLY, merged into version 1 —
        # the base facts are never rescanned
        p1 = hierarchical_rollup_partials(
            delta, agg_dim, "o_custkey",
            sum_cols=[("o_totalprice", "sum_totalprice")],
            count_alias="n_orders",
        )
        merged = merge_rollup_partials(
            [table.read(), p1],
            sum_aliases=["sum_totalprice"],
            count_alias="n_orders",
        )
        v = table.upsert(merged, ["ancestor_node_id"])
        print(f"committed v{v}; v0 still readable:", table.read(0).count())

        # optimistic concurrency: a writer holding a STALE view of the
        # table cannot silently double-commit the same version slot
        stale = VersionedParquetTable(spark, f"{td}/rollup")
        stale.current_version = lambda: 0  # its cached, outdated view
        try:
            stale.upsert(merged.limit(1), ["ancestor_node_id"])
            raise AssertionError("stale writer must lose the CAS")
        except ConcurrentWriteError as e:
            print("stale writer correctly refused:", e)

        # verification: merged-partials == one-shot rollup over ALL facts
        got = finalize_rollup_partials(
            table.read(), agg_dim,
            sum_aliases=["sum_totalprice"],
            group_keys=("ancestor_node_name", "ancestor_level_number"),
        )
        want = hierarchical_rollup_additive(
            t["orders"], agg_dim, "o_custkey",
            sum_cols=[("o_totalprice", "sum_totalprice")],
            count_alias="n_orders",
            group_keys=("ancestor_node_name", "ancestor_level_number"),
            sort=False,
        )
        cols = ["ancestor_node_name", "ancestor_level_number",
                "sum_totalprice", "n_orders"]
        diff = (
            got.select(*cols).exceptAll(want.select(*cols)).count()
            + want.select(*cols).exceptAll(got.select(*cols)).count()
        )
        assert diff == 0, f"incremental != one-shot ({diff} rows differ)"
        print("incremental rollup == one-shot recompute: bit-identical")

        got.orderBy("ancestor_level_number", "ancestor_node_name").show(
            8, truncate=False
        )


if __name__ == "__main__":
    main()
