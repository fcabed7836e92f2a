"""Source/sink layer tests: format round-trips, partition pruning,
bucketed join shuffle elimination — the properties that matter at scale,
asserted from the physical plan, not just row counts."""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.session import load_table
from ibis_olap_aggregation_spark.sources import io as sio


@pytest.fixture()
def workdir():
    d = f"/tmp/spark_io_test_{uuid.uuid4().hex[:8]}"
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_orc_roundtrip(spark, sf_small, workdir):
    orders = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    sio.write_table(orders, f"{workdir}/orc", "orc")
    back = sio.read_table(spark, f"{workdir}/orc", "orc")
    assert back.count() == orders.count()
    assert back.schema == orders.schema


def test_partitioned_write_prunes(spark, sf_small, workdir):
    orders = load_table(spark, sf_small, "orders").withColumn(
        "bucket", (F.col("o_custkey") % 4).cast("int")
    )
    sio.write_partitioned(orders, f"{workdir}/part", ["bucket"])
    back = sio.read_table(spark, f"{workdir}/part")
    pruned = back.filter(F.col("bucket") == 2)
    # partition filter reaches the scan: only bucket=2 files are listed
    assert "PartitionFilters: [isnotnull(bucket" in _plan(pruned)
    want = orders.filter(F.col("bucket") == 2).count()
    assert pruned.count() == want


def test_bucketed_join_has_no_shuffle(spark, sf_small, workdir):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    orders = load_table(spark, sf_small, "orders")
    lineitem = load_table(spark, sf_small, "lineitem")
    sio.write_bucketed(
        orders.select("o_orderkey", "o_totalprice"), "t_orders_b", ["o_orderkey"], 8
    )
    sio.write_bucketed(
        lineitem.select("l_orderkey", "l_quantity"), "t_lineitem_b", ["l_orderkey"], 8
    )
    ob, lb = spark.table("t_orders_b"), spark.table("t_lineitem_b")
    # force sort-merge path (broadcast would hide the bucketing benefit)
    joined = ob.hint("merge").join(lb, ob.o_orderkey == lb.l_orderkey)
    joined.count()
    plan = _plan(joined)
    # both sides read pre-bucketed files: no Exchange on either join input
    assert "Exchange hashpartitioning" not in plan, plan
    n = joined.count()
    want = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).count()
    )
    assert n == want
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_dynamic_partition_pruning(spark, sf_small, workdir):
    """Facts partitioned by order year + a filtered dim join: Spark
    injects a runtime subquery filter on the partition column, so only
    the years the dim selects are scanned (the mechanism that keeps a
    date-partitioned 100 TB fact table from being fully read)."""
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    orders = load_table(spark, sf_small, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    sio.write_partitioned(orders, f"{workdir}/orders_by_year", ["o_year"])
    facts = sio.read_table(spark, f"{workdir}/orders_by_year")
    years = spark.createDataFrame(
        [(y, "pick" if y == 1996 else "skip") for y in range(1995, 2002)],
        "o_year int, tag string",
    ).filter(F.col("tag") == "pick")  # the selective dim filter DPP keys on
    joined = facts.join(years, "o_year").select("o_orderkey", "o_year", "tag")
    plan = joined._jdf.queryExecution().sparkPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    want = orders.filter(F.col("o_year") == 1996).count()
    assert joined.count() == want


def test_csv_json_registry_roundtrips_covered_by_oracle():
    """source_csv_roundtrip / source_json_roundtrip run under the oracle
    differential gate (tests/test_entry_oracle.py) — nothing to re-assert
    here; this is a signpost."""


def test_upsert_parquet_replaces_appends_deletes(spark, sf_small, workdir):
    import os

    from pyspark.sql import functions as F

    from ibis_olap_aggregation_spark.sources.io import upsert_parquet

    path = os.path.join(workdir, "docs_meta")
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    docs.write.mode("overwrite").parquet(path)
    n0 = spark.read.parquet(path).count()

    updates = spark.createDataFrame(
        [(0, "xx", 1), (10**9, "new", 42)],
        "doc_id bigint, lang string, n_chars bigint",
    )
    upsert_parquet(spark, path, updates, ["doc_id"])
    after = spark.read.parquet(path)
    assert after.count() == n0 + 1  # one replace + one insert
    assert after.filter("doc_id = 0").collect()[0].lang == "xx"
    assert after.filter("doc_id = 1000000000").count() == 1

    # delete_where drops matching rows from the merged result
    upsert_parquet(
        spark,
        path,
        updates.limit(0),
        ["doc_id"],
        delete_where="lang = 'xx'",
    )
    final = spark.read.parquet(path)
    assert final.filter("doc_id = 0").count() == 0
    assert final.count() == n0  # replace-row deleted, insert remains

    # idempotence: re-applying the same (empty) upsert changes nothing
    upsert_parquet(spark, path, updates.limit(0), ["doc_id"])
    assert spark.read.parquet(path).count() == n0

    # missing columns are rejected before touching the table
    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing columns"):
        upsert_parquet(
            spark, path, updates.select("doc_id", "lang"), ["doc_id"]
        )
    assert spark.read.parquet(path).count() == n0


def test_upsert_parquet_recovers_dangling_backup(spark, sf_small, workdir):
    """A crash between upsert's two renames leaves the table only at the
    .old-* backup path; the next call must restore it before merging."""
    import os
    import shutil

    from ibis_olap_aggregation_spark.sources.io import upsert_parquet

    path = os.path.join(workdir, "docs_meta_recover")
    docs = load_table(spark, sf_small, "documents").select("doc_id", "lang")
    docs.write.mode("overwrite").parquet(path)
    n0 = spark.read.parquet(path).count()

    # simulate the crash window: table renamed to backup, swap never done
    os.rename(path, f"{path}.old-deadbeef")

    updates = spark.createDataFrame([(10**9, "new")], "doc_id bigint, lang string")
    upsert_parquet(spark, path, updates, ["doc_id"])
    assert spark.read.parquet(path).count() == n0 + 1
    assert not os.path.exists(f"{path}.old-deadbeef")
    shutil.rmtree(path)


def test_versioned_table_upsert_and_time_travel(spark, sf_small, workdir):
    import os

    from ibis_olap_aggregation_spark.sources.io import VersionedParquetTable

    root = os.path.join(workdir, "versioned")
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    t = VersionedParquetTable.create(spark, root, docs)
    n0 = t.read().count()
    assert t.current_version() == 0

    updates = spark.createDataFrame(
        [(0, "xx", 1), (10**9, "new", 42)],
        "doc_id bigint, lang string, n_chars bigint",
    )
    v = t.upsert(updates, ["doc_id"])
    assert v == 1 and t.current_version() == 1
    after = t.read()
    assert after.count() == n0 + 1
    assert after.filter("doc_id = 0").collect()[0].lang == "xx"
    # time travel: version 0 still readable (keep_versions=2) and intact
    assert t.read(0).count() == n0
    assert t.read(0).filter("doc_id = 0").collect()[0].lang != "xx"

    # delete + retention: after the next commit version 0 is retired
    v = t.upsert(updates.limit(0), ["doc_id"], delete_where="lang = 'xx'")
    assert v == 2
    assert t.read().filter("doc_id = 0").count() == 0
    assert t.versions() == [1, 2]
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        t.read(0)


def test_versioned_table_crash_before_flip_is_invisible(spark, sf_small, workdir):
    """A writer that dies after claiming its slot but BEFORE the
    manifest flip must leave readers on the old version. While the
    orphan is FRESH it blocks the slot (it is indistinguishable from a
    live writer mid-flip — the grace protects that window); once older
    than orphan_grace_secs the next upsert reclaims it."""
    import os

    import pytest as _pytest

    from ibis_olap_aggregation_spark.sources.io import (
        ConcurrentWriteError,
        VersionedParquetTable,
    )

    root = os.path.join(workdir, "versioned_crash")
    docs = load_table(spark, sf_small, "documents").select("doc_id", "lang")
    t = VersionedParquetTable.create(spark, root, docs)
    n0 = t.read().count()

    # simulate the crashed write: full v-00001 exists, manifest not flipped
    docs.limit(10).write.parquet(t._version_dir(1))
    assert t.current_version() == 0
    assert t.read().count() == n0  # readers unaffected

    updates = spark.createDataFrame([(10**9, "new")], "doc_id bigint, lang string")
    # fresh orphan: slot blocked, conflict surfaces
    with _pytest.raises(ConcurrentWriteError):
        t.upsert(updates, ["doc_id"])
    assert t.current_version() == 0

    # past the grace: the orphan is reclaimed and the upsert commits
    v = t.upsert(updates, ["doc_id"], orphan_grace_secs=0.0)
    # the orphan was discarded, NOT committed: the new version has the
    # full merged table, not the 10-row orphan content
    assert v == 1 and t.read().count() == n0 + 1
    assert t.current_version() == 1


def test_versioned_table_interleaved_writers_cannot_double_commit(
    spark, sf_small, workdir
):
    """Optimistic concurrency: two writers that both read version N can
    never both commit N+1. The loser either fails with
    ConcurrentWriteError (leaving the winner's commit intact) or, with
    max_retries, re-merges against the winner's result and lands N+2
    with BOTH writers' rows."""
    import os

    import pytest as _pytest

    from ibis_olap_aggregation_spark.sources.io import (
        ConcurrentWriteError,
        VersionedParquetTable,
    )

    root = os.path.join(workdir, "versioned_race")
    docs = load_table(spark, sf_small, "documents").select("doc_id", "lang")
    a = VersionedParquetTable(spark, root)
    b = VersionedParquetTable(spark, root)
    VersionedParquetTable.create(spark, root, docs)
    n0 = a.read().count()

    up_a = spark.createDataFrame([(10**9, "aa")], "doc_id bigint, lang string")
    up_b = spark.createDataFrame([(10**9 + 1, "bb")], "doc_id bigint, lang string")

    # interleave: B snapshots current=0 (stale read), A commits v1 first
    b.current_version = lambda: 0  # B's cached view of the table
    assert a.upsert(up_a, ["doc_id"]) == 1

    # B builds against parent 0 and targets the SAME slot v1: the
    # rename-CAS must refuse (A's v1 is committed and fresh)
    with _pytest.raises(ConcurrentWriteError):
        b.upsert(up_b, ["doc_id"])
    # A's commit intact, B's row absent — no lost update, no double commit
    t = VersionedParquetTable(spark, root)
    assert t.current_version() == 1
    assert t.read().filter("lang = 'aa'").count() == 1
    assert t.read().filter("lang = 'bb'").count() == 0

    # with retries the loser re-reads the advanced version and lands v2
    del b.current_version  # restore the real (re-reading) view
    assert b.upsert(up_b, ["doc_id"], max_retries=2) == 2
    after = t.read()
    assert after.count() == n0 + 2
    assert after.filter("lang = 'aa'").count() == 1
    assert after.filter("lang = 'bb'").count() == 1


def test_versioned_table_live_claim_survives_competing_reclaim(
    spark, sf_small, workdir
):
    """THE orphan-reclaim race (VERDICT r4/r5 finding #1): a LIVE writer
    whose snapshot was staged long before the claim must not have its
    just-claimed slot rmtree'd by a competitor mid-flip. The claim
    re-stamps the slot's mtime (``os.rename`` preserves the staging
    dir's mtime — the snapshot WRITE time), so the orphan grace measures
    time-since-CLAIM. Without the re-stamp the competitor reclaims the
    fresh claim, both writers flip the same version, and one commit is
    silently lost."""
    import os
    import threading
    import time

    import pytest as _pytest

    from ibis_olap_aggregation_spark.sources.io import (
        ConcurrentWriteError,
        VersionedParquetTable,
    )

    root = os.path.join(workdir, "versioned_liveclaim")
    docs = load_table(spark, sf_small, "documents").select("doc_id", "lang")
    a = VersionedParquetTable(spark, root)
    b = VersionedParquetTable(spark, root)
    VersionedParquetTable.create(spark, root, docs)
    n0 = docs.count()

    claimed = threading.Event()
    competitor_done = threading.Event()
    real_claim = a._claim_slot

    def slow_claim(staging: str, target: str) -> None:
        # this writer staged its snapshot "hours ago" (a slow merge):
        # backdate the staging dir so its mtime is ancient at claim time
        old = time.time() - 7200
        os.utime(staging, (old, old))
        real_claim(staging, target)
        claimed.set()
        # ...and is slow BETWEEN claim and manifest flip: hold the
        # window open until the competitor has taken its shot
        competitor_done.wait(120)

    a._claim_slot = slow_claim

    up_a = spark.createDataFrame([(3_000_000, "aa")], "doc_id bigint, lang string")
    up_b = spark.createDataFrame([(3_000_001, "bb")], "doc_id bigint, lang string")
    errs: list[str] = []

    def run_a() -> None:
        try:
            a.upsert(up_a, ["doc_id"])
        except Exception as e:  # noqa: BLE001
            errs.append(repr(e))

    th = threading.Thread(target=run_a)
    th.start()
    try:
        assert claimed.wait(120)
        # competitor: the slot it collides with is claimed-but-not-yet-
        # flipped with a FRESH claim mtime -> a live writer, not an
        # orphan. grace=30s is far above the competitor's own merge
        # latency but far below the 2h-old staging mtime, so the pre-fix
        # behavior (grace vs snapshot-write time) would reclaim here.
        with _pytest.raises(ConcurrentWriteError):
            b.upsert(up_b, ["doc_id"], orphan_grace_secs=30.0)
        assert os.path.isdir(a._version_dir(1))  # slot NOT rmtree'd
    finally:
        competitor_done.set()
        th.join(120)
    assert not errs, errs
    t = VersionedParquetTable(spark, root)
    assert t.current_version() == 1  # exactly one flip — no double commit
    final = t.read()
    assert final.count() == n0 + 1
    assert final.filter("lang = 'aa'").count() == 1  # A's commit intact


def test_versioned_table_threaded_writers_all_land(spark, sf_small, workdir):
    """Stress the optimistic-concurrency loop with REAL interleaving:
    four threads upsert disjoint rows concurrently with retries. Every
    row must land exactly once, the version chain must advance by one
    per commit, and no commit may be lost (the lost-update anomaly the
    CAS exists to prevent)."""
    import os
    import threading

    from ibis_olap_aggregation_spark.sources.io import VersionedParquetTable

    root = os.path.join(workdir, "versioned_threads")
    docs = load_table(spark, sf_small, "documents").select("doc_id", "lang")
    VersionedParquetTable.create(spark, root, docs)
    n0 = docs.count()

    errs = []

    def writer(i: int) -> None:
        try:
            t = VersionedParquetTable(spark, root)
            up = spark.createDataFrame(
                [(2_000_000 + i, f"w{i}")], "doc_id bigint, lang string"
            )
            t.upsert(up, ["doc_id"], max_retries=16, keep_versions=10)
        except Exception as e:  # noqa: BLE001
            errs.append((i, repr(e)))

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs

    t = VersionedParquetTable(spark, root)
    assert t.current_version() == 4  # one slot per commit, none lost
    final = t.read()
    assert final.count() == n0 + 4
    got = sorted(
        r["lang"] for r in final.filter("doc_id >= 2000000").collect()
    )
    assert got == ["w0", "w1", "w2", "w3"]
