"""Streaming incremental dedup: stream == sequential batch, store grows.

Feeds the sf0.001 documents table as three file-batches through
run_dedup_stream and pins:
- the streamed verdict log equals running dedup_batch_against_store
  sequentially over the same splits (stream==batch);
- the signature store grows by exactly the unique docs;
- a SECOND drain with the same checkpoint processes nothing new
  (restartability), and a newly dropped file IS processed and dedupes
  against docs from earlier batches;
- in-batch exact copies resolve to the batch canonical.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.operators.dedup import doc_signatures
from ibis_olap_aggregation_spark.session import load_table
from ibis_olap_aggregation_spark.streaming.dedup_stream import (
    dedup_batch_against_store,
    run_dedup_stream,
    seed_signature_store,
)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("dedup_stream")
    d = {
        k: str(root / k)
        for k in ("source", "store", "verdicts", "chk", "store_seq")
    }
    os.makedirs(d["source"])
    return d


def _drop_file(spark, df, source_dir: str, name: str) -> None:
    """Write df as ONE parquet file named `name` directly in source_dir
    (the streaming file source does not recurse into nested dirs)."""
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.coalesce(1).write.parquet(os.path.join(td, "out"))
        part = glob.glob(os.path.join(td, "out", "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(source_dir, name))


def _splits(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    b0 = docs.filter("doc_id % 4 = 0")  # seed corpus
    b1 = docs.filter("doc_id % 4 = 1")
    b2 = docs.filter("doc_id % 4 = 2")
    b3 = docs.filter("doc_id % 4 = 3")
    return b0, b1, b2, b3


@pytest.fixture(scope="module")
def drained(spark, sf_small, dirs):
    """First drain, shared by both stream tests so each is
    self-sufficient under -k / randomized ordering: seed both stores,
    build the sequential ground truth, stream batches 1+2. Returns the
    expected verdict map."""
    b0, b1, b2, _ = _splits(spark, sf_small)
    seed_signature_store(b0, dirs["store"])
    seed_signature_store(b0, dirs["store_seq"])

    # sequential ground truth over the same splits (same tagged-append
    # store layout as the stream writer)
    expected = {}
    for i, b in enumerate((b1, b2)):
        verdicts, new_rows = dedup_batch_against_store(
            spark, b, dirs["store_seq"], batch_id=i
        )
        for r in verdicts.collect():
            expected[r["doc_id"]] = (r["verdict"], r["matched_doc_id"])
        new_rows.withColumn("_batch_id", F.lit(i).cast("bigint")).write.option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("_batch_id").mode("overwrite").parquet(dirs["store_seq"])

    # stream the same two batches as files (the file source lists the
    # directory flat: drop single parquet FILES, not nested dirs)
    _drop_file(spark, b1, dirs["source"], "batch1.parquet")
    _drop_file(spark, b2, dirs["source"], "batch2.parquet")
    run_dedup_stream(
        spark, dirs["source"], dirs["store"], dirs["verdicts"],
        checkpoint_dir=dirs["chk"],
    )
    return expected


def test_stream_equals_sequential_batches(spark, sf_small, dirs, drained):
    b0 = _splits(spark, sf_small)[0]
    expected = drained
    got = {
        r["doc_id"]: (r["verdict"], r["matched_doc_id"])
        for r in spark.read.parquet(dirs["verdicts"]).collect()
    }
    assert got == expected

    # store grew by exactly the unique docs, in signature layout
    n_seed = b0.count()
    n_unique = sum(1 for v, _ in expected.values() if v == "unique")
    store = spark.read.parquet(dirs["store"])
    assert store.count() == n_seed + n_unique
    assert set(store.columns) == {"doc_id", "ms", "hs", "ch", "_batch_id"}


def test_restart_processes_only_new_files(spark, sf_small, dirs, drained):
    before = spark.read.parquet(dirs["verdicts"]).count()
    run_dedup_stream(
        spark, dirs["source"], dirs["store"], dirs["verdicts"],
        checkpoint_dir=dirs["chk"],
    )
    assert spark.read.parquet(dirs["verdicts"]).count() == before

    # drop a new file that duplicates batch-1 docs exactly: every doc
    # must classify exact_dup against the store built by earlier batches
    _, b1, _, _ = _splits(spark, sf_small)
    b1_copy = b1.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    _drop_file(spark, b1_copy, dirs["source"], "batch3.parquet")
    run_dedup_stream(
        spark, dirs["source"], dirs["store"], dirs["verdicts"],
        checkpoint_dir=dirs["chk"],
    )
    new = (
        spark.read.parquet(dirs["verdicts"])
        .filter(F.col("doc_id") >= 1_000_000)
        .collect()
    )
    assert len(new) == b1.count()
    # every copy is a duplicate of SOMETHING already absorbed: the
    # original (if it entered the store as unique) or the store doc the
    # original itself duplicated — never unique
    assert all(r["verdict"] != "unique" for r in new)
    # copies of originals that DID enter the store exact-match them
    stored = {
        r["doc_id"]
        for r in spark.read.parquet(dirs["store"])
        .filter(F.col("doc_id") < 1_000_000)
        .collect()
    }
    for r in new:
        if r["doc_id"] - 1_000_000 in stored:
            assert r["verdict"] == "exact_dup"
            assert r["matched_doc_id"] == r["doc_id"] - 1_000_000, r


def test_in_batch_exact_copies_resolve_to_canonical(spark, sf_small):
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        store = os.path.join(td, "store")
        docs = load_table(spark, sf_small, "documents").limit(0)
        seed_signature_store(docs, store)  # empty corpus
        batch = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 46),
                (2, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 46),
                (3, "completely different content words here now ok", "en", "s", 46),
            ],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )
        verdicts, new_rows = dedup_batch_against_store(spark, batch, store)
        v = {r["doc_id"]: (r["verdict"], r["matched_doc_id"]) for r in verdicts.collect()}
        assert v[1][0] == "unique" and v[3][0] == "unique"
        assert v[2] == ("exact_dup", 1)
        assert sorted(r["doc_id"] for r in new_rows.collect()) == [1, 3]


def test_reseed_refused_once_stream_partitions_exist(spark, sf_small):
    """seed_signature_store is one-time init: once the stream has
    appended _batch_id>=0 partitions, re-seeding must fail instead of
    leaving those rows as a ghost corpus."""
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        store = os.path.join(td, "store")
        docs = load_table(spark, sf_small, "documents").limit(8)
        seed_signature_store(docs, store)
        # re-seed over a seed-only store is fine (idempotent init)
        seed_signature_store(docs, store)
        # simulate a stream append, then re-seed must refuse
        doc_signatures(docs).write.mode("overwrite").parquet(
            os.path.join(store, "_batch_id=0")
        )
        with pytest.raises(ValueError, match="ghost corpus"):
            seed_signature_store(docs, store)


def test_crash_replay_is_idempotent(spark, sf_small):
    """Simulate the worst crash window: a batch wrote BOTH sinks but
    died before the checkpoint commit, so foreachBatch replays it. The
    replay must produce bit-identical verdicts (no self-matches against
    the rows the first attempt appended) and leave the store without
    duplicates."""
    import tempfile

    from ibis_olap_aggregation_spark.streaming.dedup_stream import (
        dedup_batch_against_store as classify,
    )

    with tempfile.TemporaryDirectory() as td:
        store = os.path.join(td, "store")
        docs = load_table(spark, sf_small, "documents")
        seed_signature_store(docs.filter("doc_id % 2 = 0"), store)
        batch = docs.filter("doc_id % 2 = 1")

        def attempt():
            verdicts, new_rows = classify(spark, batch, store, batch_id=7)
            got = sorted(
                (r["doc_id"], r["verdict"], r["matched_doc_id"])
                for r in verdicts.collect()
            )
            new_rows.withColumn("_batch_id", F.lit(7).cast("bigint")).write.option(
                "partitionOverwriteMode", "dynamic"
            ).partitionBy("_batch_id").mode("overwrite").parquet(store)
            return got

        first = attempt()   # batch succeeds, checkpoint commit "lost"
        replay = attempt()  # foreachBatch replays the same batch_id
        assert replay == first
        store_df = spark.read.parquet(store)
        assert store_df.count() == store_df.select("doc_id").distinct().count()
        assert not any(d == m for d, v, m in replay if m is not None)


def test_seed_refuses_partition_landing_mid_write(spark, sf_small, tmp_path, monkeypatch):
    """The seed guard is check-then-act (VERDICT r4/r5 finding #5-minor):
    a stream partition landing BETWEEN the pre-write scan and the write
    must be caught by the post-write re-check, not silently absorbed."""
    import os

    import pytest as _pytest

    from ibis_olap_aggregation_spark.session import load_table
    from ibis_olap_aggregation_spark.streaming import dedup_stream as ds

    docs = load_table(spark, sf_small, "documents").limit(5)
    store = str(tmp_path / "store")

    real_sigs = ds.doc_signatures

    def sigs_then_interleave(d):
        out = real_sigs(d)
        # simulate a concurrently running stream appending its first
        # micro-batch between the scan and the seed write
        os.makedirs(os.path.join(store, "_batch_id=0"), exist_ok=True)
        return out

    monkeypatch.setattr(ds, "doc_signatures", sigs_then_interleave)
    with _pytest.raises(RuntimeError, match="WHILE seeding"):
        ds.seed_signature_store(docs, store)
