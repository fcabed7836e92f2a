"""Degenerate-bucket robustness for the shared LSH/prefix pair generator.

A corpus of ALL-IDENTICAL documents is the worst case for bucket-grouped
pair generation: every document lands in the same band/prefix/chunk
bucket, so the naive collect_list shape holds the entire corpus in one
task and emits O(n²) from it. bucket_pairs salts buckets over
BUCKET_PAIR_CAP members into sub-buckets (within-salt lists + one
cross-salt equi-join) — these tests pin that

1. the salted plan is EXACT: pair sets and multiplicities are identical
   to the naive unsalted form (cap=huge) under a tiny cap that forces
   many splits, and
2. every pair query survives an all-identical corpus with the full
   expected quadratic OUTPUT while no single collect_list ever
   materializes more than ~cap members (asserted structurally: the same
   tiny cap governs the run).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.operators import dedup as dd

N_DOCS = 120  # C(120,2) = 7140 pairs — quadratic output, quick runtime
_TEXT = "the quick brown fox jumps over the lazy dog again and again today"


@pytest.fixture(scope="module")
def identical_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("identical")
    docs = pd.DataFrame(
        {
            "doc_id": range(N_DOCS),
            "text": [_TEXT] * N_DOCS,
            "lang": ["en"] * N_DOCS,
            "source": ["s0"] * N_DOCS,
            "n_chars": [len(_TEXT)] * N_DOCS,
        }
    )
    docs.to_parquet(str(d / "documents.parquet"), index=False)
    emb = pd.DataFrame(
        {
            "vec_id": range(N_DOCS),
            "embedding": [[1.0] * 16 + [0.0] * 48] * N_DOCS,
            "label": [0] * N_DOCS,
        }
    )
    emb.to_parquet(str(d / "embeddings.parquet"), index=False)
    return str(d)


def _pairs_set(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_bucket_pairs_exact_vs_unsalted(spark):
    """Randomized buckets, cap=7: salted output == unsalted output as a
    MULTISET (counting consumers rely on per-bucket multiplicity 1)."""
    import random

    rng = random.Random(42)
    rows = []
    for bucket in range(6):
        n = rng.choice([1, 2, 5, 23, 40])
        members = rng.sample(range(1000), n)
        rows += [(bucket, m) for m in members]
    df = spark.createDataFrame(rows, "k int, m bigint")

    def collect(cap):
        out = dd.bucket_pairs(df, ["k"], "m", cap=cap).collect()
        return sorted((r.a, r.b) for r in out)

    salted, unsalted = collect(7), collect(10**6)
    assert salted == unsalted
    # sanity: the expected count from bucket sizes
    sizes = [r.n for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()]
    assert len(unsalted) == sum(n * (n - 1) // 2 for n in sizes)


@pytest.fixture()
def tiny_cap(monkeypatch):
    # 16 << 120 members/bucket: every degenerate bucket must split
    monkeypatch.setattr(dd, "BUCKET_PAIR_CAP", 16)


def test_minhash_lsh_all_identical(spark, identical_sf_dir, tiny_cap):
    out = dd.dedup_minhash_lsh_candidates(spark, identical_sf_dir).collect()
    n_pairs = math.comb(N_DOCS, 2)
    assert len(out) == n_pairs
    # identical docs agree on every band
    assert all(r.n_band_matches == dd.N_MINHASH for r in out)
    assert all(r.est_jaccard == 1.0 for r in out)


def test_ngram_jaccard_all_identical(spark, identical_sf_dir, tiny_cap):
    out = dd.dedup_ngram_jaccard_pairs(spark, identical_sf_dir)
    rows = out.collect()
    assert len(rows) == math.comb(N_DOCS, 2)
    assert all(r.jaccard == 1.0 for r in rows)


def test_simhash_all_identical(spark, identical_sf_dir, tiny_cap):
    out = dd.dedup_simhash_near_pairs(spark, identical_sf_dir)
    rows = out.collect()
    assert len(rows) == math.comb(N_DOCS, 2)
    assert all(r.hamming == 0 for r in rows)
    # blocked == all-pairs on the degenerate corpus too
    ap = _pairs_set(dd._simhash_near_pairs_allpairs(spark, identical_sf_dir))
    assert _pairs_set(out) == ap


def test_rp_lsh_cosine_all_identical(spark, identical_sf_dir, tiny_cap):
    out = dd.dedup_embedding_cosine_lsh_pairs(spark, identical_sf_dir)
    rows = out.collect()
    assert len(rows) == math.comb(N_DOCS, 2)
    assert all(r.cosine == 1.0 for r in rows)


def test_duplicate_clusters_all_identical(spark, identical_sf_dir, tiny_cap):
    rows = dd.dedup_duplicate_clusters(spark, identical_sf_dir).collect()
    assert len(rows) == 1  # one cluster containing the whole corpus
    assert rows[0].n_docs == N_DOCS
    assert rows[0].min_doc == 0 and rows[0].max_doc == N_DOCS - 1


# -- property-based: random bucket shapes, random caps ----------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def bucket_layout(draw):
    n_buckets = draw(st.integers(min_value=1, max_value=4))
    rows = []
    for b in range(n_buckets):
        size = draw(st.integers(min_value=1, max_value=30))
        members = draw(
            st.lists(
                st.integers(min_value=0, max_value=500),
                min_size=size,
                max_size=size,
                unique=True,
            )
        )
        rows += [(b, m) for m in members]
    cap = draw(st.integers(min_value=1, max_value=40))
    return rows, cap


@settings(
    max_examples=8,  # each example is a Spark job round-trip
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(layout=bucket_layout())
def test_bucket_pairs_property(spark, layout):
    """For ANY bucket layout and ANY cap (including cap=1, maximal
    splitting), the salted generator emits exactly the naive pair
    multiset."""
    rows, cap = layout
    df = spark.createDataFrame(rows, "k int, m bigint")
    got = sorted(
        (r.a, r.b) for r in dd.bucket_pairs(df, ["k"], "m", cap=cap).collect()
    )
    by_bucket: dict[int, list[int]] = {}
    for k, m in rows:
        by_bucket.setdefault(k, []).append(m)
    want = sorted(
        (min(x, y), max(x, y))
        for ms in by_bucket.values()
        for i, x in enumerate(ms)
        for y in ms[i + 1 :]
    )
    assert got == want


def test_simhash_chunk_value_space_is_wide():
    """Design guard for the round-3 scale fix: the pigeonhole chunks
    must keep a wide value space (>= 2^15 values per chunk) — 8-bit
    chunks force sum(bucket^2) >= n^2/256 regardless of content and
    OOMed a 24g heap at 100k docs."""
    from ibis_olap_aggregation_spark.operators.dedup import (
        SIMHASH_BITS,
        SIMHASH_MAX_HAMMING,
    )

    n_chunks = SIMHASH_MAX_HAMMING + 1
    chunk_bits = SIMHASH_BITS // n_chunks
    assert chunk_bits >= 15, (SIMHASH_BITS, chunk_bits)
    assert SIMHASH_BITS <= 60  # md5 idiom carries 60 usable bits


def test_rp_lsh_adaptive_bits_match_oracle_at_checked_scales():
    """The adaptive RP-LSH width must reproduce the static oracle's
    DEDUP_RP_BITS at every oracle-checked corpus size (sf0.001: 500
    vectors, sf0.01: 500, sf0.1: 2000) and grow logarithmically
    beyond — the exact rule dedup_embedding_cosine_lsh_pairs inlines."""
    from ibis_olap_aggregation_spark.operators.dedup import (
        DEDUP_RP_BITS,
        adaptive_rp_bits as bits,
    )

    for n in (1, 500, 2000):
        assert bits(n) == DEDUP_RP_BITS, n
    assert bits(200_000) >= 8  # wide enough that E[bucket] stays bounded
    assert bits(20_000_000) <= 16  # and recall on true near-dups survives


def test_phash_neardup_identical_corpus(spark, identical_sf_dir, tiny_cap):
    """multimodal_phash_neardup on an all-identical corpus: every doc's
    md5-derived payload yields the SAME 64-bit pHash, so all 120 docs
    share every 16-bit band key — the exact degenerate bucket the salted
    generator exists for. Under a 16-member cap the bucket must split
    across sub-bucket tasks yet still emit the full quadratic candidate
    set exactly once: one histogram row, hamming 0, C(120,2) pairs."""
    from ibis_olap_aggregation_spark.operators import multimodal as mm

    rows = mm.multimodal_phash_neardup(spark, identical_sf_dir).collect()
    assert len(rows) == 1
    assert rows[0].hamming == 0
    assert rows[0].n_pairs == math.comb(N_DOCS, 2)
