"""Semantic invariants for the training-pipeline operators
(operators/pipeline.py) — the oracle mirror (test_entry_oracle) already
pins Spark==DuckDB; these pin that the SEMANTICS are right."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.operators import pipeline as P
from ibis_olap_aggregation_spark.operators.text import tokens_col
from ibis_olap_aggregation_spark.session import load_table


def test_repetition_signal_bounds_and_flag(spark, sf_small):
    rows = P.text_repetition_signals(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 0 < r.top_token_fraction <= 1
        assert 0 <= r.dup_bigram_fraction < 1
        assert r.is_repetitive == (
            r.top_token_fraction > P.TOP_TOKEN_MAX
            or r.dup_bigram_fraction > P.DUP_BIGRAM_MAX
        )
    # the synthetic corpus repeats tokens heavily — both classes appear
    flags = {r.is_repetitive for r in rows}
    assert flags == {True, False}


def test_chunks_reconstruct_documents(spark, sf_small):
    """Dropping each chunk's overlap prefix and concatenating in
    chunk_index order must reproduce the original token stream."""
    chunks = P.text_chunk_documents(spark, sf_small)
    overlap = P.CHUNK_TOKENS - P.CHUNK_STRIDE
    rebuilt = (
        chunks.withColumn("ct", F.split("chunk_text", " "))
        .withColumn(
            "keep",
            F.when(
                F.col("chunk_index") == 0, F.col("ct")
            ).otherwise(F.expr(f"slice(ct, {overlap + 1}, {P.CHUNK_STRIDE})")),
        )
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ", F.flatten(F.array_sort(F.collect_list(F.struct("chunk_index", "keep"))).getField("keep"))
            ).alias("rebuilt")
        )
    )
    orig = load_table(spark, sf_small, "documents").select(
        "doc_id", F.concat_ws(" ", tokens_col()).alias("orig")
    )
    bad = rebuilt.join(orig, "doc_id").filter("rebuilt <> orig").count()
    assert bad == 0
    # chunk length law: min(CHUNK_TOKENS, doc_tokens - stride*index) ≥ 1
    doc_len = load_table(spark, sf_small, "documents").select(
        "doc_id", F.size(tokens_col()).alias("doc_tokens")
    )
    off = (
        chunks.join(doc_len, "doc_id")
        .filter(
            f"n_chunk_tokens <> least({P.CHUNK_TOKENS},"
            f" doc_tokens - {P.CHUNK_STRIDE} * chunk_index)"
            " or n_chunk_tokens < 1"
        )
        .count()
    )
    assert off == 0


def test_redaction_counts_and_hash(spark, sf_small):
    out = P.text_redact_patterns(spark, sf_small)
    docs = {r.doc_id: r.text for r in load_table(spark, sf_small, "documents").collect()}
    rows = out.collect()
    assert all(r.n_email == 0 for r in rows)  # corpus has no emails
    assert any(r.n_term > 0 for r in rows)  # denylist words exist
    pat = re.compile(r"\b(key|hash|secret)\b")
    for r in rows[:50]:
        text = docs[r.doc_id]
        assert r.n_term == len(pat.findall(text))
        expect = hashlib.md5(pat.sub("<TERM>", text).encode()).hexdigest()[:16]
        assert r.redacted_hash == expect


def test_shared_ngram_fraction_bounds(spark, sf_small):
    out = P.dedup_shared_ngram_fraction(spark, sf_small)
    rows = out.collect()
    assert rows
    for r in rows:
        assert r.n_shingles > 0
        assert 0 <= r.shared_fraction <= 1
    # docs shorter than k tokens are absent
    short = (
        load_table(spark, sf_small, "documents")
        .withColumn("t", tokens_col())
        .filter(F.size("t") < P.SHARED_NGRAM_K)
        .count()
    )
    total = load_table(spark, sf_small, "documents").count()
    assert len(rows) == total - short


def test_semantic_dedup_accounting(spark, sf_small):
    out = P.dedup_semantic_ivf(spark, sf_small).collect()
    n_vec = load_table(spark, sf_small, "embeddings").count()
    assert sum(r.n_vectors for r in out) == n_vec
    for r in out:
        assert r.n_kept + r.n_dropped == r.n_vectors
        assert r.n_kept >= 1  # the lowest-id vector of a cluster survives


def test_split_assign_partitions_corpus(spark, sf_small):
    out = P.sample_split_assign(spark, sf_small).collect()
    total = load_table(spark, sf_small, "documents").count()
    assert sum(r.n for r in out) == total
    assert {r.split for r in out} <= {"train", "validation", "test"}
    # deterministic: a second run is identical
    again = P.sample_split_assign(spark, sf_small).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_domain_weighted_sampling_bounds(spark, sf_small):
    rows = P.sample_domain_weighted(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 0.25 <= r.target_fraction <= 0.74
        assert 0 <= r.n_sampled <= r.n_total


def test_binaryfile_ingest_roundtrip(spark, sf_small, tmp_path):
    """Media written as raw files and re-ingested via the binaryFile
    source must carry byte-identical payloads per doc_id (the swap-in
    contract: real-file ingest == synthetic attach_media)."""
    import os

    from ibis_olap_aggregation_spark.operators.multimodal import (
        attach_media,
        ingest_binary_dir,
    )
    from ibis_olap_aggregation_spark.session import load_table

    docs = load_table(spark, sf_small, "documents").limit(20)
    media = attach_media(docs).select("doc_id", "media").collect()
    src = tmp_path / "blobs"
    os.makedirs(src)
    for r in media:
        (src / f"{r.doc_id}.bin").write_bytes(bytes(r.media))
    (src / "ignore.txt").write_text("not media")  # pruned by glob

    got = {
        r.doc_id: bytes(r.media)
        for r in ingest_binary_dir(spark, str(src)).collect()
    }
    want = {r.doc_id: bytes(r.media) for r in media}
    assert got == want


def test_decode_media_seam_all_modes(monkeypatch):
    """The codec seam (VERDICT r5 task #8) in all three regimes:
    fake mode everywhere; a REAL codec found at runtime is used (pinned
    by injecting a stub PIL module, since the sandbox has none — and by
    the importorskip twin below when Pillow IS present); no codec and
    no fake raises NotImplementedError naming the gap."""
    import sys
    import types

    import pytest as _pytest

    from ibis_olap_aggregation_spark.operators.multimodal import decode_media

    payload = bytes(range(16))

    # 1. fake mode: deterministic pseudo-decode, no library needed
    assert decode_media(payload, "image", fake=True) == payload * 4

    # 2. no codec, no fake: loud, names the missing library
    monkeypatch.setitem(sys.modules, "PIL", None)  # force ImportError
    with _pytest.raises(NotImplementedError, match="Pillow"):
        decode_media(payload, "image")
    # audio's codec is the stdlib wave module (always present): a
    # non-WAV payload is a ValueError, the with-codec contract
    with _pytest.raises(ValueError, match="WAV"):
        decode_media(payload, "audio")
    with _pytest.raises(NotImplementedError, match="video"):
        decode_media(payload, "video")

    # 3. runtime probe finds a codec: decode routes through it. The
    # stub implements exactly the Image.open->convert->tobytes surface
    # the seam calls, so this pins the call contract a real Pillow
    # satisfies.
    class _StubImage:
        def __init__(self, raw: bytes):
            self._raw = raw

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def convert(self, mode: str):
            assert mode == "RGB"
            return self

        def tobytes(self) -> bytes:
            return b"rgb:" + self._raw

    stub_pil = types.ModuleType("PIL")
    stub_pil.Image = types.SimpleNamespace(
        open=lambda fp: _StubImage(fp.read())
    )
    monkeypatch.setitem(sys.modules, "PIL", stub_pil)
    assert decode_media(payload, "image") == b"rgb:" + payload
    # video still has no seam even with an image codec present
    with _pytest.raises(NotImplementedError):
        decode_media(payload, "video")


def test_decode_media_real_wav_roundtrip():
    """The audio seam is REAL everywhere (stdlib wave): an in-memory
    8-frame mono 16-bit PCM WAV must decode to exactly its frame bytes
    through decode_media — no fake mode, no optional dependency."""
    import io
    import wave

    from ibis_olap_aggregation_spark.operators.multimodal import decode_media

    frames = bytes(range(16))  # 8 frames x 2 bytes, deterministic
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(frames)
    assert decode_media(buf.getvalue(), "audio") == frames


def test_decode_media_real_pillow_roundtrip():
    """Real-codec twin of the seam test: runs only where Pillow is
    actually installed (skipped in this sandbox). A 2x2 PNG must decode
    to its 12 raw RGB bytes through the runtime probe."""
    import io

    import pytest as _pytest

    Image = _pytest.importorskip("PIL.Image")

    from ibis_olap_aggregation_spark.operators.multimodal import decode_media

    im = Image.new("RGB", (2, 2), (255, 0, 0))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    raw = decode_media(buf.getvalue(), "image")
    assert raw == b"\xff\x00\x00" * 4


def test_decode_media_undecodable_payload_raises_value_error(monkeypatch):
    """With a real codec present, a payload the codec cannot parse must
    surface as the documented ValueError (naming the fake-mode escape
    hatch), not leak the codec's own exception type — the repo's
    synthetic md5 payloads are never valid images, so this is the path
    any accidental real-decode of fixture data takes."""
    import sys
    import types

    import pytest as _pytest

    from ibis_olap_aggregation_spark.operators.multimodal import decode_media

    class _CodecError(Exception):
        pass

    def failing_open(fp):
        raise _CodecError("cannot identify image file")

    stub_pil = types.ModuleType("PIL")
    stub_pil.Image = types.SimpleNamespace(open=failing_open)
    monkeypatch.setitem(sys.modules, "PIL", stub_pil)
    with _pytest.raises(ValueError, match="not a decodable image"):
        decode_media(bytes(range(16)), "image")
