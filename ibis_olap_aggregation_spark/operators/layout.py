"""Data-layout operators: z-order clustering, balanced shard export,
small-file compaction.

No reference counterpart (the reference's only layout decision is CTAS
into DuckDB tables, classes/hierarchy_dimension_table.py:162-163) — this
family covers the 100 TB concerns a Spark lakehouse adds on top:

- **Z-order clustering** (`zorder_key`, `layout_zorder_file_skipping`):
  multi-dimensional data layout so parquet min/max footer stats prune
  files for predicates on EITHER clustered column. A linear sort prunes
  only its leading column; the Morton (bit-interleaved) order bounds
  every file to a small rectangle of the key space. The registry query
  MEASURES the effect honestly: it simulates both layouts' file
  assignments with identical integer math in Spark and DuckDB and
  reports average files hit per probe — z-order reads ~2-2.5x fewer
  files on the TPC-H keys (and the gap widens with file count).
- **Balanced shard export** (`export_training_shards`,
  `sample_shard_manifest`): deterministic hash-sharding of a corpus
  into N equal shards for training-data delivery, with a per-shard
  manifest (row count + order-independent BIT_XOR content fingerprint)
  that a consumer can verify without re-reading the corpus.
- **Compaction** (`compact_parquet_dir`): rewrite a small-file
  directory into ~target-row files, range-clustered on a sort key so
  the compacted files also carry tight min/max stats.

Scale notes:
- The z-key is a per-row map-side expression (40 bitwise ops) — no
  shuffle beyond the final range partition that any layout rewrite
  needs anyway.
- Dimension values are min-max normalized to a common bit width before
  interleaving: raw interleave of differently-sized domains degenerates
  to a linear sort on the wider column (measured: unnormalized z-order
  was no better than linear; normalized is 2.4x better). For heavily
  skewed columns substitute a rank-based normalization (range-partition
  ids) — same interleave, same query shape.
- Shard assignment is md5-derived (functions/idioms.py), so shard
  membership is stable across runs/engines — re-exports are
  reproducible and manifests are comparable across time.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.functions.idioms import DUCK_MD5INT, SPARK_MD5INT
from ibis_olap_aggregation_spark.operators.ranking import global_row_number
from ibis_olap_aggregation_spark.queries import register
from ibis_olap_aggregation_spark.session import load_table, query_cache

__all__ = [
    "zorder_key",
    "export_training_shards",
    "read_shard_manifest",
    "compact_parquet_dir",
]

# bits per dimension after normalization: 2^10 buckets per dim is enough
# for file-level pruning (files per table << 2^20 z-cells) while keeping
# the interleaved key well inside BIGINT for up to 3 dimensions
ZORDER_BITS_PER_DIM = 10


def _morton_terms(cols: list[str], bits: int, shift_spelling: str) -> str:
    """Bit-interleave expression text; `shift_spelling` chooses the
    engine idiom ('spark' -> shiftleft()/shiftright() functions,
    'duck' -> << / >> operators)."""
    ndim = len(cols)
    terms = []
    for i in range(bits):
        for d, c in enumerate(cols):
            pos = i * ndim + d
            if shift_spelling == "spark":
                terms.append(f"shiftleft((shiftright({c}, {i}) & 1), {pos})")
            else:
                terms.append(f"((({c} >> {i}) & 1) << {pos})")
    return " | ".join(terms)


def zorder_key(
    cols: list[str],
    maxima: dict[str, int],
    bits_per_dim: int = ZORDER_BITS_PER_DIM,
) -> F.Column:
    """Morton z-order key over non-negative integer columns.

    Each column is min-max normalized to ``bits_per_dim`` bits
    (``x * 2^B // (max+1)``) and the normalized bits are interleaved
    round-robin (dimension d contributes bit positions d, d+ndim,
    d+2*ndim, ...). Sorting/range-partitioning by this key before a
    parquet write gives every output file a bounded hyper-rectangle of
    the key space, so min/max footer stats prune scans filtered on ANY
    of the clustered columns.

    ``maxima``: per-column upper bounds (inclusive). Passed in rather
    than computed here so callers can reuse known bounds and the
    expression stays a pure map-side column.
    """
    norm = [
        f"(({c} * {1 << bits_per_dim}) DIV {int(maxima[c]) + 1})" for c in cols
    ]
    return F.expr(_morton_terms(norm, bits_per_dim, "spark"))


_N_FILES = 64
_N_PROBES = 32
_PROBE_DENOM = 8  # probe rectangles are (1/8 x 1/8) of the key space


def _skipping_inputs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, int, int, int]:
    """Shared input scaffolding for the file-skipping measurements: the
    cached (pk, sk) projection plus its exact count and key maxima (two
    driver actions, the same values the oracles derive in SQL). ONE
    copy serves both skipping ops so the probe/file geometry cannot
    drift between them (code-review r14)."""
    li = query_cache(
        load_table(spark, sf_dir, "lineitem").select(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
    )
    # ONE action for count + maxima (the count used to be its own job;
    # the agg scan materializes the cache exactly the same way)
    row = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("pk").alias("mp"),
        F.max("sk").alias("ms"),
    ).first()
    return li, int(row["n"]), int(row["mp"]), int(row["ms"])


def _skipping_measurement(
    spark: SparkSession,
    n: int,
    maxp: int,
    maxs: int,
    keyed_layouts: list[tuple[DataFrame, list[str], str]],
) -> DataFrame:
    """The file-skipping harness both layout ops share: assign each
    layout's rows to {_N_FILES} equal-row files via the range-
    partitioned global ranker, compute per-file min/max stats (what
    parquet footers store), fire the {_N_PROBES} deterministic probe
    rectangles, and count overlapping files per (layout, probe) with
    the min/max test a stats-pruning reader runs. ``keyed_layouts`` is
    [(frame, order_cols, layout_name, lead_max)]; everything downstream
    — file_id formula, probe geometry, overlap predicate, output shape —
    lives HERE once, so a one-sided edit can no longer make the two
    skipping ops measure different things.

    ``lead_max`` is the inclusive maximum of ``order_cols[0]`` (every
    layout's leading key has a KNOWN domain here: curve keys are bounded
    by their bit width, the linear key by the probed column maximum), so
    each ranking uses ``global_row_number``'s deterministic-bucket path:
    no sampled range partitioner, no eager localCheckpoint per layout —
    construction runs one bounded bucket-count collect per layout and
    the rankings themselves stay lazy, pipelining CONCURRENTLY inside
    the consumer's single job (measured: the old path serialized one
    eager checkpoint job per layout)."""
    _N_BUCKETS = 128

    def file_stats(
        df: DataFrame, order_cols: list[str], layout: str, lead_max: int
    ) -> DataFrame:
        lead = order_cols[0]
        ranked = global_row_number(
            # rank only the columns the stats need: the curve keys ride
            # along (order cols), scaffolding like the (x, y) grid does not
            df.select(*order_cols),
            order_cols,
            "rk",
            row_count=n,
            bucket=(
                F.expr(f"({lead} * {_N_BUCKETS}) DIV {int(lead_max) + 1}"),
                _N_BUCKETS,
            ),
        )
        files = ranked.withColumn(
            "file_id",
            F.expr(f"CAST(((CAST(rk AS BIGINT) - 1) * {_N_FILES}) DIV {n} AS BIGINT)"),
        )
        return files.groupBy("file_id").agg(
            F.min("pk").alias("min_pk"),
            F.max("pk").alias("max_pk"),
            F.min("sk").alias("min_sk"),
            F.max("sk").alias("max_sk"),
        ).withColumn("layout", F.lit(layout))

    # |layouts| x 64 stat rows feed BOTH the probe-overlap branch and
    # the n_files count: cache so each global ranking runs once, not
    # twice (tracked, query-scoped — see session.query_cache)
    per_layout = [
        file_stats(df, cols, name, lead_max)
        for df, cols, name, lead_max in keyed_layouts
    ]
    stats = per_layout[0]
    for s in per_layout[1:]:
        stats = stats.unionByName(s)
    stats = query_cache(stats)

    pw, sw = maxp // _PROBE_DENOM, maxs // _PROBE_DENOM
    probes = spark.range(_N_PROBES).select(
        F.col("id").alias("i"),
        (((F.col("id") * 3) % _PROBE_DENOM) * (pw + 1)).alias("p_lo"),
        (((F.col("id") * 3) % _PROBE_DENOM) * (pw + 1) + pw).alias("p_hi"),
        (((F.col("id") * 5) % _PROBE_DENOM) * (sw + 1)).alias("s_lo"),
        (((F.col("id") * 5) % _PROBE_DENOM) * (sw + 1) + sw).alias("s_hi"),
    )
    # file-stat rows x 32 probes: broadcast the probe grid, count
    # overlaps per (layout, probe) with the same FILTER the oracle uses
    hits = (
        stats.join(F.broadcast(probes))
        .groupBy("layout", "i")
        .agg(
            F.sum(
                F.when(
                    (F.col("min_pk") <= F.col("p_hi"))
                    & (F.col("max_pk") >= F.col("p_lo"))
                    & (F.col("min_sk") <= F.col("s_hi"))
                    & (F.col("max_sk") >= F.col("s_lo")),
                    1,
                ).otherwise(0)
            ).alias("files_hit")
        )
    )
    n_files = stats.groupBy("layout").agg(
        F.countDistinct("file_id").alias("n_files")
    )
    return (
        hits.groupBy("layout")
        .agg(
            F.sum("files_hit").alias("sum_files_hit"),
            (F.sum("files_hit").cast("double") / _N_PROBES).alias("avg_files_hit"),
        )
        .join(n_files, "layout")
        .select(
            "layout",
            "n_files",
            F.lit(n).cast("bigint").alias("n_rows"),
            "sum_files_hit",
            "avg_files_hit",
        )
    )


@register(
    "layout_zorder_file_skipping",
    f"""
WITH li AS (SELECT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
nn AS (SELECT COUNT(*) AS c, MAX(pk) AS maxp, MAX(sk) AS maxs FROM li),
norm AS (
  SELECT pk, sk,
         (pk * {1 << ZORDER_BITS_PER_DIM}) // ((SELECT maxp FROM nn) + 1) AS xn,
         (sk * {1 << ZORDER_BITS_PER_DIM}) // ((SELECT maxs FROM nn) + 1) AS yn
  FROM li
),
zf AS (
  SELECT pk, sk,
         ((row_number() OVER (ORDER BY ({_morton_terms(['xn', 'yn'], ZORDER_BITS_PER_DIM, 'duck')}), pk, sk) - 1)
            * {_N_FILES}) // (SELECT c FROM nn) AS file_id
  FROM norm
),
lf AS (
  SELECT pk, sk,
         ((row_number() OVER (ORDER BY pk, sk) - 1) * {_N_FILES})
            // (SELECT c FROM nn) AS file_id
  FROM li
),
stats AS (
  SELECT 'zorder' AS layout, file_id, MIN(pk) AS min_pk, MAX(pk) AS max_pk,
         MIN(sk) AS min_sk, MAX(sk) AS max_sk FROM zf GROUP BY 1, 2
  UNION ALL
  SELECT 'linear', file_id, MIN(pk), MAX(pk), MIN(sk), MAX(sk) FROM lf GROUP BY 1, 2
),
probes AS (
  SELECT i,
         ((i * 3) % {_PROBE_DENOM}) * ((SELECT maxp FROM nn) // {_PROBE_DENOM} + 1) AS p_lo,
         ((i * 3) % {_PROBE_DENOM}) * ((SELECT maxp FROM nn) // {_PROBE_DENOM} + 1)
           + ((SELECT maxp FROM nn) // {_PROBE_DENOM}) AS p_hi,
         ((i * 5) % {_PROBE_DENOM}) * ((SELECT maxs FROM nn) // {_PROBE_DENOM} + 1) AS s_lo,
         ((i * 5) % {_PROBE_DENOM}) * ((SELECT maxs FROM nn) // {_PROBE_DENOM} + 1)
           + ((SELECT maxs FROM nn) // {_PROBE_DENOM}) AS s_hi
  FROM generate_series(0, {_N_PROBES - 1}) t(i)
),
hits AS (
  SELECT s.layout, p.i,
         COUNT(*) FILTER (WHERE s.min_pk <= p.p_hi AND s.max_pk >= p.p_lo
                            AND s.min_sk <= p.s_hi AND s.max_sk >= p.s_lo) AS files_hit
  FROM stats s CROSS JOIN probes p
  GROUP BY 1, 2
)
SELECT layout,
       (SELECT COUNT(DISTINCT file_id) FROM stats s2 WHERE s2.layout = hits.layout) AS n_files,
       (SELECT c FROM nn) AS n_rows,
       CAST(SUM(files_hit) AS BIGINT) AS sum_files_hit,
       CAST(SUM(files_hit) AS DOUBLE) / {_N_PROBES} AS avg_files_hit
FROM hits
GROUP BY 1
""",
)
def layout_zorder_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping evaluation: z-order vs linear layout, same data.

    Simulates writing lineitem's (l_partkey, l_suppkey) into 64
    equal-row files under (a) a linear (pk, sk) sort and (b) a
    normalized-Morton z-order sort, computes each file's min/max stats
    (exactly what parquet footers store), then fires 32 deterministic
    rectangular probes and counts how many files each probe must scan
    (the min/max overlap test — exactly what a stats-pruning reader
    does). Output: one row per layout with total/average files hit.
    Z-order wins ~2-2.5x on these keys; at real scale the same key
    feeds `repartitionByRange(zkey)` before the write.

    Construction runs two driver actions (count + maxima) to inline
    exact bounds — same values the oracle derives in SQL; file
    assignment uses the range-partitioned global ranker (no
    single-partition window). Ties in the z-key are broken by (pk, sk)
    identically in both engines, so file stats are bit-deterministic.
    """
    li, n, maxp, maxs = _skipping_inputs(spark, sf_dir)
    zkeyed = li.withColumn(
        "zkey", zorder_key(["pk", "sk"], {"pk": maxp, "sk": maxs})
    )
    return _skipping_measurement(
        spark,
        n,
        maxp,
        maxs,
        [
            (zkeyed, ["zkey", "pk", "sk"], "zorder", (1 << (2 * ZORDER_BITS_PER_DIM)) - 1),
            (li, ["pk", "sk"], "linear", maxp),
        ],
    )


# ---------------------------------------------------------------------------
# Balanced shard export + manifest
# ---------------------------------------------------------------------------

_N_SHARDS = 64

_SHARD_EXPR_SPARK = (
    SPARK_MD5INT.format(x="cast(doc_id as string)") + f" % {_N_SHARDS}"
)
_SHARD_EXPR_DUCK = (
    DUCK_MD5INT.format(x="CAST(doc_id AS VARCHAR)") + f" % {_N_SHARDS}"
)


@register(
    "sample_shard_manifest",
    f"""
SELECT {_SHARD_EXPR_DUCK} AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       bit_xor({DUCK_MD5INT.format(x='text')}) AS content_fingerprint,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM documents
GROUP BY 1
""",
)
def sample_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest: deterministic md5 hash-sharding of the
    corpus into 64 shards, with per-shard row count, size proxy, and an
    order-independent BIT_XOR content fingerprint. The fingerprint is
    the scale idiom for verifying a delivered shard without re-sorting:
    XOR is commutative/associative, so any engine reading the shard in
    any order reproduces it. One map-side-combined shuffle on the shard
    id (md5 -> uniform, skew-free by construction)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("shard", F.expr(_SHARD_EXPR_SPARK))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.expr(f"bit_xor({SPARK_MD5INT.format(x='text')})").alias(
                "content_fingerprint"
            ),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


def export_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int = _N_SHARDS,
    fingerprint_col: str | None = None,
) -> dict:
    """Write ``df`` as ``n_shards`` hash-sharded parquet directories
    (``shard=K/``) plus a ``_manifest.json`` (underscore prefix: invisible to Spark's
    file listing, like _SUCCESS) the consumer can verify
    against (per-shard row counts and, when ``fingerprint_col`` is
    given, BIT_XOR md5 fingerprints).

    Shard id = md5(key) % n_shards — stable across runs and engines, so
    incremental re-exports land each key in the same shard. The write
    repartitions BY THE SHARD COLUMN so each shard is one task's
    sequential write (no 1000-executors-each-appending-tiny-files
    problem), and partitionBy gives per-shard directories a reader can
    open independently. Returns the manifest dict."""
    shard_expr = SPARK_MD5INT.format(x=f"cast({key_col} as string)")
    sharded = df.withColumn("shard", F.expr(f"{shard_expr} % {n_shards}"))
    sharded.repartition(n_shards, "shard").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(path)
    from ibis_olap_aggregation_spark.sources.io import _invalidate_probe_memo

    _invalidate_probe_memo()  # in-place shard re-export

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if fingerprint_col is not None:
        aggs.append(
            F.expr(
                f"bit_xor({SPARK_MD5INT.format(x=fingerprint_col)})"
            ).alias("fingerprint")
        )
    stats = sharded.groupBy("shard").agg(*aggs).collect()
    manifest = {
        "n_shards": n_shards,
        "key_col": key_col,
        "shards": {
            str(r["shard"]): {
                "n_rows": r["n_rows"],
                **(
                    {"fingerprint": r["fingerprint"]}
                    if fingerprint_col is not None
                    else {}
                ),
            }
            for r in stats
        },
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_shard_manifest(path: str) -> dict:
    with open(os.path.join(path, "_manifest.json")) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# Small-file compaction
# ---------------------------------------------------------------------------


def compact_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    sort_cols: list[str],
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Rewrite a (small-file) parquet directory into ~target-row files
    range-clustered on ``sort_cols``: ``repartitionByRange`` assigns
    contiguous key ranges to files, so the compacted layout ALSO
    carries tight per-file min/max stats on the sort key (compaction
    and clustering in one pass — the lakehouse OPTIMIZE idiom).
    Returns the partition count written. One count + one range shuffle;
    ``maxRecordsPerFile`` caps stragglers if ranges skew."""
    df = spark.read.parquet(src)
    n = df.count()
    n_out = max(1, math.ceil(n / target_rows_per_file))
    (
        df.repartitionByRange(n_out, *sort_cols)
        # sort INSIDE each range partition too: maxRecordsPerFile splits
        # a partition into sequential files, so only a sorted partition
        # yields non-overlapping per-file (and per-row-group) min/max
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_file)
        .parquet(dst)
    )
    from ibis_olap_aggregation_spark.sources.io import _invalidate_probe_memo

    _invalidate_probe_memo()  # in-place compaction rewrite
    return n_out


@register(
    "layout_compaction_plan",
    """
WITH shards AS (
  SELECT source, lang,
         COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS bytes_est
  FROM documents GROUP BY 1, 2
),
planned AS (
  SELECT source, lang, n_docs, bytes_est,
         CAST(FLOOR((SUM(bytes_est) OVER (PARTITION BY source
                       ORDER BY lang
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - bytes_est) / 30000.0) AS BIGINT) AS target_file
  FROM shards
)
SELECT source, lang, n_docs, bytes_est, target_file
FROM planned
""",
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file COMPACTION PLANNING over a shard manifest: assign
    input shards to ~30 KB output files by NEXT-FIT bin packing — the
    running byte total (exclusive of the current shard) divided by the
    target size is the shard's output-file ordinal. This is the
    metadata-side answer to the small-files problem that kills parquet
    scan throughput at 100 TB (every file is an open+footer round
    trip): the plan is computed ENTIRELY at shard grain (the manifest,
    thousands of rows for petabytes of data), and the rewrite itself
    (compact_parquet_dir below) streams data once.

    Next-fit over a deterministic shard order (source, lang) is the
    SQL-expressible packing: first-fit-decreasing packs ~8% tighter but
    is inherently sequential-stateful; next-fit's waste is bounded by
    one target-size per PARTITION, irrelevant beside the open-file
    savings. The ordered window runs per source over the shard-grain
    aggregate, never over documents."""
    d = load_table(spark, sf_dir, "documents")
    shards = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("bytes_est"),
    )
    w = Window.partitionBy("source").orderBy("lang").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return shards.select(
        "source",
        "lang",
        "n_docs",
        "bytes_est",
        F.floor(
            (F.sum("bytes_est").over(w) - F.col("bytes_est")) / F.lit(30000.0)
        )
        .cast("bigint")
        .alias("target_file"),
    )


# ---------------------------------------------------------------------------
# Hilbert-vs-zorder-vs-linear file skipping
# ---------------------------------------------------------------------------

# 5 bits/dim for the three-way comparison: a 32x32 cell grid is the
# right granularity for 64 files (each file spans ~16 cells along the
# curve, so min/max rectangles still differ between curves), and the
# unrolled Hilbert fold stays at 5 layers in both engines.
HILBERT_BITS_PER_DIM = 5


def _hilbert_step_exprs(s: int, n1: int) -> tuple[str, str, str]:
    """One unrolled step of the classic Hilbert xy->d fold (state
    columns x, y, d), as engine-neutral SQL text — the same generator
    feeds Spark selectExpr layers and DuckDB CTE layers, so both
    engines run the identical integer CASE logic (the `_morton_terms`
    precedent). Quadrant increment is (3*rx) XOR ry spelled as a CASE
    on the (rx, ry) pair — no engine-specific XOR spelling; the
    rotation flips against the FULL grid bound ``n1`` (the textbook
    rot(n,...) uses n-1, not s-1)."""
    rx = f"((x & {s}) <> 0)"
    ry = f"((y & {s}) <> 0)"
    nx = f"CASE WHEN {ry} THEN x WHEN {rx} THEN {n1} - y ELSE y END"
    ny = f"CASE WHEN {ry} THEN y WHEN {rx} THEN {n1} - x ELSE x END"
    nd = (
        f"d + CASE WHEN {rx} AND {ry} THEN {2 * s * s} "
        f"WHEN {rx} THEN {3 * s * s} "
        f"WHEN {ry} THEN {s * s} ELSE 0 END"
    )
    return nx, ny, nd


def _hilbert_cte_chain(bits: int) -> str:
    """DuckDB CTE layers hb1..hb{bits} folding (x, y, d) from hb0."""
    n1 = (1 << bits) - 1
    parts = []
    prev = "hb0"
    for step, i in enumerate(reversed(range(bits)), start=1):
        nx, ny, nd = _hilbert_step_exprs(1 << i, n1)
        parts.append(
            f"hb{step} AS (SELECT pk, sk, {nx} AS x, {ny} AS y, {nd} AS d"
            f" FROM {prev})"
        )
        prev = f"hb{step}"
    return ",\n".join(parts)


def hilbert_key_layers(df: DataFrame, bits: int) -> DataFrame:
    """Spark twin of the CTE chain: fold the (x, y, d) state through
    ``bits`` selectExpr layers; expects columns pk, sk, x, y and adds
    the running d (the Hilbert index). Pure map-side expressions — no
    shuffle, exactly like zorder_key."""
    n1 = (1 << bits) - 1
    out = df.selectExpr("pk", "sk", "x", "y", "CAST(0 AS BIGINT) AS d")
    for i in reversed(range(bits)):
        nx, ny, nd = _hilbert_step_exprs(1 << i, n1)
        out = out.selectExpr(
            "pk", "sk", f"{nx} AS x", f"{ny} AS y", f"{nd} AS d"
        )
    return out


_HB = HILBERT_BITS_PER_DIM


@register(
    "layout_hilbert_vs_zorder_skipping",
    f"""
WITH li AS (SELECT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
nn AS (SELECT COUNT(*) AS c, MAX(pk) AS maxp, MAX(sk) AS maxs FROM li),
hb0 AS (
  SELECT pk, sk,
         (pk * {1 << _HB}) // ((SELECT maxp FROM nn) + 1) AS x,
         (sk * {1 << _HB}) // ((SELECT maxs FROM nn) + 1) AS y,
         CAST(0 AS BIGINT) AS d
  FROM li
),
{_hilbert_cte_chain(_HB)},
hf AS (
  SELECT pk, sk,
         ((row_number() OVER (ORDER BY d, pk, sk) - 1) * {_N_FILES})
            // (SELECT c FROM nn) AS file_id
  FROM hb{_HB}
),
zf AS (
  SELECT pk, sk,
         ((row_number() OVER (ORDER BY ({_morton_terms(['x', 'y'], _HB, 'duck')}), pk, sk) - 1)
            * {_N_FILES}) // (SELECT c FROM nn) AS file_id
  FROM hb0
),
lf AS (
  SELECT pk, sk,
         ((row_number() OVER (ORDER BY pk, sk) - 1) * {_N_FILES})
            // (SELECT c FROM nn) AS file_id
  FROM li
),
stats AS (
  SELECT 'hilbert' AS layout, file_id, MIN(pk) AS min_pk, MAX(pk) AS max_pk,
         MIN(sk) AS min_sk, MAX(sk) AS max_sk FROM hf GROUP BY 1, 2
  UNION ALL
  SELECT 'zorder', file_id, MIN(pk), MAX(pk), MIN(sk), MAX(sk) FROM zf GROUP BY 1, 2
  UNION ALL
  SELECT 'linear', file_id, MIN(pk), MAX(pk), MIN(sk), MAX(sk) FROM lf GROUP BY 1, 2
),
probes AS (
  SELECT i,
         ((i * 3) % {_PROBE_DENOM}) * ((SELECT maxp FROM nn) // {_PROBE_DENOM} + 1) AS p_lo,
         ((i * 3) % {_PROBE_DENOM}) * ((SELECT maxp FROM nn) // {_PROBE_DENOM} + 1)
           + ((SELECT maxp FROM nn) // {_PROBE_DENOM}) AS p_hi,
         ((i * 5) % {_PROBE_DENOM}) * ((SELECT maxs FROM nn) // {_PROBE_DENOM} + 1) AS s_lo,
         ((i * 5) % {_PROBE_DENOM}) * ((SELECT maxs FROM nn) // {_PROBE_DENOM} + 1)
           + ((SELECT maxs FROM nn) // {_PROBE_DENOM}) AS s_hi
  FROM generate_series(0, {_N_PROBES - 1}) t(i)
),
hits AS (
  SELECT s.layout, p.i,
         COUNT(*) FILTER (WHERE s.min_pk <= p.p_hi AND s.max_pk >= p.p_lo
                            AND s.min_sk <= p.s_hi AND s.max_sk >= p.s_lo) AS files_hit
  FROM stats s CROSS JOIN probes p
  GROUP BY 1, 2
)
SELECT layout,
       (SELECT COUNT(DISTINCT file_id) FROM stats s2 WHERE s2.layout = hits.layout) AS n_files,
       (SELECT c FROM nn) AS n_rows,
       CAST(SUM(files_hit) AS BIGINT) AS sum_files_hit,
       CAST(SUM(files_hit) AS DOUBLE) / {_N_PROBES} AS avg_files_hit
FROM hits
GROUP BY 1
""",
)
def layout_hilbert_vs_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way file-skipping comparison: Hilbert curve vs Morton
    z-order vs linear sort, same data, same simulated 64-file layout
    and the same 32 rectangular probes as [layout_zorder_file_skipping]
    (both space-filling curves at {HILBERT_BITS_PER_DIM} bits/dim so
    the comparison is apples-to-apples). The Hilbert curve has no bit-
    level discontinuities — consecutive d values are always grid-
    adjacent cells, where Morton order jumps across the key space at
    power-of-two boundaries — so Hilbert files cover tighter min/max
    rectangles and prune better; this query MEASURES that claim
    instead of asserting it.

    The Hilbert index is computed by the textbook xy2d fold unrolled
    to {HILBERT_BITS_PER_DIM} SQL layers from ONE shared generator
    (`_hilbert_step_exprs`) — Spark chains selectExpr projections,
    DuckDB chains CTEs, both running identical integer CASE logic, so
    the curve itself is cross-engine-verified rather than embedded as
    a lookup constant. Locality/bijectivity of the fold is pinned
    from scratch in tests/test_round14_properties.py.

    Scale shape: both curve keys are pure map-side integer expressions
    (like zorder_key); file assignment uses the range-partitioned
    global ranker — three rankings, no single-partition windows; the
    probe grid is a 32-row literal broadcast."""
    li, n, maxp, maxs = _skipping_inputs(spark, sf_dir)
    grid = li.selectExpr(
        "pk",
        "sk",
        f"(pk * {1 << _HB}) DIV {maxp + 1} AS x",
        f"(sk * {1 << _HB}) DIV {maxs + 1} AS y",
    )
    hkeyed = hilbert_key_layers(grid, _HB).withColumnRenamed("d", "hkey")
    zkeyed = grid.withColumn(
        "zkey", F.expr(_morton_terms(["x", "y"], _HB, "spark"))
    )
    return _skipping_measurement(
        spark,
        n,
        maxp,
        maxs,
        [
            (hkeyed, ["hkey", "pk", "sk"], "hilbert", (1 << (2 * _HB)) - 1),
            (zkeyed, ["zkey", "pk", "sk"], "zorder", (1 << (2 * _HB)) - 1),
            (li, ["pk", "sk"], "linear", maxp),
        ],
    )
