"""Cross-engine expression idioms shared by operator modules.

Leaf module (imports nothing from the package) so that operator modules
and the registry can all use these without import-order cycles.

Each idiom exists in a Spark-SQL and a DuckDB-SQL spelling that produce
IDENTICAL values — the foundation of the differential oracle gate:

- md5-derived 60-bit integers (deterministic hashing/bucketing): the
  first 15 hex chars of md5 parsed as an integer. 15 chars keep the
  value < 2^60, inside BIGINT range on both engines.
- array cosine: sequential fold over the array on both sides (per-row
  evaluation order is fixed, unlike a distributed SUM), rounded by
  callers to 6 decimals before any comparison.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def tokens_col(text_col: str = "text") -> F.Column:
    """Whitespace tokenizer (documents.text is space-separated lowercase).
    DuckDB twin: string_split_regex(trim(text), '\\s+')."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


# -- md5 -> bigint ---------------------------------------------------------
SPARK_MD5INT = "cast(conv(substr(md5({x}), 1, 15), 16, 10) as bigint)"
DUCK_MD5INT = "('0x' || substr(md5({x}), 1, 15))::BIGINT"

# -- cosine over array<double> --------------------------------------------
SPARK_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0d, (acc, x) -> acc + x)"
SPARK_NORM = "sqrt(aggregate(transform({a}, x -> x * x), 0d, (acc, x) -> acc + x))"


def spark_cosine(a: str, b: str) -> str:
    return (
        f"({SPARK_DOT.format(a=a, b=b)}) / "
        f"(({SPARK_NORM.format(a=a)}) * ({SPARK_NORM.format(a=b)}))"
    )


DUCK_COS = """
list_sum(list_transform(generate_series(1, 64), i -> {a}[i] * {b}[i]))
  / (sqrt(list_sum(list_transform({a}, x -> x * x)))
     * sqrt(list_sum(list_transform({b}, x -> x * x))))
"""

# -- IVF scoring prelude (DuckDB side) --------------------------------------
# Shared by every IVF-family oracle (similarity.py, pipeline.py): embeddings
# -> exact-DECIMAL per-label centroid means (cross-ROW sums are the one
# place order-independence genuinely needs decimal — engines aggregate in
# different orders) -> FLOAT array-fold scoring against the centroid arrays
# (per-row sequential fold: evaluation order is fixed and identical to the
# Spark zip_with/aggregate fold, so plain doubles are bit-identical across
# engines — the same already-proven contract as DUCK_COS/SPARK_DOT) -> the
# per-vector centroid rank on the 6-rounded cosine. The float scoring path
# replaces the old per-term DECIMAL(28,14) fold: scoring is the hot
# |vectors| x k cost, and decimal arithmetic there was a pure tax — the
# decimal-exact EXPLODED scorer survives as the per-family parity witness
# (similarity._ivf_score_rank, pinned against this path in
# tests/test_new_ops_properties.py).
DUCK_IVF_SCORED = """
e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
ex AS (
  SELECT vec_id, label, i.i AS dim, v[i.i] AS val
  FROM e CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) i
),
cent AS (
  SELECT label AS c_label, dim,
         CAST(SUM(CAST(val AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS cval
  FROM ex GROUP BY 1, 2
),
cent_arr AS (
  SELECT c_label, list(cval ORDER BY dim) AS cvec FROM cent GROUP BY 1
),
scored AS (
  SELECT e.vec_id, e.label, c.c_label,
         list_sum(list_transform(generate_series(1, 64),
                                 i -> e.v[i] * c.cvec[i])) AS dot,
         sqrt(list_sum(list_transform(e.v, x -> x * x)))
           * sqrt(list_sum(list_transform(c.cvec, x -> x * x))) AS norms
  FROM e CROSS JOIN cent_arr c
),
ranked AS (
  SELECT vec_id, label, c_label, ROUND(dot / norms, 6) AS cosine,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY ROUND(dot / norms, 6) DESC, c_label) AS rk
  FROM scored
)
"""
