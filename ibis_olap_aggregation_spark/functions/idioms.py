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
