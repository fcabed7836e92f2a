"""Vectorized Python UDF surface: pandas_udf + applyInPandas.

The reference has zero UDFs (SURVEY.md §2.10) — all its Python is SQL
text generation. This engine keeps Python OUT of hot paths (every
operator family is built on JVM expressions), but exposes the two
Arrow-batched escape hatches a real pipeline needs, each verified
against a pure-SQL DuckDB oracle so the Python path is bit-checked:

- `pandas_udf`: scalar vectorized compute over Arrow batches (~10-100x
  row-at-a-time Python; the ONLY acceptable Python scalar form).
- `applyInPandas`: grouped-map for per-group logic; the group is the
  parallelism unit, state fits in one worker's memory per group.

Scale notes: both stream Arrow record batches executor-side — no
driver involvement; applyInPandas shuffles once on the group key (group
cardinality = parallelism, so never group by a 5-value key at scale
without salting — see operators/skew.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ibis_olap_aggregation_spark.queries import register
from ibis_olap_aggregation_spark.session import load_table


def _signal_score(value: pd.Series, n_props: pd.Series) -> pd.Series:
    """Vectorized scalar: bounded score from value and a property count
    (pure pandas arithmetic — one Arrow batch at a time)."""
    return (value.clip(lower=0.0) / (1.0 + value.abs()) + 0.1 * n_props).round(6)


def signal_score():
    """pandas_udf wrapper built lazily — the decorator parses its DDL
    return type against the ACTIVE session, so it cannot run at module
    import (queries.py imports this module before any session exists)."""
    return pandas_udf(_signal_score, "double")


@register(
    "udf_vectorized_score",
    """
SELECT event_id,
       ROUND(CASE WHEN value > 0 THEN value ELSE 0 END / (1 + abs(value))
             + 0.1 * len(json_keys(props)), 6) AS score
FROM events
""",
)
def udf_vectorized_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas_udf scalar path, oracle-checked: the same arithmetic in
    DuckDB SQL must match the Arrow-batched pandas computation exactly."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "n_props", F.size(F.map_keys(F.from_json("props", "map<string,string>")))
    )
    return ev.select(
        "event_id", signal_score()(F.col("value"), F.col("n_props")).alias("score")
    )


_ZSCORE_SCHEMA = (
    "event_id bigint, event_type string, value double, zscore double"
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group normalization: classic grouped-map shape (the group fits
    in memory; sample-stddev ddof=1 to match SQL STDDEV)."""
    mu = pdf["value"].mean()
    sd = pdf["value"].std(ddof=1)
    out = pdf[["event_id", "event_type", "value"]].copy()
    out["zscore"] = ((pdf["value"] - mu) / sd).round(6)
    return out


@register(
    "udf_grouped_zscore",
    """
SELECT event_id, event_type, value,
       ROUND((value - AVG(value) OVER (PARTITION BY event_type))
             / STDDEV_SAMP(value) OVER (PARTITION BY event_type), 6) AS zscore
FROM events
""",
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: z-score of value within each
    event_type. The oracle computes the identical normalization with SQL
    window functions — proving the Python grouped path end-to-end."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(_zscore_group, _ZSCORE_SCHEMA)
