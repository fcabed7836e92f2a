"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship hierarchical rollup on sf0.001.
``queries()`` / ``oracle_sql()`` expose the engine's named query
registry (ibis_olap_aggregation_spark/queries.py) for the DuckDB
differential correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ibis_olap_aggregation_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.QUERIES["hierarchy_geo_rollup_orders"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each (SQL-expressible) query."""
    return dict(_q.ORACLES)
