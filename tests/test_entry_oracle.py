"""Differential gate mirror: every registry query vs its DuckDB oracle.

Mimics the driver's t2 check (row-count + schema + order-insensitive
values) locally at sf0.001 so regressions surface in seconds, not at
round end. Comparison is EXACT (the engine's determinism conventions —
decimal-exact sums, bigint ranks — are designed for bit-equality).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from ibis_olap_aggregation_spark.session import TABLES

_ORACLE_NAMES = sorted(entry_mod.oracle_sql().keys())


def run_oracle(sql: str, sf_dir: str, tables: tuple[str, ...] = TABLES) -> pd.DataFrame:
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).fetchdf()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        key = df.astype(str).agg("|".join, axis=1)
        df = df.loc[key.sort_values().index].reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_small, name):
    sdf = entry_mod.queries()[name](spark, sf_small).toPandas()
    odf = run_oracle(entry_mod.oracle_sql()[name], sf_small)
    # the DRIVER canonicalizes via a pandas column lexsort, which dies
    # with `unhashable type: 'list'` on array/struct-typed result cells
    # (the dedup_minhash_signatures r2 red row). Reproduce that exact
    # canonicalization here so an unsortable output shape fails the
    # local mirror too, not just at round end.
    for df, side in ((sdf, "spark"), (odf, "oracle")):
        if len(df):
            try:
                df.sort_values(by=sorted(df.columns))
            except TypeError as exc:
                raise AssertionError(
                    f"{name}: {side} result not driver-canonicalizable "
                    f"(emit sortable scalars, not arrays/structs): {exc}"
                ) from exc
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} != {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} != {sorted(odf.columns)}"
    )
    s, o = normalize(sdf), normalize(odf)
    pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
    # dtype drift is a schema-gate risk — surface it as a failure too
    def _canon(dt: str) -> str:
        # pandas datetime64 resolution is a transport artifact (Arrow ns
        # vs duckdb us); the logical type is TIMESTAMP on both sides
        return "datetime64" if dt.startswith("datetime64") else dt

    mismatched = [
        (c, str(s[c].dtype), str(o[c].dtype))
        for c in s.columns
        if _canon(str(s[c].dtype)) != _canon(str(o[c].dtype))
    ]
    assert not mismatched, f"{name}: dtype mismatches {mismatched}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_totalprice" in df.columns
