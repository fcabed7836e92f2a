"""Driver-contract invariants for the whole registry, enforced without
executing the queries (schema analysis only — catches contract breaks
in seconds even for queries whose execution takes minutes):

- every queries() entry is callable and analyzes to a DataFrame;
- output column names are unique (the driver sorts columns BY NAME
  before hashing — duplicates would silently corrupt the comparison);
- every oracle_sql() key has a queries() twin;
- names are stable snake_case identifiers.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import DataFrame

import __spark_entry__ as entry_mod

_ALL = sorted(entry_mod.queries())


def test_oracles_subset_of_queries():
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q, o - q


def test_names_are_identifiers():
    for name in _ALL:
        assert re.fullmatch(r"[a-z][a-z0-9_]+", name), name


@pytest.mark.parametrize("name", _ALL)
def test_schema_resolves_with_unique_columns(spark, sf_small, name):
    df = entry_mod.queries()[name](spark, sf_small)
    assert isinstance(df, DataFrame)
    cols = df.columns
    assert len(cols) == len(set(cols)), f"{name}: duplicate columns {cols}"
    assert len(cols) > 0
