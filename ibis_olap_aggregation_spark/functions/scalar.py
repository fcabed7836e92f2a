"""Scalar expression helpers mirroring the reference's function surface
(SURVEY.md §2.8): indentation (lpad+concat, reference main.py:28-30),
path sort keys, and small conveniences. All JVM-side built-ins — no
Python UDFs — so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["indent", "indented", "path_sort_key"]


def indent(level_col: Column | str, width: int = 7, char: str = "-") -> Column:
    """``lpad(char, (level-1)*width, char)`` — the reference's display
    indent (reference main.py:28). lpad with length 0 returns ''."""
    lvl = F.col(level_col) if isinstance(level_col, str) else level_col
    return F.lpad(F.lit(char), (lvl - F.lit(1)) * F.lit(width), char)


def indented(name_col: Column | str, level_col: Column | str, width: int = 7, char: str = "-") -> Column:
    """indent || name (reference main.py:29-30)."""
    name = F.col(name_col) if isinstance(name_col, str) else name_col
    return F.concat(indent(level_col, width, char), name)


def path_sort_key(path_col: Column | str, field: str) -> Column:
    """Array of one struct field along a path — a deterministic,
    lexicographically comparable depth-first sort key (replaces the
    reference's replace(cast(path as varchar), ']', '') trick,
    reference classes/hierarchy_dimension_table.py:135-137)."""
    p = F.col(path_col) if isinstance(path_col, str) else path_col
    return F.transform(p, lambda x: x.getField(field))
