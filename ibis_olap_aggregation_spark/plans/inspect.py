"""Physical-plan inspection: make scale properties assertable.

The engine's 100 TB design claims (broadcast the closure dim, push
filters into parquet scans, no redundant shuffles, codegen the hot path)
are properties of the PHYSICAL PLAN, not of test-scale row counts. This
module turns them into first-class assertions used by the test suite
(tests/test_plans.py) so a regression in plan shape fails CI even though
tiny-data results stay correct.

The reference has no analogue — its optimizer is DuckDB's, opaque to it
(SURVEY.md §4.1). Spark exposes the executed plan; we use it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "count_exchanges",
    "has_broadcast_join",
    "pushed_filters",
    "scan_columns",
    "codegen_stage_count",
]


def physical_plan(df: DataFrame, *, executed: bool = False) -> str:
    """String form of the physical plan.

    executed=True runs the query first and returns the AQE-FINAL plan:
    under adaptive execution the pre-run plan is a placeholder — codegen
    spans, runtime cache substitution (InMemoryTableScan) and coalesced
    exchanges only show up in the final plan.
    """
    if executed:
        # collect() executes THIS Dataset's own QueryExecution, finalizing
        # its AdaptiveSparkPlan (count() would plan a different query and
        # leave this one isFinalPlan=false). Test-scale inputs only.
        df.collect()
    qe = df._jdf.queryExecution()
    return str(qe.executedPlan() if executed else qe.sparkPlan())


def _strip_non_executing(plan: str) -> str:
    """Drop plan text that never executes: the AQE '== Initial Plan =='
    section, and the stored build-plan each InMemoryRelation prints under
    itself (the cache is READ at runtime; its lineage is display-only)."""
    plan = plan.split("== Initial Plan ==")[0]
    out: list[str] = []
    skip_deeper_than: int | None = None
    for ln in plan.splitlines():
        indent = len(ln) - len(ln.lstrip(" :+-*("))
        if skip_deeper_than is not None:
            if indent > skip_deeper_than:
                continue
            skip_deeper_than = None
        if "InMemoryRelation" in ln:
            skip_deeper_than = indent
            continue
        out.append(ln)
    return "\n".join(out)


def count_exchanges(df: DataFrame, *, executed: bool = False) -> int:
    """Number of shuffle Exchange operators (broadcast exchanges are NOT
    counted — they move dim-sized data, not the fact stream). With
    executed=True, exchanges inside already-cached (materialized)
    subtrees and the non-executing AQE initial plan are excluded — i.e.
    this counts the shuffles the QUERY pays, not the ones its cached
    inputs paid once at build time."""
    plan = physical_plan(df, executed=executed)
    if executed:
        plan = _strip_non_executing(plan)
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists that reached parquet scans."""
    plan = physical_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists of each parquet scan — column pruning is
    visible as a scan reading fewer columns than the table has."""
    out = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", physical_plan(df)):
        out.append([f.split(":")[0] for f in m.split(",") if f])
    return out


def codegen_stage_count(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen spans in the AQE-final plan
    (the `*(n)` operator prefixes). More spans covering the operators =
    more of the query runs as generated JVM bytecode rather than
    interpreted Volcano iterators."""
    plan = physical_plan(df, executed=True)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    ids.update(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)
