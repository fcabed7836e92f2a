"""Registry import-order robustness.

Operator modules register via the bottom of queries.py, which imports
every sibling — so importing ANY operator module directly (as tests and
downstream users do) re-enters the package mid-initialization. Shared
expression idioms live in leaf modules (functions/idioms.py,
functions/rp_lsh.py) precisely so no operator→operator import edge
exists at module level; this test pins that property for every entry
point (a regression reappears as ImportError: partially initialized
module)."""

from __future__ import annotations

import subprocess
import sys

import pytest

MODULES = [
    "dedup",
    "similarity",
    "text",
    "pipeline",
    "tpch",
    "events",
    "analytic",
    "skew",
    "quality",
    "multimodal",
    "relational",
]


@pytest.mark.parametrize("mod", MODULES)
def test_operator_module_first_import(mod):
    code = (
        f"import ibis_olap_aggregation_spark.operators.{mod}\n"
        "import __spark_entry__ as e\n"
        "q = e.queries(); o = e.oracle_sql()\n"
        "assert len(q) >= 116 and len(o) >= 115, (len(q), len(o))\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
