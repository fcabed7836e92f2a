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


def test_replay_queries_first_import_keeps_scheduler_order():
    """ADVICE r11 item 3: importing streaming.replay_queries FIRST used
    to run queries.py's final reorder before the twins' @register calls
    executed (circular-import partial module), silently dropping them
    from the scheduler's placement. The module now re-runs the reorder
    after its own registrations — the registry ORDER must be identical
    whichever entry point loads first."""
    code = (
        "import ibis_olap_aggregation_spark.streaming.replay_queries\n"
        "from ibis_olap_aggregation_spark.queries import QUERIES\n"
        "print('\\n'.join(QUERIES))\n"
    )
    direct = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert direct.returncode == 0, direct.stderr[-2000:]
    code2 = (
        "from ibis_olap_aggregation_spark.queries import QUERIES\n"
        "print('\\n'.join(QUERIES))\n"
    )
    canonical = subprocess.run(
        [sys.executable, "-c", code2],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert canonical.returncode == 0, canonical.stderr[-2000:]
    assert direct.stdout == canonical.stdout


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
