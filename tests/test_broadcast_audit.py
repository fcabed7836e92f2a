"""Broadcast-bound gate: every ``F.broadcast(`` site in the source must
carry a CLASSIFIED size bound (tools/broadcast_audit.py — the PARITY.md
audit table generator). A new broadcast hint without a stated bound —
or worse, an SF-linear side hinted unconditionally — fails here until
it is either routed through a probe (session.dim_side /
rollup._resolve_broadcast / the graph caps) or given an explicit bound
rule (VERDICT r10 finding 1: a broadcast HINT is never dropped by Spark
on size, so an unbounded hint is a 100x-scale executor-memory cliff).

Pure source analysis — no SparkSession needed.
"""

from __future__ import annotations

import importlib.util
import os

_TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "broadcast_audit.py",
)


def _load():
    spec = importlib.util.spec_from_file_location("broadcast_audit", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_broadcast_site_classified():
    audit = _load()
    unclassified = []
    n = 0
    for rel, lineno, line, path in audit.sites():
        c = audit.classify(rel, line, path, lineno)
        if c is None:
            continue
        n += 1
        klass, _bound = c
        if klass == "UNCLASSIFIED":
            unclassified.append(f"{rel}:{lineno}: {line}")
    assert n > 50, "audit scanner found suspiciously few broadcast sites"
    assert not unclassified, (
        "F.broadcast sites without a size bound — route through "
        "session.dim_side / a cap probe, or add a bound rule to "
        "tools/broadcast_audit.py:\n" + "\n".join(unclassified)
    )


def test_no_unconditional_sf_linear_table_broadcasts():
    """The raw SF-linear base tables (supplier/part/customer/orders/
    lineitem/documents/embeddings) must never appear directly inside an
    unconditional F.broadcast — they route through dim_side or a regime
    probe. (nation/region are constant-size and exempt.)"""
    audit = _load()
    bad = []
    for rel, lineno, line, _path in audit.sites():
        for pat in (
            'F.broadcast(t["supplier"]', 'F.broadcast(t["part"]',
            'F.broadcast(t["customer"]', 'F.broadcast(t["orders"]',
            'F.broadcast(t["lineitem"]', 'F.broadcast(t["documents"]',
            'F.broadcast(t["embeddings"]',
        ):
            if pat in line:
                bad.append(f"{rel}:{lineno}: {line}")
    assert not bad, "unconditional broadcast of an SF-linear base table:\n" + "\n".join(bad)


def _fake_pkg(tmp_path, body: str) -> str:
    """A synthetic package tree whose similarity.py contains ``body``."""
    pkg = tmp_path / "fakepkg"
    pkg.mkdir()
    (pkg / "similarity.py").write_text(body)
    return str(pkg)


def test_unbounded_q_broadcast_fails_audit(tmp_path):
    """VERDICT r12 'what's wrong' #1: the fixed-k rule must certify by
    the operand's ASSIGNMENT lineage, not its variable name — an
    unbounded side named q (the exact name the rule matches) must fail
    the audit because no bound evidence is reachable from its
    definition."""
    audit = _load()
    pkg = _fake_pkg(
        tmp_path,
        "def f(e, x):\n"
        "    q = e.select('vec_id')\n"  # no bound anywhere
        "    return x.join(F.broadcast(q), 'k')\n",
    )
    assert audit.main(pkg) == 1


def test_bounded_q_broadcast_passes_audit(tmp_path):
    """Positive twin: the same site with an explicit N_QUERIES bound in
    the operand's lineage is certified fixed-k."""
    audit = _load()
    pkg = _fake_pkg(
        tmp_path,
        "def f(e, x):\n"
        "    q = e.filter(F.col('vec_id') < N_QUERIES).select('vec_id')\n"
        "    return x.join(F.broadcast(q), 'k')\n",
    )
    assert audit.main(pkg) == 0


def test_closure_captured_bound_is_visible(tmp_path):
    """A broadcast inside a nested function whose operand is assigned
    (with its bound) in the ENCLOSING scope — the mrl-truncation shape
    — must pass: closures read enclosing assignments."""
    audit = _load()
    pkg = _fake_pkg(
        tmp_path,
        "def f(e, x):\n"
        "    q = e.filter(F.col('vec_id') < N_QUERIES)\n"
        "    def topk(d):\n"
        "        return x.join(F.broadcast(q), 'k')\n"
        "    return topk(4)\n",
    )
    assert audit.main(pkg) == 0


def test_prior_line_grouped_agg_fails_audit(tmp_path):
    """ADVICE r13: the single-row-aggregate witness must not certify
    ``grouped.agg(F.sum(...))`` when the groupBy sits on a PRIOR
    assignment line — that aggregate is SF-linear (one row per group),
    not 1 row. The AST lineage check must follow the receiver name to
    its groupBy definition and refuse."""
    audit = _load()
    pkg = _fake_pkg(
        tmp_path,
        "def f(e, x):\n"
        "    grouped = e.groupBy('k')\n"
        "    q = grouped.agg(F.sum('v').alias('s'))\n"
        "    return x.join(F.broadcast(q), 'k')\n",
    )
    assert audit.main(pkg) == 1


def test_global_agg_via_helper_lineage_passes_audit(tmp_path):
    """Positive twin of the prior-line-grouped case: a TRUE single-row
    global aggregate whose receiver resolves through an assignment
    chain with no grouping call anywhere must certify."""
    audit = _load()
    pkg = _fake_pkg(
        tmp_path,
        "def f(spark, sf_dir, x):\n"
        "    e = query_cache(load_table(spark, sf_dir, 't'))\n"
        "    q = e.agg(F.min('vec_id').alias('qid'))\n"
        "    return x.join(F.broadcast(q), 'k')\n",
    )
    assert audit.main(pkg) == 0


def test_helper_call_receiver_with_grouping_body_refuses(tmp_path):
    """Code-review r14 exploit #1: ``_groups(e).agg(F.sum(...))`` where
    the same-module helper returns ``e.groupBy(k)`` is an SF-linear
    grouped aggregate — the root resolution must scan the helper body
    and refuse."""
    audit = _load()
    pkg = _fake_pkg(
        tmp_path,
        "def _groups(e):\n"
        "    return e.groupBy('k')\n"
        "def f(e, x):\n"
        "    q = _groups(e).agg(F.sum('v').alias('s'))\n"
        "    return x.join(F.broadcast(q), 'k')\n",
    )
    assert audit.main(pkg) == 1


def test_attribute_root_receiver_refuses(tmp_path):
    """Code-review r14 exploit #2: ``obj.grouped.agg(F.sum(...))`` has
    an attribute root the audit cannot resolve — refuse, never assume
    single-row."""
    audit = _load()
    pkg = _fake_pkg(
        tmp_path,
        "def f(obj, x):\n"
        "    q = obj.grouped.agg(F.sum('v').alias('s'))\n"
        "    return x.join(F.broadcast(q), 'k')\n",
    )
    assert audit.main(pkg) == 1


def test_imported_helper_call_root_refuses(tmp_path):
    """A frame-returning call to an IMPORTED (unresolvable) helper as
    the receiver root must refuse — only the canonical loaders and
    query_cache are name-certified, and a same-module def is body-
    scanned; everything else is invisible to the audit."""
    audit = _load()
    pkg = _fake_pkg(
        tmp_path,
        "def f(spark, x):\n"
        "    q = mystery_frame(spark).agg(F.sum('v').alias('s'))\n"
        "    return x.join(F.broadcast(q), 'k')\n",
    )
    assert audit.main(pkg) == 1


def test_bare_parameter_agg_receiver_refuses(tmp_path):
    """An ``.agg`` whose receiver is a bare function PARAMETER has no
    visible lineage — the audit cannot certify what it cannot see, so
    the site must fail rather than assume the parameter is ungrouped."""
    audit = _load()
    pkg = _fake_pkg(
        tmp_path,
        "def f(e, x):\n"
        "    q = e.agg(F.min('vec_id').alias('qid'))\n"
        "    return x.join(F.broadcast(q), 'k')\n",
    )
    assert audit.main(pkg) == 1


def test_call_operand_global_agg_helper_passes_audit(tmp_path):
    """Round-14 PQ shape: ``F.broadcast(_cb_row(cb))`` where the helper's
    return is an ARGLESS groupBy().agg — a 1-row global aggregate by
    construction — must certify through the helper's return expression."""
    audit = _load()
    pkg = _fake_pkg(
        tmp_path,
        "def f(e, x):\n"
        "    def _cb_row(cb_df):\n"
        "        return cb_df.groupBy().agg(F.expr('collect_list(c) AS cbs'))\n"
        "    cb = e.select('m', 'cj', 'c')\n"
        "    return x.crossJoin(F.broadcast(_cb_row(cb)))\n",
    )
    assert audit.main(pkg) == 0


def test_call_operand_grouped_helper_refuses(tmp_path):
    """Negative twin: a helper whose return is a KEYED groupBy().agg is
    SF-linear (one row per group) — the call-operand path must refuse."""
    audit = _load()
    pkg = _fake_pkg(
        tmp_path,
        "def f(e, x):\n"
        "    def _cb_row(cb_df):\n"
        "        return cb_df.groupBy('k').agg(F.expr('collect_list(c) AS cbs'))\n"
        "    cb = e.select('k', 'c')\n"
        "    return x.crossJoin(F.broadcast(_cb_row(cb)))\n",
    )
    assert audit.main(pkg) == 1
