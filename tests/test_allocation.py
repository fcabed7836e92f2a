"""weighted_closure correctness: property-tested against brute force.

Random parent-pointer forests with random 1-dp edge weights; the Spark
closure (iterative join with DECIMAL(18,6) products) must equal a
driver-side DFS computing the SAME documented arithmetic — Decimal
products quantized HALF_UP to 6 places at each hop (the module
docstring's contract: exact for up to six sub-unit 1-dp weights,
quantized beyond) — for every (descendant, ancestor) pair including
self paths.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ibis_olap_aggregation_spark.operators.allocation import weighted_closure

_Q6 = Decimal("0.000001")


@st.composite
def forests(draw):
    n = draw(st.integers(min_value=2, max_value=16))
    edges = []
    for child in range(1, n):
        # parent strictly smaller -> acyclic; some nodes stay roots
        if draw(st.booleans()):
            parent = draw(st.integers(min_value=0, max_value=child - 1))
            w_tenths = draw(st.integers(min_value=1, max_value=10))
            edges.append((child, parent, w_tenths))
    return edges


def _brute(edges: list[tuple[int, int, int]]):
    parent = {c: (p, Decimal(w) / Decimal(10)) for c, p, w in edges}
    nodes = {c for c, _, _ in edges} | {p for _, p, _ in edges}
    out: dict[tuple[int, int], Decimal] = {}
    depth = 0
    for node in nodes:
        out[(node, node)] = Decimal(1).quantize(_Q6)
        cur, pw, hops = node, Decimal(1), 0
        while cur in parent:
            nxt, w = parent[cur]
            # the documented arithmetic: quantize after every multiply
            pw = (pw * w).quantize(_Q6, rounding=ROUND_HALF_UP)
            hops += 1
            out[(node, nxt)] = pw
            cur = nxt
        depth = max(depth, hops)
    return out, depth


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=forests())
def test_weighted_closure_matches_bruteforce(spark, edges):
    if not edges:
        return
    expected, depth = _brute(edges)
    df = spark.createDataFrame(
        [(c, p, Decimal(w) / Decimal(10)) for c, p, w in edges],
        "child bigint, parent bigint, w decimal(3,1)",
    )
    got = {
        (r["descendant"], r["ancestor"]): r["pw"].quantize(_Q6)
        for r in weighted_closure(df, max_depth=max(2, depth)).collect()
    }
    assert got == expected


def test_deep_subunit_chain_quantizes_like_documented(spark):
    """0.5^7 needs 7 decimal places: the closure's per-hop DECIMAL(18,6)
    quantization must round it at hop 7 exactly as documented — pinning
    the behavior past the exactness horizon."""
    edges = [(i, i - 1, 5) for i in range(1, 8)]  # chain of 0.5 weights
    expected, depth = _brute(edges)
    df = spark.createDataFrame(
        [(c, p, Decimal(w) / Decimal(10)) for c, p, w in edges],
        "child bigint, parent bigint, w decimal(3,1)",
    )
    got = {
        (r["descendant"], r["ancestor"]): r["pw"].quantize(_Q6)
        for r in weighted_closure(df, max_depth=depth).collect()
    }
    assert got == expected
    assert got[(7, 0)] == Decimal("0.007813")  # 0.5^7 rounded HALF_UP
