"""Integer fixed-point PageRank: reference equivalence, determinism,
structure sensitivity, mass accounting."""

from __future__ import annotations

from bonobo_sqlalchemy_spark.operators.graphalgo import (
    _DAMP_DEN,
    _DAMP_NUM,
    pagerank_integer,
)

SCALE = 10**12


def _reference(edges, iters=6, scale=SCALE):
    """Pure-Python mirror of the integer recurrence (the same role the
    DuckDB CTE chain plays in the oracle)."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: scale // n for v in nodes}
    for _ in range(iters):
        inc = {v: 0 for v in nodes}
        for s, d in edges:
            inc[d] += r[s] // outdeg[s]
        r = {v: (3 * scale) // (20 * n) + (_DAMP_NUM * inc[v]) // _DAMP_DEN for v in nodes}
    return r


def _sym(pairs):
    return [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]


def test_pagerank_matches_python_reference(spark):
    edges = _sym([(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 1), (2, 5)])
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank_integer(df, iters=6).collect()}
    assert got == _reference(edges, iters=6)


def test_pagerank_partitioning_bit_exact(spark):
    edges = _sym([(i, (i * 7) % 23) for i in range(23)] + [(i, (i + 1) % 23) for i in range(23)])
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r.node: r.rank for r in pagerank_integer(df, iters=5).collect()}
    b = {r.node: r.rank for r in pagerank_integer(df.repartition(11), iters=5).collect()}
    assert a == b


def test_pagerank_hub_dominates_star(spark):
    """Symmetric star: the hub must out-rank every leaf."""
    edges = _sym([(0, i) for i in range(1, 12)])
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank_integer(df, iters=8).collect()}
    hub = got[0]
    assert all(hub > v for k, v in got.items() if k != 0)
    # leaves are symmetric — identical ranks
    assert len({v for k, v in got.items() if k != 0}) == 1


def test_pagerank_mass_accounting(spark):
    """Total rank stays within the floor-leak bound of the damped fixed
    point (1 unit per node per division, per iteration)."""
    edges = _sym([(i, (i + 1) % 9) for i in range(9)])
    df = spark.createDataFrame(edges, "src long, dst long")
    got = pagerank_integer(df, iters=6).collect()
    total = sum(r.rank for r in got)
    # on a regular graph the fixed point conserves ~scale
    assert abs(total - SCALE) < 9 * 6 * 4  # nodes * iters * slop
    assert all(r.rank > 0 for r in got)


def test_pagerank_plan_is_jvm_side(spark):
    """The whole 6-round computation is one declarative plan: no Python
    workers, no cartesian products."""
    edges = _sym([(i, (i + 1) % 9) for i in range(9)])
    df = spark.createDataFrame(edges, "src long, dst long")
    plan = pagerank_integer(df, iters=3)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
