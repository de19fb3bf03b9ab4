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


def test_pagerank_keeps_zero_indegree_nodes(spark):
    """Pinned node contract (r13 VERDICT #2 / ADVICE): on a RAW DIRECTED
    graph, a node with out-edges but no in-edges (node 3 here) must stay in
    the output holding exactly the base term each round, and its base-mass
    contribution must keep flowing to its neighbors — the recurrence
    re-anchors on the node frame, like the personalized variant."""
    edges = [(1, 2), (2, 1), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank_integer(df, iters=6).collect()}
    ref = _reference(edges, iters=6)
    assert set(got) == {1, 2, 3}
    assert got == ref
    # node 3 receives nothing: its rank is the bare base term
    assert got[3] == (3 * SCALE) // (20 * 3)


def test_pagerank_dangling_node_keeps_rank_but_leaks_mass(spark):
    """A terminal node (in-edges, no out-edges) keeps its rank in the
    output; its damped mass leaks per the documented caller-owned
    dangling policy. The Python reference implements the same recurrence,
    so the leak is bit-consistent, not an engine divergence."""
    edges = [(1, 2), (1, 3), (2, 3)]  # 3 is a sink
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank_integer(df, iters=4).collect()}
    assert got == _reference(edges, iters=4)
    assert got[3] > got[2] > 0  # the sink accumulates, never re-emits


def test_pagerank_checkpoint_interval_value_invariant(spark):
    """The checkpoint cadence is an execution knob, not a semantic one:
    interval 1 / 2 / iters produce bit-identical ranks."""
    edges = [(1, 2), (2, 1), (3, 1), (1, 3), (4, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    outs = [
        {r.node: r.rank for r in pagerank_integer(df, iters=5, checkpoint_interval=k).collect()}
        for k in (1, 2, 5)
    ]
    assert outs[0] == outs[1] == outs[2] == _reference(edges, iters=5)


def test_pagerank_shuffle_join_leg_matches_broadcast_leg(spark):
    """broadcast_ranks=False (the billion-node fallback) runs the same
    recurrence through shuffle joins — values must be bit-identical."""
    edges = _sym([(i, (i * 3) % 17) for i in range(17)]) + [(20, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r.node: r.rank for r in pagerank_integer(df, iters=4).collect()}
    b = {r.node: r.rank for r in pagerank_integer(df, iters=4, broadcast_ranks=False).collect()}
    assert a == b == _reference(edges, iters=4)


def test_pagerank_weighted_equals_exploded_multigraph(spark):
    """weight_col (r14): a pre-aggregated (src, dst, w) edge list is
    exactly w parallel edges — bit-identical ranks, because the
    per-source floor division precedes the weight multiplication. This is
    the contract that lets z_events_markov_rank cache one row per
    distinct transition instead of one per observed transition."""
    multi = [(1, 2), (1, 2), (1, 2), (2, 1), (2, 3), (2, 3), (3, 1), (4, 1), (4, 1)]
    from collections import Counter

    agg = [(s, d, w) for (s, d), w in Counter(multi).items()]
    dm = spark.createDataFrame(multi, "src long, dst long")
    da = spark.createDataFrame(agg, "src long, dst long, w long")
    rm = {r.node: r.rank for r in pagerank_integer(dm, iters=6).collect()}
    ra = {r.node: r.rank for r in pagerank_integer(da, iters=6, weight_col="w").collect()}
    assert rm == ra == _reference(multi, iters=6)


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


def _reference_ppr(edges, seeds, iters=6, scale=SCALE):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    seeds = set(seeds)
    ns = len(seeds)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: (scale // ns if v in seeds else 0) for v in nodes}
    for _ in range(iters):
        inc = {v: 0 for v in nodes}
        for s, d in edges:
            inc[d] += r[s] // outdeg[s]
        r = {
            v: ((3 * scale) // (20 * ns) if v in seeds else 0)
            + (_DAMP_NUM * inc[v]) // _DAMP_DEN
            for v in nodes
        }
    return r


def test_ppr_matches_python_reference(spark):
    from bonobo_sqlalchemy_spark.operators.graphalgo import (
        pagerank_personalized_integer,
    )

    edges = _sym([(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 1), (2, 5)])
    df = spark.createDataFrame(edges, "src long, dst long")
    sd = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.rank for r in pagerank_personalized_integer(df, sd, iters=6).collect()}
    assert got == _reference_ppr(edges, [1], iters=6)


def test_ppr_proximity_ordering_on_a_path(spark):
    """On a symmetric path seeded at one end, rank decays with distance
    from the seed among non-seed nodes once the walk has mixed (short
    horizons show parity oscillation at the tail; the seed itself can sit
    below its neighbor, which receives the seed's ENTIRE out-mass). This
    decay is the property that makes PPR a seed-proximity selector."""
    from bonobo_sqlalchemy_spark.operators.graphalgo import (
        pagerank_personalized_integer,
    )

    edges = _sym([(i, i + 1) for i in range(6)])
    df = spark.createDataFrame(edges, "src long, dst long")
    sd = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.rank for r in pagerank_personalized_integer(df, sd, iters=24).collect()}
    ranks = [got[i] for i in range(1, 7)]  # distances 1..6
    assert all(a > b for a, b in zip(ranks, ranks[1:]))
    assert got[0] > got[2]  # seed still dominates everything past d=1


def test_ppr_nonseed_holds_mass_only_through_proximity(spark):
    """A node disconnected from the seed component ends at rank 0."""
    from bonobo_sqlalchemy_spark.operators.graphalgo import (
        pagerank_personalized_integer,
    )

    edges = _sym([(1, 2), (2, 3)]) + _sym([(10, 11)])
    df = spark.createDataFrame(edges, "src long, dst long")
    sd = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.rank for r in pagerank_personalized_integer(df, sd, iters=8).collect()}
    assert got[10] == 0 and got[11] == 0
    assert got[1] > got[2] > 0


def test_pagerank_empty_edges_yields_empty_ranks(spark):
    """No edges -> no nodes -> empty result (no division-by-zero path is
    ever evaluated; the scalar n broadcast has zero rows to cross into)."""
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank_integer(df, iters=3).count() == 0
