"""Unit tests for the datapipe10 batch operators: mixture planning,
PSI drift, the cross-source duplication matrix, and segment-level quality
outliers (round-10 verdict action item 2 — these were registered queries
with oracles but had no operator-level unit coverage).

The registered queries (`queries/datapipe10.py`) prove oracle parity on
the sf fixtures; these tests pin the BRANCHES the fixture may not fully
exercise: epoch-cap binding vs slack, zero-weight exclusion visibility,
eps-floored one-sided PSI groups, mirror-pair folding, and the garbage-
chunk gap signal with partition invariance.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.operators.profile import (
    cross_source_dup_matrix,
    distribution_psi,
)
from bonobo_sqlalchemy_spark.operators.quality import segment_quality_outliers
from bonobo_sqlalchemy_spark.operators.sampling import mixture_token_plan


@pytest.fixture(scope="module")
def docs3(spark):
    # three sources with known token mass: a=1000, b=300, c=200
    rows = (
        [(i, "a", 100) for i in range(10)]
        + [(100 + i, "b", 100) for i in range(3)]
        + [(200 + i, "c", 50) for i in range(4)]
    )
    return spark.createDataFrame(rows, "doc_id bigint, source string, n_chars bigint")


def test_mixture_plan_cap_and_deficit_branches(spark, docs3):
    # budget 2000, recipe 50/30/20, cap at 1 epoch:
    #   a: target 1000, avail 1000 -> cap 1000, allocated 1000, deficit 0
    #   b: target 600,  avail 300  -> cap 300,  allocated 300,  deficit 300
    #   c: target 400,  avail 200  -> cap 200,  allocated 200,  deficit 200
    plan = {
        r["source"]: r.asDict()
        for r in mixture_token_plan(
            docs3, {"a": 0.5, "b": 0.3, "c": 0.2}, 2000, max_epochs=1.0
        ).collect()
    }
    assert plan["a"]["allocated_tokens"] == 1000 and plan["a"]["deficit_tokens"] == 0
    assert plan["b"]["allocated_tokens"] == 300 and plan["b"]["deficit_tokens"] == 300
    assert plan["c"]["allocated_tokens"] == 200 and plan["c"]["deficit_tokens"] == 200
    assert plan["b"]["epochs"] == 1.0  # cap binds exactly at max_epochs
    assert plan["a"]["epochs"] == 1.0


def test_mixture_plan_epoch_cap_above_one_unlocks_repeats(spark, docs3):
    # 2-epoch cap: b can now fill target 600 via repeats (cap 600)
    plan = {
        r["source"]: r.asDict()
        for r in mixture_token_plan(
            docs3, {"a": 0.5, "b": 0.3, "c": 0.2}, 2000, max_epochs=2.0
        ).collect()
    }
    assert plan["b"]["allocated_tokens"] == 600 and plan["b"]["deficit_tokens"] == 0
    assert plan["b"]["epochs"] == 2.0


def test_mixture_plan_absent_source_visible_at_weight_zero(spark, docs3):
    # source c absent from the recipe: planned at weight 0, never dropped
    plan = {
        r["source"]: r.asDict()
        for r in mixture_token_plan(docs3, {"a": 0.7, "b": 0.3}, 1000).collect()
    }
    assert set(plan) == {"a", "b", "c"}
    c = plan["c"]
    assert c["weight"] == 0.0 and c["target_tokens"] == 0
    assert c["allocated_tokens"] == 0 and c["deficit_tokens"] == 0


def test_psi_identical_distributions_is_zero(spark, docs3):
    out = distribution_psi(docs3, docs3, group_col="source", weight_col="n_chars")
    rows = out.collect()
    assert len(rows) == 3
    for r in rows:
        assert r["psi_term"] == 0.0
        assert r["share_a"] == r["share_b"]


def test_psi_one_sided_groups_get_eps_floor(spark):
    a = spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")], "id bigint, g string")
    b = spark.createDataFrame([(1, "x"), (2, "z")], "id bigint, g string")
    rows = {
        r["group"]: r.asDict()
        for r in distribution_psi(a, b, group_col="g").collect()
    }
    assert set(rows) == {"x", "y", "z"}
    # y vanished in b, z is brand-new in a: both terms finite and positive
    for g, share_key in (("y", "share_b"), ("z", "share_a")):
        assert rows[g][share_key] == 0.0
        assert math.isfinite(rows[g]["psi_term"]) and rows[g]["psi_term"] > 0
    # vanished-group term matches the eps-floor formula: (p-0)*ln(p/eps)
    p = 1.0 / 3.0
    assert rows["y"]["psi_term"] == pytest.approx(p * math.log(p / 1e-6), abs=1e-6)


def test_dup_matrix_folds_mirrored_pairs_and_pct_sums_to_one(spark, docs3):
    # pairs across (a,b), (b,a) — mirrored source order folds to one cell
    pairs = spark.createDataFrame(
        [(0, 100), (101, 1), (0, 1), (100, 101)], "id1 bigint, id2 bigint"
    )
    rows = {
        (r["source_a"], r["source_b"]): r.asDict()
        for r in cross_source_dup_matrix(docs3, pairs).collect()
    }
    assert set(rows) == {("a", "b"), ("a", "a"), ("b", "b")}
    assert rows[("a", "b")]["n_pairs"] == 2  # (0,100) + (101,1) fold together
    assert sum(r["pct"] for r in rows.values()) == pytest.approx(1.0, abs=2e-6)


def test_segment_outliers_flags_embedded_garbage_block(spark):
    # doc 1: 64 fluent tokens (common words). doc 2: same but tokens 16-31
    # replaced by singletons — its worst chunk must crater while doc_lp
    # stays closer, i.e. gap(doc2) >> gap(doc1).
    common = ["the", "cat", "sat", "here"] * 16  # 64 tokens
    garbage = list(common)
    garbage[16:32] = [f"zq{i}x" for i in range(16)]
    df = spark.createDataFrame(
        [(1, " ".join(common)), (2, " ".join(garbage))],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in segment_quality_outliers(df, chunk=16).collect()
    }
    assert rows[1]["n_chunks"] == 4 and rows[2]["n_chunks"] == 4
    # uniform doc: every chunk identical, gap exactly 0
    assert rows[1]["gap"] == 0.0
    assert rows[1]["doc_lp"] == rows[1]["worst_lp"]
    # garbage block: the min-chunk floor drops far below the mean
    assert rows[2]["worst_lp"] < rows[2]["doc_lp"]
    assert rows[2]["gap"] > 1.0
    # hand-check the uniform doc: all 112 common tokens + 16 singletons
    total = 128.0
    counts = {"the": 28, "cat": 28, "sat": 28, "here": 28}
    clp = sum(math.log2(counts[t] / total) for t in common[:16]) / 16
    assert rows[1]["doc_lp"] == pytest.approx(clp, abs=1e-6)


def test_segment_outliers_partition_invariant(spark, sf_small):
    from bonobo_sqlalchemy_spark.sources.files import load_table

    docs = load_table(spark, sf_small, "documents").limit(60)
    a = sorted(map(tuple, segment_quality_outliers(docs, chunk=16).collect()))
    b = sorted(
        map(tuple, segment_quality_outliers(docs.repartition(13), chunk=16).collect())
    )
    assert a == b


def test_respread_proportional_split_with_ample_headroom(spark, docs3):
    # budget 1000, weights 50/10/40, cap 1.0:
    #   a: target 500, cap 1000 -> base 500, headroom 500
    #   b: target 100, cap 300  -> base 100, headroom 200
    #   c: target 400, cap 200  -> base 200, deficit 200
    # D=200, eligible {a, b}, W=0.6:
    #   extra_a = floor(200*0.5/0.6) = 166, extra_b = floor(200*0.1/0.6) = 33
    from bonobo_sqlalchemy_spark.operators.sampling import (
        mixture_deficit_respread,
    )

    plan = mixture_token_plan(
        docs3, {"a": 0.5, "b": 0.1, "c": 0.4}, 1000, max_epochs=1.0
    )
    out = {
        r["source"]: r.asDict()
        for r in mixture_deficit_respread(plan, max_epochs=1.0).collect()
    }
    assert out["a"]["extra_tokens"] == 166 and out["a"]["allocated_tokens"] == 666
    assert out["b"]["extra_tokens"] == 33 and out["b"]["allocated_tokens"] == 133
    assert out["c"]["extra_tokens"] == 0  # no headroom: it caused the deficit


def test_respread_bounded_by_headroom(spark, docs3):
    # budget 2000, weights 20/50/30, cap 1.0:
    #   a: target 400, cap 1000 -> base 400, headroom 600
    #   b: target 1000, cap 300 -> base 300, deficit 700
    #   c: target 600, cap 200  -> base 200, deficit 400
    # D=1100, eligible {a} only, W=0.2: extra_a = min(1100, 600) = 600
    from bonobo_sqlalchemy_spark.operators.sampling import (
        mixture_deficit_respread,
    )

    plan = mixture_token_plan(
        docs3, {"a": 0.2, "b": 0.5, "c": 0.3}, 2000, max_epochs=1.0
    )
    out = {
        r["source"]: r.asDict()
        for r in mixture_deficit_respread(plan, max_epochs=1.0).collect()
    }
    assert out["a"]["extra_tokens"] == 600  # headroom binds, not the target
    assert out["a"]["allocated_tokens"] == 1000 and out["a"]["epochs"] == 1.0
    assert out["b"]["extra_tokens"] == 0 and out["c"]["extra_tokens"] == 0
    # residual mass even the refill cannot place: 1100 - 600 = 500
    assert sum(r["extra_tokens"] for r in out.values()) == 600


def test_respread_chains(spark, docs3):
    # The output's signed deficit ledger makes a second refill round work
    # by just feeding the output back through (ADVICE r11):
    # budget 1000, weights 10/10/80, cap 1.0 over avail a=1000 b=300 c=200:
    #   round 1: a base 100 (headroom 900), b base 100 (headroom 200),
    #            c base 200 (deficit 600). D=600, W=0.2 ->
    #            extra_a = min(300, 900) = 300, extra_b = min(300, 200)=200
    #            residual = 600 - 500 = 100
    #   round 2 (chained on the output): D2 = sum(ledger) = 100,
    #            eligible {a} (headroom 500), W=0.1 -> extra_a = 100.
    from bonobo_sqlalchemy_spark.operators.sampling import (
        mixture_deficit_respread,
    )

    plan = mixture_token_plan(
        docs3, {"a": 0.1, "b": 0.1, "c": 0.8}, 1000, max_epochs=1.0
    )
    r1 = mixture_deficit_respread(plan, max_epochs=1.0)
    out1 = {r["source"]: r.asDict() for r in r1.collect()}
    assert out1["a"]["extra_tokens"] == 300
    assert out1["b"]["extra_tokens"] == 200
    assert out1["c"]["deficit_tokens"] == 600  # capped source keeps it
    # ledger sums to the unplaced residual
    assert sum(r["deficit_tokens"] for r in out1.values()) == 100
    r2 = mixture_deficit_respread(r1, max_epochs=1.0)
    out2 = {r["source"]: r.asDict() for r in r2.collect()}
    assert out2["a"]["extra_tokens"] == 100
    assert out2["a"]["allocated_tokens"] == 500
    assert out2["b"]["extra_tokens"] == 0  # headroom exhausted in round 1
    # fully placed: the chained ledger drains to zero
    assert sum(r["deficit_tokens"] for r in out2.values()) == 0
    # and a third round is a no-op (D=0), never a claw-back
    out3 = {
        r["source"]: r.asDict()
        for r in mixture_deficit_respread(r2, max_epochs=1.0).collect()
    }
    for s in ("a", "b", "c"):
        assert out3[s]["extra_tokens"] == 0
        assert out3[s]["allocated_tokens"] == out2[s]["allocated_tokens"]


def test_respread_zero_eligible_is_noop(spark, docs3):
    # budget 2000, weights 50/30/20, cap 1.0: every source is capped
    # (headroom 0 across the board), so the refill places nothing
    from bonobo_sqlalchemy_spark.operators.sampling import (
        mixture_deficit_respread,
    )

    plan = mixture_token_plan(
        docs3, {"a": 0.5, "b": 0.3, "c": 0.2}, 2000, max_epochs=1.0
    )
    out = {
        r["source"]: r.asDict()
        for r in mixture_deficit_respread(plan, max_epochs=1.0).collect()
    }
    for s in ("a", "b", "c"):
        assert out[s]["extra_tokens"] == 0
        assert out[s]["allocated_tokens"] == out[s]["base_tokens"]
