"""Count-Min sketch: estimator guarantees, merge linearity, self-describing
parameter validation, probe plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_merge,
)


def _keys(spark, items):
    return spark.createDataFrame([(k,) for k in items], "k string")


def test_cms_estimate_is_one_sided_and_tight_when_sparse(spark):
    """With far more cells than keys, estimates are EXACT; always >= true."""
    data = [f"key{i}" for i in range(20) for _ in range(i + 1)]
    df = _keys(spark, data)
    sk = cms_build(df, "k", depth=4, width=4096)
    true = {f"key{i}": i + 1 for i in range(20)}
    est = {
        r.k: r.est
        for r in cms_estimate(sk, _keys(spark, list(true)), "k").collect()
    }
    assert est == true  # no collisions at this sparsity


def test_cms_overcounts_under_collision_pressure(spark):
    """Tiny width forces collisions: estimates stay one-sided (>= true) and
    at least one key genuinely overcounts — the sketch behaves like a
    sketch, not a count table."""
    data = [f"key{i}" for i in range(200) for _ in range(3)]
    df = _keys(spark, data)
    sk = cms_build(df, "k", depth=2, width=16)
    rows = cms_estimate(sk, _keys(spark, [f"key{i}" for i in range(200)]), "k").collect()
    assert all(r.est >= 3 for r in rows)
    assert any(r.est > 3 for r in rows)


def test_cms_merge_equals_combined_build(spark):
    """Counters are linear: merge(build(A), build(B)) == build(A ∪ B),
    cell for cell."""
    a = _keys(spark, [f"k{i % 7}" for i in range(50)])
    b = _keys(spark, [f"k{i % 11}" for i in range(80)])
    merged = cms_merge(
        cms_build(a, "k", depth=3, width=64), cms_build(b, "k", depth=3, width=64)
    )
    combined = cms_build(a.unionByName(b), "k", depth=3, width=64)
    as_set = lambda df: {(r.row, r.pos, r.cnt) for r in df.collect()}
    assert as_set(merged) == as_set(combined)


def test_cms_merge_rejects_mismatched_geometry(spark):
    a = cms_build(_keys(spark, ["x"]), "k", depth=3, width=64)
    b = cms_build(_keys(spark, ["x"]), "k", depth=4, width=64)
    with pytest.raises(ValueError, match="incompatible"):
        cms_merge(a, b)


def test_cms_weighted_build(spark):
    df = spark.createDataFrame([("a", 5), ("a", 7), ("b", 2)], "k string, w int")
    sk = cms_build(df, "k", depth=4, width=1024, weight_col="w")
    est = {r.k: r.est for r in cms_estimate(sk, _keys(spark, ["a", "b"]), "k").collect()}
    assert est == {"a": 12, "b": 2}


def test_cms_probe_plan_broadcasts_sketch(spark):
    df = _keys(spark, [f"k{i}" for i in range(100)])
    sk = cms_build(df, "k", depth=4, width=256)
    plan = (
        cms_estimate(sk, df, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_cms_stream_fold_equals_batch_build(spark, tmp_path):
    """Linearity across micro-batches: folding a 3-file replay equals one
    batch build over all rows, cell for cell."""
    import os

    from bonobo_sqlalchemy_spark.streaming.sketches import (
        cms_from_cells,
        cms_stream_fold,
    )

    d = str(tmp_path / "feed")
    os.makedirs(d)
    all_rows = []
    for i in range(3):
        rows = [(f"k{j % 17}",) for j in range(i * 40, (i + 1) * 40)]
        all_rows += rows
        df = spark.createDataFrame(rows, "k string").coalesce(1)
        df.write.parquet(f"{d}/_t{i}")
        part = next(p for p in os.listdir(f"{d}/_t{i}") if p.endswith(".parquet"))
        os.rename(f"{d}/_t{i}/{part}", f"{d}/b{i}.parquet")
        os.utime(f"{d}/b{i}.parquet", ns=(10**15 + i * 10**9, 10**15 + i * 10**9))
    stream = (
        spark.readStream.schema("k string").option("maxFilesPerTrigger", 1).parquet(d)
    )
    sink, cells, batches = cms_stream_fold(stream, "k", depth=3, width=64)
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()
    assert len(batches) == 3
    folded = cms_from_cells(spark, cells, depth=3, width=64)
    combined = cms_build(spark.createDataFrame(all_rows, "k string"), "k", depth=3, width=64)
    as_set = lambda df: {(r.row, r.pos, r.cnt) for r in df.collect()}
    assert as_set(folded) == as_set(combined)


def test_cms_empty_build_probe_raises_clearly(spark):
    """An empty sketch carries no geometry; probing it is a caller error
    with a clear message, not a silent all-zero estimate."""
    empty = cms_build(_keys(spark, []), "k", depth=4, width=64)
    with pytest.raises(ValueError, match="empty Count-Min sketch"):
        cms_estimate(empty, _keys(spark, ["a"]), "k")


# ---------------------------------------------------------------------------
# KMV / theta set-operation cardinalities (round 14)
# ---------------------------------------------------------------------------

from bonobo_sqlalchemy_spark.operators.sketch import (  # noqa: E402
    _KMV_M,
    kmv_set_cardinalities,
    kmv_set_cardinalities_sql,
)


def _gk(spark, rows):
    return spark.createDataFrame(rows, "g string, key string")


def test_kmv_exact_mode_when_sketches_unfull(spark):
    """Sets smaller than k: every estimate is an EXACT count (theta = M)."""
    rows = [("a", f"u{i}") for i in range(30)] + [("b", f"u{i}") for i in range(10, 50)]
    out = {
        (r.group_a, r.group_b): (r.est_a, r.est_b, r.est_union, r.est_inter)
        for r in kmv_set_cardinalities(_gk(spark, rows), "key", "g", k=64).collect()
    }
    assert out == {("a", "b"): (30, 40, 50, 20)}


def test_kmv_estimator_tracks_truth_when_full(spark):
    """Sets much larger than k: estimates land within the KMV standard
    error (~1/sqrt(k-1), take 4 sigma) of the true cardinalities."""
    n = 4000
    rows = [("a", f"u{i}") for i in range(n)] + [
        ("b", f"u{i}") for i in range(n // 2, n + n // 2)
    ]
    k = 256
    out = kmv_set_cardinalities(_gk(spark, rows), "key", "g", k=k).collect()[0]
    sigma = 4 / (k - 1) ** 0.5
    assert abs(out.est_a - n) <= sigma * n
    assert abs(out.est_b - n) <= sigma * n
    assert abs(out.est_union - 1.5 * n) <= sigma * 1.5 * n
    assert abs(out.est_inter - 0.5 * n) <= 2 * sigma * n  # intersection: wider CI


def test_kmv_sketch_is_mergeable(spark):
    """Bottom-k of a union equals bottom-k over concatenated per-shard
    bottom-k's: computing the pair table over pre-sketched shards yields
    the IDENTICAL result as over the raw input — the property that lets
    per-shard sketches fold without revisiting shards."""
    import hashlib
    import random

    rnd = random.Random(7)
    rows = [("a", f"u{rnd.randrange(500)}") for _ in range(900)] + [
        ("b", f"u{rnd.randrange(500, 1200)}") for _ in range(900)
    ]
    full = sorted(
        tuple(r)
        for r in kmv_set_cardinalities(_gk(spark, rows), "key", "g", k=32).collect()
    )

    # Pre-REDUCE each shard to its per-group bottom-32 sketch (python twin
    # of _kmv_hash: 40-bit int from the first 10 md5 hex chars), keeping
    # only the 32 keys with the smallest fingerprints per (shard, group) —
    # a genuine lossy sketch, NOT the raw shard. Feeding the concatenated
    # sketches back through the operator must reproduce the full-input
    # result exactly: bottom-k(union) == bottom-k(concat of bottom-k's).
    def py_fp(key: str) -> int:
        return int(hashlib.md5(key.encode()).hexdigest()[:10], 16)

    shards = [rows[0::2], rows[1::2]]
    sketch_rows = []
    for s in shards:
        per_group: dict[str, set[str]] = {}
        for g, key in s:
            per_group.setdefault(g, set()).add(key)
        for g, keys in per_group.items():
            bottom = sorted(keys, key=py_fp)[:32]
            sketch_rows += [(g, key) for key in bottom]
    # the sketches really dropped keys (the merge is not a trivial concat)
    assert len({k for _, k in sketch_rows}) < len({k for _, k in rows})
    merged = sorted(
        tuple(r)
        for r in kmv_set_cardinalities(
            _gk(spark, sketch_rows), "key", "g", k=32
        ).collect()
    )
    assert full == merged


def test_kmv_sql_twin_matches(spark):
    import duckdb

    rows = [("a", f"u{i * 7 % 300}") for i in range(400)] + [
        ("b", f"u{(i * 11 + 5) % 300}") for i in range(350)
    ] + [("c", f"u{i}") for i in range(20)]
    got = sorted(
        tuple(r)
        for r in kmv_set_cardinalities(_gk(spark, rows), "key", "g", k=48).collect()
    )
    values = ", ".join(f"('{g}', '{k}')" for g, k in rows)
    sql = kmv_set_cardinalities_sql(
        f"SELECT * FROM (VALUES {values}) AS t(g, key)", k=48
    )
    ref = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == ref


def test_kmv_theta_branch_engages_on_mixed_sizes(spark):
    """One full sketch + one unfull sketch: theta_ab comes from the full
    side and the estimator branch (not the exact branch) produces the
    pair numbers — guards the CASE wiring."""
    rows = [("big", f"u{i}") for i in range(2000)] + [
        ("tiny", f"u{i}") for i in range(40)
    ]
    out = kmv_set_cardinalities(_gk(spark, rows), "key", "g", k=64).collect()[0]
    # tiny ⊂ big: union ≈ |big|, inter ≈ |tiny| (both through the theta path)
    assert abs(out.est_union - 2000) <= 1200  # 4-sigma at k=64 is ~50%
    assert abs(max(out.est_a, out.est_b) - 2000) <= 1200  # full side estimates
    assert min(out.est_a, out.est_b) == 40  # unfull side stays exact


def test_kmv_stream_fold_equals_batch_bottomk(spark):
    """Folding per-batch bottom-k's through the streaming sink yields the
    IDENTICAL sketch (and therefore the identical distinct estimate) as
    one bottom-k over the concatenated feed — the mergeability contract
    the six-micro-batch replay query relies on."""
    from bonobo_sqlalchemy_spark.operators.sketch import _kmv_hash
    from bonobo_sqlalchemy_spark.streaming.sketches import (
        kmv_distinct_estimate,
        kmv_stream_fold,
    )

    all_keys = [f"u{i * 13 % 500}" for i in range(700)]
    batches_in = [all_keys[i::5] for i in range(5)]  # 5 uneven slices
    sink, state, seen = kmv_stream_fold(None, "k", k=32)  # stream unused by sink
    for bid, keys in enumerate(batches_in):
        sink(spark.createDataFrame([(x,) for x in keys], "k string"), bid)
    assert len(seen) == 5
    full = (
        spark.createDataFrame([(x,) for x in all_keys], "k string")
        .select(_kmv_hash(F.col("k")).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(32)
        .collect()
    )
    assert state["vals"] == [r.hv for r in full]
    k_used, est = kmv_distinct_estimate(state["vals"], 32)
    true = len(set(all_keys))
    assert k_used == 32
    assert abs(est - true) <= 4 / (31**0.5) * true  # 4 sigma


def test_kmv_distinct_estimate_exact_when_unfull(spark):
    from bonobo_sqlalchemy_spark.streaming.sketches import (
        kmv_distinct_estimate,
        kmv_stream_fold,
    )

    sink, state, seen = kmv_stream_fold(None, "k", k=64)
    sink(spark.createDataFrame([(f"u{i}",) for i in range(20)], "k string"), 0)
    sink(spark.createDataFrame([(f"u{i}",) for i in range(10, 30)], "k string"), 1)
    k_used, est = kmv_distinct_estimate(state["vals"], 64)
    assert (k_used, est) == (30, 30)


def test_kmv_single_group_yields_no_pairs(spark):
    out = kmv_set_cardinalities(
        _gk(spark, [("only", f"u{i}") for i in range(10)]), "key", "g", k=8
    )
    assert out.columns == [
        "group_a", "group_b", "est_a", "est_b", "est_union", "est_inter"
    ]
    assert out.count() == 0
