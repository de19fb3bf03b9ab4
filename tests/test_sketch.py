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
