"""`partitioning.rebalance_narrow_input` — the scale-conditional
repartition-after-read (guide §2.5) used by the dedup/similarity/BPE/CMS
CPU-dense entry points.

Contract under test:

- a narrow file input (one small local parquet — the shipped fixtures)
  GETS the exchange, so a CPU-dense stage downstream fans out;
- an in-memory frame (no file input) is returned unchanged;
- a frame that already plans to >= defaultParallelism input files is
  returned unchanged (the at-scale no-op, simulated by writing many
  files);
- values are never affected (repartitioning is a physical-layout move).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.partitioning import rebalance_narrow_input

SF = "/root/testdata/sf0.001"


def _has_repartition(df) -> bool:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return "RepartitionByExpression" in plan or "Repartition" in plan


def test_narrow_parquet_scan_is_rebalanced(spark, tmp_path):
    # A private copy of the fixture, NOT the shared /root/testdata path:
    # other test modules cache() frames over the shared file, and cache
    # substitution makes inputFiles() on any later plan over that file
    # return [] — which the helper conservatively treats as "no file
    # input" (pass through). The contract under test is the narrow-FILE
    # leg, so probe it on a file nothing else caches.
    p = str(tmp_path / "docs")
    spark.read.parquet(f"{SF}/documents.parquet").coalesce(1).write.parquet(p)
    docs = spark.read.parquet(p)
    out = rebalance_narrow_input(docs.select("doc_id", "text"), "doc_id")
    assert _has_repartition(out), "one-small-file scan must get the exchange"
    # and values are untouched
    assert out.count() == docs.count()


def test_cache_substituted_frame_passes_through(spark):
    """Cache substitution hides the file relation from inputFiles(); the
    helper must treat that as no-file-input and add NO exchange (the
    cached layout is whatever the persist chose — not ours to second-
    guess from file metadata that no longer drives the scan)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cached = docs.cache()
    try:
        cached.count()
        probe = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "text"
        )
        out = rebalance_narrow_input(probe, "doc_id")
        assert not _has_repartition(out)
    finally:
        cached.unpersist()


def test_in_memory_frame_is_unchanged(spark):
    df = spark.createDataFrame([(i, f"t{i}") for i in range(10)], "id long, t string")
    out = rebalance_narrow_input(df, "id")
    assert out is df, "no file input -> returned unchanged"


def test_wide_file_input_is_unchanged(spark, tmp_path):
    """>= defaultParallelism files == the scan fans out on its own: the
    helper must add NO exchange (the production no-op leg)."""
    par = spark.sparkContext.defaultParallelism
    p = str(tmp_path / "wide")
    spark.range(par * 10).withColumn("t", F.lit("x")).repartition(
        par
    ).write.parquet(p)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) >= par
    out = rebalance_narrow_input(df, "id")
    assert not _has_repartition(out), "wide input must pass through untouched"


def test_values_identical_after_rebalance(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    a = sorted(tuple(r) for r in docs.collect())
    b = sorted(tuple(r) for r in rebalance_narrow_input(docs, "doc_id").collect())
    assert a == b
