"""Deterministic sampling / shuffle / z-order operator properties.

These pin the engine-level guarantees the z_* parity queries can't see:
partitioning-invariance, global order of the written shuffle, weighted-
sampling monotonicity, and the z-order clustering effect on file stats.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.operators.sampling import (
    deterministic_shuffle,
    stratified_sample_exact,
    weighted_sample_topk,
)
from bonobo_sqlalchemy_spark.operators.zorder import zorder_write


@pytest.fixture(scope="module")
def docs(spark):
    from bonobo_sqlalchemy_spark.sources.files import load_table

    return load_table(spark, "/root/testdata/sf0.001", "documents")


def test_stratified_exact_counts_and_partition_invariance(spark, docs):
    s1 = stratified_sample_exact(docs, "lang", 5, "doc_id", seed=3)
    counts = {r.lang: r["count"] for r in s1.groupBy("lang").count().collect()}
    full = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    for lang, n in counts.items():
        assert n == min(5, full[lang])
    # identical sample regardless of input partitioning
    s2 = stratified_sample_exact(docs.repartition(17), "lang", 5, "doc_id", seed=3)
    assert sorted(r.doc_id for r in s1.collect()) == sorted(
        r.doc_id for r in s2.collect()
    )
    # different seed -> different sample
    s3 = stratified_sample_exact(docs, "lang", 5, "doc_id", seed=4)
    assert sorted(r.doc_id for r in s1.collect()) != sorted(
        r.doc_id for r in s3.collect()
    )


def test_deterministic_shuffle_is_globally_ordered_permutation(spark, docs):
    out = deterministic_shuffle(docs.select("doc_id"), "doc_id", seed=1, num_partitions=4)
    # permutation: same id multiset
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in docs.collect()
    )
    # global order: partition i's keys all precede partition i+1's
    parts = out.select("shuffle_key", F.spark_partition_id().alias("pid"))
    bounds = parts.groupBy("pid").agg(
        F.min("shuffle_key").alias("lo"), F.max("shuffle_key").alias("hi")
    )
    rows = sorted(bounds.collect(), key=lambda r: r.pid)
    for prev, nxt in zip(rows, rows[1:]):
        assert prev.hi <= nxt.lo


def test_weighted_sampling_favors_heavy_rows(spark):
    # 200 rows, weight 100 for ids < 20, weight 1 otherwise: the top-40
    # sample must be dominated by heavy rows far beyond their 10% share.
    rows = [(i, 100.0 if i < 20 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, w double")
    got = weighted_sample_topk(df, "w", 40, "id", seed=5)
    heavy = sum(1 for r in got.collect() if r.id < 20)
    assert heavy >= 15  # ~all heavy rows selected; 2 expected by chance


def test_weighted_sampling_deterministic_across_partitioning(spark, docs):
    a = weighted_sample_topk(docs, "n_chars", 25, "doc_id", seed=9)
    b = weighted_sample_topk(docs.repartition(13), "n_chars", 25, "doc_id", seed=9)
    assert [r.doc_id for r in a.collect()] == [r.doc_id for r in b.collect()]


@pytest.mark.parametrize("normalize", ["range", "rank"])
def test_zorder_write_clusters_both_dimensions(spark, tmp_path, normalize):
    from bonobo_sqlalchemy_spark.sources.files import load_table

    part = load_table(spark, "/root/testdata/sf0.01", "part")
    n = part.count()
    zpath = str(tmp_path / f"part_z_{normalize}.parquet")
    zorder_write(part, "p_partkey", "p_size", zpath, num_files=8, normalize=normalize)

    out = spark.read.parquet(zpath)
    assert out.count() == n  # lossless rewrite

    # Each z-ordered file covers a compact rectangle: the per-file spans of
    # BOTH columns must be far below the global span on average (a plain
    # sort on p_partkey would cluster that column only, leaving p_size
    # spans at ~full range in every file).
    def spans(path_glob):
        spans_k, spans_s = [], []
        for f in glob.glob(path_glob):
            t = pq.read_table(f, columns=["p_partkey", "p_size"])
            k = t.column("p_partkey").to_pylist()
            s = t.column("p_size").to_pylist()
            if k:
                spans_k.append(max(k) - min(k))
                spans_s.append(max(s) - min(s))
        return spans_k, spans_s

    # With 8 files the range split consumes the top 3 Morton bits: y
    # (p_size, odd positions) holds 2 of them, x (p_partkey) 1 — so
    # expected per-file spans are ~1/4 and ~1/2 of global respectively.
    gk = part.agg(F.max("p_partkey") - F.min("p_partkey")).collect()[0][0]
    gs = part.agg(F.max("p_size") - F.min("p_size")).collect()[0][0]
    spans_k, spans_s = spans(zpath + "/part-*.parquet")
    assert len(spans_k) >= 4
    assert sum(spans_k) / len(spans_k) <= 0.70 * gk
    assert sum(spans_s) / len(spans_s) <= 0.50 * gs


def test_quantile_bucket_rejects_degenerate_out_range(spark):
    """More surviving boundaries than out_range codes would floor the
    rescale stride to 0 and collapse every bucket to 0 (silently
    un-clustering the Morton key) — the public API must error instead."""
    import pytest

    from bonobo_sqlalchemy_spark.operators.zorder import quantile_bucket

    df = spark.range(1000).selectExpr("CAST(id AS DOUBLE) AS v")
    with pytest.raises(ValueError, match="out_range"):
        quantile_bucket(df, "v", buckets=64, out_range=8)
    # healthy case still spans the requested range
    col = quantile_bucket(df, "v", buckets=8, out_range=64)
    vals = [r[0] for r in df.select(col.alias("b")).distinct().collect()]
    assert min(vals) == 0 and max(vals) > 0


def test_mixture_sample_quotas_and_cap(spark, docs):
    """Exact quotas per group; quota above group population yields the
    whole group; unlisted groups are dropped; partitioning-invariant."""
    from bonobo_sqlalchemy_spark.operators.sampling import mixture_sample

    pops = {r[0]: r[1] for r in docs.groupBy("source").count().collect()}
    src_a, src_b = sorted(pops)[0], sorted(pops)[1]
    targets = {src_a: 3, src_b: 10_000}
    out = mixture_sample(docs, "source", targets, "doc_id", seed=11)
    got = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    assert got == {src_a: 3, src_b: pops[src_b]}
    # deterministic + partitioning-invariant
    ids1 = {r.doc_id for r in out.collect()}
    ids2 = {
        r.doc_id
        for r in mixture_sample(
            docs.repartition(13), "source", targets, "doc_id", seed=11
        ).collect()
    }
    assert ids1 == ids2
    # different seed -> different pick (overwhelmingly likely for quota 3)
    ids3 = {
        r.doc_id
        for r in mixture_sample(docs, "source", {src_a: 3}, "doc_id", seed=12).collect()
    }
    assert ids3 != {i for i in ids1 if i not in ids2 - ids1} or ids3 != ids1


def test_temperature_sample_quotas_follow_sqrt_counts(spark, docs):
    from bonobo_sqlalchemy_spark.operators.sampling import (
        temperature_mixture_sample,
    )
    import math

    out = temperature_mixture_sample(
        docs, "source", total_n=100, id_col="doc_id", tau=0.5, seed=17
    )
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    counts = {r["source"]: r["n"] for r in docs.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    z = sum(math.sqrt(n) for n in counts.values())
    for s, n in counts.items():
        expect = min(n, math.floor(100 * math.sqrt(n) / z))
        assert got.get(s, 0) == expect, (s, got.get(s), expect)


def test_temperature_sample_partitioning_invariant(spark, docs):
    from bonobo_sqlalchemy_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    a = temperature_mixture_sample(
        docs, "source", 80, "doc_id", seed=3
    ).select("doc_id")
    b = temperature_mixture_sample(
        docs.repartition(17), "source", 80, "doc_id", seed=3
    ).select("doc_id")
    assert sorted(r[0] for r in a.collect()) == sorted(r[0] for r in b.collect())
