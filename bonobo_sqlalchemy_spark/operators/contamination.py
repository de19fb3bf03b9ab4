"""Benchmark-contamination detection: flag corpus documents that share
word-n-gram shingles with a held-out benchmark/eval set.

Training pipelines must exclude documents that leak evaluation data. The
standard check is n-gram overlap: shingle both sides, then count, per
corpus document, how many distinct shingles also occur in any benchmark
document. At 100 TB the corpus side dominates, so the plan must be a
broadcast of the (small) benchmark shingle set against the exploded corpus
shingles — one corpus-side shuffle for the per-document aggregate, never a
corpus-corpus self-join.

Reference scope note: training-data extension surface (SURVEY §2.4); the
reference engine has no equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _exploded_shingles


def benchmark_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_shared: int = 1,
) -> DataFrame:
    """Per corpus document: distinct shingles shared with the benchmark.

    Returns ``(id_col, n_shared_shingles, n_benchmark_docs)`` for documents
    with at least ``min_shared`` shared distinct shingles. The benchmark
    side is broadcast (eval sets are small by construction); corpus
    documents never join each other.
    """
    corp = _exploded_shingles(corpus, text_col, id_col, n).select("id", "g")
    bench = (
        _exploded_shingles(benchmark, text_col, id_col, n)
        .select(F.col("id").alias("bench_id"), "g")
    )
    return (
        corp.join(F.broadcast(bench), "g")
        .groupBy("id")
        .agg(
            F.countDistinct("g").alias("n_shared_shingles"),
            F.countDistinct("bench_id").alias("n_benchmark_docs"),
        )
        .where(F.col("n_shared_shingles") >= min_shared)
        .withColumnRenamed("id", id_col)
    )
