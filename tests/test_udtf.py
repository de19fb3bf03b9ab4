"""Python-UDTF surface (SURVEY §2.3 UDTF row).

The reference's generator nodes are 1-row-in/N-rows-out transforms
(``readers.py:72-75``, ``tests/test_integration.py:130-134``); the engine
exposes that shape as a Spark 4 Python UDTF and proves it agrees with the
codegen fast path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.functions.udtfs import register_udtfs


def _lateral_chunks(spark, rows, budget):
    register_udtfs(spark)
    spark.createDataFrame(rows, "doc_id int, text string").createOrReplaceTempView(
        "__udtf_t"
    )
    return spark.sql(
        f"SELECT d.doc_id, c.* FROM __udtf_t d, LATERAL chunk_doc(d.text, {budget}) c"
    ).collect()


def test_udtf_chunking_golden(spark):
    got = sorted(
        tuple(r) for r in _lateral_chunks(spark, [(1, "a b c d e"), (2, "x y")], 2)
    )
    assert got == [
        (1, 0, 2, "a b"),
        (1, 1, 2, "c d"),
        (1, 2, 1, "e"),
        (2, 0, 2, "x y"),
    ]


def test_udtf_empty_text_yields_no_rows(spark):
    # Generator-that-never-yields == the reference's empty-page stop.
    assert _lateral_chunks(spark, [(1, ""), (2, "   "), (3, None)], 4) == []


def test_udtf_matches_codegen_chunker(spark):
    # Slow path (UDTF) must agree with the fast path (explode + slice) on
    # chunk boundaries and sizes.
    rows = [(i, " ".join(f"w{j}" for j in range(n))) for i, n in [(1, 130), (2, 64), (3, 1)]]
    udtf_rows = sorted(
        (r["doc_id"], r["chunk_id"], r["n_chunk_tokens"])
        for r in _lateral_chunks(spark, rows, 64)
    )
    df = spark.createDataFrame(rows, "doc_id int, text string").select(
        "doc_id", F.split(F.trim("text"), " +").alias("w")
    )
    fast = (
        df.select(
            "doc_id",
            "w",
            F.explode(
                F.sequence(
                    F.lit(0), F.ceil(F.size("w") / F.lit(64.0)).cast("bigint") - 1
                )
            ).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.least(F.lit(64), F.size("w") - F.col("chunk_id") * 64).alias("n"),
        )
        .collect()
    )
    fast_rows = sorted((r["doc_id"], r["chunk_id"], r["n"]) for r in fast)
    assert udtf_rows == fast_rows
