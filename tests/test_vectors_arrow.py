"""Focused tests for the r15 zero-copy Arrow vector paths.

The optimization rewrote `cosine_rounded_arrow`-based verification and the
`matrix_dots`/`hyperplane_table_keys` internals onto raw-Arrow-buffer
extraction (`functions.vectors._list_matrix` + `pairwise_cosine_arrow`).
These tests pin value-identity against the original per-row path and the
ragged/null fallback behavior.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.functions import vectors as V


@pytest.fixture(scope="module")
def pairs_df(spark):
    rows = []
    rng = np.random.default_rng(7)
    for i in range(500):
        a = rng.normal(size=8).astype(np.float32).tolist()
        b = rng.normal(size=8).astype(np.float32).tolist()
        rows.append((i, i + 1000, a, b))
    return spark.createDataFrame(rows, "id1 long, id2 long, v1 array<float>, v2 array<float>")


def test_pairwise_cosine_matches_pandas_udf_path(spark, pairs_df):
    new = {
        (r.id1, r.id2): r.cosine
        for r in V.pairwise_cosine_arrow(pairs_df, "v1", "v2").collect()
    }
    cos = V.cosine_rounded_arrow()
    old = {
        (r.id1, r.id2): r.cosine
        for r in pairs_df.select(
            "id1", "id2", cos("v1", "v2").alias("cosine")
        ).collect()
    }
    assert new == old  # bit-identical doubles, not approx


def test_pairwise_cosine_keeps_passthrough_columns_and_order(spark, pairs_df):
    df = pairs_df.withColumn("tag", F.col("id1") % 3)
    out = V.pairwise_cosine_arrow(df.select("id1", "id2", "tag", "v1", "v2"), "v1", "v2")
    assert out.columns == ["id1", "id2", "tag", "cosine"]
    assert out.count() == 500


def test_pairwise_cosine_empty_input(spark, pairs_df):
    out = V.pairwise_cosine_arrow(pairs_df.where(F.lit(False)), "v1", "v2")
    assert out.collect() == []


def test_pairwise_cosine_gather_bit_equal_to_join_form(spark):
    """The gathered verify (id pairs + closure matrix, guide §8) must be
    BIT-equal to the join-attach verify — same float64 einsum on the same
    vector values, only the transport differs."""
    rng = np.random.default_rng(11)
    vecs = [(i, rng.normal(size=8).tolist()) for i in range(60)]
    vdf = spark.createDataFrame(vecs, "id long, v array<double>")
    pairs = [(a, b) for a in range(0, 60, 3) for b in range(a + 1, 60, 7)]
    pdf = spark.createDataFrame(pairs, "id1 long, id2 long")
    via_gather = {
        (r.id1, r.id2): r.cosine
        for r in V.pairwise_cosine_gather(pdf, vecs, "id1", "id2").collect()
    }
    v1 = vdf.select(F.col("id").alias("id1"), F.col("v").alias("v1"))
    v2 = vdf.select(F.col("id").alias("id2"), F.col("v").alias("v2"))
    via_join = {
        (r.id1, r.id2): r.cosine
        for r in V.pairwise_cosine_arrow(
            pdf.join(v1, "id1").join(v2, "id2").select("id1", "id2", "v1", "v2"),
            "v1",
            "v2",
        ).collect()
    }
    assert via_gather == via_join  # bit-identical doubles, not approx


def test_pairwise_cosine_gather_empty_and_unsorted_rows(spark):
    rng = np.random.default_rng(12)
    vecs = [(i, rng.normal(size=4).tolist()) for i in (5, 1, 9, 3)]  # unsorted ids
    pdf = spark.createDataFrame([(1, 9), (3, 5)], "id1 long, id2 long")
    out = V.pairwise_cosine_gather(pdf, vecs, "id1", "id2").collect()
    assert len(out) == 2
    by_id = {i: np.asarray(v) for i, v in vecs}
    for r in out:
        a, b = by_id[r.id1], by_id[r.id2]
        want = round(float(a @ b / np.sqrt((a @ a) * (b @ b))), 6)
        assert r.cosine == want
    empty = V.pairwise_cosine_gather(
        pdf.where(F.lit(False)), vecs, "id1", "id2"
    ).collect()
    assert empty == []


def test_list_matrix_refuses_silent_reshape_on_ragged_rows():
    import pyarrow as pa

    # total length divisible by n (6 = 3*2) but offsets non-uniform: the
    # fast path MUST detect this and fall back, and the fallback raises
    # (exactly like the original per-row np.vstack) instead of silently
    # producing a mis-shaped matrix
    ragged = pa.array([[1.0, 2.0], [3.0], [4.0, 5.0, 6.0]], pa.list_(pa.float32()))
    with pytest.raises(ValueError):
        V._list_matrix(ragged)


def test_list_matrix_uniform_and_sliced():
    import pyarrow as pa

    arr = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], pa.list_(pa.float32()))
    m = V._list_matrix(arr)
    assert m.shape == (3, 2) and m.dtype == np.float64
    np.testing.assert_array_equal(m, [[1, 2], [3, 4], [5, 6]])
    sl = arr.slice(1, 2)  # offsets no longer start at 0
    m2 = V._list_matrix(sl)
    np.testing.assert_array_equal(m2, [[3, 4], [5, 6]])


def test_matrix_dots_matches_numpy(spark):
    rng = np.random.default_rng(11)
    vecs = [(i, rng.normal(size=6).astype(np.float32).tolist()) for i in range(64)]
    df = spark.createDataFrame(vecs, "vid long, emb array<float>")
    M = rng.normal(size=(4, 6)).tolist()
    out = {r.id: r.dots for r in V.matrix_dots(df, "emb", "vid", M).collect()}
    # reference = the same batched X @ M.T the operator has always used
    # (per-row vector products differ in the last float64 bit from BLAS
    # matrix-matrix blocking; consumers round to 6dp for exactly that)
    X = np.vstack([np.asarray(e, dtype=np.float64) for _, e in vecs])
    D = X @ np.array(M).T
    for i, (vid, _) in enumerate(vecs):
        np.testing.assert_array_equal(out[vid], D[i])


def test_hyperplane_table_keys_packing(spark):
    rng = np.random.default_rng(13)
    vecs = [(i, rng.normal(size=6).astype(np.float32).tolist()) for i in range(32)]
    df = spark.createDataFrame(vecs, "vid long, emb array<float>")
    planes = V.seeded_planes(8, 6, seed=3)  # 2 tables x 4 bits
    out = {
        r.id: r.tkeys
        for r in V.hyperplane_table_keys(df, "emb", "vid", planes, 4).collect()
    }
    W = np.array(planes, dtype=np.float64).T
    weights = 1 << np.arange(4, dtype=np.int64)
    for vid, emb in vecs:
        bits = (np.array(emb, dtype=np.float64) @ W >= 0).astype(np.int64)
        expect = list(bits.reshape(2, 4) @ weights)
        assert out[vid] == expect
