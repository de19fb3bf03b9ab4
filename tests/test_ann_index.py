"""Incremental ANN index maintenance (operators/similarity.py::
ivf_index_write / ivf_index_upsert / ivf_topk_preassigned): the delta path
must be gold-equivalent to a fresh full build at the same fixed codebook,
rewrite only the affected cell partitions, and probe identically to the
training-path ivf_topk."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.operators.similarity import (
    ivf_assign,
    ivf_cell_assignments,
    ivf_index_upsert,
    ivf_index_write,
    ivf_topk,
    ivf_topk_preassigned,
    ivf_train_or_init,
)
from bonobo_sqlalchemy_spark.sources.files import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return load_table(spark, sf_small, "embeddings").cache()


@pytest.fixture(scope="module")
def codebook(emb):
    # fixed codebook: deterministic first-16-by-id (oracle-stable)
    return ivf_train_or_init(emb, "embedding", "vec_id", 16, 0)


def _table_rows(spark, path):
    return sorted(
        (int(r["vec_id"]), int(r["cell"]), tuple(r["embedding"]))
        for r in spark.read.parquet(path).collect()
    )


def test_ivf_assign_matches_window_assignment(emb, codebook):
    """The argmax-in-batch assignment must agree with the window-based
    rule ivf_topk uses (first max == dot desc, cell asc) on every row."""
    via_assign = {
        int(r["vec_id"]): int(r["cell"])
        for r in ivf_assign(emb, codebook).collect()
    }
    corpus_cells, _ = ivf_cell_assignments(emb, emb.limit(1), codebook)
    via_window = {
        int(r["neighbor_id"]): int(r["cell"]) for r in corpus_cells.collect()
    }
    assert via_assign == via_window


def test_upsert_gold_equivalent_to_fresh_build(spark, emb, codebook, tmp_path):
    """base (stale + missing rows) --upsert--> must equal a fresh full
    build of the final corpus, content and cell assignments both."""
    delta = emb.where(F.col("vec_id") % 5 == 3)
    stale = delta.where(F.col("vec_id") % 10 == 3).withColumn(
        "embedding", F.reverse("embedding")
    )
    base = emb.where(F.col("vec_id") % 5 != 3).unionByName(stale)

    inc_path = str(tmp_path / "inc")
    ivf_index_write(spark, inc_path, base, codebook)
    ivf_index_upsert(spark, inc_path, delta, codebook)

    fresh_path = str(tmp_path / "fresh")
    ivf_index_write(spark, fresh_path, emb, codebook)

    assert _table_rows(spark, inc_path) == _table_rows(spark, fresh_path)


def test_upsert_rewrites_only_affected_cells(spark, emb, codebook, tmp_path):
    """Partition-level selectivity: cells untouched by the delta keep the
    exact same files (names AND mtimes) after the upsert."""
    path = str(tmp_path / "idx")
    ivf_index_write(spark, path, emb, codebook)

    def file_state():
        out = {}
        for d in os.listdir(path):
            if not d.startswith("cell="):
                continue
            full = os.path.join(path, d)
            out[d] = sorted(
                (f, os.stat(os.path.join(full, f)).st_mtime_ns)
                for f in os.listdir(full)
            )
        return out

    before = file_state()
    # a 3-row delta of fresh ids: touches at most 3 cells
    dim = len(emb.first()["embedding"])
    delta = spark.createDataFrame(
        [(10_000 + i, [float(i + 1)] * dim) for i in range(3)],
        "vec_id bigint, embedding array<double>",
    )
    touched = {int(r["cell"]) for r in ivf_assign(delta, codebook).collect()}
    ivf_index_upsert(spark, path, delta, codebook)
    after = file_state()

    untouched = {d for d in before if int(d.split("=")[1]) not in touched}
    assert untouched, "fixture degenerate: every cell touched"
    for d in untouched:
        assert after[d] == before[d], f"{d} was rewritten"
    for c in touched:
        assert after[f"cell={c}"] != before.get(f"cell={c}")


def test_upsert_moves_vector_across_cells_and_cleans_empty(
    spark, codebook, emb, tmp_path
):
    """An UPDATED vector that lands in a different cell: its old row must
    leave the old cell; if that empties the cell, the partition dir goes
    away entirely (dynamic overwrite would otherwise leave stale files)."""
    # one-vector base: id 999 sits alone in whatever cell its stale vector
    # maps to; the update moves it to the true vector's cell
    dim = len(emb.first()["embedding"])
    v_new = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    stale = spark.createDataFrame(
        [(999, list(reversed(v_new)))], "vec_id bigint, embedding array<double>"
    )
    delta = spark.createDataFrame(
        [(999, v_new)], "vec_id bigint, embedding array<double>"
    )
    old_cell = int(ivf_assign(stale, codebook).first()["cell"])
    new_cell = int(ivf_assign(delta, codebook).first()["cell"])
    if old_cell == new_cell:
        pytest.skip("fixture vectors map to the same cell")

    path = str(tmp_path / "move")
    ivf_index_write(spark, path, stale, codebook)
    assert os.path.isdir(os.path.join(path, f"cell={old_cell}"))
    ivf_index_upsert(spark, path, delta, codebook)
    assert not os.path.isdir(os.path.join(path, f"cell={old_cell}"))
    rows = _table_rows(spark, path)
    assert rows == [(999, new_cell, tuple(v_new))]


def test_preassigned_probe_matches_training_path(spark, emb, codebook, tmp_path):
    """Probing the stored assignment table reproduces ivf_topk exactly at
    the same fixed codebook — same candidates, same rounded sims, same
    tie-broken ranks."""
    path = str(tmp_path / "probe")
    ivf_index_write(spark, path, emb, codebook)
    queries = emb.where(F.col("vec_id") < 8)

    via_index = ivf_topk_preassigned(
        spark.read.parquet(path), queries, codebook, k=5, n_probe=4
    )
    via_train = ivf_topk(emb, queries, k=5, n_probe=4, codebook=codebook)
    norm = lambda df: sorted(map(tuple, df.collect()))
    assert norm(via_index) == norm(via_train)


# ---------------------------------------------------------------------------
# IVF-PQ code table: codes stored next to the data, incrementally maintained
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def books(emb):
    from bonobo_sqlalchemy_spark.operators.similarity import pq_codebooks

    return pq_codebooks(emb, "embedding", "vec_id", m=8, ksub=16, iters=1)


def _code_rows(spark, path):
    return sorted(
        (int(r["vec_id"]), int(r["cell"]), tuple(r["codes"]))
        for r in spark.read.parquet(path).collect()
    )


def test_pq_assign_encode_matches_component_ops(emb, codebook, books):
    """The fused (cell, codes) pass must agree with ivf_assign and
    pq_encode run separately — same argmax/argmin on the same arithmetic."""
    from bonobo_sqlalchemy_spark.operators.similarity import (
        pq_assign_encode,
        pq_encode,
    )

    fused = {
        int(r["vec_id"]): (int(r["cell"]), tuple(r["codes"]))
        for r in pq_assign_encode(emb, codebook, books).collect()
    }
    cells = {
        int(r["vec_id"]): int(r["cell"])
        for r in ivf_assign(emb, codebook).collect()
    }
    codes = {
        int(r["vec_id"]): tuple(r["codes"])
        for r in pq_encode(emb, books, "embedding", "vec_id").collect()
    }
    assert fused == {i: (cells[i], codes[i]) for i in cells}


def test_pq_code_table_upsert_gold_equivalent(spark, emb, codebook, books, tmp_path):
    from bonobo_sqlalchemy_spark.operators.similarity import (
        pq_code_table_upsert,
        pq_code_table_write,
    )

    delta = emb.where(F.col("vec_id") % 5 == 3)
    stale = delta.where(F.col("vec_id") % 10 == 3).withColumn(
        "embedding", F.reverse("embedding")
    )
    base = emb.where(F.col("vec_id") % 5 != 3).unionByName(stale)

    inc = str(tmp_path / "inc")
    pq_code_table_write(spark, inc, base, codebook, books)
    pq_code_table_upsert(spark, inc, delta, codebook, books)
    fresh = str(tmp_path / "fresh")
    pq_code_table_write(spark, fresh, emb, codebook, books)
    assert _code_rows(spark, inc) == _code_rows(spark, fresh)


def test_precoded_probe_matches_training_path(spark, emb, codebook, books, tmp_path):
    """Probing the stored code table reproduces ivfpq_topk exactly at the
    same fixed codebooks — stored codes, probed cells, ADC scores, and
    re-ranked top-k all identical."""
    from bonobo_sqlalchemy_spark.operators.similarity import (
        ivfpq_topk,
        ivfpq_topk_precoded,
        pq_code_table_write,
    )

    path = str(tmp_path / "codes")
    pq_code_table_write(spark, path, emb, codebook, books)
    queries = emb.where(F.col("vec_id") < 8)
    via_table = ivfpq_topk_precoded(
        spark.read.parquet(path), emb, queries, codebook, books, k=5, n_probe=6
    )
    via_train = ivfpq_topk(
        emb, queries, k=5, n_probe=6, m=8, ksub=16,
        codebook=codebook, books=books,
    )
    norm = lambda df: sorted(map(tuple, df.collect()))
    assert norm(via_table) == norm(via_train)


def test_preassigned_probe_prunes_partitions_dynamically(spark, emb, codebook, tmp_path):
    """The point of the cell-partitioned layout: the probe's scan of the
    assignment table must carry a dynamic partition-pruning subquery on
    `cell` (the broadcast query-cells join feeds it), so at scale only
    the probed cells' files are read."""
    path = str(tmp_path / "dpp")
    ivf_index_write(spark, path, emb, codebook)
    out = ivf_topk_preassigned(
        spark.read.parquet(path), emb.where(F.col("vec_id") < 4), codebook,
        k=5, n_probe=4,
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan[:2000]


def test_precoded_probe_prunes_partitions_statically(spark, emb, codebook, books, tmp_path):
    """The IVF-PQ probe filters the code table by the (collected,
    query-sized) probe set, which lands as a static INSET partition
    filter on the `cell` partition column of the stored table."""
    import re

    from bonobo_sqlalchemy_spark.operators.similarity import (
        ivfpq_topk_precoded,
        pq_code_table_write,
    )

    path = str(tmp_path / "inset")
    pq_code_table_write(spark, path, emb, codebook, books)
    out = ivfpq_topk_precoded(
        spark.read.parquet(path), emb, emb.where(F.col("vec_id") < 2),
        codebook, books, k=5, n_probe=2,
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # small probe sets render as IN (..), larger ones as INSET ..
    filters = re.findall(
        r"PartitionFilters: \[cell#\d+ (?:IN \(([^)]*)\)|INSET ([^\]]*))\]",
        plan,
    )
    assert filters, plan[:2000]
    vals = (filters[0][0] or filters[0][1]).split(",")
    # 2 queries x 2 probes: at most 4 distinct cells survive the filter
    assert len(vals) <= 4, filters
