"""Similarity search over embedding columns (SURVEY §2.4).

- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small)
  query set against the corpus; one pass, no shuffle of the corpus, top-k
  per query via ROW_NUMBER. The correctness baseline.
- :func:`lsh_topk` — random-hyperplane LSH buckets: corpus and queries get
  a sign-bit signature; candidates = same bucket (optionally multi-probe by
  shorter prefixes); exact cosine re-rank within candidates. The scale path:
  bucket join replaces the cross product.

Ranking determinism: rank on the *rounded* cosine with the neighbor id as
tie-break, so results are reproducible across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions import vectors as V


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    scored = V.pairwise_cosine_arrow(
        pairs.select("query_id", "neighbor_id", "qv", "cv"), "qv", "cv", out_col="sim"
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def kmeans_codebook(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    iters: int = 3,
) -> list[list[float]]:
    """Distributed spherical k-means codebook for IVF coarse quantization.

    Deterministic init (first *k* corpus vectors by id), then Lloyd
    iterations where every step is distributed: assignment is one fused
    Arrow matmul per batch against the broadcast codebook
    (`matrix_dots` + argmax — spherical: nearest by dot product, matching
    the cosine retrieval metric), the centroid update is a
    (cell, dimension) hash aggregate. ONLY k x dim floats ever reach the
    driver — per iteration, one k·dim-row aggregate result; the corpus
    never moves. Empty cells keep their previous centroid.
    """
    def _unit(vec: list[float]) -> list[float]:
        import math

        n = math.sqrt(sum(x * x for x in vec))
        return [x / n for x in vec] if n > 1e-12 else vec

    init = corpus.orderBy(id_col).limit(k).select(vec_col).collect()
    # Spherical k-means: centroids live on the unit sphere — both the init
    # and every Lloyd update are L2-normalized. Unnormalized means of
    # spread-out members shrink toward zero and deflate the dot-product
    # assignment (the objective would DROP with training).
    codebook = [_unit([float(x) for x in row[0]]) for row in init]
    for _ in range(max(0, iters)):
        # Fused assignment (r15): `ivf_assign` computes the argmax cell in
        # the same Arrow pass that holds the vector, so the per-iteration
        # corpus-by-id join of the old matrix_dots form — a full corpus
        # shuffle (or a broadcast that re-executed the Python stage) at ANY
        # scale — disappears. numpy's first-argmax on the identical
        # ``X @ M.T`` dots is exactly the old array_position(array_max)
        # rule (see ivf_assign's contract), so assignments are
        # bit-identical.
        assigned = ivf_assign(corpus, codebook, vec_col, id_col)
        # mean per (cell, dim): one shuffle keyed (cell, pos) — k*dim groups
        sums = (
            assigned.select("cell", F.posexplode(vec_col).alias("_pos", "_x"))
            .groupBy("cell", "_pos")
            .agg(F.avg(F.col("_x").cast("double")).alias("_m"))
            .collect()
        )
        new_book = [list(c) for c in codebook]  # empty cells keep centroids
        by_cell: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cell.setdefault(r.cell, {})[r._pos] = r._m
        for cell, dims in by_cell.items():
            for pos, m in dims.items():
                new_book[cell][pos] = m
            new_book[cell] = _unit(new_book[cell])
        codebook = new_book
    return codebook


def ivf_train_or_init(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    n_cells: int,
    train_iters: int,
) -> list[list[float]]:
    """Coarse codebook: spherical k-means when ``train_iters > 0``, else the
    deterministic first-``n_cells`` corpus vectors by id (oracle-stable)."""
    if train_iters > 0:
        return kmeans_codebook(corpus, vec_col, id_col, k=n_cells, iters=train_iters)
    cents = corpus.orderBy(id_col).limit(n_cells).select(vec_col).collect()
    return [[float(x) for x in row[0]] for row in cents]


def ivf_cell_assignments(
    corpus: DataFrame,
    queries: DataFrame,
    codebook: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """(corpus_cells, query_cells): each corpus vector's single nearest cell
    and each query's ``n_probe`` nearest cells, both via one fused Arrow
    matmul per batch against the broadcast codebook. Shared by
    :func:`ivf_topk` and :func:`ivfpq_topk`; also the unit the
    candidate-fraction tests measure."""

    def cell_dots(df: DataFrame, out_id: str) -> DataFrame:
        return V.matrix_dots(df, vec_col, id_col, codebook, out_id=out_id).select(
            out_id, F.posexplode("dots").alias("cell", "dot")
        )

    # Corpus side (r15): the fused argmax pass — numpy first-argmax on the
    # identical ``X @ M.T`` dots is exactly the old
    # ``row_number() over (dot desc, cell asc) = 1`` rule, with no
    # N*n_cells-row explode, no corpus-wide window shuffle and no sort
    # (see ivf_assign's contract; the window form survives below only for
    # the query side, whose frame is query-set-sized).
    corpus_cells = ivf_assign(corpus, codebook, vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"), "cell"
    )
    w_probe = W.partitionBy("qid").orderBy(F.col("dot").desc(), F.col("cell"))
    query_cells = (
        cell_dots(queries, "qid")
        .withColumn("rn", F.row_number().over(w_probe))
        .where(F.col("rn") <= n_probe)
        .select(F.col("qid").alias("query_id"), "cell")
    )
    return corpus_cells, query_cells


def ann_index_save(
    spark: "SparkSession",
    path: str,
    codebook: list[list[float]],
) -> None:
    """Persist a coarse codebook as parquet ``(cell bigint, w
    array<double>)`` — the train-once half of the production ANN operating
    mode: at 100 TB the quantizer is trained ONCE (on a sample), written
    next to the corpus, and every subsequent ingest assignment or query
    probe loads it instead of re-deriving it — index build must never be
    an implicit side effect of each query call. The parquet is
    codebook-sized (n_cells × dim doubles), trivially broadcastable."""
    rows = [(i, [float(x) for x in w]) for i, w in enumerate(codebook)]
    df = spark.createDataFrame(rows, "cell bigint, w array<double>")
    df.coalesce(1).write.mode("overwrite").parquet(path)


def ann_index_load(spark: "SparkSession", path: str) -> list[list[float]]:
    """Load a codebook persisted by :func:`ann_index_save`, cell order
    restored. The collect is codebook-sized by contract (n_cells rows —
    the same bounded driver-side footprint `ivf_train_or_init` already
    has), never corpus-sized."""
    rows = spark.read.parquet(path).orderBy("cell").collect()
    return [[float(x) for x in r["w"]] for r in rows]


def ivf_assign(
    df: DataFrame,
    codebook: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(id_col, vec_col, cell)``: each vector's single nearest coarse
    cell under a FIXED codebook — one fused Arrow matmul per batch with
    ``argmax`` row-local (numpy argmax takes the FIRST max, which is
    exactly :func:`ivf_cell_assignments`'s ``row_number() over (dot desc,
    cell asc)`` tie rule on bit-identical dots, so the two assignment
    paths agree everywhere). Unlike `ivf_cell_assignments` this carries
    the vector through, producing the self-contained row an assignment
    TABLE stores — no corpus re-join, no shuffle, no window. r15: the
    pass is ``mapInArrow`` over the zero-copy ``_list_matrix`` extraction
    (the same boundary the other vector passes use) — the old
    ``mapInPandas`` + per-row ``np.vstack`` form paid one Python object
    conversion per vector on BOTH sides of the boundary; the float64
    values and the argmax are unchanged."""
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    M = np.array(codebook, dtype=np.float64)  # (k, dim)
    src = df.select(id_col, vec_col)
    out_schema = StructType(
        list(src.schema.fields) + [StructField("cell", IntegerType())]
    )
    names = [f.name for f in src.schema.fields] + ["cell"]

    def _assign(batches):
        import pyarrow as pa

        for b in batches:
            if b.num_rows:
                X = V._list_matrix(b.column(b.schema.get_field_index(vec_col)))
                cells = (X @ M.T).argmax(axis=1).astype("int32")
            else:
                cells = np.empty(0, dtype="int32")
            cols = [b.column(i) for i in range(b.num_columns)]
            cols.append(pa.array(cells, type=pa.int32()))
            yield pa.RecordBatch.from_arrays(cols, names)

    return src.mapInArrow(_assign, out_schema)


def ivf_index_write(
    spark: "SparkSession",
    path: str,
    corpus: DataFrame,
    codebook: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Full build of the cell-partitioned IVF assignment TABLE: every
    corpus vector routed through the (fixed, usually
    :func:`ann_index_load`-ed) codebook and written as parquet partitioned
    by ``cell``. This is the other half of the persisted-index story: the
    codebook outlives the driver (`ann_index_save`), and the corpus-side
    inverted lists outlive it too — a probe then reads ONLY the probed
    cells' partitions (partition pruning at the source) instead of
    re-assigning the whole corpus per query batch."""
    ivf_assign(corpus, codebook, vec_col, id_col).write.partitionBy(
        "cell"
    ).mode("overwrite").parquet(path)


def ivf_index_upsert(
    spark: "SparkSession",
    path: str,
    delta: DataFrame,
    codebook: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Incremental maintenance of an :func:`ivf_index_write` table: route
    an ingest batch of new/updated vectors through the LOADED codebook and
    rewrite ONLY the affected cell partitions — the delta path a daily
    100 TB ingest needs, where re-assigning the full corpus per batch is
    the cost being avoided. Result is gold-equivalent to a fresh full
    build over (base minus delta-ids, plus delta) at the same fixed
    codebook (asserted in tests/test_ann_index.py, and value-exact via
    the registered ``z_sim_ivf_incremental`` query, which shares
    `sim_ivf_topk`'s oracle verbatim).

    Affected cells = the delta's NEW cells ∪ the cells currently holding
    any updated id (an updated vector may MOVE cells; its old row must
    go). Locating old cells costs one column-pruned ``(id, cell)`` scan of
    the table anti-joined down to the delta ids — never a vector read.
    Driver-side footprint: one distinct-cell collect, ≤ n_cells rows
    (codebook-bounded, never data-sized). Delta-size contract: the delta
    id set broadcasts into the joins (an ingest batch, not a corpus — a
    corpus-sized delta should be a fresh :func:`ivf_index_write`).

    Same dynamic-partition-overwrite protocol as
    ``operators/export.py::update_training_shards``: merged partitions are
    localCheckpoint-materialized BEFORE the overwrite (their lineage reads
    the files being replaced), and a cell whose every row moved away is
    deleted explicitly (dynamic overwrite only touches partitions it
    writes rows for)."""
    _cell_partitioned_upsert(
        spark,
        path,
        ivf_assign(delta, codebook, vec_col, id_col),
        delta.select(id_col).distinct(),
        id_col,
    )


def _cell_partitioned_upsert(
    spark: "SparkSession",
    path: str,
    new_rows: DataFrame,
    delta_ids: DataFrame,
    id_col: str,
) -> None:
    """Shared delta protocol for cell-partitioned index tables (IVF
    assignment rows, IVF-PQ code rows): affected cells = new rows' cells ∪
    cells holding any updated id; merge = (affected base rows minus delta
    ids) + new rows; publish via dynamic partition overwrite with
    localCheckpoint materialization and explicit empty-cell cleanup. All
    driver-side collects are ≤ n_cells rows (codebook-bounded)."""
    base = spark.read.parquet(path)
    old_cells = (
        base.join(F.broadcast(delta_ids), id_col)
        .select("cell")
        .distinct()
    )
    new_cells = new_rows.select("cell").distinct()
    # bounded-collect: distinct affected cells, <= n_cells rows
    affected = {
        int(r["cell"]) for r in old_cells.unionByName(new_cells).distinct().collect()
    }
    if not affected:
        return
    merged = (
        base.where(F.col("cell").isin([int(c) for c in affected]))
        .join(F.broadcast(delta_ids), id_col, "left_anti")
        .unionByName(new_rows)
    )
    # materialize BEFORE overwriting: merged's lineage reads the very
    # files the write replaces
    merged = merged.localCheckpoint()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.partitionBy("cell").mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # bounded-collect: distinct written cells, <= n_cells rows
    present = {int(r["cell"]) for r in merged.select("cell").distinct().collect()}
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    for c in affected - present:
        gone = jvm.org.apache.hadoop.fs.Path(jpath, f"cell={int(c)}")
        if fs.exists(gone):
            fs.delete(gone, True)


def pq_assign_encode(
    df: DataFrame,
    codebook: list[list[float]],
    books: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(id_col, cell, codes)``: each vector's coarse cell AND its PQ
    byte codes in ONE fused Arrow pass — the row an IVF-PQ code TABLE
    stores next to the corpus (32× smaller than the vectors; the vectors
    themselves stay in the corpus and are fetched only for re-ranking).
    Cell rule identical to :func:`ivf_assign` (first-max argmax ==
    `ivf_cell_assignments`'s window rule); code rule identical to
    :func:`pq_encode` (per-subspace nearest centroid by squared L2,
    numpy argmin first-min tie rule on the same arithmetic)."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    M = np.array(codebook, dtype=np.float64)  # (n_cells, dim)
    B = np.asarray(books, dtype=np.float64)  # (m, ksub, dsub)
    m, ksub, dsub = B.shape
    src = df.select(id_col, vec_col)
    out_schema = StructType(
        [
            src.schema.fields[0],
            StructField("cell", IntegerType()),
            StructField("codes", ArrayType(IntegerType())),
        ]
    )

    def _run(batches):
        import pandas as pd

        for pdf in batches:
            out = pdf[[id_col]].copy()
            if len(pdf):
                X = np.vstack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                out["cell"] = (X @ M.T).argmax(axis=1).astype("int32")
                Xs = X.reshape(len(pdf), m, dsub)
                dots = np.einsum("bmd,mkd->bmk", Xs, B)
                cn = (B * B).sum(axis=2)
                codes = (cn[None, :, :] - 2.0 * dots).argmin(axis=2)
                out["codes"] = [c.astype("int32").tolist() for c in codes]
            else:
                out["cell"] = pd.Series([], dtype="int32")
                out["codes"] = []
            yield out

    return src.mapInPandas(_run, out_schema)


def pq_code_table_write(
    spark: "SparkSession",
    path: str,
    corpus: DataFrame,
    codebook: list[list[float]],
    books: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Full build of the cell-partitioned IVF-PQ code table — the 'codes
    written next to the data' layout :func:`pq_index_save`'s durability
    story assumes and `ivfpq_topk`'s docstring prescribes for 100 TB
    ('at scale you'd WRITE the code table partitioned by cell so the
    probed-cell filter becomes partition pruning'). One fused Arrow pass
    per vector; parquet partitioned by ``cell``."""
    pq_assign_encode(corpus, codebook, books, vec_col, id_col).write.partitionBy(
        "cell"
    ).mode("overwrite").parquet(path)


def pq_code_table_upsert(
    spark: "SparkSession",
    path: str,
    delta: DataFrame,
    codebook: list[list[float]],
    books: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Incremental maintenance of a :func:`pq_code_table_write` table:
    route an ingest batch through the LOADED codebooks (coarse + PQ) and
    rewrite only the affected cell partitions — same
    :func:`_cell_partitioned_upsert` protocol as the IVF assignment
    table, including moved-id eviction and empty-cell cleanup. Gold-
    equivalent to a fresh full encode at the same fixed codebooks
    (tests/test_ann_index.py), value-exact via ``z_sim_ivfpq_incremental``
    sharing `sim_ivfpq_topk`'s oracle."""
    _cell_partitioned_upsert(
        spark,
        path,
        pq_assign_encode(delta, codebook, books, vec_col, id_col),
        delta.select(id_col).distinct(),
        id_col,
    )


def ivf_topk_preassigned(
    assignments: DataFrame,
    queries: DataFrame,
    codebook: list[list[float]],
    k: int = 5,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe against a stored assignment table (the
    :func:`ivf_index_write` / :func:`ivf_index_upsert` product): queries
    route through the codebook (query-set-sized matmul), candidates come
    straight from the probed cells' rows — NO training stage and NO
    corpus-wide assignment pass in the plan, and when ``assignments`` is
    the cell-partitioned parquet the broadcast cell join prunes the scan
    to the probed partitions. Output is identical to :func:`ivf_topk` at
    the same fixed codebook (same dots, same tie rules, same re-rank)."""
    cells = V.matrix_dots(
        queries, vec_col, id_col, codebook, out_id="qid"
    ).select("qid", F.posexplode("dots").alias("cell", "dot"))
    w_probe = W.partitionBy("qid").orderBy(F.col("dot").desc(), F.col("cell"))
    query_cells = (
        cells.withColumn("rn", F.row_number().over(w_probe))
        .where(F.col("rn") <= n_probe)
        .select(F.col("qid").alias("query_id"), "cell")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cand = (
        assignments.withColumnRenamed(id_col, "neighbor_id")
        .withColumnRenamed(vec_col, "cv")
        .join(F.broadcast(query_cells), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
        .join(F.broadcast(q), "query_id")
    )
    scored = V.pairwise_cosine_arrow(
        cand.select("query_id", "neighbor_id", "qv", "cv"), "qv", "cv", out_col="sim"
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def pq_index_save(
    spark: "SparkSession",
    path: str,
    codebook: list[list[float]],
    books: list[list[list[float]]],
) -> None:
    """Persist a full IVF-PQ index: the coarse codebook
    (:func:`ann_index_save` layout under ``{path}/coarse``) plus the PQ
    subspace codebooks as parquet ``(subspace, code, w array<double>)``
    under ``{path}/pq`` — together ``n_cells*dim + m*ksub*dsub`` floats,
    the entire driver-side training product of :func:`ivfpq_topk`. At
    scale this is what makes PQ-coded corpora durable: codes written next
    to the data are only decodable against the EXACT codebooks that
    produced them, so the codebooks must persist with the corpus, not
    live inside one job's driver."""
    ann_index_save(spark, f"{path}/coarse", codebook)
    rows = [
        (s, c, [float(x) for x in w])
        for s, book in enumerate(books)
        for c, w in enumerate(book)
    ]
    df = spark.createDataFrame(rows, "subspace int, code int, w array<double>")
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/pq")


def pq_index_load(
    spark: "SparkSession", path: str
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Load an index persisted by :func:`pq_index_save` — returns
    ``(codebook, books)`` with subspace/code order restored. Both
    collects are codebook-sized by contract."""
    codebook = ann_index_load(spark, f"{path}/coarse")
    rows = spark.read.parquet(f"{path}/pq").orderBy("subspace", "code").collect()
    m = 1 + max(r["subspace"] for r in rows)
    books: list[list[list[float]]] = [[] for _ in range(m)]
    for r in rows:
        books[r["subspace"]].append([float(x) for x in r["w"]])
    return codebook, books


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    n_probe: int = 4,
    train_iters: int = 0,
    codebook: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse quantization + probed exact re-rank.

    Cells are defined by K centroids: deterministic first-K corpus vectors
    when ``train_iters=0`` (reproducible, oracle-stable), or a spherical
    k-means codebook (`kmeans_codebook`, ``train_iters`` Lloyd rounds) for
    better-balanced cells / higher recall per probe. Assignment scores
    every vector against the codebook in one fused Arrow/numpy matmul per
    batch (`functions.vectors.matrix_dots` — see that module for why this
    beats the explode+join+agg codegen form); each query probes its
    ``n_probe`` nearest cells and re-ranks exactly inside them. The corpus
    never cross-joins the queries — candidate count is ~n_probe/n_cells of
    the corpus per query.

    Pass ``codebook`` (e.g. from :func:`ann_index_load`) to probe a
    PERSISTED index instead of deriving one — the train-once/probe-often
    operating mode; ``n_cells``/``train_iters`` are ignored then.
    """
    if codebook is None:
        codebook = ivf_train_or_init(corpus, vec_col, id_col, n_cells, train_iters)
    # r15: probe over the fused assign pass. The old inline form assigned
    # cells via an N*n_cells explode + window (a corpus-wide shuffle +
    # sort) and then re-joined the corpus by id to fetch vectors (a second
    # corpus shuffle); `ivf_assign` carries the vector through the same
    # Arrow pass that computes the argmax cell, so both exchanges
    # disappear. Unlike `ivf_topk_preassigned` (whose stored assignment
    # table could in principle carry duplicates) there is no dropDuplicates
    # exchange either: a fresh assignment has exactly ONE cell per corpus
    # row and `query_cells` is distinct (query, cell) rows, so each
    # (query, neighbor) pair surfaces at most once by construction.
    # Same dots, same tie rules, same re-rank — output identical.
    cells = V.matrix_dots(
        queries, vec_col, id_col, codebook, out_id="qid"
    ).select("qid", F.posexplode("dots").alias("cell", "dot"))
    w_probe = W.partitionBy("qid").orderBy(F.col("dot").desc(), F.col("cell"))
    query_cells = (
        cells.withColumn("rn", F.row_number().over(w_probe))
        .where(F.col("rn") <= n_probe)
        .select(F.col("qid").alias("query_id"), "cell")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cand = (
        ivf_assign(corpus, codebook, vec_col, id_col)
        .withColumnRenamed(id_col, "neighbor_id")
        .withColumnRenamed(vec_col, "cv")
        .join(F.broadcast(query_cells), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "cv")
        .join(F.broadcast(q), "query_id")
    )
    scored = V.pairwise_cosine_arrow(
        cand.select("query_id", "neighbor_id", "qv", "cv"), "qv", "cv", out_col="sim"
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits_per_table: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: multi-table hyperplane LSH + exact re-rank.

    Standard (b, L)-LSH: ``n_tables`` independent ``bits_per_table``-bit
    sign signatures; a corpus vector is a candidate if it matches the query
    in ANY table. Per-table keys go through one explode + bucket join (the
    scale path — the cross product never materializes); candidates are
    deduped then exactly re-ranked. Recall/candidate-fraction tradeoff is
    tunable: for weakly clustered data (near-uniform directions) use more
    tables, not more bits. Deterministic planes from a seeded LCG.
    """
    planes = V.seeded_planes(bits_per_table * n_tables, dim, seed)
    # Signatures via the Arrow matmul path (functions/vectors.py), with
    # per-table bucket keys packed as longs in the same numpy batch (no
    # bit-string materialization or substring slicing; see
    # `hyperplane_table_keys`). Keys are materialized as plain columns on
    # BOTH sides before the join — a key expression mixing the two sides'
    # columns is not an equi-condition to Catalyst and degrades the join
    # to BroadcastNestedLoopJoin (the plan gate caught exactly this).
    # Exploding per table multiplies the broadcast-tiny query side too,
    # which keeps the join a pure (tidx, key) equi-join.
    ct = V.hyperplane_table_keys(
        corpus, vec_col, id_col, planes, bits_per_table, out_id="neighbor_id"
    ).select("neighbor_id", F.posexplode("tkeys").alias("tidx", "ckey"))
    qt = V.hyperplane_table_keys(
        queries, vec_col, id_col, planes, bits_per_table, out_id="query_id"
    ).select("query_id", F.posexplode("tkeys").alias("qtidx", "qkey"))
    # A pair sharing k tables surfaces k times; dedup the slim candidate
    # stream before the vector-fetch joins + Arrow re-rank (bounded by the
    # candidate set size — the expensive stage comes after).
    cand = (
        ct.join(
            F.broadcast(qt),
            (F.col("tidx") == F.col("qtidx"))
            & (F.col("ckey") == F.col("qkey"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = V.pairwise_cosine_arrow(
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", "qv", "cv"),
        "qv",
        "cv",
        out_col="sim",
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    dim: int = 64,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: ``m`` subspace k-means codebooks of
    ``ksub`` centroids each (``m x ksub x dim/m`` floats).

    The memory-scale path beyond IVF: a d-dim float vector compresses to
    ``m`` byte codes (32x for d=64, m=8), so the ADC scan in
    :func:`pq_topk` touches ~3% of the bytes brute force reads. Training is
    fully distributed like `kmeans_codebook`: assignment runs as one Arrow
    pass per batch (codes for ALL subspaces per row), the centroid update
    is a (subspace, code, dimension) hash aggregate, and only
    ``m*ksub*dsub`` floats ever reach the driver per iteration.
    Deterministic init (subvectors of the first ``ksub`` corpus vectors by
    id) keeps training reproducible; plain (non-spherical) L2 k-means —
    PQ quantizes raw subvectors, the metric correction happens in the
    query-side lookup tables.
    """
    import numpy as np

    dsub = dim // m
    if m * dsub != dim:
        raise ValueError(f"dim={dim} must divide evenly into m={m} subspaces")
    init = corpus.orderBy(id_col).limit(ksub).select(vec_col).collect()
    if len(init) < ksub:
        # Ragged init would fail deep inside pq_encode's np.asarray with an
        # obscure object-dtype error; fail here with the real cause instead.
        raise ValueError(
            f"pq_codebooks needs >= ksub={ksub} corpus vectors to initialize "
            f"codebooks, got {len(init)}; lower ksub or grow the corpus"
        )
    books = [
        [[float(row[0][s * dsub + j]) for j in range(dsub)] for row in init]
        for s in range(m)
    ]  # m x ksub x dsub
    for _ in range(max(0, iters)):
        # Fused encode (r15): keep_vec=True carries the raw vector through
        # the SAME Arrow pass that computes the codes, so the old
        # per-iteration corpus-by-id join (a corpus shuffle, or a broadcast
        # re-executing the Python encode stage, at any scale) is gone. The
        # codes themselves are the identical einsum/argmin computation.
        src = pq_encode(corpus, books, vec_col, id_col, out_id="_cid", keep_vec=True)
        # one N*dim-row codegen explode; groups = m*ksub*dsub (tiny result)
        sums = (
            src.select("codes", F.posexplode("_v").alias("_pos", "_x"))
            .select(
                (F.col("_pos") / dsub).cast("int").alias("_sub"),
                (F.col("_pos") % dsub).alias("_j"),
                F.expr(f"codes[CAST(_pos / {dsub} AS INT)]").alias("_code"),
                F.col("_x").cast("double").alias("_x"),
            )
            .groupBy("_sub", "_code", "_j")
            .agg(F.avg("_x").alias("_m"))
            .collect()
        )
        new_books = [[list(c) for c in book] for book in books]  # empty cells keep
        for r in sums:
            new_books[r._sub][r._code][r._j] = r._m
        books = new_books
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_id: str = "vec_id",
    keep_vec: bool = False,
) -> DataFrame:
    """``(id, codes)`` rows: per-subspace nearest-centroid codes (one fused
    Arrow pass; codebooks ship in the closure, ``m`` ints per vector).
    ``keep_vec=True`` additionally carries the raw vector through as
    ``_v`` — the fused form the Lloyd update consumes, so training never
    re-joins the corpus to its own encode output (r15). Zero-copy Arrow
    boundary (``_list_matrix`` in, offsets-built list array out; the kept
    vector column is an untouched Arrow pass-through)."""
    import numpy as np
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    B = np.asarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    m, ksub, dsub = B.shape
    src = df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias("_v"))
    fields = [src.schema.fields[0], StructField("codes", ArrayType(IntegerType()))]
    if keep_vec:
        fields.insert(1, src.schema.fields[1])
    out_schema = StructType(fields)
    names = [f.name for f in fields]

    def _enc(batches):
        import pyarrow as pa

        for b in batches:
            n = b.num_rows
            if n:
                X = V._list_matrix(b.column(b.schema.get_field_index("_v")))
                Xs = X.reshape(n, m, dsub)  # (B, m, dsub)
                # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over ksub
                dots = np.einsum("bmd,mkd->bmk", Xs, B)
                cn = (B * B).sum(axis=2)  # (m, ksub)
                codes = (cn[None, :, :] - 2.0 * dots).argmin(axis=2)  # (B, m)
                offs = pa.array(
                    np.arange(0, (n + 1) * m, m, dtype=np.int32), pa.int32()
                )
                ccol = pa.ListArray.from_arrays(
                    offs, pa.array(codes.astype("int32").ravel(), pa.int32())
                )
            else:
                ccol = pa.array([], pa.list_(pa.int32()))
            cols = [b.column(b.schema.get_field_index(f)) for f in names[:-1]]
            cols.append(ccol)
            yield pa.RecordBatch.from_arrays(cols, names)

    return src.mapInArrow(_enc, out_schema)


def _assign_encode(
    df: DataFrame,
    codebook: list[list[float]],
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_id: str = "vec_id",
) -> DataFrame:
    """``(out_id, cell, codes)``: coarse argmax cell AND per-subspace PQ
    codes from ONE Arrow pass (r15). The cell is :func:`ivf_assign`'s
    exact computation (``(X @ M.T).argmax`` — numpy first-argmax == the
    window tie rule on bit-identical dots) and the codes are
    :func:`pq_encode`'s exact einsum/argmin, so the fused output matches
    the two separate passes row-for-row with no corpus-by-id join to glue
    them back together. Zero-copy Arrow boundary on both sides
    (``_list_matrix`` in, offsets-built list array out — guide §4.2)."""
    import numpy as np
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    M = np.array(codebook, dtype=np.float64)  # (k, dim)
    B = np.asarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    m, ksub, dsub = B.shape
    src = df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias("_v"))
    out_schema = StructType(
        [
            src.schema.fields[0],
            StructField("cell", IntegerType()),
            StructField("codes", ArrayType(IntegerType())),
        ]
    )
    names = [out_id, "cell", "codes"]

    def _fn(batches):
        import pyarrow as pa

        for b in batches:
            n = b.num_rows
            if n:
                X = V._list_matrix(b.column(b.schema.get_field_index("_v")))
                cells = (X @ M.T).argmax(axis=1).astype("int32")
                Xs = X.reshape(n, m, dsub)  # (B, m, dsub)
                dots = np.einsum("bmd,mkd->bmk", Xs, B)
                cn = (B * B).sum(axis=2)  # (m, ksub)
                codes = (cn[None, :, :] - 2.0 * dots).argmin(axis=2)  # (B, m)
                offs = pa.array(
                    np.arange(0, (n + 1) * m, m, dtype=np.int32), pa.int32()
                )
                ccol = pa.ListArray.from_arrays(
                    offs, pa.array(codes.astype("int32").ravel(), pa.int32())
                )
                cellcol = pa.array(cells, type=pa.int32())
            else:
                ccol = pa.array([], pa.list_(pa.int32()))
                cellcol = pa.array([], pa.int32())
            yield pa.RecordBatch.from_arrays(
                [b.column(b.schema.get_field_index(out_id)), cellcol, ccol], names
            )

    return src.mapInArrow(_fn, out_schema)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    ksub: int = 16,
    train_iters: int = 2,
    refine: int = 4,
    dim: int = 64,
) -> DataFrame:
    """PQ-ADC approximate top-k with exact re-rank.

    Asymmetric distance computation: each query builds an ``m x ksub``
    lookup table of subspace dot products against the codebooks, so scoring
    a corpus vector is ``m`` table lookups + adds on its byte codes — no
    float vectors move during the scan. Distributed shape: the code table
    scans partition-parallel (`mapInPandas`), each partition emits only its
    local top ``refine*k`` per query (numpy partial sort), the global
    top-``refine*k`` reduction is a TakeOrdered-sized window, and only
    those candidates fetch real vectors for the exact cosine re-rank.
    Queries are collected to the driver for LUT construction — a
    query-set-sized (not corpus-sized) transfer, same bound as the
    broadcast in `cosine_topk`.
    """
    import numpy as np

    books = pq_codebooks(corpus, vec_col, id_col, m, ksub, train_iters, dim)
    B = np.asarray(books, dtype=np.float64)  # (m, ksub, dsub)
    dsub = B.shape[2]
    qrows = queries.select(id_col, vec_col).collect()
    qids = [r[0] for r in qrows]
    Q = np.vstack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    # LUT[q, s, c] = dot(q_sub[s], centroid[s][c]) -> ADC approximates dot(q, v)
    LUT = np.einsum("qmd,mkd->qmk", Q.reshape(len(qids), m, dsub), B)
    n_local = max(k * refine, k)

    coded = pq_encode(corpus, books, vec_col, id_col, out_id="neighbor_id")

    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    id_field = coded.schema.fields[0]
    out_schema = StructType(
        [
            StructField("query_id", id_field.dataType),
            StructField("neighbor_id", id_field.dataType),
            StructField("adc", DoubleType()),
        ]
    )
    qid_arr = np.asarray(qids)

    def _scan(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.vstack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            nid = pdf["neighbor_id"].to_numpy()
            # scores[q, b] = sum_s LUT[q, s, codes[b, s]]
            scores = LUT[:, np.arange(m)[None, :], codes].sum(axis=2)  # (Q, B)
            rows = []
            for qi in range(scores.shape[0]):
                # Self is dropped BEFORE the local cut and ties break by
                # (adc desc, neighbor_id) — the same total order the global
                # reduction uses. That makes the emitted union provably a
                # superset of the global top-n_local under ANY partitioning
                # (each global top candidate has < n_local rows above it in
                # the total order, partition-wide too), so the final
                # candidate set is partitioning-invariant and oracle-exact;
                # argpartition's arbitrary tie choice (identical-code
                # vectors share an exact adc) broke that in edge cases.
                keep = nid != qid_arr[qi]
                s, nk = scores[qi][keep], nid[keep]
                top = min(n_local, len(nk))
                idx = np.lexsort((nk, -s))[:top]
                for bi in idx:
                    rows.append((qids[qi], nk[bi], float(s[bi])))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "adc"])

    local_top = coded.mapInPandas(_scan, out_schema)
    return _exact_rerank_adc(local_top, corpus, queries, k, n_local, vec_col, id_col)


def _exact_rerank_adc(
    local_top: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_local: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Shared ADC tail: global top-``n_local`` by ADC score per query, then
    fetch real vectors for ONLY those candidates and re-rank by exact
    (rounded, tie-broken) cosine."""
    w_adc = W.partitionBy("query_id").orderBy(F.col("adc").desc(), F.col("neighbor_id"))
    cand = (
        local_top.withColumn("rn", F.row_number().over(w_adc))
        .where(F.col("rn") <= n_local)
        .select("query_id", "neighbor_id")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = V.pairwise_cosine_arrow(
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", "qv", "cv"),
        "qv",
        "cv",
        out_col="sim",
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    coarse_iters: int = 1,
    pq_iters: int = 1,
    refine: int = 4,
    dim: int = 64,
    codebook: list[list[float]] | None = None,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """IVF-PQ: coarse cell routing + PQ-ADC scan of ONLY the probed cells.

    The production composition of :func:`ivf_topk` and :func:`pq_topk`:
    `pq_topk` ADC-scans ALL N codes per query; here each query probes its
    ``n_probe`` nearest coarse cells and the ADC scan touches only those
    cells' codes — candidate work drops to ~``n_probe/n_cells`` of the full
    PQ scan, on codes that are already 32x smaller than the raw vectors.

    Distributed shape (the 100 TB story):
    - coarse + PQ codebooks train distributed (hash-agg updates; the driver
      holds ``n_cells*dim + m*ksub*dsub`` floats only);
    - corpus codes carry their cell id — at scale you'd WRITE the code table
      partitioned/bucketed by ``cell`` so the `isin(probed)` filter becomes
      partition pruning; here it is an ordinary pushed filter;
    - the scan is partition-parallel `mapInPandas`, grouped by cell inside
      each Arrow batch, scoring only the queries that probe that cell, and
      emits per-partition local top-``refine*k`` per query;
    - the exact re-rank fetches vectors for the surviving candidates only.

    PQ quantizes RAW vectors (FAISS ``by_residual=false`` flavor): residual
    encoding would couple the PQ codebooks to the coarse cells; the raw
    flavor keeps codes cell-independent (one codebook set, simpler
    re-ranking) at a small recall cost that ``refine`` absorbs.

    Queries and their probe sets are collected for LUT construction —
    query-set-sized, the same bound as `cosine_topk`'s broadcast.

    Pass ``codebook`` + ``books`` (from :func:`pq_index_load`) to probe a
    PERSISTED index instead of training — the train-once/probe-often
    operating mode; the ``n_cells``/``*_iters`` training knobs are
    ignored then.
    """
    if codebook is None:
        codebook = ivf_train_or_init(corpus, vec_col, id_col, n_cells, coarse_iters)
    if books is None:
        books = pq_codebooks(corpus, vec_col, id_col, m, ksub, pq_iters, dim)
    # Query probe sets: query-set-sized window (same construction as
    # ivfpq_topk_precoded). The corpus side no longer routes through
    # ivf_cell_assignments — see coded_fn below.
    cells = V.matrix_dots(
        queries, vec_col, id_col, codebook, out_id="qid"
    ).select("qid", F.posexplode("dots").alias("cell", "dot"))
    w_probe = W.partitionBy("qid").orderBy(F.col("dot").desc(), F.col("cell"))
    query_cells = (
        cells.withColumn("rn", F.row_number().over(w_probe))
        .where(F.col("rn") <= n_probe)
        .select(F.col("qid").alias("query_id"), "cell")
    )

    def coded_fn(probed_cells):
        # r15: ONE fused Arrow pass computes the coarse argmax cell AND the
        # PQ codes (identical dots/argmax and einsum/argmin as the separate
        # ivf_assign / pq_encode passes — same numpy expressions on the
        # same float64 operands), replacing encode + corpus-by-id join with
        # a join-free map. The old shape shuffled the full code table by id
        # at any scale; this one shuffles nothing.
        return (
            _assign_encode(
                corpus, codebook, books, vec_col, id_col, out_id="neighbor_id"
            )
            # At scale: codes stored bucketed by cell -> partition pruning
            # (that stored layout IS ivfpq_topk_precoded).
            .where(F.col("cell").isin(probed_cells))
            .select("neighbor_id", "cell", "codes")
        )

    return _ivfpq_adc_probe(
        coded_fn, corpus, queries, query_cells, books, k, refine, vec_col, id_col
    )


def _ivfpq_adc_probe(
    coded_fn,
    corpus: DataFrame,
    queries: DataFrame,
    query_cells: DataFrame,
    books: list[list[list[float]]],
    k: int,
    refine: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Shared IVF-PQ probe tail: collect the (query-sized) probe sets,
    build per-query ADC lookup tables, scan the probed cells' codes
    (``coded_fn(probed_cells)`` supplies the ``(neighbor_id, cell,
    codes)`` rows — freshly encoded in `ivfpq_topk`, read from a stored
    cell-partitioned table in :func:`ivfpq_topk_precoded`), then exact
    re-rank. Emission order inside the scan is the partitioning-invariant
    (adc desc, id) total order with self dropped before the cut."""
    import numpy as np

    probes: dict[int, list] = {}
    for r in query_cells.collect():  # Q*n_probe rows — query-sized
        probes.setdefault(r.cell, []).append(r.query_id)

    B = np.asarray(books, dtype=np.float64)  # (m, ksub, dsub)
    m, _, dsub = B.shape
    qrows = queries.select(id_col, vec_col).collect()
    qids = [r[0] for r in qrows]
    qidx = {qid: i for i, qid in enumerate(qids)}
    Q = np.vstack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    LUT = np.einsum("qmd,mkd->qmk", Q.reshape(len(qids), m, dsub), B)
    n_local = max(k * refine, k)
    cell_queries = {
        c: np.asarray([qidx[q] for q in qs], dtype=np.int64)
        for c, qs in probes.items()
    }

    coded = coded_fn(sorted(probes))

    from pyspark.sql.types import DoubleType, StructField, StructType

    id_type = coded.schema["neighbor_id"].dataType
    out_schema = StructType(
        [
            StructField("query_id", id_type),
            StructField("neighbor_id", id_type),
            StructField("adc", DoubleType()),
        ]
    )

    def _scan(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for cell, grp in pdf.groupby("cell") if len(pdf) else ():
                qis = cell_queries.get(cell)
                if qis is None or not len(grp):
                    continue
                codes = np.vstack([np.asarray(c, dtype=np.int64) for c in grp["codes"]])
                nid = grp["neighbor_id"].to_numpy()
                # scores[i, b] = sum_s LUT[qis[i], s, codes[b, s]]
                scores = LUT[qis][:, np.arange(m)[None, :], codes].sum(axis=2)
                for row_i, qi in enumerate(qis):
                    # Same partitioning-invariant emission as pq_topk's scan:
                    # self dropped before the cut, (adc desc, id) total order.
                    keep = nid != qids[qi]
                    s, nk = scores[row_i][keep], nid[keep]
                    top = min(n_local, len(nk))
                    idx = np.lexsort((nk, -s))[:top]
                    for bi in idx:
                        rows.append((qids[qi], nk[bi], float(s[bi])))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "adc"])

    local_top = coded.mapInPandas(_scan, out_schema)
    return _exact_rerank_adc(local_top, corpus, queries, k, n_local, vec_col, id_col)


def ivfpq_topk_precoded(
    code_table: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    codebook: list[list[float]],
    books: list[list[list[float]]],
    k: int = 5,
    n_probe: int = 4,
    refine: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ probe against a STORED code table (the
    :func:`pq_code_table_write` / :func:`pq_code_table_upsert` product):
    queries route through the loaded coarse codebook, the ADC scan reads
    ``(neighbor_id, cell, codes)`` rows straight from the cell-partitioned
    parquet — no corpus-wide encode pass, and the probed-cell filter
    prunes the scan to the probed partitions — then only the surviving
    candidates fetch real vectors from ``corpus`` for the exact re-rank.
    Identical output to :func:`ivfpq_topk` at the same fixed codebooks."""
    cells = V.matrix_dots(
        queries, vec_col, id_col, codebook, out_id="qid"
    ).select("qid", F.posexplode("dots").alias("cell", "dot"))
    w_probe = W.partitionBy("qid").orderBy(F.col("dot").desc(), F.col("cell"))
    query_cells = (
        cells.withColumn("rn", F.row_number().over(w_probe))
        .where(F.col("rn") <= n_probe)
        .select(F.col("qid").alias("query_id"), "cell")
    )

    def coded_fn(probed_cells):
        return (
            code_table.withColumnRenamed(id_col, "neighbor_id")
            .where(F.col("cell").isin(probed_cells))
            .select("neighbor_id", "cell", "codes")
        )

    return _ivfpq_adc_probe(
        coded_fn, corpus, queries, query_cells, books, k, refine, vec_col, id_col
    )
