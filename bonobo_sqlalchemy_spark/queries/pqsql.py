"""DuckDB oracle builders for the product-quantization ANN family.

Same philosophy as `_sim_lsh_oracle` / `_semantic_kmeans_prefix`: the
approximate index is value-checkable because every source of randomness is
a shared deterministic constant — PQ codebooks initialize from the
subvectors of the first-``ksub`` corpus vectors by id, each L2 k-means
round is two aggregations (argmin ``||c||^2 - 2 x.c`` assignment with the
first-min tie rule, per-(sub, code, dim) mean update with empty cells
keeping their previous centroid), encoding is the same argmin, and the ADC
score is a sum of per-subspace lookup dots. The Spark scans emit
per-partition local tops under the (adc DESC, neighbor_id) total order
with self dropped before the cut, so the union provably contains the
global top-``n_local`` under any partitioning — which is exactly the set
the SQL's single window computes.

Cross-engine FP: every aggregate here sums <= dsub (8) or m (8) doubles;
Spark/numpy and DuckDB agree bitwise on folds this shape (measured for the
64-term case in round 8), and all downstream comparisons (argmin margins,
ADC ranking, the 6dp-rounded cosine) sit many orders above any residual
summation-order difference.
"""

from __future__ import annotations


def pq_train_ctes(
    m: int = 8,
    ksub: int = 16,
    iters: int = 1,
    dim: int = 64,
    final_books: str = "bF",
) -> str:
    """CTE text (no leading WITH): corpus subvector table ``ex``, init
    books ``b0``, ``iters`` k-means rounds, final books aliased
    ``final_books``, and final corpus codes ``codesF (id, sub, code)``."""
    dsub = dim // m
    parts = [
        f"""
    ex AS (SELECT vec_id AS id, (d - 1) // {dsub} AS sub, (d - 1) % {dsub} AS j,
                  CAST(x AS DOUBLE) AS x
           FROM (SELECT vec_id, unnest(embedding) AS x,
                        generate_subscripts(embedding, 1) AS d
                 FROM embeddings)),
    ip AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, embedding AS v
           FROM embeddings ORDER BY vec_id LIMIT {ksub}),
    b0 AS (SELECT (d - 1) // {dsub} AS sub, code, (d - 1) % {dsub} AS j,
                  CAST(x AS DOUBLE) AS w
           FROM (SELECT code, unnest(v) AS x,
                        generate_subscripts(v, 1) AS d
                 FROM ip))"""
    ]

    def assign(a: str, b: str) -> str:
        return f"""
    {a} AS (SELECT id, sub, code FROM (
            SELECT d.id, d.sub, d.code,
                   ROW_NUMBER() OVER (PARTITION BY d.id, d.sub
                                      ORDER BY c.cn - 2 * d.dot ASC, d.code) AS rn
            FROM (SELECT ex.id, ex.sub, b.code, SUM(ex.x * b.w) AS dot
                  FROM ex JOIN {b} b ON ex.sub = b.sub AND ex.j = b.j
                  GROUP BY 1, 2, 3) d
            JOIN (SELECT sub, code, SUM(w * w) AS cn
                  FROM {b} GROUP BY 1, 2) c
              ON d.sub = c.sub AND d.code = c.code) WHERE rn = 1)"""

    prev = "b0"
    for i in range(1, iters + 1):
        nxt = final_books if i == iters else f"b{i}"
        parts.append(assign(f"a{i}", prev))
        parts.append(f"""
    m{i} AS (SELECT a.sub, a.code, ex.j, AVG(ex.x) AS w
             FROM ex JOIN a{i} a ON ex.id = a.id AND ex.sub = a.sub
             GROUP BY 1, 2, 3),
    {nxt} AS (SELECT sub, code, j, w FROM m{i}
              UNION ALL
              SELECT b.sub, b.code, b.j, b.w FROM {prev} b
              WHERE NOT EXISTS (SELECT 1 FROM m{i} m
                                WHERE m.sub = b.sub AND m.code = b.code))""")
        prev = nxt
    parts.append(assign("codesF", final_books))
    return ",".join(parts)


def adc_rerank_sql(
    n_local: int,
    k: int,
    pair_source: str,
    final_books: str = "bF",
    n_queries: int = 8,
) -> str:
    """Closing CTEs + SELECT: per-query lookup dots against the final
    books, ADC per candidate pair from ``pair_source`` (a CTE exposing
    ``(query_id, neighbor_id, sub, code)`` rows — one per subspace), global
    top-``n_local`` under (adc DESC, neighbor_id), exact rounded-cosine
    re-rank to top-``k``."""
    return f""",
    lut AS (SELECT ex.id AS qid, ex.sub, b.code, SUM(ex.x * b.w) AS l
            FROM ex JOIN {final_books} b ON ex.sub = b.sub AND ex.j = b.j
            WHERE ex.id < {n_queries} GROUP BY 1, 2, 3),
    adc AS (SELECT p.query_id, p.neighbor_id, SUM(l.l) AS adc
            FROM {pair_source} p
            JOIN lut l ON p.query_id = l.qid AND p.sub = l.sub AND p.code = l.code
            GROUP BY 1, 2),
    cand AS (SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id,
                    ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY adc DESC, neighbor_id) AS rn
             FROM adc) WHERE rn <= {n_local}),
    ev AS (SELECT vec_id, embedding FROM embeddings),
    jj AS (SELECT query_id, neighbor_id, eq.embedding AS qv, ec.embedding AS cv
           FROM cand JOIN ev eq ON query_id = eq.vec_id
                     JOIN ev ec ON neighbor_id = ec.vec_id),
    uu AS (SELECT query_id, neighbor_id, unnest(qv) AS x, unnest(cv) AS y FROM jj),
    pp AS (SELECT query_id, neighbor_id,
                  SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                  SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
                  SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
           FROM uu GROUP BY 1, 2),
    rr AS (SELECT query_id, neighbor_id, round(dot / sqrt(na * nb), 6) AS sim,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY round(dot / sqrt(na * nb), 6) DESC,
                                              neighbor_id) AS rn
           FROM pp)
    SELECT query_id, neighbor_id, sim, CAST(rn AS BIGINT) AS rank
    FROM rr WHERE rn <= {k}
    """


def pq_topk_oracle(
    m: int = 8,
    ksub: int = 16,
    iters: int = 1,
    dim: int = 64,
    k: int = 5,
    refine: int = 4,
    n_queries: int = 8,
) -> str:
    """Full-corpus PQ-ADC oracle (`pq_topk`): every corpus code is a
    candidate pair for every query (self excluded)."""
    n_local = max(k * refine, k)
    pairs = f""",
    pairs AS (SELECT l.qid AS query_id, c.id AS neighbor_id, c.sub, c.code
              FROM codesF c
              JOIN (SELECT DISTINCT id AS qid FROM ex WHERE id < {n_queries}) l
                ON c.id <> l.qid)"""
    return (
        "WITH "
        + pq_train_ctes(m, ksub, iters, dim)
        + pairs
        + adc_rerank_sql(n_local, k, "pairs", n_queries=n_queries)
    )


def ivfpq_topk_oracle(
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    pq_iters: int = 1,
    dim: int = 64,
    k: int = 5,
    refine: int = 4,
    n_queries: int = 8,
) -> str:
    """IVF-PQ oracle (`ivfpq_topk`, coarse_iters=1): spherical-k-means
    coarse cells (identical 1-Lloyd-round construction as
    `_semantic_kmeans_prefix`, but 0-based cells with the argmax-dot /
    lowest-cell tie rule of `ivf_cell_assignments`), queries probe their
    ``n_probe`` nearest cells, and ADC candidate pairs are restricted to
    probed cells before the global top-``n_local`` cut."""
    n_local = max(k * refine, k)
    coarse = f""",
    cv0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS v
            FROM embeddings ORDER BY vec_id LIMIT {n_cells}),
    cvu AS (SELECT cell, CAST(x AS DOUBLE) AS x, d - 1 AS d
            FROM (SELECT cell, unnest(v) AS x,
                         generate_subscripts(v, 1) AS d FROM cv0)),
    cvn AS (SELECT cell, sqrt(SUM(x * x)) AS nrm FROM cvu GROUP BY 1),
    cc0 AS (SELECT cvu.cell, cvu.d, cvu.x / cvn.nrm AS w
            FROM cvu JOIN cvn USING (cell)),
    exf AS (SELECT id, (sub * {dim // m} + j) AS d, x FROM ex),
    cd1 AS (SELECT exf.id, c.cell, SUM(exf.x * c.w) AS dot
            FROM exf JOIN cc0 c USING (d) GROUP BY 1, 2),
    ca1 AS (SELECT id, cell FROM (
             SELECT id, cell, ROW_NUMBER() OVER (PARTITION BY id
                                                 ORDER BY dot DESC, cell) AS rn
             FROM cd1) WHERE rn = 1),
    cm AS (SELECT ca1.cell, exf.d, AVG(exf.x) AS mu
           FROM exf JOIN ca1 USING (id) GROUP BY 1, 2),
    cmn AS (SELECT cell, sqrt(SUM(mu * mu)) AS nrm FROM cm GROUP BY 1),
    cc1 AS (SELECT cm.cell, cm.d, cm.mu / cmn.nrm AS w FROM cm JOIN cmn USING (cell)
            UNION ALL
            SELECT c.cell, c.d, c.w FROM cc0 c
            WHERE c.cell NOT IN (SELECT DISTINCT cell FROM cm)),
    cd2 AS (SELECT exf.id, c.cell, SUM(exf.x * c.w) AS dot
            FROM exf JOIN cc1 c USING (d) GROUP BY 1, 2),
    ccell AS (SELECT id, cell FROM (
              SELECT id, cell, ROW_NUMBER() OVER (PARTITION BY id
                                                  ORDER BY dot DESC, cell) AS rn
              FROM cd2) WHERE rn = 1),
    qprobe AS (SELECT id AS qid, cell FROM (
               SELECT id, cell, ROW_NUMBER() OVER (PARTITION BY id
                                                   ORDER BY dot DESC, cell) AS rn
               FROM cd2 WHERE id < {n_queries}) WHERE rn <= {n_probe}),
    pairs AS (SELECT DISTINCT q.qid AS query_id, cc.id AS neighbor_id
              FROM ccell cc JOIN qprobe q USING (cell)
              WHERE cc.id <> q.qid),
    pairc AS (SELECT p.query_id, p.neighbor_id, c.sub, c.code
              FROM pairs p JOIN codesF c ON p.neighbor_id = c.id)"""
    return (
        "WITH "
        + pq_train_ctes(m, ksub, pq_iters, dim)
        + coarse
        + adc_rerank_sql(n_local, k, "pairc", n_queries=n_queries)
    )
