"""Round-14 training-data pipeline extensions: graph-structure audits of
the near-dup graph (triangle counts / local clustering, k-core peeling)
and theta-sketch set-operation cardinalities.

Why these belong in a 100 TB curation engine:

- **Triangle counts + local clustering coefficient** — the transitivity
  audit run BEFORE component-collapse dedup: if "near-dup" were a true
  equivalence, every LSH component would be a clique (lcc 1.0); a
  high-degree/low-lcc node is a hub document gluing unrelated clusters
  through the threshold, exactly the failure mode that makes
  union-find-style dedup over-delete. Degree-oriented counting keeps the
  wedge volume at O(E^1.5) regardless of skew.
- **k-core peeling** — the standard dense-subgraph extractor: high-core
  documents sit in heavily interlinked duplication farms (mirrors,
  boilerplate templates) worth dropping at the SOURCE, while organic
  near-dup pairs peel away in the first round.
- **KMV/theta set-operation cardinalities** — absolute distinct-count
  estimates of union/intersection between key sets from k-sized sketches
  (Beyer et al. 2007): "how many users do these two event streams share?"
  without a cross-stream join. Mergeable bottom-k state, so per-shard
  sketches fold without revisiting shards.

All three are VALUE-EXACT: integer (scaled) arithmetic end-to-end on
md5-derived hashes and exact counts, replayed term-for-term by DuckDB
twins (`operators/graphalgo.py::{triangle_counts_sql,kcore_peel_sql}`,
`operators/sketch.py::kmv_set_cardinalities_sql`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.files import load_table
from .base import query


def _neardup_edges_oracle() -> str:
    """The minhash near-dup pair set as a (src, dst) edge list — reuses the
    hash-deterministic `_minhash_oracle` construction verbatim."""
    from .datapipe import _minhash_oracle

    return f"SELECT id1 AS src, id2 AS dst FROM ({_minhash_oracle()})"


def _triangles_oracle() -> str:
    from ..operators.graphalgo import triangle_counts_sql

    return (
        triangle_counts_sql(_neardup_edges_oracle())
        + "\n    ORDER BY node"
    )


@query(
    "z_graph_triangles",
    oracle=_triangles_oracle(),
    tags=("graph", "dedup", "scale"),
    bench=True,
)
def z_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup TRANSITIVITY audit: per-document triangle counts and exact
    local clustering coefficient (micro-units) over the MinHash-LSH
    near-dup graph (threshold 0.5) —
    `operators/graphalgo.py::triangle_counts` over
    `operators/dedup.py::minhash_lsh_pairs`.

    Reading the output: lcc_micro == 1e6 on every node of a component
    means the cluster is a clique (safe to collapse); a node with high
    deg and low lcc_micro is a hub gluing unrelated clusters through the
    threshold — inspect before union-find dedup.

    Scale: the pair stage is the LSH band-bucket join (no all-pairs); the
    triangle stage orients every edge from its lower-(degree, id)
    endpoint, bounding per-node wedge fan-out at O(sqrt(E)) under ANY
    degree skew, then closes wedges with one composite-key equi-join.
    VALUE-EXACT: the md5-deterministic minhash pairs and the
    integer-only triangle/lcc arithmetic are both replayed exactly by
    the DuckDB twin."""
    from ..operators import dedup as D
    from ..operators.graphalgo import triangle_counts

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, n=3, num_perm=32, bands=8, threshold=0.5)
    edges = pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    return triangle_counts(edges).orderBy("node")


def _kcore_oracle() -> str:
    from ..operators.graphalgo import kcore_peel_sql

    return (
        kcore_peel_sql(_neardup_edges_oracle(), k=2, rounds=4)
        + "\n    ORDER BY node"
    )


@query(
    "z_graph_kcore",
    oracle=_kcore_oracle(),
    tags=("graph", "dedup"),
)
def z_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-duplication-core extraction: 2-core of the MinHash near-dup
    graph after 4 peel rounds (`operators/graphalgo.py::kcore_peel`) —
    the surviving ``(node, deg_final)`` rows are documents embedded in
    CYCLIC duplication structures (every survivor has >= 2 near-dup
    neighbours that themselves stay in the core — trees and isolated
    pairs peel away, so what remains is mirror-farm-shaped), the clusters a
    curation run drops at the source rather than pair-joining every
    snapshot. Fixed-round semantics with the fixpoint asserted on the
    fixture in tests (rounds 4 == rounds 3); VALUE-EXACT via the
    unrolled peel-round CTE chain."""
    from ..operators import dedup as D
    from ..operators.graphalgo import kcore_peel

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, n=3, num_perm=32, bands=8, threshold=0.5)
    edges = pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    return kcore_peel(edges, k=2, rounds=4).orderBy("node")


def _kmv_setops_oracle() -> str:
    from ..operators.sketch import kmv_set_cardinalities_sql

    keys = "SELECT event_type AS g, user_id AS key FROM events"
    return (
        kmv_set_cardinalities_sql(keys, k=64)
        + "\n    ORDER BY group_a, group_b"
    )


@query(
    "z_sketch_kmv_setops",
    oracle=_kmv_setops_oracle(),
    tags=("sketch", "scale"),
    bench=True,
)
def z_sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET-OPERATION cardinalities between event streams:
    for every event-type pair, integer estimates of each side's distinct
    users and of the union/intersection user counts, from bottom-64 KMV
    sketches (`operators/sketch.py::kmv_set_cardinalities`) — the
    audience-overlap question ("how many users do click and purchase
    share?") answered from k-row mergeable sketches instead of a
    cross-stream distinct join.

    Scale: the only corpus-sized stage is the distinct (type, user-hash)
    projection; the bottom-k window forwards at most k rows per group
    per input partition (Partial WindowGroupLimit below the exchange),
    and every later stage is sketch-sized. VALUE-EXACT: 40-bit md5
    fingerprints and BIGINT floor estimators, replayed term-for-term by
    the DuckDB twin — at sf0.001 the sketches are unfull so the
    estimates are EXACT counts; at sf0.01+ the estimator branch
    engages."""
    from ..operators.sketch import kmv_set_cardinalities

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return kmv_set_cardinalities(
        ev, key_col="user_id", group_col="event_type", k=64
    ).orderBy("group_a", "group_b")
