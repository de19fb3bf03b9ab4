"""Graph-structure audit of a corpus's near-duplicate relation — the
inspection pass a curation run does BETWEEN pair generation and
destructive dedup:

1. MinHash-LSH near-dup pairs (the engine's standard pair generator);
2. TRIANGLE / local-clustering audit (`triangle_counts`): is "near-dup"
   behaving like an equivalence here? Components that are cliques
   (lcc 1.0) are safe to collapse; high-degree low-lcc hubs are
   threshold-gluing documents to inspect before union-find dedup;
3. K-CORE peel (`kcore_peel`): the cyclic duplication cores — the
   mirror-farm-shaped clusters worth dropping at the SOURCE rather than
   pair-joining every snapshot;
4. LABEL PROPAGATION (`label_propagation`): spread the audited verdicts
   — seed the core members as 'farm' and everything isolated as
   'organic', and let the similarity structure classify the rest.

Everything is an engine operator; nothing collects to the driver until
the final summary `show()`. At 100 TB the same program runs with paths
pointed at object storage — degree-oriented triangle counting
(O(sqrt(E)) wedge fan-out per node), broadcast semi-join peeling, and
per-round-broadcast label spreading are the scale-out shapes already.

Run: python examples/corpus_graph_audit.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.operators import dedup as D
from bonobo_sqlalchemy_spark.operators.graphalgo import (
    kcore_peel,
    label_propagation,
    triangle_counts,
)
from bonobo_sqlalchemy_spark.session import get_spark
from bonobo_sqlalchemy_spark.sources.files import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus-graph-audit")

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, n=3, num_perm=32, bands=8, threshold=0.5)
    edges = pairs.select(
        F.col("id1").alias("src"), F.col("id2").alias("dst")
    ).localCheckpoint()  # three audit consumers; generate pairs ONCE

    # --- transitivity audit -------------------------------------------
    tri = triangle_counts(edges)
    audit = tri.agg(
        F.count(F.lit(1)).alias("nodes_in_graph"),
        (F.sum("tri") / 3).cast("bigint").alias("triangles"),
        F.sum((F.col("deg") >= 2).cast("int")).alias("closable_nodes"),
        F.sum(((F.col("deg") >= 2) & (F.col("lcc_micro") == 10**6)).cast("int")).alias(
            "fully_clustered"
        ),
    )
    print("near-dup transitivity audit (clique-ness of the pair graph):")
    audit.show()
    print("hub suspects (high degree, low clustering — inspect before collapse):")
    tri.where((F.col("deg") >= 3) & (F.col("lcc_micro") < 500_000)).orderBy(
        F.col("deg").desc(), "node"
    ).show(5)

    # --- duplication-farm cores ---------------------------------------
    core = kcore_peel(edges, k=2, rounds=4)
    n_core = core.count()
    print(f"2-core (cyclic duplication structures): {n_core} documents")

    # --- spread the verdict over the similarity structure -------------
    # farm-members propagate label 1, everything else competes with 0
    seeds = core.select(
        F.col("node"), F.lit(1).alias("label")
    ).unionByName(
        tri.where(F.col("deg") == 1).select("node", F.lit(0).alias("label"))
    )
    spread = label_propagation(edges, seeds, rounds=3)
    print("label spread over the near-dup graph (1 = farm-like, 0 = organic):")
    spread.groupBy("label").count().orderBy("label").show()

    print("graph audit complete")


if __name__ == "__main__":
    main()
