"""Hybrid corpus search — the retrieval workflow next to the curation one
(`training_data_pipeline.py`): find the documents most relevant to a
query using BOTH signals a curation team has on hand, fused by
reciprocal rank:

  lexical   BM25 over the text (bag-of-terms query), top-50
  semantic  cosine over the embedding column (query = a seed doc), top-50
  fusion    rrf(d) = sum_lists 1 / (60 + rank_list(d)), top-10

Each leg is bounded BEFORE fusion, so fusion only ever touches <=100
candidate rows no matter the corpus size; at 100 TB the semantic leg
swaps `cosine_topk` for `ivf_topk`/`lsh_topk` under the same (id, rank)
candidate contract and nothing else changes. This is the corpus-mining /
contamination-triage / eval-set-retrieval shape (`search_hybrid_rrf` in
the query registry is the value-checked twin of this program).

Run: python examples/corpus_search.py [sf_dir] [terms ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

import bonobo_sqlalchemy_spark as bss
from bonobo_sqlalchemy_spark.operators import similarity as S
from bonobo_sqlalchemy_spark.operators.scale import single_partition_key
from bonobo_sqlalchemy_spark.operators.selection import bm25_topk, rrf_fuse
from bonobo_sqlalchemy_spark.sources.files import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    terms = sys.argv[2:] or ["spark", "sort", "window"]
    spark = bss.get_spark(app_name="corpus-search")

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # lexical leg: BM25 top-50 (token stream filtered to the broadcast
    # term list before any shuffle), ranked over the 50-row candidate list
    lex = bm25_topk(docs, terms, k=50).withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy(single_partition_key()).orderBy(
                F.col("bm25").desc(), "doc_id"
            )
        ),
    )

    # semantic leg: neighbors of a seed document's embedding (vec_id 0);
    # exact cosine here, IVF/LSH at scale — same candidate contract
    seed = emb.where(F.col("vec_id") == 0)
    vec = S.cosine_topk(emb, seed, k=50).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )

    # the 100 TB swap, demonstrated live as the full production loop:
    # day 0 — train the coarse quantizer ONCE, persist it next to the
    # corpus (codebook-sized parquet), and write the cell-partitioned
    # assignment TABLE for the day-0 vectors; day 1 — an ingest delta
    # upserts through the LOADED codebook, rewriting only the affected
    # cell partitions; every probe then reads candidates straight from
    # the maintained table (no training stage, no corpus-wide assignment
    # pass). Same (id, rank) candidate contract as the exact leg; report
    # the overlap so the approximation cost is visible before anyone
    # flips the leg.
    import tempfile

    root = tempfile.mkdtemp()
    cb_path, tbl_path = root + "/ivf_codebook", root + "/ivf_table"
    S.ann_index_save(
        spark, cb_path, S.ivf_train_or_init(emb, "embedding", "vec_id", 16, 0)
    )
    codebook = S.ann_index_load(spark, cb_path)
    day0 = emb.where(F.col("vec_id") % 10 != 7)
    delta = emb.where(F.col("vec_id") % 10 == 7)
    S.ivf_index_write(spark, tbl_path, day0, codebook)
    S.ivf_index_upsert(spark, tbl_path, delta, codebook)  # day-1 ingest
    ivf = S.ivf_topk_preassigned(
        spark.read.parquet(tbl_path), seed, codebook, k=50, n_probe=4
    ).select(F.col("neighbor_id").alias("doc_id"))
    overlap = vec.join(ivf, "doc_id", "left_semi").count()
    print(
        f"incrementally-maintained IVF leg (4/16 cells probed) recovers "
        f"{overlap}/50 of the exact semantic candidates -> {tbl_path}"
    )

    fused = rrf_fuse(
        {"bm25": lex.select("doc_id", "rank"), "cos": vec}, k0=60, k=10
    )
    out = (
        fused.join(docs.select("doc_id", "lang", "source", "text"), "doc_id")
        .withColumn("snippet", F.substring("text", 1, 60))
        .select("doc_id", "rrf_score", "bm25_rank", "cos_rank", "lang", "snippet")
        .orderBy(F.col("rrf_score").desc(), "doc_id")
    )
    print(f"query terms: {terms}; seed vector: vec_id=0")
    out.show(truncate=False)


if __name__ == "__main__":
    main()
