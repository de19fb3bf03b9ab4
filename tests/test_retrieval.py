"""Reciprocal-rank fusion and the leakage-free group-disjoint split.

Corpus-level value-exactness is covered by the registry oracles
(`search_hybrid_rrf`, `text_split_leakproof`); these are the planted-case
and property tests.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.operators.dedup import (
    group_disjoint_split,
    ngram_jaccard_pairs,
)
from bonobo_sqlalchemy_spark.operators.selection import rrf_fuse


# ------------------------------------------------------------------- rrf

def _ranked(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "rank"])


def test_rrf_hand_computed(spark):
    """Two 3-row lists with one shared doc — fused scores match the
    formula computed in pure Python."""
    a = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    b = _ranked(spark, [(2, 1), (4, 2), (5, 3)])
    out = {
        r.doc_id: (r.rrf_score, r.a_rank, r.b_rank)
        for r in rrf_fuse({"a": a, "b": b}, k0=60, k=10).collect()
    }
    assert out[2] == (round(1 / 62 + 1 / 61, 6), 2, 1)
    assert out[1] == (round(1 / 61, 6), 1, None)
    assert out[4] == (round(1 / 62, 6), None, 2)
    assert len(out) == 5


def test_rrf_both_lists_beats_one_list(spark):
    """A doc ranked moderately by BOTH retrievers outranks a doc ranked
    first by only one — the consensus property RRF is used for."""
    a = _ranked(spark, [(10, 1), (7, 2), (8, 3)])
    b = _ranked(spark, [(11, 1), (7, 2), (9, 3)])
    rows = rrf_fuse({"a": a, "b": b}, k0=60, k=10).collect()
    assert rows[0].doc_id == 7  # 2/62 > 1/61


def test_rrf_limit_and_tie_order(spark):
    """Symmetric ranks fuse to equal scores; ties order by id, and the
    top-k boundary is deterministic."""
    a = _ranked(spark, [(1, 1), (2, 2)])
    b = _ranked(spark, [(2, 1), (1, 2)])
    rows = rrf_fuse({"a": a, "b": b}, k0=60, k=1).collect()
    assert len(rows) == 1 and rows[0].doc_id == 1


# ----------------------------------------------------------- group split

def _near_dup_corpus(spark):
    """Three exact/near-dup pairs plus singletons, one language block."""
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, dup, "en"),
        (1, dup + " iota", "en"),          # near-dup of 0
        (2, "one two three four five six seven eight", "en"),
        (3, "one two three four five six seven nine", "en"),  # near-dup of 2
        (4, "totally different words nothing shared here at all", "en"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_group_split_never_straddles_components(spark):
    docs = _near_dup_corpus(spark)
    pairs = ngram_jaccard_pairs(docs, block_col="lang", n=3, threshold=0.5)
    out = group_disjoint_split(docs, pairs)
    straddle = (
        out.groupBy("component")
        .agg(F.countDistinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert straddle == 0
    assert out.count() == 5  # every doc assigned, singletons included


def test_group_split_planted_pair_shares_split(spark):
    docs = _near_dup_corpus(spark)
    pairs = ngram_jaccard_pairs(docs, block_col="lang", n=3, threshold=0.5)
    by_id = {r.doc_id: r.split for r in group_disjoint_split(docs, pairs).collect()}
    assert by_id[0] == by_id[1]
    assert by_id[2] == by_id[3]


def test_group_split_matches_per_doc_rule_for_singletons(spark):
    """A singleton's component is its own id, so its assignment equals the
    per-document split — the two split functions agree off the dup graph."""
    from bonobo_sqlalchemy_spark.functions.text import train_val_split

    docs = _near_dup_corpus(spark)
    pairs = ngram_jaccard_pairs(docs, block_col="lang", n=3, threshold=0.5)
    got = {
        r.doc_id: r.split
        for r in group_disjoint_split(docs, pairs).where(F.col("doc_id") == 4).collect()
    }
    want = docs.where(F.col("doc_id") == 4).select(
        train_val_split(F.col("doc_id").cast("string")).alias("s")
    ).collect()[0].s
    assert got[4] == want
