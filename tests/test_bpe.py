"""BPE tokenizer tests: classic-equivalence vs a pure-Python reference,
determinism across input partitionings, batched-merge round-trip, and the
token-count contract on real documents."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.functions import bpe
from bonobo_sqlalchemy_spark.sources.files import load_table

CORPUS = (
    "low low low low low lower lower newest newest newest "
    "newest newest newest widest widest widest"
)


def _reference_bpe(word_freqs: dict[str, int], n_merges: int, min_freq: int = 2):
    """Sennrich-style sequential BPE: count adjacent pairs over the vocab,
    merge the most frequent (lexicographic tie-break), repeat."""
    vocab = {
        tuple(list(w) + [bpe.EOW]): f for w, f in word_freqs.items()
    }
    merges = []
    for _ in range(n_merges):
        counts = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        counts = {p: c for p, c in counts.items() if c >= min_freq}
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        merges.append(best)
        vocab = {
            tuple(bpe._merge_word(syms, [best])): f for syms, f in vocab.items()
        }
    return merges


def test_sequential_training_matches_reference(spark):
    docs = spark.createDataFrame([(CORPUS,)], "text string")
    freqs = collections.Counter(CORPUS.split())
    want = _reference_bpe(freqs, 12)
    got = bpe.bpe_train(docs, n_merges=12, merges_per_round=1)
    assert got == want


def test_training_is_partitioning_invariant(spark):
    rows = [(w,) for w in CORPUS.split()]
    a = bpe.bpe_train(
        spark.createDataFrame(rows, "text string").repartition(1), n_merges=8
    )
    b = bpe.bpe_train(
        spark.createDataFrame(rows, "text string").repartition(13), n_merges=8
    )
    assert a == b and len(a) == 8


def test_batched_training_roundtrips_and_is_deterministic(spark):
    docs = spark.createDataFrame([(CORPUS,)], "text string")
    m1 = bpe.bpe_train(docs, n_merges=12, merges_per_round=4)
    m2 = bpe.bpe_train(docs, n_merges=12, merges_per_round=4)
    assert m1 == m2 and len(m1) == 12
    ranks = {p: i for i, p in enumerate(m1)}
    for w in set(CORPUS.split()) | {"lowest", "wider", "new"}:
        toks = bpe.encode_word(w, ranks)
        assert bpe.decode_tokens(toks) == w
        assert all(t == bpe.EOW or t for t in toks)


def test_token_counts_contract_on_documents(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").limit(200).cache()
    merges = bpe.bpe_train(docs, n_merges=16, merges_per_round=8)
    assert len(merges) == 16
    counts = bpe.bpe_token_counts(docs, merges)
    joined = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("n_words"),
        F.length("text").alias("n_chars"),
    ).join(counts, "doc_id")
    rows = joined.collect()
    assert len(rows) == 200
    for r in rows:
        # every word is >= 1 token; merges never push counts above chars+words
        assert r.n_words <= r.n_bpe_tokens <= r.n_chars + r.n_words, r
    # merges must actually compress: strictly fewer tokens than the
    # merge-free (chars + EOW per word) encoding for the corpus overall
    unmerged = bpe.bpe_token_counts(docs, []).agg(
        F.sum("n_bpe_tokens")
    ).collect()[0][0]
    total = sum(r.n_bpe_tokens for r in rows)
    assert total < unmerged
