"""Bloom-filter membership, KMV source overlap, bigram LM fluency.

Planted-case tests for the round-8 part-2 operators; their corpus-level
value-exactness is covered by the registry oracles
(`dedup_bloom_prefilter`, `profile_source_overlap`,
`text_bigram_logprob`).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.operators.dedup import bloom_build, bloom_probe
from bonobo_sqlalchemy_spark.operators.profile import source_overlap_kmv
from bonobo_sqlalchemy_spark.operators.quality import bigram_interpolated_logprob


# ---------------------------------------------------------------- bloom

def test_bloom_zero_false_negatives(spark):
    """Every reference key MUST hit — the Bloom guarantee that makes
    bloom_hit=false a safe discard at scale."""
    ref = spark.createDataFrame([(f"key{i}",) for i in range(500)], ["k"])
    bloom = bloom_build(ref, "k")
    probed = bloom_probe(ref, bloom, "k")
    assert probed.where(~F.col("bloom_hit")).count() == 0


def test_bloom_false_positive_rate_bounded(spark):
    """Non-members mostly miss: auto-sizing targets 0.1% FP (~14.4
    bits/key), so expect ~2 hits on 2000 non-member probes; assert a
    generous 1% ceiling."""
    ref = spark.createDataFrame([(f"key{i}",) for i in range(500)], ["k"])
    bloom = bloom_build(ref, "k")
    others = spark.createDataFrame([(f"other{i}",) for i in range(2000)], ["k"])
    fp = bloom_probe(others, bloom, "k").where(F.col("bloom_hit")).count()
    assert fp <= 20, f"false-positive count {fp} exceeds 1% of 2000"


def test_bloom_params_sizing_rule():
    """The m-vs-n contract: ~9.6 bits/key at 1%, ~14.4 at 0.1%, k near
    (m/n)·ln2 — and sizing grows linearly with n, which is the whole
    point (a fixed m saturates as the reference grows)."""
    from bonobo_sqlalchemy_spark.operators.dedup import bloom_params

    m1, k1 = bloom_params(1000, 0.01)
    assert 9_000 <= m1 <= 10_000 and k1 == 7
    m2, k2 = bloom_params(1000, 0.001)
    assert 14_000 <= m2 <= 15_000 and k2 == 10
    m3, _ = bloom_params(1_000_000, 0.001)
    assert abs(m3 / m2 - 1000) < 2  # linear in n
    assert bloom_params(0, 0.001)[0] >= 64  # degenerate input still valid


def test_bloom_auto_size_tracks_reference_and_merge_rejects_mismatch(spark):
    """Auto-built filters record their derived (m_bits, k); two snapshots
    auto-sized from different cardinalities are structurally incompatible
    and bloom_merge must refuse to OR them (garbage that still looks like
    a filter), while explicit shared params keep snapshots mergeable."""
    import pytest

    from bonobo_sqlalchemy_spark.operators.dedup import bloom_merge

    small = spark.createDataFrame([(f"s{i}",) for i in range(100)], ["k"])
    big = spark.createDataFrame([(f"b{i}",) for i in range(2000)], ["k"])
    fs, fb = bloom_build(small, "k"), bloom_build(big, "k")
    ms = fs.select("m_bits", "k").first()
    mb = fb.select("m_bits", "k").first()
    assert mb["m_bits"] > ms["m_bits"] * 10  # sizing tracked cardinality
    with pytest.raises(ValueError, match="incompatible"):
        bloom_merge(fs, fb)
    # explicit shared params: mergeable, and probe reads params itself
    fs2 = bloom_build(small, "k", m_bits=1 << 14, k=5)
    fb2 = bloom_build(big, "k", m_bits=1 << 14, k=5)
    merged = bloom_merge(fs2, fb2)
    probed = bloom_probe(small.unionByName(big), merged, "k")
    assert probed.where(~F.col("bloom_hit")).count() == 0  # zero FN survives


def test_bloom_probe_plan_has_no_shuffle_of_probe_side(spark):
    """The selling point: the probed corpus never shuffles. The only
    exchange in the probe plan belongs to the filter build (reference
    side); the probe side is scan -> project -> broadcast-cross."""
    ref = spark.createDataFrame([(f"key{i}",) for i in range(50)], ["k"])
    probe = spark.createDataFrame([(f"p{i}",) for i in range(100)], ["k"])
    plan = (
        bloom_probe(probe, bloom_build(ref, "k"), "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # build side: one exchange for the word-index aggregate, one single-
    # partition collect for map_from_entries; nothing keyed by probe rows
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert (
                "pos" in line or "w#" in line or "_groupingexpression" in line
            ), f"probe-side shuffle: {line}"


def test_bloom_smaller_m_raises_fp_not_fn(spark):
    """Shrinking the filter degrades precision, never recall."""
    ref = spark.createDataFrame([(f"key{i}",) for i in range(200)], ["k"])
    bloom = bloom_build(ref, "k", m_bits=256, k=2)
    probed = bloom_probe(ref, bloom, "k", m_bits=256, k=2)
    assert probed.where(~F.col("bloom_hit")).count() == 0
    others = spark.createDataFrame([(f"other{i}",) for i in range(200)], ["k"])
    fp = bloom_probe(others, bloom, "k", m_bits=256, k=2).where(
        F.col("bloom_hit")
    ).count()
    assert fp > 0  # a 256-bit filter over 200 keys is saturated


# ------------------------------------------------------------------ kmv

def _grams(spark, rows):
    return spark.createDataFrame(rows, ["source", "text"])


def test_kmv_identical_groups_full_overlap(spark):
    shared = [(g, f"gram{i}") for g in ("a", "b") for i in range(100)]
    out = source_overlap_kmv(_grams(spark, shared), "source", "text", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.group_a, r.group_b) == ("a", "b")
    assert r.k_used == 64 and r.n_shared == 64 and r.jaccard_est == 1.0


def test_kmv_disjoint_groups_zero_overlap(spark):
    rows = [("a", f"left{i}") for i in range(100)] + [
        ("b", f"right{i}") for i in range(100)
    ]
    r = source_overlap_kmv(_grams(spark, rows), "source", "text", k=64).collect()[0]
    assert r.n_shared == 0 and r.jaccard_est == 0.0


def test_kmv_estimate_tracks_true_jaccard(spark):
    """50% shared grams -> estimate within sketch error of 1/3 Jaccard
    (|A∩B|=100, |A∪B|=300)."""
    rows = (
        [("a", f"shared{i}") for i in range(100)]
        + [("b", f"shared{i}") for i in range(100)]
        + [("a", f"lonlyA{i}") for i in range(100)]
        + [("b", f"lonlyB{i}") for i in range(100)]
    )
    r = source_overlap_kmv(_grams(spark, rows), "source", "text", k=64).collect()[0]
    assert abs(r.jaccard_est - 1 / 3) < 0.2, r


def test_kmv_partitioning_invariant(spark):
    """Content-derived hashes + total md5 order: the sketch (and hence the
    estimate) must not depend on input partitioning."""
    rows = [(f"src{i % 4}", f"gram{i % 130}") for i in range(1000)]
    df = _grams(spark, rows)
    a = sorted(
        (r.group_a, r.group_b, r.k_used, r.n_shared, r.jaccard_est)
        for r in source_overlap_kmv(df, "source", "text", k=32).collect()
    )
    b = sorted(
        (r.group_a, r.group_b, r.k_used, r.n_shared, r.jaccard_est)
        for r in source_overlap_kmv(
            df.repartition(13), "source", "text", k=32
        ).collect()
    )
    assert a == b


def test_kmv_small_union_uses_k_used_denominator(spark):
    """Union smaller than k: the estimate is exact with denominator
    k_used = |union|, never k."""
    rows = [("a", "x"), ("a", "y"), ("b", "y"), ("b", "z")]
    r = source_overlap_kmv(_grams(spark, rows), "source", "text", k=64).collect()[0]
    assert r.k_used == 3 and r.n_shared == 1
    assert r.jaccard_est == round(1 / 3, 6)


# --------------------------------------------------------------- bigram

def test_bigram_logprob_matches_hand_computation(spark):
    """Two tiny docs, lam=0.5 — expected value computed in pure Python."""
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a a")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: (r.n_scored, r.avg_log2p)
        for r in bigram_interpolated_logprob(docs, lam=0.5).collect()
    }
    # corpus tokens: a,b,a,b,a,a -> c(a)=4, c(b)=2, N=6
    # bigrams: (a,b)x2, (b,a)x1, (a,a)x1
    c1 = {"a": 4, "b": 2}
    c2 = {("a", "b"): 2, ("b", "a"): 1, ("a", "a"): 1}
    N = 6

    def p(prev, w):
        return 0.5 * c2[(prev, w)] / c1[prev] + 0.5 * c1[w] / N

    exp1 = (
        math.log2(p("a", "b")) + math.log2(p("b", "a")) + math.log2(p("a", "b"))
    ) / 3
    exp2 = math.log2(p("a", "a")) / 1
    assert out[1][0] == 3 and abs(out[1][1] - exp1) < 1e-6
    assert out[2][0] == 1 and abs(out[2][1] - exp2) < 1e-6


def test_bigram_logprob_drops_single_token_docs(spark):
    docs = spark.createDataFrame(
        [(1, "only"), (2, "two tokens")], ["doc_id", "text"]
    )
    out = bigram_interpolated_logprob(docs).collect()
    assert [r.doc_id for r in out] == [2]


def test_bigram_scores_repetition_above_shuffled_text(spark):
    """A doc whose bigrams the corpus has seen scores higher than one with
    the same tokens in an order the corpus has never seen."""
    base = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    docs = spark.createDataFrame(
        base + [(100, "dog the over fox lazy jumps quick brown the")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.avg_log2p for r in bigram_interpolated_logprob(docs).collect()}
    assert out[0] > out[100]


# ---------------------------------------------------------------- merge

def test_bloom_merge_equals_build_of_union(spark):
    """Mergeability, the incremental-ingest property: OR-ing two filters
    is bit-identical to building one filter over the union key set."""
    from bonobo_sqlalchemy_spark.operators.dedup import bloom_merge

    a = spark.createDataFrame([(f"key{i}",) for i in range(200)], ["k"])
    b = spark.createDataFrame([(f"key{i}",) for i in range(150, 350)], ["k"])
    # shared explicit params — the documented contract for snapshots that
    # will be merged (auto-sizing tracks each input's own cardinality)
    mk = dict(m_bits=1 << 13, k=6)
    merged = bloom_merge(bloom_build(a, "k", **mk), bloom_build(b, "k", **mk))
    direct = bloom_build(a.unionByName(b).distinct(), "k", **mk)

    def words(df):
        return sorted(df.select(F.explode("bloom")).collect())

    assert words(merged) == words(direct)


def test_bloom_merge_zero_false_negatives_across_snapshots(spark):
    from bonobo_sqlalchemy_spark.operators.dedup import bloom_merge

    a = spark.createDataFrame([(f"snapA{i}",) for i in range(300)], ["k"])
    b = spark.createDataFrame([(f"snapB{i}",) for i in range(300)], ["k"])
    merged = bloom_merge(bloom_build(a, "k"), bloom_build(b, "k"))
    probed = bloom_probe(a.unionByName(b), merged, "k")
    assert probed.where(~F.col("bloom_hit")).count() == 0


# -------------------------------------------------------- compression

def test_compression_ratio_matches_python_zlib(spark):
    """Exact equality against the same zlib the operator uses — verifies
    the Arrow plumbing (batching, null handling, rounding), not zlib."""
    import zlib

    from bonobo_sqlalchemy_spark.operators.quality import compression_ratio

    rows = [
        (1, "spam " * 200),                      # highly compressible
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, None),                               # NULL text
        (4, ""),                                 # empty text
        (5, "abc123XYZ!@# unique entropy 9q8w7e6r5t4y"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in compression_ratio(docs).collect()}
    for i, t in rows:
        raw = (t or "").encode("utf-8")
        nb, nc = len(raw), (len(zlib.compress(raw, 6)) if raw else 0)
        assert got[i].n_bytes == nb and got[i].n_compressed == nc
        assert got[i].compression_ratio == (round(nb / nc, 6) if nc else 0.0)
    # the redundancy ordering the screen exists for
    assert got[1].compression_ratio > got[2].compression_ratio


def test_compression_ratio_partitioning_invariant(spark):
    from bonobo_sqlalchemy_spark.operators.quality import compression_ratio

    docs = spark.createDataFrame(
        [(i, f"doc {i} " + "repeat " * (i % 7)) for i in range(100)],
        ["doc_id", "text"],
    )
    a = sorted(map(tuple, compression_ratio(docs).collect()))
    b = sorted(map(tuple, compression_ratio(docs.repartition(13)).collect()))
    assert a == b


def test_compression_ratio_honors_id_column(spark):
    """Round-9 contract: the caller's id column passes through under its
    own name AND dtype — previously the output hardcoded 'doc_id bigint',
    renaming the column and int()-crashing on string ids."""
    from bonobo_sqlalchemy_spark.operators.quality import compression_ratio

    docs = spark.createDataFrame(
        [("u-1", "alpha beta alpha beta"), ("u-2", None)],
        "url string, text string",
    )
    out = compression_ratio(docs, id_col="url")
    assert out.columns[0] == "url"
    assert dict(out.dtypes)["url"] == "string"
    got = {r.url: r for r in out.collect()}
    assert set(got) == {"u-1", "u-2"}
    assert got["u-2"].n_bytes == 0 and got["u-2"].compression_ratio == 0.0
    assert got["u-1"].n_compressed > 0
