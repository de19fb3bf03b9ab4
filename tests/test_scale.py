"""Scale-toolkit tests: salted joins match plain joins exactly; bucketed
tables join without exchanges; JDBC option construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.operators.scale import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from bonobo_sqlalchemy_spark.registry import JdbcService
from bonobo_sqlalchemy_spark.sources.files import load_table
from bonobo_sqlalchemy_spark.sources.jdbc import jdbc_read_options


def _norm(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_join_matches_plain_inner(spark, sf_small):
    o = load_table(spark, sf_small, "orders").withColumnRenamed("o_custkey", "c_custkey")
    c = load_table(spark, sf_small, "customer")
    plain = o.join(c, "c_custkey")
    salted = salted_join(o, c, "c_custkey", salt_buckets=8)
    cols = ["o_orderkey", "c_custkey", "c_name"]
    assert _norm(salted, cols) == _norm(plain, cols)


def test_salted_join_matches_plain_left(spark, sf_small):
    c = load_table(spark, sf_small, "customer")
    o = (
        load_table(spark, sf_small, "orders")
        .withColumnRenamed("o_custkey", "c_custkey")
        .where(F.col("o_totalprice") > 400000)
    )
    # left join preserving customers with no qualifying orders
    plain = c.join(o, "c_custkey", "left")
    salted = salted_join(c, o, "c_custkey", how="left", salt_buckets=4)
    cols = ["c_custkey", "o_orderkey"]
    assert _norm(salted, cols) == _norm(plain, cols)


def test_salted_join_rejects_outer_on_replicated_side():
    with pytest.raises(ValueError):
        salted_join(None, None, "k", how="full_outer")


def test_bucketed_join_has_no_exchange(spark, sf_small):
    o = load_table(spark, sf_small, "orders")
    c = load_table(spark, sf_small, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    write_bucketed(o, "b_orders", "o_custkey", n_buckets=4, sort_col="o_custkey")
    write_bucketed(c, "b_customer", "o_custkey", n_buckets=4, sort_col="o_custkey")
    # force sort-merge (tiny test tables would otherwise broadcast, which
    # hides the property under test: co-located buckets need no shuffle)
    joined = bucketed_join(
        spark, "b_orders", "b_customer", "o_custkey", force_sort_merge=True
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan[:1500]
    assert joined.count() == o.count()


def test_jdbc_options_table_and_query_forms():
    svc = JdbcService("jdbc:postgresql://h:5432/db", {"user": "u"})
    t = jdbc_read_options(svc, "lineitem", fetchsize=500)
    assert t["dbtable"] == "lineitem" and t["fetchsize"] == "500" and t["user"] == "u"
    q = jdbc_read_options(
        svc,
        "SELECT a, b FROM t WHERE a > 0;",
        partition_column="a",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=16,
    )
    assert q["dbtable"] == "(SELECT a, b FROM t WHERE a > 0) AS __src"
    assert q["partitionColumn"] == "a" and q["numPartitions"] == "16"


def test_jdbc_partition_requires_bounds():
    svc = JdbcService("jdbc:postgresql://h/db")
    with pytest.raises(ValueError):
        jdbc_read_options(svc, "t", partition_column="a")


# ---------------------------------------------------------------------------
# Skew hardening: pathological hot-key corpora through the dedup self-joins
# ---------------------------------------------------------------------------

def _skewed_docs(spark, n_hot=600, n_cold=600):
    """A corpus where half the docs share ONE ultra-hot shingle ('hot hot
    hot') but are otherwise pairwise-distinct — the worst case for an
    inverted-index self-join: a single posting list of n_hot docs that
    contributes n_hot*(n_hot-1)/2 candidate pairs, none of which is a true
    near-duplicate (1 shared shingle out of ~13)."""
    rows = [
        (i, f"hot hot hot hot u{i} v{i} w{i} x{i} y{i} z{i}")
        for i in range(n_hot)
    ] + [
        (i, f"p{i} q{i} r{i} s{i} t{i} m{i} n{i} o{i}")
        for i in range(n_hot, n_hot + n_cold)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_stop_shingle_cap_bounds_hot_posting_lists(spark):
    """Structural skew bound: without the cap the hot shingle's posting
    list is n_hot docs (quadratic candidate blowup on one reducer); with
    the cap it is gone entirely and the join's per-key work is bounded by
    max_shingle_df, independent of how hot the key was."""
    from bonobo_sqlalchemy_spark.operators.dedup import (
        _cap_shingles,
        _exploded_shingles,
        ngram_jaccard_pairs,
    )

    docs = _skewed_docs(spark)
    ex = _exploded_shingles(docs, "text", "doc_id", 3, None)
    hottest = ex.groupBy("g").count().agg(F.max("count")).first()[0]
    assert hottest == 600  # the pathology is real

    capped = _cap_shingles(ex, max_shingle_df=50)
    hottest_capped = capped.groupBy("g").count().agg(F.max("count")).first()[0]
    assert hottest_capped <= 50

    # The full operator under the cap: completes with zero candidate pairs
    # (the hot docs share nothing but the dropped stop-shingle).
    assert (
        ngram_jaccard_pairs(
            docs, block_col=None, threshold=0.3, max_shingle_df=50
        ).count()
        == 0
    )


def test_minhash_lsh_on_skewed_corpus_stays_bounded(spark):
    """LSH banding on the hot-shingle corpus: one shared shingle cannot
    dominate 32 MIN lanes, so hot docs land in distinct buckets and the
    candidate stream stays near-empty — banding is itself the skew guard
    (plus exact verification kills any stragglers)."""
    from bonobo_sqlalchemy_spark.operators.dedup import minhash_lsh_pairs

    docs = _skewed_docs(spark)
    assert minhash_lsh_pairs(docs, threshold=0.5).count() == 0


def test_semantic_dedup_hot_cluster_cap_bounds_pairs(spark):
    """SemDeDup's structural skew guard: a planted mega-cluster (every
    vector near-identical, so k-means routes ALL of them to one centroid)
    would make the intra-cluster join quadratic — C(400,2) = 79,800
    candidate pairs on one key. With max_cluster_size the cluster is
    sub-split by a content hash and candidate work drops to
    ~n_sub * C(cap, 2) while per-key fan-out stays ~cap. Exact duplicates
    that share a sub-bucket are still found (recall inside the hot cluster
    degrades by design; normal clusters are untouched)."""
    import numpy as np

    from bonobo_sqlalchemy_spark.operators.dedup import semantic_dedup_pairs

    rng = np.random.default_rng(7)
    n = 400
    base = rng.normal(size=8)
    rows = [
        (i, [float(x) for x in base + rng.normal(scale=1e-3, size=8)])
        for i in range(n)
    ]
    docs = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    capped = semantic_dedup_pairs(
        docs, threshold=0.99, n_clusters=4, max_cluster_size=50
    ).count()
    # expected sub-bucket size ~50 over ~8 buckets: ~8 * C(50,2) = 9,800
    # pairs worst case; 4x headroom for hash-split variance, still far
    # under the 79,800 a quadratic blowup would generate.
    assert 0 < capped < 40_000, capped

    # uncapped on a small slice remains exhaustive — the guard only
    # engages above the cap
    small = docs.limit(30)
    uncapped = semantic_dedup_pairs(
        small, threshold=0.99, n_clusters=1, max_cluster_size=None
    ).count()
    assert uncapped == 30 * 29 // 2, uncapped


def test_skew_join_safety_nets_enabled(spark):
    """The runtime guards the structural bounds rely on: AQE skew-join
    splitting (covers genuinely hot LSH buckets of true duplicates, where
    dropping the key would be wrong) stays enabled in the engine session."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_skew_report_math_and_rowcap(spark):
    from bonobo_sqlalchemy_spark.operators.scale import skew_report

    df = spark.createDataFrame(
        [("hot",)] * 80 + [("warm",)] * 15 + [("cold",)] * 5, "k string"
    )
    rows = skew_report(df, ["k"], top_k=2).collect()
    assert [(r.k, r.n_rows) for r in rows] == [("hot", 80), ("warm", 15)]
    hot = rows[0]
    assert hot.share == 0.8
    # mean per key = 100/3; hot is 80 / (100/3) = 2.4x the mean
    assert hot.x_mean == 2.4


def _hot_token_docs(spark, n_docs=300, reps=40):
    """A corpus where the token 'the' appears `reps` times in EVERY
    document (plus a unique tail per doc) — a planted zipf head: 12,000
    occurrences of one key where every other token has a handful. Without
    a guard, every one of those rows hashes to a single shuffle partition
    of the token→count lookup join."""
    rows = [
        (i, ("the " * reps) + f"alpha{i} beta{i} gamma{i} delta{i}")
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_segment_outliers_hot_token_bypass_exact(spark):
    """The hot-key bypass in segment_quality_outliers is EXACT: splitting
    the vocab lookup into broadcast(hot) + shuffle(cold) and unioning must
    reproduce the plain single-join result row-for-row (the rounded 6dp
    outputs compare equal), because the hot/cold predicate partitions the
    vocab and every token matches exactly one side."""
    from bonobo_sqlalchemy_spark.operators.quality import (
        segment_quality_outliers,
    )

    docs = _hot_token_docs(spark)
    plain = segment_quality_outliers(docs, chunk=16, hot_token_df=None)
    bypass = segment_quality_outliers(docs, chunk=16, hot_token_df=100)
    key = lambda r: r[0]
    a = sorted(map(tuple, plain.collect()), key=key)
    b = sorted(map(tuple, bypass.collect()), key=key)
    assert a == b


def test_segment_outliers_hot_slice_is_pigeonhole_bounded(spark):
    """Structural bound: the broadcast (hot) side of the bypass holds one
    row per DISTINCT token with df > threshold — at most
    total_occurrences / threshold rows by pigeonhole — while the residual
    shuffle side's hottest key is capped at the threshold. On the planted
    corpus: 'the' (df 12,000) is the only hot token at threshold 100."""
    from pyspark.sql import functions as F

    docs = _hot_token_docs(spark)
    toks = docs.select(
        F.posexplode(F.split(F.trim("text"), " +")).alias("pos", "tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    hot = counts.where(F.col("c") > 100)
    cold = counts.where(F.col("c") <= 100)
    total = toks.count()
    assert hot.count() == 1  # just 'the'
    assert hot.count() <= total // 100  # the pigeonhole bound itself
    # residual shuffle join's per-key volume is threshold-capped
    assert cold.agg(F.max("c")).first()[0] <= 100


def test_segment_outliers_bypass_plan_broadcasts_hot_leg(spark):
    """Plan-level evidence: with the guard engaged, the executed plan
    carries a BroadcastHashJoin (the hot leg) — the hot key's rows never
    enter a shuffle exchange keyed on the token."""
    from bonobo_sqlalchemy_spark.operators.quality import (
        segment_quality_outliers,
    )

    docs = _hot_token_docs(spark)
    out = segment_quality_outliers(docs, chunk=16, hot_token_df=100)
    out.collect()  # AQE finalizes the physical plan on execution
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_auto_bits_per_table_hits_target_occupancy():
    """The auto default (round 13) keeps expected bucket occupancy in
    (target/2, target] for corpora above the floor, at two sizes an order
    of magnitude apart — the property that makes LSH candidate volume
    linear in N instead of quadratic."""
    from bonobo_sqlalchemy_spark.operators.dedup import auto_bits_per_table

    target = 160
    for n in (20_000, 1_000_000):
        bits = auto_bits_per_table(n, target_occupancy=target)
        occupancy = n / (2**bits)
        assert target / 2 < occupancy <= target, (n, bits, occupancy)
    # the round-12 SCALING appendix's measured sweet spot reproduces
    assert auto_bits_per_table(20_000) == 7
    # small fixtures stay at the pinned floor (oracle determinism)
    assert auto_bits_per_table(500) == 4
    assert auto_bits_per_table(2_000) == 4
    assert auto_bits_per_table(0) == 4


def test_auto_simhash_blocks_sizing_rule():
    """The r14 occupancy rule: smallest k in [d+1, d+5] whose guaranteed
    key width (k-d)*floor(64/k) reaches log2(n/160). Pinned at the
    measured SCALING-appendix points plus the floor/cap edges."""
    from bonobo_sqlalchemy_spark.operators.dedup import auto_simhash_blocks

    d = 8
    assert auto_simhash_blocks(0, d) == 9  # empty -> floor
    assert auto_simhash_blocks(500, d) == 9  # driver fixtures stay classic
    assert auto_simhash_blocks(5_000, d) == 9
    assert auto_simhash_blocks(50_000, d) == 10  # sf1.0 decade
    assert auto_simhash_blocks(1_000_000, d) == 11
    assert auto_simhash_blocks(10**9, d) == 13  # capped at d+5
    # width must actually meet the occupancy bound where uncapped
    for n in (50_000, 1_000_000):
        k = auto_simhash_blocks(n, d)
        import math

        assert (k - d) * (64 // k) >= math.log2(n / 160)


def test_embedding_near_dup_auto_bits_default_engages(spark):
    """bits_per_table=None (the default) routes through the auto sizing
    and still finds planted twins on a small corpus (floor bits)."""
    import random

    from bonobo_sqlalchemy_spark.operators import dedup as D

    rng = random.Random(7)
    rows = []
    for i in range(40):
        v = [rng.uniform(-1, 1) for _ in range(64)]
        rows.append((2 * i, "x", v))
        rows.append((2 * i + 1, "x", [x + 1e-4 for x in v]))
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>"
    )
    found = {
        (r.id1, r.id2)
        for r in D.embedding_near_dup_pairs(df, threshold=0.9).collect()
    }
    expected = {(2 * i, 2 * i + 1) for i in range(40)}
    assert len(expected - found) <= 1


# ---------------------------------------------------------------------------
# Round 15: planted-cluster embedding fixture (sf1_generate) — geometry and
# operator recall, so the fixture change cannot silently weaken the
# operators' test value (r14 verdict item 1)
# ---------------------------------------------------------------------------


def test_planted_cluster_fixture_geometry_and_operator_recall(spark):
    """The sf1.0 embedding generator must yield the geometry its docstring
    promises — within-cluster cosine >> 0.4, every cross-cluster cosine
    below the 0.15 query threshold — and `embedding_near_dup_pairs` at the
    production auto-bits default must recover the planted pair set with
    ~perfect recall and zero cross-cluster hallucinations. Asserted on a
    small instance of the same helper (same construction, n scaled down)."""
    import numpy as np

    from sf1_generate import planted_cluster_embeddings
    from bonobo_sqlalchemy_spark.operators.dedup import embedding_near_dup_pairs

    n, n_clusters = 600, 32
    vecs, labels, cids = planted_cluster_embeddings(
        n, n_clusters=n_clusters, seed=99
    )
    gram = vecs @ vecs.T
    same = cids[:, None] == cids[None, :]
    off_diag = ~np.eye(n, dtype=bool)
    assert gram[same & off_diag].min() > 0.9          # planted pairs: near-dup
    assert gram[~same].max() < 0.15                   # cross: below threshold
    # labels are cluster-correlated (cluster -> label is a function)
    assert all(
        len({int(l) for l in labels[cids == c]}) == 1 for c in range(n_clusters)
    )

    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]], int(labels[i])) for i in range(n)],
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        (r.id1, r.id2)
        for r in embedding_near_dup_pairs(
            df, threshold=0.15, block_col=None
        ).collect()
    }
    want = {
        (int(min(i, j)), int(max(i, j)))
        for i in range(n)
        for j in range(i + 1, n)
        if cids[i] == cids[j]
    }
    assert not (got - want), "cross-cluster hallucinated pairs"
    recall = len(got & want) / len(want)
    assert recall >= 0.99, f"planted-pair recall {recall:.4f}"
