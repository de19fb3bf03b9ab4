"""Data-selection operator tests: DSIR weighting direction, BM25 ranking
semantics, and threshold-sweep math on hand fixtures. Value-exactness vs
DuckDB is covered by the registered queries in tests/test_oracle_parity.py;
these tests pin the SEMANTICS (who ranks above whom and why)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.operators.selection import (
    bm25_topk,
    dsir_log_weights,
    dsir_select,
    threshold_sweep,
)


def test_dsir_prefers_target_like_documents(spark):
    """Documents written in the target subset's vocabulary must out-weight
    documents written in the off-target vocabulary — the defining DSIR
    property. Target docs use words {aa..ae}; off-target use {zz..zv};
    the held-out probe docs mix the two vocabularies in known ratios."""
    tgt_words = ["aa", "ab", "ac", "ad", "ae"]
    off_words = ["zz", "zy", "zx", "zw", "zv"]
    rows = []
    for i in range(20):
        rows.append((i, " ".join(tgt_words * 4), "en"))
        rows.append((100 + i, " ".join(off_words * 4), "zz"))
    # probes: mostly-target vs mostly-off mixes, NOT in the target subset
    rows.append((900, " ".join(tgt_words * 3 + off_words), "xx"))
    rows.append((901, " ".join(off_words * 3 + tgt_words), "xx"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    w = {
        r.doc_id: r.dsir_logw
        for r in dsir_log_weights(
            docs, F.col("lang") == "en", n_buckets=256
        ).collect()
    }
    assert w[900] > w[901]
    assert w[0] > w[100]  # pure target beats pure off-target
    # selection keeps the highest-weighted docs first
    top = [r.doc_id for r in dsir_select(docs, F.col("lang") == "en", k=21).collect()]
    assert set(top) <= {i for i in range(20)} | {900}


def test_dsir_is_partitioning_invariant(spark, sf_small):
    from bonobo_sqlalchemy_spark.sources.files import load_table

    docs = load_table(spark, sf_small, "documents")
    a = {
        r.doc_id: r.dsir_logw
        for r in dsir_log_weights(docs.repartition(1), F.col("lang") == "en").collect()
    }
    b = {
        r.doc_id: r.dsir_logw
        for r in dsir_log_weights(docs.repartition(13), F.col("lang") == "en").collect()
    }
    assert a == b


def test_bm25_ranking_semantics(spark):
    """More matching terms and higher tf rank higher; rare terms count
    more than common ones; documents without any query term are absent."""
    rows = [
        (1, "spark spark spark filler filler"),
        (2, "spark filler filler filler filler"),
        (3, "common common filler filler filler"),
        (4, "filler only no match here at all"),
        (5, "spark common filler filler filler"),
        # make 'common' common (low idf) and 'spark' rarer (high idf)
        (6, "common filler a b c"),
        (7, "common filler d e f"),
        (8, "common filler g h i"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = bm25_topk(docs, ["spark", "common"], k=10)
    scores = {r.doc_id: r.bm25 for r in got.collect()}
    assert 4 not in scores  # no query term -> no row
    assert scores[1] > scores[2]  # higher tf wins
    assert scores[5] > scores[2]  # two matched terms beat one
    # a rare-term-only doc beats a common-term-only doc at equal tf
    assert scores[2] > scores[3]


def test_bm25_is_one_corpus_pass(spark, sf_small):
    """r15: tf, dl and df all derive from ONE checkpointed token
    aggregation, so the returned plan reads the materialized checkpoint
    (Scan ExistingRDD) and never re-scans the corpus — the old shape
    re-ran the token aggregation in every broadcast-build job."""
    from bonobo_sqlalchemy_spark.sources.files import load_table

    docs = load_table(spark, sf_small, "documents")
    got = bm25_topk(docs, ["spark", "sort", "window"], k=10)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan
    assert "parquet" not in plan.lower()


def test_threshold_sweep_math_hand_fixture(spark):
    """4 docs at 3 distinct scores: sweep rows must carry exact cumulative
    counts and precision/recall for 'keep score >= threshold'."""
    rows = [
        (1, 3.0, True),
        (2, 2.0, True),
        (3, 2.0, False),
        (4, 1.0, False),
    ]
    scored = spark.createDataFrame(rows, "doc_id bigint, s double, pos boolean")
    got = {r.threshold: r for r in threshold_sweep(scored, "s", "pos").collect()}
    assert got[3.0].n_kept == 1 and got[3.0].tp == 1
    assert got[3.0].precision == 1.0 and got[3.0].recall == 0.5
    assert got[2.0].n_kept == 3 and got[2.0].tp == 2
    assert got[2.0].precision == round(2 / 3, 6) and got[2.0].recall == 1.0
    assert got[1.0].n_kept == 4 and got[1.0].tp == 2
    assert got[1.0].precision == 0.5 and got[1.0].recall == 1.0


def test_grouped_sweep_and_auto_threshold(spark):
    """Two groups with known curves: auto_threshold must pick each group's
    most permissive threshold meeting the precision floor, and emit no
    row for a group that can't reach it at any threshold."""
    from bonobo_sqlalchemy_spark.operators.selection import auto_threshold

    rows = [
        # group g1: scores 3,2,1 with labels T,T,F ->
        #   thr=3: p=1.0 r=0.5; thr=2: p=1.0 r=1.0; thr=1: p=2/3 r=1.0
        ("g1", 3.0, True), ("g1", 2.0, True), ("g1", 1.0, False),
        # group g2: all negative -> precision 0 everywhere, no pick
        ("g2", 3.0, False), ("g2", 2.0, False),
    ]
    scored = spark.createDataFrame(rows, "g string, s double, pos boolean")
    sweep = threshold_sweep(scored, "s", "pos", group_col="g")
    got = {(r.g, r.threshold): r for r in sweep.collect()}
    assert got[("g1", 2.0)].precision == 1.0 and got[("g1", 2.0)].recall == 1.0
    picked = {r.g: r for r in auto_threshold(sweep, 0.9, group_col="g").collect()}
    assert set(picked) == {"g1"}  # g2 honestly absent
    assert picked["g1"].threshold == 2.0  # most permissive at p>=0.9


def test_grouped_decile_semantics_and_plan(spark):
    """grouped_decile: bucket 1 holds the best scores, equal scores share
    a bucket regardless of row order, every bucket label is in [1, n],
    and the physical plan contains NO Window operator at all (the entire
    point: boundaries broadcast back instead of a per-group sort)."""
    from bonobo_sqlalchemy_spark.operators.selection import grouped_decile

    rows = [(i, "en", float(i)) for i in range(100)]
    # a tied clump in 'de': 10 docs share score 5.0, others spread
    rows += [(200 + i, "de", 5.0) for i in range(10)]
    rows += [(300 + i, "de", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, s double")
    out = grouped_decile(df, "s", "lang", out_col="d")
    got = {r.doc_id: r.d for r in out.collect()}
    # highest english score -> bucket 1, lowest -> bucket 10
    assert got[99] == 1 and got[0] == 10
    # monotone: higher score never lands in a worse (higher) bucket
    for i in range(99):
        assert got[i + 1] <= got[i]
    # the tied 'de' clump shares one bucket
    assert len({got[200 + i] for i in range(10)}) == 1
    assert all(1 <= d <= 10 for d in got.values())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_grouped_decile_null_group_and_null_score(spark):
    """Round-9 null contract: rows with a NULL group survive (null-safe
    join back to their own NULL-group boundary row — the ntile window
    this operator replaced kept NULL partitions, so dropping them was a
    silent behavior change for corpora with undetected lang), and a NULL
    score lands in the WORST bucket, never bucket 1."""
    from bonobo_sqlalchemy_spark.operators.selection import grouped_decile

    rows = [(i, "en", float(i)) for i in range(20)]
    rows += [(100 + i, None, float(i)) for i in range(20)]  # NULL group
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, s double")
    df = df.unionByName(
        spark.createDataFrame(
            [(999, "en", None)], "doc_id bigint, lang string, s double"
        )
    )
    out = grouped_decile(df, "s", "lang", out_col="d")
    got = {r.doc_id: r for r in out.collect()}
    assert len(got) == 41  # nothing dropped
    # NULL-group rows bucket against their own boundaries
    assert got[119].d == 1 and got[100].d == 10
    assert all(1 <= got[100 + i].d <= 10 for i in range(20))
    # NULL score -> worst bucket
    assert got[999].d == 10


def test_mixture_sample_rank_pushdown(spark):
    """The literal max-quota conjunct must produce a Partial
    WindowGroupLimit (map-side per-group truncation) — without it one
    dominant group is a single-task sort at scale."""
    from bonobo_sqlalchemy_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(60)], "doc_id bigint, g string"
    )
    out = mixture_sample(df, "g", {"a": 5, "b": 7}, "doc_id", seed=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan
    counts = {r.g: r.n for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 5, "b": 7}
