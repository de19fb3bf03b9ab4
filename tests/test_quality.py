"""Learned quality-model tests: separation on planted docs, determinism,
weak-label agreement, and the all-codegen feature extraction contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.operators import quality as Q
from bonobo_sqlalchemy_spark.sources.files import load_table

CLEAN = [
    f"the quick brown fox number {i} jumps over the lazy dog and then "
    "runs far away into the woods of the north to find a quiet place"
    for i in range(25)
]
JUNK = ["@#$%^&*" + "!?~" * (15 + i) + " ///\\\\ +++" for i in range(25)]


def _planted(spark):
    rows = [(i, t, 1.0) for i, t in enumerate(CLEAN)] + [
        (100 + i, t, 0.0) for i, t in enumerate(JUNK)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, label double")


def test_model_separates_planted_clean_from_junk(spark):
    df = _planted(spark)
    w = Q.train_quality_model(df, n_features=256, iters=6)
    assert len(w) == 257
    scores = {r.doc_id: r.q_prob for r in Q.score_quality(df, w).collect()}
    worst_clean = min(v for k, v in scores.items() if k < 100)
    best_junk = max(v for k, v in scores.items() if k >= 100)
    assert worst_clean > best_junk, (worst_clean, best_junk)
    assert worst_clean > 0.8 and best_junk < 0.2


def test_training_is_deterministic_and_partitioning_invariant(spark):
    df = _planted(spark)
    w1 = Q.train_quality_model(df.repartition(1), n_features=128, iters=3)
    w2 = Q.train_quality_model(df.repartition(17), n_features=128, iters=3)
    # gradient sums are IEEE doubles: partitioning can flip the last bits,
    # never more (rounded scores are identical — asserted below)
    assert max(abs(a - b) for a, b in zip(w1, w2)) < 1e-9
    s1 = {r.doc_id: r.q_prob for r in Q.score_quality(df, w1).collect()}
    s2 = {r.doc_id: r.q_prob for r in Q.score_quality(df, w2).collect()}
    assert s1 == s2


def test_weak_label_bootstrap_agrees_with_confident_heuristic(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    out = Q.quality_model_scores(docs, iters=6).cache()
    assert out.count() == docs.count()  # every doc scored, band included
    labeled = out.where(F.col("label").isNotNull())
    # the learned model must reproduce the confident labels it trained on
    acc = labeled.select(
        F.avg(
            (F.col("label") == (F.col("q_prob") > 0.5).cast("double")).cast("double")
        ).alias("acc")
    ).collect()[0]["acc"]
    assert acc >= 0.9, f"train-label agreement {acc:.3f}"


def test_feature_extraction_is_codegen_only(spark):
    """No Python UDFs in the per-token path: the feature plan must be free
    of BatchEvalPython / ArrowEvalPython / mapInPandas stages."""
    df = _planted(spark)
    plan = Q.hashed_ngram_features(df)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan, marker


def test_bias_only_doc_gets_scored(spark):
    """Empty/whitespace docs still produce the bias row and a score."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real text here")], "doc_id bigint, text string"
    )
    w = [0.5] * 129
    assert Q.score_quality(df, w).count() == 3


def test_gopher_rules_verdict_logic(spark):
    from bonobo_sqlalchemy_spark.operators.quality import gopher_rules

    rows = [
        # passes everything: 25 words, normal lengths, 2 stopwords, no repeats
        (1, "the cat sat on a mat today and then walked across town before "
            "dinner with friends who arrived early bringing fresh bread "
            "plus cheese wine"),
        # too short
        (2, "the and tiny doc"),
        # no stopwords
        (3, " ".join(f"w{i}" for i in range(30))),
        # heavy bigram repetition: 'x y' repeated
        (4, "the and " + "x y " * 20),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in gopher_rules(
        df, min_words=10, max_words=90, min_stopwords=2,
        max_dup_bigram_ratio=0.2,
    ).collect()}
    assert out[1]["keep"] is True
    assert out[2]["ok_n_words"] is False and out[2]["keep"] is False
    assert out[3]["ok_stopwords"] is False and out[3]["keep"] is False
    assert out[4]["ok_dup_bigram"] is False and out[4]["keep"] is False
    # metric spot-checks
    assert out[3]["n_words"] == 30 and out[3]["n_stopwords"] == 0
    assert out[4]["dup_bigram_ratio"] > 0.2


def test_gopher_rules_null_and_empty_docs(spark):
    """The round-9 null/empty contract: NULL or whitespace-only text gets a
    fully-defined verdict row (previously such docs vanished from the
    output entirely, and '' read n_words=1 via the one-empty-token split):
    n_words=0, n_stopwords=0, NULL ratios, ratio gates false, keep=false."""
    from bonobo_sqlalchemy_spark.operators.quality import gopher_rules

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "the cat and dog have fun")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in gopher_rules(df, min_words=2).collect()}
    assert set(out) == {1, 2, 3, 4}  # every document in, one row out
    for i in (1, 2, 3):
        r = out[i]
        assert r["n_words"] == 0 and r["n_stopwords"] == 0
        assert r["mean_word_len"] is None and r["alpha_ratio"] is None
        assert r["dup_bigram_ratio"] == 0.0
        assert r["ok_n_words"] is False
        assert r["ok_mean_word_len"] is False and r["ok_alpha"] is False
        assert r["ok_dup_bigram"] is True  # 0.0 repetition passes the ceiling
        assert r["keep"] is False
    assert out[4]["n_words"] == 6 and out[4]["keep"] is True


def test_gopher_rules_partitioning_invariant(spark):
    from bonobo_sqlalchemy_spark.operators.quality import gopher_rules
    from bonobo_sqlalchemy_spark.sources.files import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = gopher_rules(docs, min_words=20, max_words=90)
    b = gopher_rules(docs.repartition(11), min_words=20, max_words=90)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
