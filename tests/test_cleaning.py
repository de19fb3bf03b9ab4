"""Cleaning / curation operator tests: PII redaction on real PII strings,
chunk reconstruction, repetition metrics on hand-checkable docs, and
benchmark-contamination semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.functions import cleaning as C
from bonobo_sqlalchemy_spark.operators.contamination import benchmark_overlap
from bonobo_sqlalchemy_spark.sources.files import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return load_table(spark, sf_small, "documents").cache()


def test_redact_pii_on_real_strings(spark):
    rows = [
        (1, "mail alice.smith+x@sub.example.org now"),
        (2, "server at 192.168.10.254 rebooted"),
        (3, "call 415-555-0199 or 650-555-0123"),
        (4, "mixed bob@ex.co 10.0.0.1 555-123-4567 end"),
        (5, "clean text with no pii at all"),
        (6, "version 1.2.3.4.5 is not an ip boundary case"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    out = {
        r.id: (r.red, r.ne, r.ni, r.np)
        for r in df.select(
            "id",
            C.redact_pii("t").alias("red"),
            C.pii_counts("t")["email"].alias("ne"),
            C.pii_counts("t")["ipv4"].alias("ni"),
            C.pii_counts("t")["phone"].alias("np"),
        ).collect()
    }
    assert out[1] == ("mail <EMAIL> now", 1, 0, 0)
    assert out[2] == ("server at <IP> rebooted", 0, 1, 0)
    assert out[3] == ("call <PHONE> or <PHONE>", 0, 0, 2)
    assert out[4] == ("mixed <EMAIL> <IP> <PHONE> end", 1, 1, 1)
    assert out[5][1:] == (0, 0, 0)
    # 1.2.3.4.5: the leading 1.2.3.4 has no trailing word boundary before
    # '.5'? It does (digit->dot) — the \b pair still matches the prefix run.
    assert out[6][0].count("<IP>") == out[6][2]


def test_email_redacted_before_ip_and_phone(spark):
    """An address like u@10.0.0.1-style hosts must be consumed by the email
    pattern, not double-redacted by later patterns."""
    df = spark.createDataFrame([(1, "write to john.doe@mail.example.com today")], ["id", "t"])
    red = df.select(C.redact_pii("t").alias("r")).collect()[0].r
    assert red == "write to <EMAIL> today"
    assert "<IP>" not in red and "<PHONE>" not in red


def test_chunks_reconstruct_document(docs):
    """Concatenating a document's chunks in chunk order must reproduce the
    whitespace-normalized document exactly, with every chunk full except
    possibly the last."""
    d = docs.select("doc_id", F.split(F.trim("text"), " +").alias("w"))
    chunks = d.select(
        "doc_id",
        F.size("w").alias("n"),
        F.explode(
            F.sequence(F.lit(0), F.ceil(F.size("w") / F.lit(64.0)).cast("bigint") - 1)
        ).alias("c"),
        "w",
    ).select(
        "doc_id",
        "n",
        "c",
        F.concat_ws(" ", F.expr("slice(w, c*64+1, 64)")).alias("chunk"),
        F.least(F.lit(64), F.size("w") - F.col("c") * 64).alias("clen"),
    )
    rows = chunks.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    originals = {
        r.doc_id: (" ".join(r.w), len(r.w)) for r in d.collect()
    }
    assert set(by_doc) == set(originals)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.c)
        text, n = originals[doc_id]
        assert " ".join(r.chunk for r in rs) == text
        # all full chunks except possibly the tail
        assert all(r.clen == 64 for r in rs[:-1])
        assert sum(r.clen for r in rs) == n


def test_repetition_metrics_hand_check(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # bigrams: ab,ba,ab,ba,ab -> top 'a b' 3/5
            (2, "x y z w"),          # 3 distinct bigrams, no dups
        ],
        ["doc_id", "text"],
    )
    d = (
        df.select("doc_id", F.split(F.trim("text"), " +").alias("w"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("w") - 1)).alias("i"),
            "w",
        )
        .select(
            "doc_id",
            F.concat(
                F.element_at("w", F.col("i")),
                F.lit(" "),
                F.element_at("w", F.col("i") + 1),
            ).alias("gram"),
        )
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n"),
            F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top"),
            F.round((F.sum("cnt") - F.count(F.lit(1))) / F.sum("cnt"), 6).alias("dup"),
        )
    )
    out = {r.doc_id: r for r in d.collect()}
    assert (out[1].n, out[1].top, out[1].dup) == (5, 0.6, 0.6)
    assert (out[2].n, out[2].top, out[2].dup) == (3, round(1 / 3, 6), 0.0)


def test_benchmark_overlap_flags_planted_contamination(spark):
    """A corpus doc embedding a benchmark doc's text verbatim must be
    flagged with at least the benchmark doc's shingle count; an unrelated
    doc must not be flagged."""
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "intro words then alpha beta gamma delta epsilon zeta and more"),
            (2, "totally different content with unique tokens here"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in benchmark_overlap(corpus, bench, n=3, min_shared=1).collect()}
    assert 1 in out and 2 not in out
    assert out[1].n_shared_shingles == 4  # 4 distinct 3-grams in a 6-token doc
    assert out[1].n_benchmark_docs == 1


def test_benchmark_overlap_never_self_joins_corpus(spark, docs):
    """Plan gate: the corpus side must join only the broadcast benchmark
    shingles — no corpus-corpus join, no cartesian product."""
    from bonobo_sqlalchemy_spark.functions import text as T

    is_bench = T.split_bucket("doc_id", 50) == 0
    out = benchmark_overlap(docs.where(~is_bench), docs.where(is_bench), n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
