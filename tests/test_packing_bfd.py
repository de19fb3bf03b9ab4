"""Best-fit-decreasing packing tests: budget compliance, fill-ratio gain
over start-offset packing, determinism across partitionings."""

from __future__ import annotations

from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.operators.packing import (
    pack_sequences,
    pack_sequences_bfd,
)
from bonobo_sqlalchemy_spark.sources.files import load_table


def _bins_used(df, token_col):
    return (
        df.select("shard", "bin").distinct().count(),
        df.agg(F.sum(token_col)).first()[0],
    )


def test_bfd_respects_budget_and_packs_everything(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").select("doc_id", "n_chars")
    budget = 3000
    out = pack_sequences_bfd(
        docs, token_col="n_chars", budget=budget, n_shards=4
    ).cache()
    assert out.count() == docs.count()  # nothing dropped
    # no bin over budget unless it holds a single oversized doc
    over = out.where(F.col("bin_fill") > budget)
    singles = over.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n"), F.max("n_chars").alias("mx")
    )
    for r in singles.collect():
        assert r.n == 1 and r.mx > budget, r


def test_bfd_fill_beats_start_offset(spark, sf_small):
    """BFD must use no MORE bins than start-offset packing on the same
    shards/budget (usually strictly fewer when sizes vary)."""
    docs = load_table(spark, sf_small, "documents").select("doc_id", "n_chars")
    budget = 3000
    bfd = pack_sequences_bfd(docs, token_col="n_chars", budget=budget, n_shards=4)
    base = pack_sequences(docs, token_col="n_chars", budget=budget, n_shards=4)
    n_bfd, tot = _bins_used(bfd, "n_chars")
    n_base, tot2 = _bins_used(base, "n_chars")
    assert tot == tot2
    assert n_bfd <= n_base, (n_bfd, n_base)


def test_bfd_is_partitioning_invariant(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").select("doc_id", "n_chars")
    a = {
        (r.doc_id): (r.shard, r.bin)
        for r in pack_sequences_bfd(docs.repartition(1), token_col="n_chars", n_shards=4).collect()
    }
    b = {
        (r.doc_id): (r.shard, r.bin)
        for r in pack_sequences_bfd(docs.repartition(13), token_col="n_chars", n_shards=4).collect()
    }
    assert a == b
