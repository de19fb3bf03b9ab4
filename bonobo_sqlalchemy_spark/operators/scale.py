"""Scale toolkit: skew-salted joins and bucketed (co-located) joins.

These are the two knobs the engine reaches for when AQE alone isn't enough
on a 1000-executor cluster:

- **Salted join** — a hot key floods one reducer in a shuffled join. AQE's
  skew-join splits oversized partitions *after* materialization; salting
  prevents the flood structurally: the skewed (large) side gets a random
  salt in [0, n); the small side is replicated n times, one copy per salt;
  the join key becomes (key, salt). Results are identical to the unsalted
  join.
- **Bucketed tables** — pre-shuffling both sides of a recurring join into
  the same bucket layout at write time removes the exchange (and often the
  sort) from every subsequent join on the bucket key. The write pays one
  shuffle once; every downstream join reads co-located buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scalar_attach(df: DataFrame, scalars: DataFrame) -> DataFrame:
    """Attach a 1-row aggregate (a scalar subquery's result) to every row of
    ``df`` via ``crossJoin(broadcast(...))``.

    This is the DataFrame spelling of SQL's scalar subquery. It plans as a
    BroadcastNestedLoopJoin with a ONE-ROW build side — constant work per
    probe row, no quadratic term (a literal-key equi-join doesn't help:
    Catalyst constant-folds ``lit(1) == lit(1)`` to ``true`` and
    degenerates it to the same nested loop). The no-cartesian plan gate
    exempts each use with this rationale; when the probe side is itself
    bounded (a bucket/score table), prefer a window over it instead and
    skip the join entirely."""
    return df.crossJoin(F.broadcast(scalars))


def single_partition_key():
    """Window partition key for an intentional single-partition window over
    a PROVABLY BOUNDED input (bucket tables, distinct-score grids — never
    the corpus).

    ``lit(1)`` would express the same thing, but Catalyst constant-folds a
    foldable partition key away entirely, turning the spec into "no
    partition defined" — which makes Spark log the global-window warning on
    every run, burying real warnings under noise from windows that are
    single-partition BY DESIGN. ``spark_partition_id() * 0`` evaluates to
    the same constant 0 for every row yet is flagged non-deterministic, so
    the optimizer keeps it and the warning never fires."""
    return F.spark_partition_id() * F.lit(0)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join on ``on``: salt the large side, replicate the
    small side per salt. Observable results match ``large.join(small, on,
    how)`` exactly; only the shuffle distribution changes.

    ``how`` supports inner/left joins (the replicated side must be the
    non-preserved side for outer semantics to hold).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_large = large.withColumn(
        "__salt", (F.rand(seed=0) * salt_buckets).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    replicated_small = small.select("*", salts)
    out = salted_large.join(replicated_small, [on, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist a DataFrame as a bucketed managed table (parquet).

    Joins between two tables bucketed identically on the join key execute
    with NO exchange on either side (verified in tests by plan inspection) —
    the write-time shuffle is amortized over every future join.
    """
    spark = df.sparkSession
    # A fresh session's in-memory catalog forgets managed tables but their
    # warehouse directories survive; clear both so overwrite is really
    # overwrite.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    import shutil
    from urllib.parse import urlparse

    loc = urlparse(warehouse).path or warehouse
    shutil.rmtree(f"{loc.rstrip('/')}/{table}", ignore_errors=True)

    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
    force_sort_merge: bool = False,
) -> DataFrame:
    """Join two (identically) bucketed tables on their bucket key.

    ``force_sort_merge`` applies a MERGE hint — useful to demonstrate (and
    test) the zero-shuffle property even when the table is small enough
    that Spark would otherwise broadcast it.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    if force_sort_merge:
        left, right = left.hint("merge"), right.hint("merge")
    return left.join(right, on, how)


def skew_report(
    df: "DataFrame",
    key_cols: list[str],
    top_k: int = 20,
) -> "DataFrame":
    """Heavy-hitter diagnostic for a prospective join/agg key: the ``top_k``
    hottest key values with row count, share of the table, and the ratio to
    the mean per-key count.

    The operational input to every skew mitigation in this module: a ratio
    around 1 means hash partitioning balances fine; a top key holding
    double-digit share is the signal to salt (:func:`salted_join`), AQE
    skew-split, or broadcast the other side. One shuffle (the key agg —
    partial map-side); totals ride along as a literal-sized broadcast, and
    the top-k is a TakeOrderedAndProject, so the report costs one pass and
    returns ``top_k`` rows regardless of table size.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("__total"), F.count(F.lit(1)).alias("__nkeys")
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            *key_cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
            F.round(
                F.col("n_rows") / (F.col("__total") / F.col("__nkeys")), 6
            ).alias("x_mean"),
        )
        .orderBy(F.col("n_rows").desc(), *key_cols)
        .limit(top_k)
    )
