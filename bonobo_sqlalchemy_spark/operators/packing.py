"""Sequence packing: assign documents to fixed token-budget bins.

Training pipelines pack variable-length documents into fixed-size training
sequences; the assignment step is the distributed part (the actual token
concatenation happens in the data loader). Strategy here is start-offset
packing: within a shard, documents line up in a deterministic order and a
document belongs to the bin where its running token offset starts —
``bin = floor(exclusive_cumsum / budget)``. Bins can overflow by at most
one document (standard best-effort packing; the loader truncates or spills
the tail), and the whole assignment is ONE window aggregate — no sequential
driver loop, and portable SQL (the oracle is the same window expression).

Scale: a global packing order would serialize into one reducer, so packing
is sharded — ``shard = hash-bucket(order key)`` joins the window partition
key. Shards pack independently (each produces its own bin space), which is
exactly how multi-worker data loaders consume packed corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions import text as T


def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    budget: int = 4096,
    n_shards: int = 64,
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Add ``shard``, ``bin`` and ``bin_offset`` columns.

    ``bin_offset`` is the document's exclusive running token offset within
    its (partition, shard) stream; ``bin = bin_offset div budget``.
    Deterministic for a fixed ``order_col`` regardless of input
    partitioning (the shard hash is content-derived, not partition-derived).
    """
    shard = T.split_bucket(F.col(order_col), n_shards)
    w = (
        W.partitionBy(*partition_cols, "shard")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = df.withColumn("shard", shard).withColumn(
        "bin_offset",
        (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("bigint"),
    )
    return out.withColumn(
        "bin", F.expr(f"bin_offset div {int(budget)}").cast("bigint")
    )
