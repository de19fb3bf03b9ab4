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


#: Output schema of the BFD packing stage.
BFD_SCHEMA_SUFFIX = "shard bigint, bin bigint, bin_fill bigint"


def pack_sequences_bfd(
    df: DataFrame,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    budget: int = 4096,
    n_shards: int = 64,
) -> DataFrame:
    """Best-fit-decreasing packing: within each shard, documents are
    placed largest-first into the open bin with the least remaining room
    that still fits, opening a new bin only when none fits — the
    classic BFD heuristic (≤ 11/9·OPT + 1 bins), which beats the
    start-offset packer's fill whenever document sizes vary.

    Distributed shape: the shard is the packing unit (same content-derived
    hash bucket as :func:`pack_sequences`), and BFD's inherently
    sequential greedy loop runs INSIDE each shard via ``applyInPandas`` —
    shards pack in parallel, each loop touches only its shard's rows, and
    the result is deterministic for a fixed ``order_col`` regardless of
    input partitioning (sort: tokens desc, order key asc). Documents
    larger than the budget get a bin of their own (the loader truncates).

    Output: the input columns + ``(shard, bin, bin_fill)`` where
    ``bin_fill`` is the bin's total tokens after packing — so the fill
    ratio is directly measurable (asserted >= the start-offset packer's
    in tests).
    """
    import pandas as pd

    shard = T.split_bucket(F.col(order_col), n_shards)
    src = df.withColumn("shard", shard)
    out_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{out_fields}, {BFD_SCHEMA_SUFFIX}"

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            [token_col, order_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        bins: list[int] = []  # remaining room per bin
        assign: list[int] = []
        for t in pdf[token_col]:
            t = int(t)
            best, best_room = -1, None
            for b, room in enumerate(bins):
                if t <= room and (best_room is None or room < best_room):
                    best, best_room = b, room
            if best < 0:
                bins.append(max(int(budget) - t, 0))
                assign.append(len(bins) - 1)
            else:
                bins[best] -= t
                assign.append(best)
        pdf["bin"] = pd.Series(assign, dtype="int64")
        fill = pdf.groupby("bin")[token_col].transform("sum")
        pdf["bin_fill"] = fill.astype("int64")
        return pdf

    return src.groupBy("shard").applyInPandas(pack, schema=out_schema)
