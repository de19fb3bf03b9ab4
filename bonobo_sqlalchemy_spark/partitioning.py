"""Scale-conditional input rebalancing (optimization guide §2.5).

The local test fixtures — and any real-world "small reference corpus"
ingest — arrive as one small parquet file with a single row group, so a
scan plans exactly ONE task. Every CPU-dense stage that sits directly on
such a scan (an Arrow matmul, a shingle explode, a BPE encode pass) then
runs serially on one core no matter how many the cluster has. The guide's
remedy for too-few input splits is "repartition immediately after the
read" — but an UNCONDITIONAL repartition is a full-input shuffle that a
production-scale scan (thousands of splits) must never pay.

:func:`rebalance_narrow_input` applies the remedy only when the plan's
file input is provably too small to fan out on its own, decided from
driver-side metadata (no job runs). When it fires, the exchange it adds
is bounded above by one default split (128 MB) per core by construction;
when the input is at scale, the DataFrame is returned unchanged and no
exchange enters the plan.
"""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: One scan task's worth of input at Spark's default split size
#: (``spark.sql.files.maxPartitionBytes`` = 128 MB). Inputs larger than
#: one such split PER CORE already fan out to >= parallelism scan tasks,
#: so the rebalance never fires for them.
_SPLIT_QUANTUM = 128 * 1024 * 1024


def rebalance_narrow_input(df: DataFrame, *keys: str | Column) -> DataFrame:
    """Hash-repartition ``df`` by ``keys`` ONLY when its file input is too
    small to fan out to the cluster's parallelism.

    Decision, from driver-side metadata only (``df.inputFiles()`` — no
    Spark job):

    - ``>= defaultParallelism`` input files → the scan already fans out →
      unchanged;
    - any non-local file URI → trust the remote scan's own splitting →
      unchanged (conservative: never add a shuffle we cannot size);
    - total local bytes ``>= defaultParallelism × 128 MB`` → the scan
      splits to at least one task per core on its own → unchanged;
    - otherwise (a narrow input: few small local files) → repartition by
      ``keys``. The shuffled volume is < 128 MB/core by construction, and
      AQE sizes the resulting partitions.

    Frames with no file input at all (in-memory test fixtures, streaming
    sources) are returned unchanged.
    """
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files or len(files) >= par:
        return df
    total = 0
    for uri in files:
        p = urlparse(uri)
        if p.scheme not in ("", "file"):
            return df
        try:
            total += os.path.getsize(unquote(p.path))
        except OSError:
            return df
    if total >= par * _SPLIT_QUANTUM:
        return df
    return df.repartition(*[F.col(k) if isinstance(k, str) else k for k in keys])
