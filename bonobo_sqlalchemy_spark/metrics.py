"""Execution-metric capture: shuffle / spill / scan volumes per query run.

Wall-clock alone can't answer the 100 TB question — a query can look fast
at sf0.1 while its shuffle volume grows super-linearly. This module reads
Spark's AppStatusStore (the same numbers the UI's Stages tab shows) so the
scaling audit can report DATA-MOVEMENT scaling alongside time scaling:
shuffle bytes are deterministic per plan+input (unlike seconds), which
makes their decade exponents the cleanest scale signal we can measure
in-container.

Access note: ``SparkContext._jsc.sc().statusStore().stageList`` is a
Scala method with default parameters; py4j requires passing them
explicitly, which is what :func:`_stage_list` does via the compiler's
``stageList$default$N`` accessors. The store retains a bounded number of
stages (``spark.ui.retainedStages``, default 1000), so deltas taken
around a single query are exact unless that query alone exceeds the
retention window.
"""

from __future__ import annotations

from dataclasses import dataclass


def _stage_list(spark):
    core = spark.sparkContext._jsc.sc().statusStore()
    statuses = spark._jvm.java.util.ArrayList()
    args = [getattr(core, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
    return core.stageList(statuses, *args)


@dataclass(frozen=True)
class VolumeTotals:
    stages: int
    shuffle_write_bytes: int
    shuffle_read_bytes: int
    spill_bytes: int
    input_bytes: int
    output_bytes: int

    def __sub__(self, other: "VolumeTotals") -> "VolumeTotals":
        return VolumeTotals(
            self.stages - other.stages,
            self.shuffle_write_bytes - other.shuffle_write_bytes,
            self.shuffle_read_bytes - other.shuffle_read_bytes,
            self.spill_bytes - other.spill_bytes,
            self.input_bytes - other.input_bytes,
            self.output_bytes - other.output_bytes,
        )


def volume_totals(spark) -> VolumeTotals:
    """Cumulative stage-level data volumes for the whole application."""
    it = _stage_list(spark).iterator()
    n = w = r = sp = ib = ob = 0
    while it.hasNext():
        s = it.next()
        n += 1
        w += s.shuffleWriteBytes()
        r += s.shuffleReadBytes()
        sp += s.diskBytesSpilled() + s.memoryBytesSpilled()
        ib += s.inputBytes()
        ob += s.outputBytes()
    return VolumeTotals(n, w, r, sp, ib, ob)


class measure_volumes:
    """Context manager: data-volume deltas for the enclosed work.

    >>> with measure_volumes(spark) as m:
    ...     df.collect()
    >>> m.delta.shuffle_write_bytes
    """

    def __init__(self, spark):
        self._spark = spark
        self.delta: VolumeTotals | None = None

    def __enter__(self):
        self._before = volume_totals(self._spark)
        return self

    def __exit__(self, *exc):
        self.delta = volume_totals(self._spark) - self._before
        return False
