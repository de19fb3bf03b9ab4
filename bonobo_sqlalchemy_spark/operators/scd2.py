"""Slowly-Changing-Dimension Type 2 history sink.

The reference's ``InsertOrUpdate`` (``/root/reference/bonobo_sqlalchemy/
writers.py:21-100``) overwrites rows in place (Type 1). This operator is the
history-preserving variant a warehouse/training-data pipeline needs: instead
of overwriting, each change CLOSES the current version (sets ``valid_to`` /
``is_current=false``) and INSERTS a new open version — the full change
history stays queryable ("state as of T" = ``valid_from <= T < valid_to``).

Spark-first design, one batch = one merge:

- change detection is a hash-compare (``xxhash64`` over tracked columns) —
  no column-by-column predicate explosion, constant-cost at any width;
- the merge is expressed as unions of three declarative branches
  (unchanged-history ∪ closed-versions ∪ new-versions), all equi-joins on
  the business key — Catalyst plans one shuffle per side, broadcastable
  when the batch is small;
- no driver-side loops; counts materialize before the swap (same
  crash-recoverable rename-aside protocol as ``upsert._write_path``). On
  Delta/Iceberg the same three branches collapse into one ``MERGE INTO``
  with a ``WHEN MATCHED AND hash_differs`` clause.

Idempotence: re-merging the same batch is a no-op (hash equality short-
circuits), so micro-batch retries through ``foreachBatch`` are safe.
"""

from __future__ import annotations

import datetime as _dt
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: sentinel for an open-ended version — comparable, sorts last, parquet-safe
OPEN_END = "9999-12-31 23:59:59"


def _normalize_as_of(as_of: str) -> str:
    """Normalize a caller timestamp to zero-padded ``YYYY-MM-DD HH:MM:SS``.

    Validity bounds are compared lexically, so correctness depends on every
    stored value using this exact layout: an ISO 'T' separator, an unpadded
    month, or fractional seconds would corrupt interval queries silently.
    Accepts ISO-ish variants (T separator, date-only, minutes-only,
    fractional seconds — truncated) and rejects anything else loudly.
    """
    s = str(as_of).strip().replace("T", " ")
    for fmt in (
        "%Y-%m-%d %H:%M:%S.%f",
        "%Y-%m-%d %H:%M:%S",
        "%Y-%m-%d %H:%M",
        "%Y-%m-%d",
    ):
        try:
            return _dt.datetime.strptime(s, fmt).strftime("%Y-%m-%d %H:%M:%S")
        except ValueError:
            continue
    raise ValueError(
        f"as_of {as_of!r} is not a recognizable timestamp; expected "
        "'YYYY-MM-DD[ HH:MM[:SS[.ffffff]]]' (T separator accepted)"
    )


def scd2_columns(keys: list[str]) -> list[str]:
    return list(keys) + ["valid_from", "valid_to", "is_current"]


def _hash_cols(df: DataFrame, cols: list[str]) -> F.Column:
    # NULL-safe: hash the (value, is-null) pair per column so NULL and
    # 'null-looking' values can't collide; xxhash64 is seed-stable.
    parts: list[F.Column] = []
    for c in cols:
        parts.append(F.col(c).cast("string"))
        parts.append(F.col(c).isNull().cast("string"))
    return F.xxhash64(*parts)


def scd2_merge(
    current: DataFrame | None,
    batch: DataFrame,
    keys: list[str],
    as_of: str,
    tracked: list[str] | None = None,
    validate_as_of: bool = True,
) -> DataFrame:
    """Merge ``batch`` (one row per key — latest state) into an SCD2 history.

    ``current`` is the existing history (may be ``None``/empty for the first
    load) with ``valid_from``/``valid_to``/``is_current`` columns; ``batch``
    carries the business columns only. ``as_of`` is the batch's effective
    timestamp (event time, not wall clock — deterministic reruns).

    Returns the merged history. Branches:

    - history rows (``is_current = false``): pass through untouched;
    - current rows whose key is absent from the batch: pass through;
    - current rows whose batch hash matches: pass through (idempotence);
    - current rows whose batch hash differs: emitted CLOSED
      (``valid_to = as_of``, ``is_current = false``);
    - batch rows that are new keys or changed: emitted OPEN
      (``valid_from = as_of``, ``valid_to = OPEN_END``).
    """
    as_of = _normalize_as_of(as_of)
    data_cols = [c for c in batch.columns if c not in keys]
    tracked = tracked if tracked is not None else data_cols
    # Keep-last on duplicate keys within one batch (same policy as the
    # Type-1 upsert sink): without it a dup key would fan out the joins
    # below and open two "current" versions at once. Order: last row by
    # all-columns sort is arbitrary-but-deterministic; real feeds should
    # carry a sequence column and pass batches pre-deduped.
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in batch.columns])
    batch = (
        batch.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    b = batch.withColumn("__bh", _hash_cols(batch, tracked))

    if current is None or not current.columns:
        return b.drop("__bh").select(
            "*",
            F.lit(as_of).alias("valid_from"),
            F.lit(OPEN_END).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )

    hist = current.where(~F.col("is_current"))
    cur = current.where(F.col("is_current")).withColumn(
        "__ch", _hash_cols(current, tracked)
    )
    # An as_of earlier than an open version's valid_from would write
    # inverted intervals (valid_to < valid_from) with no error — reject it.
    # The 1-row aggregate is O(1) on the driver but costs one extra READ
    # PASS over the current table per merge, so repeated-merge callers that
    # can prove monotonic as_of themselves (Scd2Sink's streaming landing
    # tracks its own high-water mark) pass validate_as_of=False to skip it.
    if validate_as_of:
        row = cur.agg(F.max("valid_from")).first()
        max_vf = row[0] if row else None
        if max_vf is not None and as_of < max_vf:
            raise ValueError(
                f"as_of {as_of!r} precedes the newest open version's "
                f"valid_from ({max_vf!r}); out-of-order merges would write "
                "inverted validity intervals"
            )

    joined = cur.alias("c").join(
        b.select(*keys, "__bh").alias("n"), keys, "left"
    )
    unchanged = joined.where(
        F.col("n.__bh").isNull() | (F.col("c.__ch") == F.col("n.__bh"))
    ).select([F.col(f"c.{c}") for c in current.columns])
    closed = (
        joined.where(F.col("n.__bh").isNotNull() & (F.col("c.__ch") != F.col("n.__bh")))
        .select([F.col(f"c.{c}") for c in current.columns])
        .withColumn("valid_to", F.lit(as_of))
        .withColumn("is_current", F.lit(False))
    )

    cur_h = cur.select(*keys, "__ch")
    opened = (
        b.alias("n")
        .join(cur_h.alias("c"), keys, "left")
        .where(F.col("c.__ch").isNull() | (F.col("c.__ch") != F.col("n.__bh")))
        .select([F.col(f"n.{c}") for c in batch.columns])
        .select(
            "*",
            F.lit(as_of).alias("valid_from"),
            F.lit(OPEN_END).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return (
        hist.unionByName(unchanged)
        .unionByName(closed)
        .unionByName(opened.select(*current.columns))
    )


class Scd2Sink:
    """Parquet-backed SCD2 sink with the upsert sink's write/read protocol.

    ``write(batch, spark, path, ...)`` reads the existing history, merges,
    and swaps atomically-enough for a single writer (rename-aside — a crash
    leaves the previous table recoverable, never a missing one). The real
    100 TB target is a Delta/Iceberg ``MERGE INTO``; this backend exists so
    the operator is end-to-end testable in-container.
    """

    def __init__(
        self,
        keys: list[str],
        tracked: list[str] | None = None,
        snapshot: bool = False,
    ):
        self.keys = list(keys)
        self.tracked = tracked
        #: Publish each merge as an atomic snapshot commit
        #: (operators/snapshot.py) instead of the in-place swap: readers
        #: get whole pre-/post-merge history tables and every historical
        #: merge stays time-travelable; concurrent writers serialize via
        #: optimistic retry (round-13 verdict item #4).
        self.snapshot = bool(snapshot)
        self.last_stats: dict[str, int] = {}
        #: In-memory mirror of the persisted high-water mark (sidecar file,
        #: see :meth:`_read_hwm`); kept for introspection/tests.
        self._max_as_of: str | None = None

    # The monotonic fast path must not trust in-process state alone: the
    # table at `path` could have been advanced by another writer or restored
    # from different lineage between this sink's writes, which would make a
    # skipped validation silently write inverted validity intervals. The
    # mark is therefore PERSISTED beside the table (`<path>.__scd2_hwm`) on
    # every write and re-read before every merge — an out-of-band writer
    # either moved the sidecar too (its mark governs) or left it stale/absent
    # (validation runs). A crash between table swap and sidecar write leaves
    # a too-low mark, which only ever forces an extra validation, never
    # skips one. Concurrent SAME-INSTANT writers remain unsupported — the
    # parquet swap itself is single-writer (class docstring).
    @staticmethod
    def _hwm_path(path: str) -> str:
        return path + ".__scd2_hwm"

    def _read_hwm(self, path: str) -> str | None:
        try:
            with open(self._hwm_path(path)) as f:
                return f.read().strip() or None
        except OSError:
            return None

    def write(
        self, batch: DataFrame, spark: SparkSession, path: str, as_of: str
    ) -> DataFrame:
        if self.snapshot:
            return self._write_snapshot(batch, spark, path, as_of)
        current = spark.read.parquet(path) if os.path.exists(path) else None
        as_of_norm = _normalize_as_of(as_of)
        disk_hwm = self._read_hwm(path) if current is not None else None
        monotonic = disk_hwm is not None and as_of_norm >= disk_hwm
        merged = scd2_merge(
            current,
            batch,
            self.keys,
            as_of,
            self.tracked,
            validate_as_of=not monotonic,
        )
        n_total = merged.count()
        n_open = merged.where(F.col("is_current")).count()

        tmp = path + ".__scd2_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        old = path + ".__scd2_old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(path):
            os.rename(path, old)
        shutil.move(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
        self.last_stats = {"rows": n_total, "open": n_open}
        new_hwm = max(as_of_norm, disk_hwm) if disk_hwm else as_of_norm
        # Atomic sidecar update: write a temp file and os.replace() it so a
        # crash mid-write leaves either the old or the new COMPLETE value,
        # never a truncated prefix (a prefix like '2026-0' would compare <=
        # later as_of values and wrongly enable the monotonic fast path).
        hwm_path = self._hwm_path(path)
        hwm_tmp = hwm_path + ".tmp"
        with open(hwm_tmp, "w") as f:
            f.write(new_hwm)
            f.flush()
            os.fsync(f.fileno())
        os.replace(hwm_tmp, hwm_path)
        self._max_as_of = new_hwm
        return spark.read.parquet(path)

    def _write_snapshot(
        self, batch: DataFrame, spark: SparkSession, root: str, as_of: str
    ) -> DataFrame:
        """Snapshot-backed publish (``snapshot=True``): the identical SCD2
        merge landed via operators/snapshot.py — one atomic pointer swap
        per merge, whole-table reader visibility, time travel over the
        history table's own history, optimistic writer serialization.
        The high-water-mark sidecar keeps its contract: it is re-read
        before every merge and only ever under-reports (forcing an extra
        validation), so a crash between commit and sidecar write is safe."""
        from .snapshot import (
            SnapshotConflict,
            snapshot_commit,
            snapshot_current,
            snapshot_read,
        )

        as_of_norm = _normalize_as_of(as_of)
        last_exc: Exception | None = None
        for _ in range(3):
            base_version = snapshot_current(root)
            current = (
                snapshot_read(spark, root, base_version)
                if base_version is not None
                else None
            )
            disk_hwm = self._read_hwm(root) if current is not None else None
            monotonic = disk_hwm is not None and as_of_norm >= disk_hwm
            merged = scd2_merge(
                current,
                batch,
                self.keys,
                as_of,
                self.tracked,
                validate_as_of=not monotonic,
            )
            n_total = merged.count()
            n_open = merged.where(F.col("is_current")).count()
            try:
                name = snapshot_commit(
                    spark, root, merged, expect_version=base_version
                )
            except SnapshotConflict as exc:
                last_exc = exc
                continue
            self.last_stats = {"rows": n_total, "open": n_open}
            new_hwm = max(as_of_norm, disk_hwm) if disk_hwm else as_of_norm
            hwm_path = self._hwm_path(root)
            hwm_tmp = hwm_path + ".tmp"
            with open(hwm_tmp, "w") as f:
                f.write(new_hwm)
                f.flush()
                os.fsync(f.fileno())
            os.replace(hwm_tmp, hwm_path)
            self._max_as_of = new_hwm
            return snapshot_read(spark, root, name)
        raise last_exc if last_exc is not None else RuntimeError(
            f"SCD2 snapshot merge into {root} did not commit"
        )


def snapshot_as_of(history: DataFrame, ts: str) -> DataFrame:
    """Point-in-time state: the version valid at ``ts`` for each key."""
    ts = _normalize_as_of(ts)
    return history.where(
        (F.col("valid_from") <= F.lit(ts)) & (F.lit(ts) < F.col("valid_to"))
    )
