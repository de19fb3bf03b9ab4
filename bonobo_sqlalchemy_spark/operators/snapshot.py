"""Versioned snapshot tables: atomic reader-visible commits on plain
parquet — the transactional upgrade for the parquet-directory MERGE
emulation's documented weakness.

``operators/upsert.py::_write_path`` swaps the table directory in place
(rename-aside + move), which is crash-recoverable but NOT atomic for
concurrent readers: a reader listing the directory mid-swap can see a
half-state (the "Known divergences" note in COVERAGE.md since round 5).
The real fix on a cluster is Delta/Iceberg ``MERGE INTO`` — both still
ImportError in this container (probe log in COVERAGE.md) — but the core
mechanism those formats use is PUBLIC and small: immutable data files
plus an atomically-swapped pointer to the current snapshot (Delta's
``_last_checkpoint`` / Iceberg's ``version-hint.text`` play). This module
implements that mechanism directly:

    table_root/
      _VERSION            # tiny text file: name of the current snapshot
      v00001-<uuid8>/     # immutable parquet snapshot directories
      v00002-<uuid8>/

- **Reader atomicity**: :func:`snapshot_read` resolves ``_VERSION`` once,
  then scans an IMMUTABLE directory — a concurrent commit can never
  change or half-replace the files under an in-flight query. POSIX
  ``rename`` gives pointer readers either the old or the new content,
  never a torn write.
- **Crash safety**: a writer dying after materializing its snapshot dir
  but before the pointer rename leaves the table exactly as it was (the
  orphan dir is invisible and vacuumable).
- **Optimistic concurrency**: :func:`snapshot_commit` takes
  ``expect_version``; a concurrent commit in between raises
  :class:`SnapshotConflict` instead of silently clobbering
  (read-modify-write callers like :func:`snapshot_merge` retry).
- **Time travel**: every committed snapshot stays readable by name until
  :func:`snapshot_vacuum` removes it.

Scale note: the pointer file is O(bytes) and the commit cost is one
rename regardless of table size; data-file volume equals what the merge
itself writes. On object stores without atomic rename the pointer swap
maps to a conditional PUT (the same adaptation Delta/Iceberg make); the
single-pointer design keeps that the ONLY primitive needing atomicity.

Reference scope note: the reference engine delegates upserts to an RDBMS
transaction (`/root/reference/bonobo_sqlalchemy/writers.py:113-126`);
this module is the Spark-side equivalent durability story for file-backed
targets.
"""

from __future__ import annotations

import fcntl
import os
import shutil
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

POINTER = "_VERSION"
LOCKFILE = "_LOCK"


@contextmanager
def _commit_lock(root: str):
    """Exclusive advisory lock held across the check-version→publish
    critical section. Without it, two concurrent committers can BOTH pass
    the ``expect_version`` check and both rename — last writer silently
    clobbers the other (a TOCTOU the optimistic protocol must not have).
    Data materialization stays OUTSIDE the lock (it's the expensive part
    and touches only a private staging dir); only sequence assignment,
    the version check, and the pointer swap serialize. On object stores
    the equivalent primitive is a conditional PUT of the pointer."""
    fd = os.open(os.path.join(root, LOCKFILE), os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def _seq_of(name: str) -> int:
    """Sequence number of a snapshot name — digits between 'v' and the
    first '-'. Width-agnostic: 'v100000-…' parses as 100000 and sorts
    after 'v99999-…' (lexical sort would misorder them)."""
    return int(name.split("-", 1)[0][1:])


class SnapshotConflict(RuntimeError):
    """Raised when ``expect_version`` no longer matches the pointer — a
    concurrent writer committed first. Retry the read-modify-write."""


def _pointer_path(root: str) -> str:
    return os.path.join(root, POINTER)


def snapshot_current(root: str) -> str | None:
    """Name of the current snapshot, or None for an empty table."""
    try:
        with open(_pointer_path(root)) as f:
            return f.read().strip() or None
    except FileNotFoundError:
        return None


def snapshot_versions(root: str) -> list[str]:
    """All snapshot names on disk, commit order (sorted by integer
    sequence, not lexically — survives the 5→6 digit rollover)."""
    if not os.path.isdir(root):
        return []
    return sorted(
        (d for d in os.listdir(root) if d.startswith("v")), key=_seq_of
    )


def snapshot_read(
    spark: SparkSession, root: str, version: str | None = None
) -> DataFrame:
    """Read the current snapshot (or a named one — time travel). The
    pointer is resolved ONCE; everything after scans an immutable
    directory, so a concurrent commit cannot tear this read."""
    name = version or snapshot_current(root)
    if name is None:
        raise FileNotFoundError(f"snapshot table at {root} is empty")
    return spark.read.parquet(os.path.join(root, name))


def snapshot_commit(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    expect_version: str | None = "__unset__",
) -> str:
    """Materialize ``df`` as a new immutable snapshot and atomically swap
    the pointer to it; returns the new snapshot name.

    ``expect_version`` is the optimistic-concurrency guard: pass the
    version your read-modify-write started from (or None for "table must
    be empty"); a mismatch at publish time raises :class:`SnapshotConflict`
    and leaves the table untouched. Omit it for last-writer-wins.

    Protocol order is what makes a crash at ANY point safe: (1) write the
    data to a private staging dir (expensive, unlocked, invisible to
    readers and to ``snapshot_versions``), (2) under the commit lock:
    re-check ``expect_version``, claim the next sequence, rename staging
    to its final ``vNNNNN-…`` name, (3) still under the lock, write the
    pointer CONTENT to a unique temp file and atomically rename it onto
    ``_VERSION``. Readers never take the lock — the pointer rename alone
    gives them old-or-new, never torn. The lock exists so two concurrent
    committers cannot BOTH pass the version check (check and publish were
    previously separate steps — a TOCTOU)."""
    os.makedirs(root, exist_ok=True)
    staging = os.path.join(root, f".staged-{uuid.uuid4().hex[:12]}")
    try:
        df.write.mode("overwrite").parquet(staging)
        with _commit_lock(root):
            if (
                expect_version != "__unset__"
                and snapshot_current(root) != expect_version
            ):
                raise SnapshotConflict(
                    f"expected version {expect_version!r}, found "
                    f"{snapshot_current(root)!r} — a concurrent commit won"
                )
            versions = snapshot_versions(root)
            seq = _seq_of(versions[-1]) + 1 if versions else 1
            name = f"v{seq:05d}-{uuid.uuid4().hex[:8]}"
            os.rename(staging, os.path.join(root, name))
            tmp = _pointer_path(root) + f".tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                f.write(name)
                f.flush()
                os.fsync(f.fileno())
            # readers see either the previous version or `name`, never both
            os.rename(tmp, _pointer_path(root))
        return name
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def snapshot_merge(
    spark: SparkSession,
    root: str,
    incoming: DataFrame,
    keys: list[str],
    max_retries: int = 3,
) -> str:
    """Keyed MERGE as an atomic snapshot commit: rows whose ``keys`` match
    an existing row are replaced, new keys append — and a reader at any
    instant sees either the whole pre-merge table or the whole post-merge
    table, never the in-between (the property the in-place swap path
    cannot give). Optimistic read-modify-write: on
    :class:`SnapshotConflict` the merge re-reads and retries, so
    concurrent mergers serialize instead of losing updates."""
    for _ in range(max(1, max_retries)):
        base_version = snapshot_current(root)
        if base_version is None:
            merged = incoming
        else:
            base = snapshot_read(spark, root, base_version)
            merged = base.join(
                incoming.select(*keys).distinct(), keys, "left_anti"
            ).unionByName(incoming)
        try:
            return snapshot_commit(
                spark, root, merged, expect_version=base_version
            )
        except SnapshotConflict:
            continue
    raise SnapshotConflict(
        f"merge into {root} lost {max_retries} optimistic rounds"
    )


def snapshot_vacuum(root: str, keep: int = 2) -> list[str]:
    """Delete snapshot dirs older than the newest ``keep`` (the current
    pointer target is always kept); returns the removed names. Run it
    OUTSIDE any reader's resolved-snapshot lifetime window, the same
    contract as Delta's VACUUM retention."""
    current = snapshot_current(root)
    names = snapshot_versions(root)
    victims = [n for n in names[: max(0, len(names) - keep)] if n != current]
    for n in victims:
        shutil.rmtree(os.path.join(root, n), ignore_errors=True)
    return victims
