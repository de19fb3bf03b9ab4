"""Process-safe, code-version-aware artifact cache for derived indexes.

A handful of registered queries exercise the *production* operating mode of
an operator — probe a PERSISTED ANN index, replay a staged micro-batch
directory — and therefore must materialize a side artifact before the query
proper runs. Those artifacts are cached under ``tempfile.gettempdir()`` so
repeated bench/parity sweeps in one container do not re-train identical
codebooks. Two correctness hazards follow (flagged in ADVICE r11):

1. **Staleness across code versions** — a codebook trained by an older
   ``ivf_train_or_init`` must not satisfy a newer engine. The cache key
   therefore folds in :func:`engine_source_hash`, a content hash of every
   engine source file (the same construction ``parity_report.py`` stamps
   into ``PARITY_LOCAL.md``), alongside the caller's data stamp
   (path/size/mtime of the input parquet).
2. **Cross-process races** — two concurrent runs both noticing an absent
   artifact must not interleave writes into one directory.
   :func:`ensure_artifact` builds into a unique temp sibling and publishes
   with one atomic ``os.rename``; the loser of the race discards its build
   and uses the winner's.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid
from pathlib import Path
from typing import Callable

_SRC_HASH: str | None = None

#: marker file proving a cache directory was fully built then atomically
#: published (never a partial write — rename is the publish step)
PUBLISHED = "_PUBLISHED"


def engine_source_hash() -> str:
    """Content hash of every engine source file, computed once per process.

    Same construction as ``parity_report.py`` (sorted
    ``bonobo_sqlalchemy_spark/**/*.py``, name + bytes), minus the repo-root
    ``__spark_entry__.py`` (not importable from the package; query modules
    only need invalidation when *engine* code changes).
    """
    global _SRC_HASH
    if _SRC_HASH is None:
        h = hashlib.sha256()
        pkg = Path(__file__).parent
        for p in sorted(pkg.rglob("*.py")):
            h.update(p.name.encode())
            h.update(p.read_bytes())
        _SRC_HASH = h.hexdigest()[:12]
    return _SRC_HASH


def artifact_path(kind: str, data_stamp: str) -> str:
    """Deterministic cache location for (artifact kind, input data, engine
    code version). Changing any engine source file changes the path, so a
    stale artifact is simply never *found* — no invalidation protocol."""
    stamp = f"{data_stamp}:{engine_source_hash()}"
    return os.path.join(
        tempfile.gettempdir(),
        f"bss_{kind}_" + hashlib.md5(stamp.encode()).hexdigest()[:12],
    )


def ensure_artifact(path: str, build: Callable[[str], None]) -> str:
    """Build-once/publish-atomically: if ``path`` is not yet published,
    run ``build(tmp_dir)`` against a unique sibling directory, then
    ``os.rename`` it into place. Concurrent builders race on the rename;
    the loser deletes its duplicate build and reads the winner's. Readers
    never observe a partially-written artifact because the marker file is
    written *before* the rename and the rename is atomic."""
    marker = os.path.join(path, PUBLISHED)
    if os.path.exists(marker):
        return path
    tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    try:
        build(tmp)
        open(os.path.join(tmp, PUBLISHED), "w").close()
    except BaseException:
        # a failed build (e.g. a Spark job dying mid-write) must not leave
        # an orphan partial directory accumulating in the temp root
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    if os.path.exists(path) and not os.path.exists(marker):
        # interrupted build of this same code version: clear the husk
        shutil.rmtree(path, ignore_errors=True)
    try:
        os.rename(tmp, path)
    except OSError:
        # lost the publish race — another process renamed first
        shutil.rmtree(tmp, ignore_errors=True)
    return path
