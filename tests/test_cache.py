"""Unit tests for the artifact cache (bonobo_sqlalchemy_spark/cache.py):
code-version-aware keys + atomic publish (ADVICE r11 hardening)."""

import os
import threading

import pytest

from bonobo_sqlalchemy_spark.cache import (
    PUBLISHED,
    artifact_path,
    engine_source_hash,
    ensure_artifact,
)


def test_engine_source_hash_stable_and_in_key():
    h1 = engine_source_hash()
    assert h1 == engine_source_hash() and len(h1) == 12
    p1 = artifact_path("k", "stamp-a")
    assert p1 == artifact_path("k", "stamp-a")
    assert p1 != artifact_path("k", "stamp-b")
    assert p1 != artifact_path("other", "stamp-a")


def test_ensure_artifact_builds_once(tmp_path):
    target = str(tmp_path / "art")
    calls = []

    def build(d):
        calls.append(d)
        os.makedirs(d)
        open(os.path.join(d, "data.txt"), "w").write("x")

    p = ensure_artifact(target, build)
    assert p == target
    assert os.path.exists(os.path.join(target, PUBLISHED))
    assert open(os.path.join(target, "data.txt")).read() == "x"
    ensure_artifact(target, build)
    assert len(calls) == 1  # second call is a cache hit


def test_ensure_artifact_replaces_unpublished_husk(tmp_path):
    # an interrupted old build (dir exists, no marker) must not wedge the
    # cache forever
    target = str(tmp_path / "art")
    os.makedirs(target)
    open(os.path.join(target, "partial.txt"), "w").write("junk")

    def build(d):
        os.makedirs(d)
        open(os.path.join(d, "data.txt"), "w").write("good")

    ensure_artifact(target, build)
    assert os.path.exists(os.path.join(target, PUBLISHED))
    assert open(os.path.join(target, "data.txt")).read() == "good"
    assert not os.path.exists(os.path.join(target, "partial.txt"))


def test_ensure_artifact_concurrent_publish_single_winner(tmp_path):
    # two racing builders: exactly one published artifact survives, no
    # leftover tmp siblings, no exception from the loser
    target = str(tmp_path / "art")
    barrier = threading.Barrier(2)
    errors = []

    def build(d):
        os.makedirs(d)
        open(os.path.join(d, "data.txt"), "w").write("x")
        barrier.wait(timeout=10)  # both finish building before either renames

    def run():
        try:
            ensure_artifact(target, build)
        except Exception as e:  # pragma: no cover - the assertion target
            errors.append(e)

    ts = [threading.Thread(target=run) for _ in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errors
    assert os.path.exists(os.path.join(target, PUBLISHED))
    leftovers = [p for p in os.listdir(tmp_path) if p.startswith("art.tmp-")]
    assert leftovers == []


def test_ensure_artifact_failed_build_cleans_tmp(tmp_path, monkeypatch):
    """A build() that raises (e.g. a Spark job dying mid-write) must not
    leave its unique .tmp-* staging directory behind (ADVICE r12)."""
    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    path = str(tmp_path / "bss_test_deadbeef")

    def exploding_build(tmp):
        os.makedirs(tmp)
        open(os.path.join(tmp, "partial"), "w").close()
        raise RuntimeError("job died mid-build")

    with pytest.raises(RuntimeError):
        ensure_artifact(path, exploding_build)
    orphans = [d for d in os.listdir(tmp_path) if ".tmp-" in d]
    assert orphans == []
    assert not os.path.exists(path)
