"""Smoke test for the flagship end-to-end example
(`examples/training_data_pipeline.py`): the full curation pipeline —
exact dedup → quality-aware near-dup survivorship → quality gate →
weighted sample → split/shuffle → partitioned write → compaction — must
run green at sf0.001 and land a readable partitioned corpus.
"""

from __future__ import annotations

import importlib
import sys
from pathlib import Path

from pyspark.sql import functions as F


def test_training_data_pipeline_end_to_end(spark, tmp_path):
    examples = str(Path(__file__).resolve().parent.parent / "examples")
    if examples not in sys.path:
        sys.path.insert(0, examples)
    mod = importlib.import_module("training_data_pipeline")

    out = str(tmp_path / "corpus")
    argv_save = sys.argv
    sys.argv = ["training_data_pipeline.py", "/root/testdata/sf0.001", out]
    try:
        mod.main()
    finally:
        sys.argv = argv_save

    back = spark.read.parquet(out)
    assert back.count() > 0
    # partitioned layout landed and carries the curation columns
    assert {"lang", "split", "quality", "n_tokens"} <= set(back.columns)
    assert (tmp_path / "corpus").is_dir()
    assert any(p.name.startswith("lang=") for p in (tmp_path / "corpus").iterdir())
    # quality gate held
    assert back.where(F.col("quality") < 0.55).count() == 0
    # both splits present, deterministic hash split
    splits = {r[0] for r in back.select("split").distinct().collect()}
    assert splits <= {"train", "val"} and "train" in splits
    # verified training-shard export landed next to the corpus with a
    # manifest whose totals match the shard files
    import json

    shards = tmp_path / "shards"
    assert (shards / "_MANIFEST.json").exists()
    manifest = json.loads((shards / "_MANIFEST.json").read_text())
    n_manifest = sum(s["n_rows"] for s in manifest["shards"].values())
    assert n_manifest == spark.read.parquet(str(shards)).count()


def test_corpus_search_example_runs(spark, capsys):
    """Smoke test for the hybrid-search example: runs end-to-end at
    sf0.001 and prints a fused result table."""
    examples = str(Path(__file__).resolve().parent.parent / "examples")
    if examples not in sys.path:
        sys.path.insert(0, examples)
    mod = importlib.import_module("corpus_search")

    argv_save = sys.argv
    sys.argv = ["corpus_search.py", "/root/testdata/sf0.001"]
    try:
        mod.main()
    finally:
        sys.argv = argv_save
    out = capsys.readouterr().out
    assert "rrf_score" in out and "bm25_rank" in out
    # the semantic leg demos the production loop: day-0 table build,
    # day-1 delta upsert through the loaded codebook, table-probe
    assert "incrementally-maintained IVF leg" in out


def test_corpus_graph_audit_example_runs(spark, capsys):
    """Smoke test for the graph-audit example: runs end-to-end at sf0.001
    and prints all three audit sections."""
    examples = str(Path(__file__).resolve().parent.parent / "examples")
    if examples not in sys.path:
        sys.path.insert(0, examples)
    mod = importlib.import_module("corpus_graph_audit")

    argv_save = sys.argv
    sys.argv = ["corpus_graph_audit.py", "/root/testdata/sf0.001"]
    try:
        mod.main()
    finally:
        sys.argv = argv_save
    out = capsys.readouterr().out
    assert "transitivity audit" in out
    assert "2-core" in out
    assert "label spread" in out
    assert "graph audit complete" in out
