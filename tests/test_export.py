"""Training-shard export tests: layout, manifest publish-last protocol,
round-trip verification, corruption detection, determinism."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.operators import export as E
from bonobo_sqlalchemy_spark.sources.files import load_table


def test_export_roundtrip_verifies_clean(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents").limit(200)
    path = str(tmp_path / "shards")
    manifest = E.write_training_shards(
        docs, path, order_col="doc_id", token_col="n_chars", n_shards=4
    )
    assert os.path.exists(os.path.join(path, E.MANIFEST_NAME))
    assert sum(s["n_rows"] for s in manifest["shards"].values()) == 200
    # one data file per shard: shards are the loader's scheduling unit
    for k in manifest["shards"]:
        files = [
            f
            for f in os.listdir(os.path.join(path, f"shard={k}"))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (k, files)
    report = E.verify_training_shards(spark, path)
    rows = report.collect()
    assert len(rows) == len(manifest["shards"])
    assert all(r.ok for r in rows), rows


def test_export_detects_corruption(spark, sf_small, tmp_path):
    """Dropping one row from a shard must flip that shard's hash_match and
    row count — and ONLY that shard's."""
    docs = load_table(spark, sf_small, "documents").limit(100)
    path = str(tmp_path / "shards")
    E.write_training_shards(docs, path, order_col="doc_id", n_shards=4)
    # corrupt shard 0: rewrite its single file minus one row
    sdir = os.path.join(path, "shard=0")
    dropped_id = spark.read.parquet(sdir).orderBy("doc_id").first()["doc_id"]
    kept = spark.read.parquet(sdir).where(F.col("doc_id") != dropped_id)
    kept.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "fix"))
    import shutil

    shutil.rmtree(sdir)
    shutil.copytree(str(tmp_path / "fix"), sdir)
    report = {r.shard: r for r in E.verify_training_shards(spark, path).collect()}
    assert not report[0].ok and not report[0].hash_match
    assert report[0].n_rows_actual == report[0].n_rows_expected - 1
    assert all(r.ok for s, r in report.items() if s != 0)


def test_manifest_is_partitioning_invariant(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").limit(150)
    a = {
        r.shard: (r.n_rows, r.content_hash)
        for r in E.shard_manifest(docs.repartition(1), n_shards=4).collect()
    }
    b = {
        r.shard: (r.n_rows, r.content_hash)
        for r in E.shard_manifest(docs.repartition(13), n_shards=4).collect()
    }
    assert a == b


def test_manifest_publish_last(spark, sf_small, tmp_path):
    """The manifest must not exist if the data write never completed —
    loaders treat a manifest-less directory as absent."""
    docs = load_table(spark, sf_small, "documents").limit(50)
    path = str(tmp_path / "shards")
    E.write_training_shards(docs, path, n_shards=2)
    m1 = json.load(open(os.path.join(path, E.MANIFEST_NAME)))
    os.remove(os.path.join(path, E.MANIFEST_NAME))
    # a fresh write re-publishes an identical manifest (determinism)
    m2 = E.write_training_shards(docs, path, n_shards=2)
    assert m1["shards"] == {
        k: dict(v) for k, v in m2["shards"].items()
    }
