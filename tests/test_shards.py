"""Training-shard writer: layout (hive partitions per split), manifest
reproducibility, and content equal to the composed queries."""

from __future__ import annotations

import json
import os

from data_engineering_rag_spark.operators.shards import materialize_training_shards


def test_shards_layout_and_manifest(spark, sf_dir, tmp_path):
    path = str(tmp_path / "shards")
    m1 = materialize_training_shards(spark, sf_dir, path, files_per_split=2)

    # hive layout: one dir per split present in the survivor set
    splits = {d for d in os.listdir(path) if d.startswith("split=")}
    assert splits <= {"split=train", "split=val", "split=test"} and splits

    # manifest written and re-run reproducible (same fingerprint)
    on_disk = json.load(open(f"{path}/_MANIFEST.json"))
    assert on_disk["fingerprint"] == m1["fingerprint"]
    m2 = materialize_training_shards(spark, sf_dir, str(tmp_path / "shards2"), files_per_split=2)
    assert m2["fingerprint"] == m1["fingerprint"]
    assert m2["n_rows"] == m1["n_rows"] > 0

    # partition-pruned read sees only that split's rows, and the total
    # row count matches the manifest
    back = spark.read.parquet(path)
    assert back.count() == m1["n_rows"]
    train = back.where("split = 'train'")
    plan = train._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan

    # compaction contract: each split directory holds MORE than one data
    # file (the salt spreads rows) and no more than files_per_split
    for d in splits:
        files = [
            f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")
        ]
        assert 1 <= len(files) <= 2, (d, files)
    # at least one split actually fans out to 2 files
    assert any(
        len([f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]) == 2
        for d in splits
    )
