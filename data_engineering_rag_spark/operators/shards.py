"""Training-shard materialization: the WRITE half of the corpus-prep
endgame. ``plans/pipelineq.py::corpus_materialize_clean`` decides WHAT
survives; this operator lays it out — hive-partitioned by split so a
trainer's "read the train split" is a partition-pruned scan, with a
reproducibility manifest per run (row count, schema, order-insensitive
content fingerprint) that downstream consumers pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def materialize_training_shards(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    files_per_split: int = 4,
) -> dict:
    """Clean corpus ∧ split assignment → ``path`` partitioned by split.

    Layout contract: one directory per split (partition-pruned reads),
    ``files_per_split`` files each (the compaction knob — at 100 TB
    this is computed from target file size, see ``compact_parquet``),
    ``_MANIFEST.json`` at the root with the content fingerprint.
    Returns the manifest."""
    from ..plans.pipelineq import dataset_split_assign
    from ..sources.io import write_parquet_with_manifest

    from ..plans import REGISTRY

    clean = REGISTRY["corpus_materialize_clean"].spark(spark, sf_dir)
    splits = dataset_split_assign(spark, sf_dir).select("doc_id", "split")
    # corpus_materialize_clean already restricts to the train split's
    # gates; re-join the full assignment so val/test shards materialize
    # from the same survivor set (gates minus the split restriction).
    shard = clean.select("doc_id", "lang", "content_md5").join(splits, "doc_id")

    manifest = write_parquet_with_manifest_partitioned(shard, path, files_per_split)
    return manifest


def write_parquet_with_manifest_partitioned(
    df: DataFrame, path: str, files_per_partition: int
) -> dict:
    """Partitioned variant of ``sources/io.py::write_parquet_with_manifest``:
    hive-partition by ``split``, bound files per partition via
    repartition(split-key round robin), same order-insensitive
    fingerprint contract."""
    import json

    fingerprint_row = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(F.xxhash64(*df.columns)).alias("fingerprint"),
    ).collect()[0]
    (
        df.repartition(files_per_partition, "split")
        .write.mode("overwrite")
        .partitionBy("split")
        .parquet(path)
    )
    manifest = {
        "n_rows": fingerprint_row.n_rows,
        "fingerprint": fingerprint_row.fingerprint,
        "schema": df.schema.jsonValue(),
        "partitioned_by": ["split"],
    }
    spark = df.sparkSession
    sc = spark.sparkContext
    # write via the JVM-agnostic local path (tests run on local FS)
    with open(f"{path}/_MANIFEST.json", "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    _ = sc  # layout is FS-local here; on object stores use the util in sources/io
    return manifest
