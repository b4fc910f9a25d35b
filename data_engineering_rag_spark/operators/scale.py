"""Physical-layout utilities for cluster scale (SURVEY.md §4.2 and the
100 TB north star): bucketed co-located joins, skew salting, and
partitioning helpers. These don't add query semantics — they shape
WHERE data lives so the semantic operators stop shuffling.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNSET = object()


def durable_checkpoint(df: DataFrame, checkpoint_dir: str | None | object = _UNSET) -> DataFrame:
    """Materialize + truncate lineage, with a durability knob.

    ``localCheckpoint`` (the default) writes to executor-local disk:
    right for local[32] and for short jobs, but on a real cluster an
    executor loss mid-job discards the blocks and kills iterative
    consumers. Passing ``checkpoint_dir`` (or setting
    ``SPARK_GRAFT_CHECKPOINT_DIR``) switches to reliable
    ``checkpoint()`` into that (HDFS/S3) directory — the 100 TB story
    for anything iterative or reused across stages."""
    if checkpoint_dir is _UNSET:
        checkpoint_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR") or None
    if checkpoint_dir is not None:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() != checkpoint_dir:
            sc.setCheckpointDir(checkpoint_dir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Two tables bucketed the same way on the join key give Catalyst a
    shuffle-FREE sort-merge join — at 100 TB that's the difference
    between re-shuffling every query and paying the layout cost once at
    write time. (File-path writes can't carry bucket metadata; this is
    inherently a table-catalog feature.)"""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: explode the SMALL side n_salts×, salt
    the big side's key uniformly, join on (key, salt). A single hot key
    spreads over n_salts tasks instead of melting one executor.

    AQE's skew-join split handles moderate skew automatically; explicit
    salting is for the pathological case (one key = 30% of rows) where
    even a split partition exceeds memory. Columns keep their names;
    the salt is internal.

    Only left-preserving joins are valid: the right side is exploded
    n_salts×, so 'right'/'full'/'outer' would emit each unmatched
    right-side row n_salts times. ('left_anti'/'left_semi' are fine —
    the exploded side covers every salt for a present key.)"""
    allowed = {"inner", "left", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join supports left-preserving joins only {sorted(allowed)}; "
            f"got how={how!r} (unmatched right rows would be duplicated n_salts times)"
        )
    salt = (F.abs(F.hash(F.monotonically_increasing_id())) % n_salts).alias("_salt")
    left_salted = left.withColumn("_salt", salt)
    right_exploded = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = left_salted.join(right_exploded, [key, "_salt"], how)
    return joined.drop("_salt")


def repartition_for_join(df: DataFrame, key: str, n_partitions: int | None = None) -> DataFrame:
    """Pre-shuffle on the join key so several downstream joins/aggs on
    the same key reuse one exchange (Catalyst's ReusedExchange kicks in
    when partitioning already matches)."""
    return df.repartition(n_partitions, F.col(key)) if n_partitions else df.repartition(F.col(key))
