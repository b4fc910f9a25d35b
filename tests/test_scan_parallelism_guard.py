"""The single-file scan-serialization guard (r16, VERDICT r15 item 1).

The r15 salt-cap probe measured the hazard: a ONE-file parquet corpus
is one scan partition, and the identical salted self-join ran 989.7 s
vs 55.9 s at 32 files — the salt is powerless when the scan never
parallelizes. `operators/scale.py::ensure_scan_parallelism` is the
engine guard: below-floor inputs repartition (with a named warning),
healthy inputs pass through with ZERO plan change.
"""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from data_engineering_rag_spark.operators.scale import (
    ScanParallelismWarning,
    ensure_scan_parallelism,
)


def _single_file_fixture(spark, tmp_path, n=512):
    """One-file embeddings-shaped parquet: the hazard layout."""
    d = str(tmp_path / "embeddings.parquet")
    (
        spark.range(0, n)
        .select(
            F.col("id").alias("vec_id"),
            (F.col("id") % 4).cast("int").alias("label"),
            F.array(*[F.rand(seed=i) for i in range(8)]).alias("embedding"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(d)
    )
    return d


def test_single_file_scan_repartitioned_with_named_warning(spark, tmp_path):
    d = _single_file_fixture(spark, tmp_path)
    df = spark.read.parquet(d)
    assert df.rdd.getNumPartitions() == 1  # the hazard precondition
    with pytest.warns(ScanParallelismWarning, match="989.7 s single-file"):
        guarded = ensure_scan_parallelism(df, label="test fixture")
    floor = max(2, spark.sparkContext.defaultParallelism // 2)
    assert guarded.rdd.getNumPartitions() == floor
    # values untouched — round-robin repartition only
    assert guarded.count() == df.count()
    assert sorted(r.vec_id for r in guarded.select("vec_id").collect()) == list(range(512))


def test_healthy_input_passes_through_unchanged(spark):
    floor = max(2, spark.sparkContext.defaultParallelism // 2)
    df = spark.range(0, 10_000, numPartitions=floor)
    with warnings.catch_warnings():
        warnings.simplefilter("error", ScanParallelismWarning)
        out = ensure_scan_parallelism(df, label="healthy")
    assert out is df  # same object: zero plan delta for good layouts


def test_explicit_floor_overrides_default(spark, tmp_path):
    d = _single_file_fixture(spark, tmp_path, n=64)
    df = spark.read.parquet(d)
    with pytest.warns(ScanParallelismWarning):
        out = ensure_scan_parallelism(df, min_partitions=4, label="explicit")
    assert out.rdd.getNumPartitions() == 4


def test_ivf_self_join_input_multipartition_on_single_file_corpus(spark, tmp_path):
    """End-to-end acceptance (VERDICT r15 item 1 'Done' clause): the
    registered IVF near-dup query over a SINGLE-file corpus must carry
    a round-robin exchange so the join input is multi-partition, and
    the answer must equal the unguarded plain-label self-join."""
    _single_file_fixture(spark, tmp_path, n=400)
    from data_engineering_rag_spark.plans import REGISTRY

    with pytest.warns(ScanParallelismWarning):
        out = REGISTRY["embedding_near_dup_via_ivf"].spark(spark, str(tmp_path))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan or "ROUND_ROBIN" in plan, plan

    rows = {(r.vec_a, r.vec_b) for r in out.collect()}
    # unguarded reference: plain label self-join over the same corpus
    from data_engineering_rag_spark.plans.vectors import (
        NEAR_DUP_COS,
        dot,
        l2_norm_sq,
    )

    v = (
        spark.read.parquet(str(tmp_path / "embeddings.parquet"))
        .select("vec_id", "label", F.col("embedding").cast("array<double>").alias("ev"))
        .withColumn("nrm", F.sqrt(l2_norm_sq(F.col("ev"))))
    )
    a = v.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("la"),
        F.col("ev").alias("ea"), F.col("nrm").alias("na"),
    )
    b = v.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"),
        F.col("ev").alias("eb"), F.col("nrm").alias("nb"),
    )
    cos = F.round(dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 8)
    ref = (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b")))
        .where(cos > NEAR_DUP_COS)
        .select("vec_a", "vec_b")
    )
    assert rows == {(r.vec_a, r.vec_b) for r in ref.collect()}
