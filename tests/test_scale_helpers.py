"""Exactness pins for the scale-safe global rank/ntile kernel
(`operators/scale.py`): results must be bit-identical to the
single-partition `row_number()`/`ntile()` window references they
replace, and the plans must carry no unbounded single-partition
window (that is the whole point)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_engineering_rag_spark.operators.scale import with_global_ntile, with_global_rank


def _df(spark, n=9973):
    # non-trivial distribution with heavy ties on v (unique tiebreak: id)
    return spark.range(0, n).select(F.col("id"), (F.xxhash64("id") % 100).alias("v"))


def test_global_rank_matches_window_reference(spark):
    df = _df(spark)
    ref = df.withColumn("r", F.row_number().over(Window.orderBy("v", "id")))
    got = with_global_rank(df, ["v", "id"], "r").withColumnRenamed("r", "r2")
    assert ref.join(got, ["id", "v"]).where("r <> r2").count() == 0


def test_global_rank_desc_ordering(spark):
    df = _df(spark, 2311)
    order = [F.col("v").desc(), F.col("id").asc()]
    ref = df.withColumn("r", F.row_number().over(Window.orderBy(*order)))
    got = with_global_rank(df, order, "r").withColumnRenamed("r", "r2")
    assert ref.join(got, ["id", "v"]).where("r <> r2").count() == 0


def test_global_ntile_matches_window_reference(spark):
    df = _df(spark)
    for k in (3, 5, 10):
        ref = df.withColumn("b", F.ntile(k).over(Window.orderBy("v", "id")))
        got = with_global_ntile(df, k, ["v", "id"], "b").withColumnRenamed("b", "b2")
        assert ref.join(got, ["id", "v"]).where("b <> b2").count() == 0


def test_global_ntile_fewer_rows_than_buckets(spark):
    # SQL ntile with n < k: the first n buckets get one row each
    tiny = spark.range(0, 4).select("id", F.col("id").alias("v"))
    ref = tiny.withColumn("b", F.ntile(10).over(Window.orderBy("v", "id")))
    got = with_global_ntile(tiny, 10, ["v", "id"], "b").withColumnRenamed("b", "b2")
    assert ref.join(got, ["id", "v"]).where("b <> b2").count() == 0


def test_helpers_plan_no_single_partition_window(spark):
    """No window may be fed by a single-partition exchange (the 1-row
    ntile TOTAL aggregate legitimately gathers to one partition — it
    reduces pre-aggregated per-range counts, not rows)."""
    from .test_plan_shapes import _unbounded_single_partition_windows

    df = _df(spark)
    rank_plan = with_global_rank(df, ["v", "id"], "r")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in rank_plan, rank_plan
    ntile_plan = (
        with_global_ntile(df, 5, ["v", "id"], "b")._jdf.queryExecution().executedPlan().toString()
    )
    assert _unbounded_single_partition_windows(ntile_plan) == 0, ntile_plan
