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


def test_grouped_top_k_matches_window_reference(spark):
    from data_engineering_rag_spark.operators.scale import grouped_top_k

    df = _df(spark, 4999).withColumn("g", (F.col("id") % 4).cast("string"))
    ref = (
        df.withColumn("rn", F.row_number().over(Window.partitionBy("g").orderBy("v", "id")))
        .where(F.col("rn") <= 7)
    )
    got = grouped_top_k(df, ["g"], ["v", "id"], 7, "rn").withColumnRenamed("rn", "rn2")
    j = ref.join(got, ["g", "id", "v"], "full")
    assert j.where("rn IS DISTINCT FROM rn2").count() == 0


def test_grouped_prefix_sum_matches_window_reference(spark):
    from data_engineering_rag_spark.operators.scale import grouped_prefix_sum

    df = _df(spark, 4999).withColumn("g", (F.col("id") % 3).cast("string"))
    w = (
        Window.partitionBy("g")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ref = df.withColumn("ps", F.coalesce(F.sum("v").over(w), F.lit(0)))
    got = grouped_prefix_sum(df, ["g"], ["id"], "v", "ps").withColumnRenamed("ps", "ps2")
    j = ref.join(got, ["g", "id", "v"], "full")
    assert j.where("ps IS DISTINCT FROM ps2").count() == 0


def test_winsorize_sketch_path_close_to_exact(spark, sf_dir):
    """The documented 100 TB alternative for `events_winsorized_values`
    — approx_percentile (t-digest, mergeable, no ranking pass) — must
    land within 2% relative error of the exact nearest-rank thresholds
    it would replace (accuracy=10000 ≈ 1e-4 rank error)."""
    from data_engineering_rag_spark.plans import REGISTRY, load
    import pyspark.sql.functions as F

    exact = {
        r.event_type: (r.p01, r.p99)
        for r in REGISTRY["events_winsorized_values"].spark(spark, sf_dir).collect()
    }
    approx = {
        r.event_type: (r.a01, r.a99)
        for r in (
            load(spark, sf_dir, "events")
            .where(F.col("value").isNotNull())
            .groupBy("event_type")
            .agg(
                F.percentile_approx("value", 0.01, 10000).alias("a01"),
                F.percentile_approx("value", 0.99, 10000).alias("a99"),
            )
            .collect()
        )
    }
    assert set(exact) == set(approx)
    for et, (p01, p99) in exact.items():
        a01, a99 = approx[et]
        spread = abs(p99 - p01) or 1.0
        assert abs(a01 - p01) / spread < 0.02, (et, p01, a01)
        assert abs(a99 - p99) / spread < 0.02, (et, p99, a99)


def test_kernel_helpers_partition_count_edges(spark):
    """The rank/ntile/prefix kernels must be exact at both degenerate
    partitionings: everything in ONE range partition, and far more
    partitions than rows (empty ranges)."""
    from data_engineering_rag_spark.operators.scale import (
        grouped_prefix_sum,
        with_global_ntile,
        with_global_rank,
    )

    df = _df(spark, 173)
    ref_rank = df.withColumn("r", F.row_number().over(Window.orderBy("v", "id")))
    for n_parts in (1, 1000):
        got = with_global_rank(df, ["v", "id"], "r", num_partitions=n_parts)
        assert (
            ref_rank.join(got.withColumnRenamed("r", "r2"), ["id", "v"])
            .where("r <> r2")
            .count()
            == 0
        ), n_parts
        ref_nt = df.withColumn("b", F.ntile(7).over(Window.orderBy("v", "id")))
        gnt = with_global_ntile(df, 7, ["v", "id"], "b", num_partitions=n_parts)
        assert (
            ref_nt.join(gnt.withColumnRenamed("b", "b2"), ["id", "v"])
            .where("b <> b2")
            .count()
            == 0
        ), n_parts

    g = df.withColumn("g", (F.col("id") % 2).cast("string"))
    w = Window.partitionBy("g").orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    ref_ps = g.withColumn("ps", F.coalesce(F.sum("v").over(w), F.lit(0)))
    for n_parts in (1, 1000):
        gps = grouped_prefix_sum(g, ["g"], ["id"], "v", "ps", num_partitions=n_parts)
        assert (
            ref_ps.join(gps.withColumnRenamed("ps", "ps2"), ["g", "id", "v"])
            .where("ps IS DISTINCT FROM ps2")
            .count()
            == 0
        ), n_parts


def test_kernels_exact_without_exchange_reuse(spark):
    """The ranked branch and the count/offset branch of the kernels
    must agree on range boundaries and partition ids even when Catalyst
    does NOT deduplicate the exchanges (ADVICE r5: the old shape was
    only correct because ReuseExchange happened to fire). The persisted
    post-exchange frame makes the sharing structural; this runs the
    parity checks with exchange/subquery reuse disabled and asserts the
    rank invariant (ranks are exactly the permutation 1..N)."""
    from data_engineering_rag_spark.operators.scale import grouped_prefix_sum

    confs = {
        "spark.sql.exchangeReuseEnabled": "false",
        "spark.sql.execution.reuseSubquery": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)

        df = _df(spark, 4999)
        n = df.count()
        got = with_global_rank(df, ["v", "id"], "r")
        stats = got.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("r").alias("mn"),
            F.max("r").alias("mx"),
            F.countDistinct("r").alias("nd"),
        ).first()
        assert (stats.cnt, stats.mn, stats.mx, stats.nd) == (n, 1, n, n)
        ref = df.withColumn("r", F.row_number().over(Window.orderBy("v", "id")))
        assert ref.join(got.withColumnRenamed("r", "r2"), ["id", "v"]).where("r <> r2").count() == 0

        ref_nt = df.withColumn("b", F.ntile(7).over(Window.orderBy("v", "id")))
        gnt = with_global_ntile(df, 7, ["v", "id"], "b")
        assert ref_nt.join(gnt.withColumnRenamed("b", "b2"), ["id", "v"]).where("b <> b2").count() == 0

        g = df.withColumn("g", (F.col("id") % 3).cast("string"))
        w = Window.partitionBy("g").orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
        ref_ps = g.withColumn("ps", F.coalesce(F.sum("v").over(w), F.lit(0)))
        gps = grouped_prefix_sum(g, ["g"], ["id"], "v", "ps")
        assert (
            ref_ps.join(gps.withColumnRenamed("ps", "ps2"), ["g", "id", "v"])
            .where("ps IS DISTINCT FROM ps2")
            .count()
            == 0
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_robust_outlier_approx_twin_close_to_exact(spark, sf_dir):
    """The production spelling of robust_outlier_audit (mergeable
    approx_percentile, no per-group value buffering) must agree with
    the exact oracle spelling: same event types and counts, median/MAD
    within 2% of the per-type MAD scale, and the outlier rate within
    an absolute 0.005 (the flags differ only for points within the
    sketch tolerance of the cut)."""
    from data_engineering_rag_spark.plans import REGISTRY

    exact = {r.event_type: r for r in REGISTRY["robust_outlier_audit"].spark(spark, sf_dir).collect()}
    approx = {
        r.event_type: r
        for r in REGISTRY["robust_outlier_audit_approx"].spark(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx) and exact
    for et, e in exact.items():
        a = approx[et]
        assert a.n == e.n
        scale = abs(e.mad_value) or 1.0
        assert abs(a.median_value - e.median_value) / scale < 0.02, (et, e, a)
        assert abs(a.mad_value - e.mad_value) / scale < 0.02, (et, e, a)
        assert abs(a.outlier_rate - e.outlier_rate) < 0.005, (et, e, a)


def test_scan_guard_memoizes_partition_probe(spark, monkeypatch):
    """r17 (VERDICT r16 item 8): ensure_scan_parallelism probes the
    partition count via df.rdd, which builds the full physical
    translation per call; semantically-equal frames within one session
    must hit the memo instead of re-planning. The memo holds layout
    integers only — the guard's plan output is unchanged (identity
    either way here)."""
    import pyspark.sql.classic.dataframe as dfmod

    from data_engineering_rag_spark.operators import scale

    scale._SCAN_PARTITIONS_MEMO.clear()
    calls = {"n": 0}
    orig = dfmod.DataFrame.rdd

    def counting_rdd(self):
        calls["n"] += 1
        return orig.func(self)  # classic DataFrame.rdd is a cached_property

    monkeypatch.setattr(dfmod.DataFrame, "rdd", property(counting_rdd))
    df1 = spark.range(1000).selectExpr("id", "id * 2 AS v")
    df2 = spark.range(1000).selectExpr("id", "id * 2 AS v")
    out1 = scale.ensure_scan_parallelism(df1, label="memo-test")
    assert calls["n"] == 1
    out2 = scale.ensure_scan_parallelism(df2, label="memo-test")
    assert calls["n"] == 1  # second semantically-equal probe: memo hit
    # zero plan change on already-parallel input
    assert out1 is df1 and out2 is df2
