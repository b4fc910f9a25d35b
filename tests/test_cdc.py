"""CDC operators: snapshot diff classification (null-safe) and SCD2
interval construction (consecutive dedup, open current row)."""

from __future__ import annotations

from datetime import datetime

from data_engineering_rag_spark.operators.cdc import scd2_intervals, snapshot_diff


def test_snapshot_diff_classes_and_null_safety(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, None, 40.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", None), (3, "c", 31.0), (4, "d", 40.0), (5, "e", 50.0)],
        "k int, s string, v double",
    )
    rows = {
        r.k: r
        for r in snapshot_diff(
            old, new, key_cols=["k"], compare_cols=["s", "v"], include_unchanged=True
        ).collect()
    }
    assert rows[1].change_type == "removed"
    assert rows[2].change_type == "unchanged"  # NULL <=> NULL is not a change
    assert rows[3].change_type == "changed"
    assert rows[4].change_type == "changed"  # NULL -> 'd' is a change
    assert rows[5].change_type == "added"
    # Default drops unchanged.
    kept = snapshot_diff(old, new, key_cols=["k"], compare_cols=["s", "v"]).collect()
    assert {r.k for r in kept} == {1, 3, 4, 5}


def test_scd2_intervals_dedup_and_current(spark):
    t = lambda d: datetime(2024, 1, d)
    changes = spark.createDataFrame(
        [
            (1, t(1), "gold"),
            (1, t(2), "gold"),  # no-op update: must not open an interval
            (1, t(3), "silver"),
            (2, t(1), "basic"),
        ],
        "k int, ts timestamp, tier string",
    )
    out = scd2_intervals(changes, ["k"], "ts", ["tier"]).collect()
    by = {(r.k, r.tier): r for r in out}
    assert len(out) == 3
    g = by[(1, "gold")]
    assert g.effective_from == t(1) and g.effective_to == t(3) and not g.is_current
    s = by[(1, "silver")]
    assert s.effective_from == t(3) and s.effective_to is None and s.is_current
    assert by[(2, "basic")].is_current


def test_scd2_tiebreak_determinism(spark):
    t = datetime(2024, 1, 1)
    changes = spark.createDataFrame(
        [(1, t, 2, "b"), (1, t, 1, "a")], "k int, ts timestamp, seq int, attr string"
    )
    out = scd2_intervals(changes, ["k"], "ts", ["attr"], tiebreak_cols=["seq"]).collect()
    cur = [r for r in out if r.is_current]
    assert len(cur) == 1 and cur[0].attr == "b"  # seq order decides the survivor


def test_column_profile_planted(spark):
    from data_engineering_rag_spark.operators.profile import column_profile

    df = spark.createDataFrame(
        [(1, None, 2.5), (2, "x", None), (2, "y", 7.5)], "k int, s string, v double"
    )
    prof = {r.col_name: r for r in column_profile(df).collect()}
    assert prof["k"].n_rows == 3 and prof["k"].n_nulls == 0 and prof["k"].n_distinct == 2
    assert prof["k"].min_num == 1.0 and prof["k"].max_num == 2.0
    assert prof["s"].n_nulls == 1 and prof["s"].min_str == "x" and prof["s"].max_str == "y"
    assert prof["v"].n_nulls == 1 and prof["v"].max_num == 7.5 and prof["v"].min_str is None
    # Approx mode: same shape, sketch-based distincts still sane on tiny data.
    aprof = {r.col_name: r for r in column_profile(df, exact_distinct=False).collect()}
    assert aprof["k"].n_distinct == 2


def test_scd2_intervals_partition_timeline(spark):
    """Randomized invariant check: per key, intervals are contiguous
    (each effective_to equals the next effective_from), exactly one
    open current row, and adjacent intervals never share a state."""
    import random
    from datetime import datetime, timedelta

    rng = random.Random(7)
    rows = []
    for k in range(20):
        t = datetime(2024, 1, 1)
        for _ in range(rng.randint(1, 12)):
            t += timedelta(days=rng.randint(1, 5))
            rows.append((k, t, rng.choice("abc")))
    changes = spark.createDataFrame(rows, "k int, ts timestamp, st string")
    out = scd2_intervals(changes, ["k"], "ts", ["st"]).collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    for k, ivs in by_key.items():
        ivs.sort(key=lambda r: r.effective_from)
        open_rows = [r for r in ivs if r.effective_to is None]
        assert len(open_rows) == 1 and open_rows[0] is ivs[-1]
        assert open_rows[0].is_current
        for a, b in zip(ivs, ivs[1:]):
            assert a.effective_to == b.effective_from
            assert a.st != b.st  # consecutive dedup collapsed no-ops


def test_ivm_signed_delete_delta_equals_recompute(spark, sf_dir):
    """The IVM partials must also absorb DELETES: negate the deleted
    batch's partial (cnt → -cnt, rev → -rev), merge with the full
    view's partials, and the result must EXACTLY equal recomputing the
    view without the deleted rows — counts and decimal sums subtract
    exactly (the reason the partials are never averages)."""
    from pyspark.sql import functions as F

    from data_engineering_rag_spark.plans import load
    from data_engineering_rag_spark.plans.cdcq import nation_view_partial

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    full = nation_view_partial(o, c, n)
    deleted = nation_view_partial(o.where(F.col("o_orderkey") % 7 == 0), c, n)
    neg = deleted.select("n_name", (-F.col("cnt")).alias("cnt"), (-F.col("rev")).alias("rev"))
    maintained = (
        full.unionByName(neg)
        .groupBy("n_name")
        .agg(F.sum("cnt").alias("cnt"), F.sum("rev").alias("rev"))
        .where(F.col("cnt") > 0)
    )
    recomputed = nation_view_partial(o.where(F.col("o_orderkey") % 7 != 0), c, n)

    got = {r.n_name: (r.cnt, r.rev) for r in maintained.collect()}
    want = {r.n_name: (r.cnt, r.rev) for r in recomputed.collect()}
    assert got == want  # exact: integer counts, decimal sums
