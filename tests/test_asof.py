"""As-of join edge semantics: inclusive boundary, no-predecessor NULL,
per-key isolation."""

from __future__ import annotations

import datetime as dt

from data_engineering_rag_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def ts(minutes: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, ts(30), "p1"), (1, ts(120), "p2"), (2, ts(0), "p3"), (3, ts(60), "p4")],
        ["user_id", "p_ts", "p_name"],
    )
    right = spark.createDataFrame(
        [(1, ts(0), "v1"), (1, ts(60), "v2"), (1, ts(120), "v3"), (2, ts(10), "v4")],
        ["user_id", "v_ts", "v_name"],
    )
    out = {
        r.p_name: (r.v_name, r.v_ts)
        for r in asof_join(
            left, right, key="user_id", left_time="p_ts", right_time="v_ts",
            right_value_cols=["v_name", "v_ts"],
        ).collect()
    }
    assert out["p1"] == ("v1", ts(0))  # latest view before 10:30
    assert out["p2"] == ("v3", ts(120))  # exact tie is INCLUSIVE (<=)
    assert out["p3"] == (None, None)  # right row is after the left row
    assert out["p4"] == (None, None)  # key has no right rows at all


def test_asof_directions_tiny(spark):
    """Hand-checkable fixture for all three directions, including
    equal-timestamp inclusivity and the nearest tie → backward rule."""
    from data_engineering_rag_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("a", 10, "l0"), ("a", 20, "l1"), ("b", 5, "l2")], ["k", "lt", "lbl"]
    )
    right = spark.createDataFrame(
        [("a", 8, "r8"), ("a", 10, "r10"), ("a", 26, "r26"), ("b", 99, "r99")],
        ["k", "rt", "rv"],
    )

    def run(direction):
        out = asof_join(
            left, right, key="k", left_time="lt", right_time="rt",
            right_value_cols=["rv"], direction=direction,
        )
        return {r.lbl: r.rv for r in out.collect()}

    # backward: latest rt <= lt (equal time inclusive)
    assert run("backward") == {"l0": "r10", "l1": "r10", "l2": None}
    # forward: earliest rt >= lt
    assert run("forward") == {"l0": "r10", "l1": "r26", "l2": "r99"}
    # nearest: l1 at 20 — back r10 (d=10) vs fwd r26 (d=6) → forward;
    # l0 at 10 — exact match; l2 only has a forward candidate
    assert run("nearest") == {"l0": "r10", "l1": "r26", "l2": "r99"}

    # tie: back at d=2 and fwd at d=2 → backward wins
    tie_left = spark.createDataFrame([("a", 10, "t")], ["k", "lt", "lbl"])
    tie_right = spark.createDataFrame([("a", 8, "back"), ("a", 12, "fwd")], ["k", "rt", "rv"])
    out = asof_join(
        tie_left, tie_right, key="k", left_time="lt", right_time="rt",
        right_value_cols=["rv"], direction="nearest",
    )
    assert out.collect()[0].rv == "back"


def test_asof_bad_direction(spark):
    import pytest as _pytest

    from data_engineering_rag_spark.operators.asof import asof_join

    df = spark.createDataFrame([("a", 1)], ["k", "t"])
    with _pytest.raises(ValueError, match="direction"):
        asof_join(df, df.withColumnRenamed("t", "rt"), key="k", left_time="t",
                  right_time="rt", right_value_cols=[], direction="sideways")
