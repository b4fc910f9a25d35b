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
