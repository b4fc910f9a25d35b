"""Degenerate-input pins for the round-8 batch-7/8 queries: each one
must either produce a well-defined empty/partial result or fail LOUDLY
— never a silent wrong answer. Inputs are tiny crafted parquet tables
in tmp_path shaped like the real catalog."""

from __future__ import annotations

from datetime import datetime

import pytest

from data_engineering_rag_spark.plans import REGISTRY


def _ts(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def _write(spark, tmp_path, table, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / f"{table}.parquet")
    )


def test_holt_single_day_fails_loudly(spark, tmp_path):
    """One daily point cannot initialize a trend: the query must raise,
    not emit a made-up forecast."""
    _write(
        spark,
        tmp_path,
        "orders",
        [(1, _ts("2024-01-01 10:00:00"), 10.0)],
        "o_orderkey bigint, o_orderdate timestamp, o_totalprice double",
    )
    with pytest.raises(Exception, match="need >= 2 days"):
        REGISTRY["holt_linear_daily_forecast"].spark(spark, str(tmp_path)).collect()


def test_holt_by_type_skips_short_series(spark, tmp_path):
    """A type with a single day is skipped (no fabricated trend); types
    with >= 2 days still fit."""
    _write(
        spark,
        tmp_path,
        "events",
        [
            (1, _ts("2024-01-01 10:00:00"), 1, "view", 1.0, "{}"),
            (2, _ts("2024-01-02 10:00:00"), 1, "view", 1.0, "{}"),
            (3, _ts("2024-01-01 11:00:00"), 2, "purchase", 1.0, "{}"),
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    got = REGISTRY["holt_forecast_by_event_type"].spark(spark, str(tmp_path)).collect()
    assert [r["event_type"] for r in got] == ["view"]
    assert got[0]["n_days"] == 2


def test_stl_under_seven_days_is_empty(spark, tmp_path):
    """Fewer than 7 daily points -> no full centered window -> empty
    decomposition, not a partial-window guess."""
    rows = [
        (i, _ts(f"2024-01-0{i} 10:00:00"), 1, "view", 1.0, "{}") for i in range(1, 6)
    ]
    _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    assert REGISTRY["stl_weekly_decompose_events"].spark(spark, str(tmp_path)).count() == 0


def test_lof_singleton_labels_are_excluded(spark, tmp_path):
    """Vectors whose label bucket has no other member have no kNN set
    and must be absent from the scores (never NaN/degenerate rows)."""
    rows = [
        (1, "a", [1.0, 0.0]),
        (2, "a", [0.9, 0.1]),
        (3, "a", [0.0, 1.0]),
        (4, "a", [0.5, 0.5]),
        (5, "lonely", [2.0, 2.0]),
    ]
    _write(spark, tmp_path, "embeddings", rows, "vec_id bigint, label string, embedding array<double>")
    got = REGISTRY["lof_embedding_outliers"].spark(spark, str(tmp_path)).collect()
    ids = {r["vec_id"] for r in got}
    assert 5 not in ids
    assert ids == {1, 2, 3, 4}
    assert all(r["lof"] is not None and r["lrd"] is not None for r in got)


def test_prefix_join_short_docs_are_empty(spark, tmp_path):
    """Docs with fewer than 3 tokens have no trigram set: no pairs, no
    crash."""
    _write(
        spark,
        tmp_path,
        "documents",
        [(1, "hello world"), (2, "hello world")],
        "doc_id bigint, text string",
    )
    assert REGISTRY["jaccard_prefix_filter_pairs"].spark(spark, str(tmp_path)).count() == 0


def test_qdigest_empty_and_single_value(spark, tmp_path):
    """Empty orders -> empty sketch output (no crash); a single value
    -> every quantile answers that value's cent bucket."""
    _write(
        spark,
        tmp_path,
        "orders",
        [],
        "o_orderkey bigint, o_orderdate timestamp, o_totalprice double",
    )
    assert REGISTRY["qdigest_price_quantiles"].spark(spark, str(tmp_path)).count() == 0
    _write(
        spark,
        tmp_path,
        "orders",
        [(1, _ts("2024-01-01 10:00:00"), 123.45)],
        "o_orderkey bigint, o_orderdate timestamp, o_totalprice double",
    )
    got = REGISTRY["qdigest_price_quantiles"].spark(spark, str(tmp_path)).collect()
    assert len(got) == 7
    assert all(r["est_cents"] == 12345 and r["n"] == 1 for r in got)


# --------------------------------------------------------------------------
# ADVICE r8 regression pins: the quadratic-join cap guards must actually
# FIRE (the previous assert_true-then-drop pattern was pruned away by
# Catalyst's column pruning and never evaluated), and the IVM merge must
# match a from-scratch recompute on full-retraction inputs.
# --------------------------------------------------------------------------


def test_kendall_cap_guard_fires(spark, monkeypatch):
    """The Kendall τ pair-space cap is threaded through the consumed
    `n` output column: with the cap lowered below the sample size, the
    job must fail loudly instead of running the n² join unbounded."""
    from data_engineering_rag_spark.plans import stattestsq

    monkeypatch.setattr(stattestsq, "KT_SAMPLE_MOD", 1)  # keep every customer
    monkeypatch.setattr(stattestsq, "KT_SAMPLE_CAP", 10)
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    with pytest.raises(Exception, match="sample exceeds"):
        REGISTRY["kendall_tau_acctbal_orders"].spark(spark, sf).collect()


def test_kendall_runs_clean_under_cap(spark):
    """Control: with the shipped cap the guard is inert and the query
    still returns its single summary row."""
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    got = REGISTRY["kendall_tau_acctbal_orders"].spark(spark, sf).collect()
    assert len(got) == 1 and got[0]["n"] >= 0


def test_theil_sen_cap_guard_fires(spark, monkeypatch):
    """Same dead-guard fix for the Theil–Sen calendar cap: lowering the
    cap below the observed day count must fail the job (the guard rides
    the consumed n_days column, so Catalyst cannot prune it)."""
    from data_engineering_rag_spark.plans import forecastq

    monkeypatch.setattr(forecastq, "TS_CALENDAR_CAP", 1)
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    with pytest.raises(Exception, match="calendar cap"):
        REGISTRY["theil_sen_daily_trend"].spark(spark, sf).collect()


def test_ivm_full_retraction_drops_group(spark, tmp_path):
    """ADVICE r8 degenerate pin: an event_type whose base rows are ALL
    retracted (event_id % IVM_DELETE_MOD == 0) and that has no insert
    rows must be ABSENT from the merged view — exactly like the
    oracle's from-scratch recompute — not present as a (type, 0, 0.0)
    zombie row."""
    from data_engineering_rag_spark.plans.sketchq import IVM_DELETE_MOD

    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    )
    rows = [
        # "dead": base-window rows only, every one a retraction
        (IVM_DELETE_MOD, _ts("2024-01-01 10:00:00"), 1, "dead", 5.0, "{}"),
        (2 * IVM_DELETE_MOD, _ts("2024-01-02 10:00:00"), 1, "dead", 7.0, "{}"),
        # "live": one surviving base row + one insert-window row
        (1, _ts("2024-01-01 11:00:00"), 2, "live", 1.0, "{}"),
        (2, _ts("2024-02-15 11:00:00"), 2, "live", 2.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, schema)
    got = REGISTRY["ivm_agg_delta_merge"].spark(spark, str(tmp_path)).collect()
    assert [r["event_type"] for r in got] == ["live"]
    assert got[0]["n_events"] == 2 and got[0]["total_value"] == 3.0
