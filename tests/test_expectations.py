"""Declarative expectation-suite operator: planted violations are
counted exactly; the row-local checks share one aggregation pass
(plan-asserted); results agree with the fixed ``data_quality_audit``
checklist where they overlap."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_engineering_rag_spark.operators.expectations import Expectation, run_expectations


def test_planted_violations_counted_exactly(spark):
    df = spark.createDataFrame(
        [
            (1, "ok", 5.0),
            (2, None, 50.0),      # null name
            (2, "dup", 5.0),      # duplicate id
            (3, "bad!", -1.0),    # regex + range violation
        ],
        "id long, name string, score double",
    )
    suite = [
        Expectation("name_not_null", "not_null", column="name"),
        Expectation("score_in_range", "between", column="score", params={"low": 0, "high": 10}),
        Expectation("name_is_word", "matches_regex", column="name", params={"pattern": "^[a-z]+$"}),
        Expectation("id_unique", "unique", columns=("id",)),
    ]
    got = {r.check_name: r for r in run_expectations(df, suite).collect()}
    assert got["name_not_null"].n_violations == 1
    assert got["score_in_range"].n_violations == 2  # 50.0 and -1.0
    # NULL counts as a regex violation too (documented), plus 'bad!'
    assert got["name_is_word"].n_violations == 2
    assert got["id_unique"].n_violations == 2  # both rows of the dup key
    assert all(r.n_rows == 4 for r in got.values())
    assert not any(r.passed for r in got.values())


def test_row_local_suite_is_one_aggregation_pass(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("v"), F.lit("x").alias("s")
    )
    suite = [
        Expectation("v_low", "between", column="v", params={"low": 0, "high": 6}),
        Expectation("s_set", "in_set", column="s", params={"values": ["x", "y"]}),
        Expectation("id_nn", "not_null", column="id"),
    ]
    out = run_expectations(df, suite)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one scan feeding one aggregate: no join, no union of per-check scans
    assert plan.count("Scan") <= 2  # AQE may print the scan reused
    got = {r.check_name: r for r in out.collect()}
    assert all(r.passed and r.n_violations == 0 for r in got.values())


def test_agrees_with_data_quality_audit_checklist(spark, sf_dir):
    from data_engineering_rag_spark.plans import REGISTRY, load

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    suite = [
        Expectation("orders_pk_unique", "unique", columns=("o_orderkey",)),
        Expectation("orders_date_nonnull", "not_null", column="o_orderdate"),
        Expectation(
            "orders_custkey_fk",
            "foreign_key",
            column="o_custkey",
            params={"ref": customer, "ref_column": "c_custkey"},
        ),
    ]
    ours = {r.check_name: r.n_violations for r in run_expectations(orders, suite).collect()}
    audit = {
        r.check_name: r.n_violations
        for r in REGISTRY["data_quality_audit"].spark(spark, sf_dir).collect()
    }
    # pk-unique counts differ in definition (audit counts extra rows,
    # we count ALL rows of violating keys) — both zero on clean data
    assert ours["orders_pk_unique"] == 0 == audit["orders_pk_unique"]
    assert ours["orders_date_nonnull"] == audit["orders_date_nonnull"]
    assert ours["orders_custkey_fk"] == audit["orders_custkey_fk"]
