"""Every registered query with an oracle must match DuckDB exactly —
the local stand-in for the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from data_engineering_rag_spark.plans import REGISTRY

from .oracle_harness import compare, duckdb_conn

ORACLE_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle is not None)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, con, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    ok, msg = compare(df, con, spec.oracle)
    assert ok, f"{name}: {msg}"


ROWS_ONLY = sorted(name for name, spec in REGISTRY.items() if spec.oracle is None)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = REGISTRY[name].spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_approx_distinct_error_bounded(spark, sf_dir):
    """HLL++ sketch: rows-only in the oracle harness, so bound its
    error against the exact counts here (default rsd = 5%)."""
    from data_engineering_rag_spark.plans import load
    import pyspark.sql.functions as F

    li = load(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey").alias("a"),
        F.countDistinct("l_orderkey").alias("e"),
    ).collect()[0]
    assert abs(row.a - row.e) / row.e < 0.10
