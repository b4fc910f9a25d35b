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


#: Queries that may legitimately return zero rows at SMALL scale
#: (their predicates are data-dependent and non-empty at sf0.1 —
#: verified in the round-7 signal audit). Everything else must emit
#: at least one row: a 0 = 0 oracle match carries no value-hash
#: signal, and three such vacuous queries hid behind green checks
#: until round 7 (good_turing_counts, tfidf_search_pruned,
#: embedding_near_dup_*).
MAY_BE_EMPTY_AT_SMALL_SF = {
    "join_anti_customers_no_orders",   # 1 row at sf0.1
    "q22_notexists_scalar_subquery",   # 1 row at sf0.1
    "token_sort_fingerprints",         # 8 rows at sf0.1
    "q7_volume_shipping",              # 14 rows at sf0.01/sf0.1 (the
                                       # two-nation filter finds no
                                       # qualifying pair at sf0.001)
}


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, con, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    ok, msg = compare(df, con, spec.oracle)
    assert ok, f"{name}: {msg}"
    if name not in MAY_BE_EMPTY_AT_SMALL_SF:
        n = int(msg.split(":")[1])
        assert n > 0, (
            f"{name}: oracle parity is VACUOUS (0 = 0 rows carries no "
            f"value-hash signal); retune the query or whitelist it with "
            f"a measured non-empty scale"
        )


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
