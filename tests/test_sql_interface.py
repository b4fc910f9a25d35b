"""User-facing SQL entry point: register the catalog as views and run
raw Spark SQL — the 'switch from the reference' interface."""

from __future__ import annotations

from data_engineering_rag_spark.sources.catalog import register_temp_views


def test_spark_sql_over_catalog(spark, sf_dir):
    register_temp_views(spark, sf_dir)
    row = spark.sql(
        """
        SELECT n_name, count(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC, n_name LIMIT 1
        """
    ).collect()[0]
    assert row.n > 0 and isinstance(row.n_name, str)

    # events view went through the ns->us normalization path
    ts = spark.sql("SELECT max(ts) AS m FROM events").collect()[0].m
    assert ts is not None
