"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (chunk → TF-IDF → top-k search) on
sf0.001. ``queries()``/``oracle_sql()`` — the full operator catalog
from ``data_engineering_rag_spark.plans`` (SURVEY.md §2 inventory);
every entry with an oracle is hash-checked against DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_engineering_rag_spark.plans import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's signature dataflow (chunk → TF-IDF →
    broadcast-scored top-k search) end-to-end on sf0.001."""
    return REGISTRY["tfidf_search_topk"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
