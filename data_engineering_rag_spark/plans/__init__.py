"""Query catalog: every operator from SURVEY.md §2 as a named query.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with
an equivalent ANSI/DuckDB SQL string for the driver's oracle check
(``None`` → rows-only check, used for genuinely non-SQL-expressible
ops). Registration happens at import time via the ``@query`` decorator.

Cross-engine determinism rules (why every aggregate looks the way it
does):
- double sums are order-dependent across engines → aggregate exact
  decimals (``cast(x as decimal(18,k))``), then ``round(cast(.. as
  double), k)`` so both engines emit bit-identical doubles.
- per-row double arithmetic is IEEE-identical when written identically
  in both dialects — safe without decimals.
- any value produced by a float *reduction* (norms, cosines, scores) is
  rounded explicitly in BOTH dialects.
- every computed column is aliased identically in both dialects (the
  driver hash-compares by sorted column name).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    from ..sources.catalog import read_parquet_table

    return read_parquet_table(spark, sf_dir, table)


# Import for side effects: each module registers its queries.
from . import relational  # noqa: E402,F401
from . import rag  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import vectors  # noqa: E402,F401
from . import streaming_q  # noqa: E402,F401
from . import logsq  # noqa: E402,F401
from . import ingestq  # noqa: E402,F401
from . import mediaq  # noqa: E402,F401
