"""As-of join — an operator Spark lacks natively (task-listed custom
op). For every left row, attach the latest right row with
``right_time <= left_time`` within the same key.

Spark-first implementation (no per-row subquery, no range cross
product): tag both sides, UNION on (key, time, side), and sweep one
``last_value(..., ignoreNulls)`` window ordered by (time, side) —
right rows sort before left rows at equal timestamps, so the
``<=`` (inclusive) semantics fall out of the sort order. One shuffle
on the key, linear in |L|+|R|; the classic sort-merge as-of shape
(what kdb/QuestDB/DuckDB do natively, expressed as a window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_value_cols: list[str],
) -> DataFrame:
    """Left rows + ``right_value_cols`` of the as-of right match
    (NULLs when no right row precedes). Column names must not collide
    between sides except ``key``."""
    left_cols = left.columns
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in right_value_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"_rv_{c}") for c in right_value_cols],
    )
    merged = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = merged.select(
        "_side",
        *left_cols,
        *[
            F.last(F.col(f"_rv_{c}"), ignorenulls=True).over(w).alias(c)
            for c in right_value_cols
        ],
    )
    return swept.where(F.col("_side") == 1).drop("_side")
