"""As-of join — an operator Spark lacks natively (task-listed custom
op). For every left row, attach the right row nearest in time within
the same key, in one of three directions:

- ``backward`` (default): latest right with ``right_time <= left_time``
- ``forward``: earliest right with ``right_time >= left_time``
- ``nearest``: closer of the two; exact ties prefer backward

Spark-first implementation (no per-row subquery, no range cross
product): tag both sides, UNION on (key, time, side), and sweep with
``last_value(..., ignoreNulls)`` / ``first_value`` windows ordered so
that equal timestamps respect the inclusive bound — the classic
sort-merge as-of shape (what kdb/QuestDB/DuckDB do natively),
expressed as window functions. One shuffle on the key, linear in
|L|+|R|; ``nearest`` runs both sweeps over the same exchange (two
local sorts, one shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DIRECTIONS = ("backward", "forward", "nearest")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left rows + ``right_value_cols`` of the as-of right match
    (NULLs when no right row qualifies). Column names must not collide
    between sides except ``key``."""
    if direction not in DIRECTIONS:
        raise ValueError(f"direction must be one of {DIRECTIONS}, got {direction!r}")
    left_cols = left.columns
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in right_value_cols],
        F.lit(None).cast(right.schema[right_time].dataType).alias("_rt"),
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"_rv_{c}") for c in right_value_cols],
        F.col(right_time).alias("_rt"),
    )
    merged = l_tagged.unionByName(r_tagged)

    # Backward sweep: right (side 0) sorts BEFORE left (side 1) at equal
    # _t, so `last` over (-inf, current] includes an equal-time right →
    # inclusive <=. Forward sweep: order side DESC so right sorts AFTER
    # left at equal _t and `first` over [current, +inf) includes it → >=.
    w_back = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    def back(c):  # noqa: ANN001
        return F.last(F.col(c), ignorenulls=True).over(w_back)

    def fwd(c):  # noqa: ANN001
        return F.first(F.col(c), ignorenulls=True).over(w_fwd)

    if direction == "backward":
        picked = [back(f"_rv_{c}").alias(c) for c in right_value_cols]
    elif direction == "forward":
        picked = [fwd(f"_rv_{c}").alias(c) for c in right_value_cols]
    else:  # nearest
        bt, ft = back("_rt"), fwd("_rt")
        lt = F.col("_t").cast("double")
        use_back = F.when(ft.isNull(), F.lit(True)).otherwise(
            bt.isNotNull()
            & ((lt - bt.cast("double")) <= (ft.cast("double") - lt))
        )
        picked = [
            F.when(use_back, back(f"_rv_{c}")).otherwise(fwd(f"_rv_{c}")).alias(c)
            for c in right_value_cols
        ]
    swept = merged.select("_side", *left_cols, *picked)
    return swept.where(F.col("_side") == 1).drop("_side")
