"""Declarative data-quality expectations compiled to Spark plans — a
Great-Expectations-style suite runner for the pipeline gate (the
operator behind the ``data_quality_audit`` query's fixed checklist;
this is the reusable, user-facing surface).

Design for scale: every ROW-LOCAL expectation (not_null / in_set /
between / matches_regex) compiles into ONE combinable conditional
aggregation over a single scan — a suite of 20 row-local checks still
reads the table once. Set-level checks compile to their canonical
scalable shapes: ``unique`` → key groupBy (count minus distinct is NOT
enough to locate violators, but the audit only needs counts — one
partial-aggregable pass), ``foreign_key`` → left-anti broadcast/hash
join per referenced table.

No Python runs per row; everything stays in whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One check. ``kind`` ∈ {not_null, in_set, between, matches_regex,
    unique, foreign_key}; row-local kinds use ``column`` (+``params``),
    ``unique`` uses ``columns``, ``foreign_key`` needs ``params`` with
    ``ref`` (DataFrame) and ``ref_column``."""

    name: str
    kind: str
    column: str | None = None
    columns: tuple[str, ...] = ()
    params: dict = field(default_factory=dict)


def _violation_predicate(e: Expectation) -> Column:
    c = F.col(e.column)
    if e.kind == "not_null":
        return c.isNull()
    if e.kind == "in_set":
        return ~c.isin(list(e.params["values"])) | c.isNull()
    if e.kind == "between":
        lo, hi = e.params["low"], e.params["high"]
        return (c < lo) | (c > hi) | c.isNull()
    if e.kind == "matches_regex":
        return ~c.rlike(e.params["pattern"]) | c.isNull()
    raise ValueError(f"not a row-local expectation: {e.kind}")


def run_expectations(df: DataFrame, suite: list[Expectation]) -> DataFrame:
    """Evaluate a suite against ``df``. Returns one row per expectation:
    ``(check_name, n_violations, n_rows, passed)``, in suite order by
    name. Row-local checks share ONE aggregation pass; each ``unique``
    adds one key-groupBy pass; each ``foreign_key`` adds one anti join."""
    results: list[DataFrame] = []

    row_local = [e for e in suite if e.kind in ("not_null", "in_set", "between", "matches_regex")]
    if row_local:
        aggs = [F.count(F.lit(1)).cast("long").alias("_n_rows")]
        for e in row_local:
            aggs.append(
                F.sum(F.when(_violation_predicate(e), 1).otherwise(0))
                .cast("long")
                .alias(f"_v_{e.name}")
            )
        one = df.agg(*aggs)
        stack_args = ", ".join(f"'{e.name}', _v_{e.name}" for e in row_local)
        results.append(
            one.select(
                F.expr(
                    f"stack({len(row_local)}, {stack_args}) AS (check_name, n_violations)"
                ),
                F.col("_n_rows").alias("n_rows"),
            )
        )

    for e in suite:
        if e.kind == "unique":
            cols = list(e.columns or (e.column,))
            grouped = df.groupBy(*[F.col(c) for c in cols]).agg(
                F.count(F.lit(1)).alias("_c")
            )
            results.append(
                grouped.agg(
                    F.coalesce(F.sum(F.when(F.col("_c") > 1, F.col("_c"))), F.lit(0))
                    .cast("long")
                    .alias("n_violations"),
                    F.sum("_c").cast("long").alias("n_rows"),
                ).select(F.lit(e.name).alias("check_name"), "n_violations", "n_rows")
            )
        elif e.kind == "foreign_key":
            ref: DataFrame = e.params["ref"]
            ref_col: str = e.params["ref_column"]
            keys = ref.select(F.col(ref_col).alias(e.column)).distinct()
            # stay lazy: orphan count as an agg over the anti join, total
            # as an agg over the table — one plan, no driver-side counts
            orphans = (
                df.join(F.broadcast(keys), e.column, "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            )
            total = df.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
            results.append(
                orphans.crossJoin(F.broadcast(total)).select(
                    F.lit(e.name).alias("check_name"), "n_violations", "n_rows"
                )
            )

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.select(
        "check_name", "n_violations", "n_rows", (F.col("n_violations") == 0).alias("passed")
    ).orderBy("check_name")
