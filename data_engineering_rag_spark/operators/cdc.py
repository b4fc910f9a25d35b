"""Change-data-capture primitives (EXT family — snapshot maintenance
for a large corpus/warehouse): snapshot diff and SCD Type-2 history
build.

A 100 TB corpus is rebuilt incrementally; the two recurring questions
are "what changed between yesterday's snapshot and today's?"
(``snapshot_diff`` — drives incremental downstream recompute) and
"what did this key look like at time T?" (``scd2_intervals`` — the
validity-interval dimension table that answers as-of lookups with a
range join).

Scale notes: ``snapshot_diff`` is ONE full-outer shuffle join on the
key (both sides hash-partitioned the same way — co-partitioned if the
snapshots are bucketed on the key, in which case no shuffle at all);
``scd2_intervals`` is one shuffle + per-key local sort (a single
window). Neither collects, loops, nor fans out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

CHANGE_TYPE_COL = "change_type"  # 'added' | 'removed' | 'changed' | 'unchanged'


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key across two snapshots of a keyed table.

    Output: ``(*key_cols, change_type, old_<c>..., new_<c>...)`` with
    ``change_type`` ∈ added (key only in ``new``), removed (only in
    ``old``), changed (present in both, any compare col differs,
    null-safely), unchanged (dropped unless ``include_unchanged``).

    Presence is tracked with explicit marker columns, NOT null checks
    on data columns — a legitimately-NULL compare column never
    misclassifies. Comparison is null-safe (``<=>``): NULL → NULL is
    unchanged, NULL → value is changed.
    """
    o = old.select(
        *key_cols,
        F.lit(1).alias("_old_present"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(1).alias("_new_present"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    joined = o.join(n, key_cols, "full")

    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))

    change = (
        F.when(F.col("_old_present").isNull(), F.lit("added"))
        .when(F.col("_new_present").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        *key_cols,
        change.alias(CHANGE_TYPE_COL),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )
    if not include_unchanged:
        out = out.where(F.col(CHANGE_TYPE_COL) != "unchanged")
    return out


def scd2_intervals(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    dedup_consecutive: bool = True,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Build a Type-2 slowly-changing-dimension history from a change
    log: one row per (key, attribute state) with
    ``effective_from`` / ``effective_to`` validity bounds
    (``effective_to`` NULL on the current row) and ``is_current``.

    ``dedup_consecutive`` drops change rows whose attributes equal the
    previous row's (null-safely) — idempotent re-deliveries and
    no-op updates don't open new intervals.

    As-of lookup over the result is a range join:
    ``dim.effective_from <= fact.ts AND (dim.effective_to IS NULL OR
    fact.ts < dim.effective_to)`` — equi on the key, so it stays a
    hash join with a range residual, never a cross product.

    ``tiebreak_cols`` break ordering ties when ``ts_col`` is not unique
    per key (mandatory for determinism on such data — a change log with
    same-timestamp rows has no well-defined history otherwise).
    """
    tb = list(tiebreak_cols or [])
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tb]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    df = changes.select(*key_cols, ts_col, *tb, *attr_cols)
    if dedup_consecutive:
        same = F.lit(True)
        for c in attr_cols:
            same = same & F.col(c).eqNullSafe(F.lag(c).over(w))
        # First row per key: lag is NULL → eqNullSafe False unless the
        # attr is NULL too; guard with an explicit first-row marker.
        first = F.lag(ts_col).over(w).isNull()
        df = df.withColumn("_keep", first | ~same).where(F.col("_keep")).drop("_keep")
    nxt = F.lead(ts_col).over(w)
    return df.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("effective_from"),
        nxt.alias("effective_to"),
        nxt.isNull().alias("is_current"),
    )
