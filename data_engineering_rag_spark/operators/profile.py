"""Whole-table column profiling (EXT family — the data-quality
reconnaissance pass a pipeline runs before trusting a new drop):
per-column null counts, distinct counts, and typed min/max, computed
in ONE scan of the table.

Scale notes: everything is a single ``agg`` over the table — nulls and
min/max are plain map-side-combinable aggregates. Exact distinct
counts over many columns make Catalyst plan an ``Expand`` (one
duplicated stream per distinct aggregate) — correct but multiplies
shuffle volume by the column count, so at 100 TB use
``exact_distinct=False`` (HLL++ ``approx_count_distinct``, one stream,
mergeable sketches). The long-format pivot afterwards operates on a
single driver-sized row (|columns| structs), not on data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    TimestampNTZType,
    TimestampType,
)

_NUM_TYPES = (ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
_TS_TYPES = (TimestampType, TimestampNTZType, DateType)


def column_profile(df: DataFrame, exact_distinct: bool = True) -> DataFrame:
    """Profile every column of ``df`` in one pass.

    Output (one row per column):
    ``col_name, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str, min_ts, max_ts`` — the min/max slot matching the
    column's type family is filled, the others are NULL. Min/max are
    actual stored values (no arithmetic), so they are engine-exact.
    """
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for f in df.schema.fields:
        c = f.name
        aggs.append((F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"_nn_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(c).cast("long").alias(f"_nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(c).cast("long").alias(f"_nd_{c}"))
        aggs.append(F.min(c).alias(f"_mn_{c}"))
        aggs.append(F.max(c).alias(f"_mx_{c}"))
    one = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    null_t = F.lit(None).cast("timestamp")
    structs = []
    for f in df.schema.fields:
        c = f.name
        if isinstance(f.dataType, _NUM_TYPES):
            mn, mx = F.col(f"_mn_{c}").cast("double"), F.col(f"_mx_{c}").cast("double")
            slot = (mn, mx, null_s, null_s, null_t, null_t)
        elif isinstance(f.dataType, _TS_TYPES):
            mn, mx = F.col(f"_mn_{c}").cast("timestamp"), F.col(f"_mx_{c}").cast("timestamp")
            slot = (null_d, null_d, null_s, null_s, mn, mx)
        else:
            mn, mx = F.col(f"_mn_{c}").cast("string"), F.col(f"_mx_{c}").cast("string")
            slot = (null_d, null_d, mn, mx, null_t, null_t)
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n_rows").cast("long").alias("n_rows"),
                F.col(f"_nn_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                slot[0].alias("min_num"),
                slot[1].alias("max_num"),
                slot[2].alias("min_str"),
                slot[3].alias("max_str"),
                slot[4].alias("min_ts"),
                slot[5].alias("max_ts"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
