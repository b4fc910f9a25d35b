"""Snapshot-maintenance queries (EXT family, ``operators/cdc.py``):
CDC diff between two table snapshots and an SCD Type-2 validity-
interval history.

Snapshots are simulated deterministically from ``orders`` (the
testdata has no real multi-version table): snapshot A drops keys
divisible by 97 ("not yet inserted"), snapshot B drops keys divisible
by 89 ("deleted") and mutates price/status on keys divisible by 13/41
("updated"). All mutations are exact double additions / literal
swaps — no rounding needed for engine parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import scd2_intervals, snapshot_diff
from . import load, query

_PRICE_BUMP = 100.0  # exact in binary → engine-identical arithmetic


def _snap_a(o: DataFrame) -> DataFrame:
    return o.where(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def _snap_b(o: DataFrame) -> DataFrame:
    return o.where(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 41 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + _PRICE_BUMP)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )


_SNAP_A_SQL = """
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 97 <> 0
"""

_SNAP_B_SQL = f"""
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 41 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + {_PRICE_BUMP}
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 89 <> 0
"""


@query(
    "snapshot_diff_orders",
    f"""
    WITH snap_a AS ({_SNAP_A_SQL}),
    snap_b AS ({_SNAP_B_SQL}),
    j AS (
      SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
             a.o_orderkey IS NOT NULL AS in_a,
             b.o_orderkey IS NOT NULL AS in_b,
             a.o_orderstatus AS old_o_orderstatus,
             a.o_totalprice AS old_o_totalprice,
             b.o_orderstatus AS new_o_orderstatus,
             b.o_totalprice AS new_o_totalprice
      FROM snap_a a FULL JOIN snap_b b ON a.o_orderkey = b.o_orderkey
    )
    SELECT o_orderkey,
           CASE WHEN NOT in_a THEN 'added'
                WHEN NOT in_b THEN 'removed'
                WHEN old_o_orderstatus IS DISTINCT FROM new_o_orderstatus
                     OR old_o_totalprice IS DISTINCT FROM new_o_totalprice THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           old_o_orderstatus, old_o_totalprice,
           new_o_orderstatus, new_o_totalprice
    FROM j
    WHERE NOT in_a OR NOT in_b
          OR old_o_orderstatus IS DISTINCT FROM new_o_orderstatus
          OR old_o_totalprice IS DISTINCT FROM new_o_totalprice
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two snapshots: one full-outer hash join on the key,
    explicit presence markers, null-safe value compare. The diff (not
    the snapshots) drives downstream incremental recompute — at 100 TB
    the changed set is orders of magnitude smaller than the table.
    Bucketed-on-key snapshots make this join co-partitioned (no
    shuffle at all)."""
    o = load(spark, sf_dir, "orders")
    return snapshot_diff(
        _snap_a(o),
        _snap_b(o),
        key_cols=["o_orderkey"],
        compare_cols=["o_orderstatus", "o_totalprice"],
    )


@query(
    "scd2_order_priority_history",
    """
    WITH changes AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority
      FROM orders
    ),
    dedup AS (
      SELECT *,
             lag(o_orderpriority) OVER w AS prev_attr,
             lag(o_orderdate) OVER w AS prev_ts
      FROM changes
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    kept AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority
      FROM dedup
      WHERE prev_ts IS NULL OR o_orderpriority IS DISTINCT FROM prev_attr
    )
    SELECT o_custkey, o_orderpriority,
           o_orderdate AS effective_from,
           lead(o_orderdate) OVER w2 AS effective_to,
           lead(o_orderdate) OVER w2 IS NULL AS is_current
    FROM kept
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def scd2_order_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: the orders change-log becomes
    per-customer priority validity intervals (consecutive duplicate
    states collapsed, ``effective_to`` NULL on the open row). One
    shuffle on the key + a per-key local sort; as-of lookups against
    the result are equi-joins with a range residual."""
    o = load(spark, sf_dir, "orders")
    return scd2_intervals(
        o,
        key_cols=["o_custkey"],
        ts_col="o_orderdate",
        attr_cols=["o_orderpriority"],
        tiebreak_cols=["o_orderkey"],
    ).drop("o_orderkey")


# --------------------------------------------------------------------------
# Lakehouse MERGE (upsert) emulation — conditional
# matched-update / matched-delete / not-matched-insert over plain
# parquet, spelled as ONE full-outer hash join (no table format
# required; Delta/Iceberg MERGE compiles to the same join shape)
# --------------------------------------------------------------------------


def _merge_source(o: DataFrame) -> DataFrame:
    """Deterministic change feed: every 3rd key, with key%41 rows
    tombstoned ('X' → WHEN MATCHED ... DELETE) and key%13 prices
    bumped (exact double addition → engine-identical)."""
    return o.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 41 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("s_status"),
        F.when(F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + _PRICE_BUMP)
        .otherwise(F.col("o_totalprice"))
        .alias("s_price"),
    )


_MERGE_SOURCE_SQL = f"""
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 41 = 0 THEN 'X' ELSE o_orderstatus END AS s_status,
         CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + {_PRICE_BUMP}
              ELSE o_totalprice END AS s_price
  FROM orders WHERE o_orderkey % 3 = 0
"""


@query(
    "merge_upsert_orders",
    f"""
    WITH t AS ({_SNAP_A_SQL}),
    s AS ({_MERGE_SOURCE_SQL}),
    merged AS (
      SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
             CASE
               WHEN t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL
                    AND s.s_status = 'X' THEN 'delete'
               WHEN t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL THEN 'update'
               WHEN t.o_orderkey IS NULL AND s.s_status = 'X' THEN 'skip'
               WHEN t.o_orderkey IS NULL THEN 'insert'
               ELSE 'keep'
             END AS action,
             CASE WHEN s.o_orderkey IS NOT NULL THEN s.s_status
                  ELSE t.o_orderstatus END AS o_orderstatus,
             CASE WHEN s.o_orderkey IS NOT NULL THEN s.s_price
                  ELSE t.o_totalprice END AS o_totalprice
      FROM t FULL JOIN s ON t.o_orderkey = s.o_orderkey
    )
    SELECT o_orderkey, action, o_orderstatus, o_totalprice
    FROM merged WHERE action IN ('keep', 'update', 'insert')
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation on plain parquet: apply a change feed to
    the snapshot-A target with lakehouse MERGE semantics —
    WHEN MATCHED AND tombstone THEN DELETE, WHEN MATCHED THEN UPDATE,
    WHEN NOT MATCHED AND NOT tombstone THEN INSERT, untouched target
    rows pass through ('keep'). Emits the post-merge table plus the
    per-row action for audit (deletes and tombstone-only source rows
    are filtered out, exactly like a real MERGE result).

    100 TB shape: ONE full-outer hash join on the table key — the same
    physical plan Delta/Iceberg MERGE lowers to (minus their file-level
    pruning, which partitioned parquet gets from partition filters).
    Change feeds are small in practice → AQE turns the join broadcast;
    no windows, no second pass."""
    o = load(spark, sf_dir, "orders")
    t = (
        _snap_a(o)
        .withColumnRenamed("o_orderstatus", "t_status")
        .withColumnRenamed("o_totalprice", "t_price")
        .alias("t")
    )
    s = _merge_source(o).alias("s")
    tk = F.col("t.o_orderkey")
    sk = F.col("s.o_orderkey")
    merged = t.join(s, tk == sk, "full_outer").select(
        F.coalesce(tk, sk).alias("o_orderkey"),
        F.when(tk.isNotNull() & sk.isNotNull() & (F.col("s_status") == "X"), F.lit("delete"))
        .when(tk.isNotNull() & sk.isNotNull(), F.lit("update"))
        .when(tk.isNull() & (F.col("s_status") == "X"), F.lit("skip"))
        .when(tk.isNull(), F.lit("insert"))
        .otherwise(F.lit("keep"))
        .alias("action"),
        F.when(sk.isNotNull(), F.col("s_status")).otherwise(F.col("t_status")).alias(
            "o_orderstatus"
        ),
        F.when(sk.isNotNull(), F.col("s_price")).otherwise(F.col("t_price")).alias(
            "o_totalprice"
        ),
    )
    return merged.where(F.col("action").isin("keep", "update", "insert"))


def nation_view_partial(orders: DataFrame, c: DataFrame, n: DataFrame) -> DataFrame:
    """Mergeable partial of the per-nation revenue view (count + exact
    decimal sum) — the representation both the insert delta and the
    signed-delete delta (negated partials, see tests/test_cdc.py) fold
    into with plain union + re-aggregation."""
    return (
        orders.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        )
    )


@query(
    "ivm_join_delta_merge",
    """
    SELECT n_name,
           cast(count(*) as bigint) AS n_orders,
           round(cast(sum(cast(o_totalprice as decimal(18,2))) as double), 2) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def ivm_join_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view (the materialized-view
    delta rule ΔV = ΔA ⋈ B for an insert batch): the per-nation revenue
    view is built from the PRE-EXISTING orders (o_orderkey % 10 != 0),
    the "newly arrived" batch (% 10 == 0) is joined and aggregated ON
    ITS OWN, and the two partial-aggregate tables merge by union +
    re-aggregation — sums of counts and exact decimal sums are
    mergeable by construction. The oracle computes the view directly
    on the full table, so a pass pins the delta-propagation algebra:
    maintaining the view touches |Δ| rows, never the base fact table.

    Deletes/updates extend the same algebra with signed multiplicities
    (counts and decimal sums subtract exactly) — the reason the
    partials are counts + decimal sums, never averages. At 100 TB the
    base partial table is |nations| rows; each batch costs one
    Δ-join + one tiny merge."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = nation_view_partial(o.where(F.col("o_orderkey") % 10 != 0), c, n)
    delta = nation_view_partial(o.where(F.col("o_orderkey") % 10 == 0), c, n)
    merged = (
        base.unionByName(delta)
        .groupBy("n_name")
        .agg(F.sum("cnt").alias("cnt"), F.sum("rev").alias("rev"))
    )
    return merged.select(
        "n_name",
        F.col("cnt").cast("long").alias("n_orders"),
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
    )
