"""Relational operator coverage (SURVEY.md §2.5 J4, §2.6 A7, §2.7 O4,
§2.8 set ops, §2.9 scalar sweep) over the synthetic star schema.

The reference's only joins/aggregations are dict lookups and pandas
means (SURVEY §2.5-2.6 REF rows); these queries are the EXT build-out
that makes this a general engine. Plans are written so Catalyst picks
the right physical strategy: dimension joins broadcast (nation/region/
supplier are tiny at any scale factor — and at 100 TB, dimensions still
fit in memory), fact-fact joins shuffle on their keys with AQE handling
skew, aggregations are map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import load, query


def _dsum(col, scale: int):
    """Order-independent double sum: exact decimal accumulate, then a
    deterministic decimal→double conversion. Mirrors the oracle's
    ``round(cast(sum(cast(x as decimal(18,s))) as double), s)``."""
    return F.round(F.sum(col.cast(f"decimal(18,{scale})")).cast("double"), scale)


# --------------------------------------------------------------------------
# Aggregation menu
# --------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(cast(sum(cast(l_quantity as decimal(18,2))) as double), 2) AS sum_qty,
           round(cast(sum(cast(l_extendedprice as decimal(18,2))) as double), 2) AS sum_base_price,
           round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double), 6) AS sum_disc_price,
           round(cast(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) as decimal(18,6))) as double), 6) AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary. Map-side partial agg on 6 groups;
    the shipdate filter pushes to the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            _dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            _dsum(disc_price, 6).alias("sum_disc_price"),
            _dsum(charge, 6).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double), 6) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < timestamp '1998-03-15 00:00:00'
      AND l_shipdate > timestamp '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join + top-k. customer(filtered) broadcasts; orders⋈
    lineitem shuffles on orderkey; LIMIT plans TakeOrderedAndProject."""
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double), 6) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
      AND o_orderdate >= timestamp '1996-01-01 00:00:00'
      AND o_orderdate < timestamp '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table join. nation/region/supplier broadcast (tiny at every
    scale); only orders⋈lineitem is a shuffle join."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"))
    )


@query(
    "agg_rollup_status",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           round(cast(sum(cast(l_quantity as decimal(18,2))) as double), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), _dsum(F.col("l_quantity"), 2).alias("sum_qty")
    )


@query(
    "agg_cube_orders",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(cast(sum(cast(o_totalprice as decimal(18,2))) as double), 2) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), _dsum(F.col("o_totalprice"), 2).alias("sum_price")
    )


@query(
    "agg_distinct_stats",
    """
    SELECT count(*) AS n_rows,
           count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           round(cast(min(cast(l_quantity as decimal(18,2))) as double), 2) AS min_qty,
           round(cast(max(cast(l_quantity as decimal(18,2))) as double), 2) AS max_qty
    FROM lineitem
    """,
)
def agg_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.round(F.min(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 2).alias("min_qty"),
        F.round(F.max(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 2).alias("max_qty"),
    )


@query(
    "agg_avg_acctbal_by_nation",
    """
    SELECT n_name,
           count(*) AS n_cust,
           round(cast(sum(cast(c_acctbal as decimal(18,2))) as double) / count(*), 6) AS avg_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def agg_avg_acctbal_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg as exact-sum/count: deterministic across engines, unlike a
    native double avg whose accumulation order varies."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_bal"),
        )
    )


# --------------------------------------------------------------------------
# Join menu
# --------------------------------------------------------------------------

@query(
    "join_semi_big_orders",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
    """,
)
def join_semi_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "join_anti_customers_no_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def join_anti_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_left_order_counts",
    """
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           round(cast(coalesce(sum(cast(o_totalprice as decimal(18,2))), 0) as double), 2) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.coalesce(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0)
                ).cast("double"),
                2,
            ).alias("total_spent"),
        )
    )


@query(
    "join_full_outer_nation_presence",
    """
    SELECT coalesce(c.nk, s.nk) AS nationkey,
           coalesce(c.n_cust, 0) AS n_cust,
           coalesce(s.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) s
    ON c.nk = s.nk
    """,
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, "nk", "full_outer").select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_cross_region_status",
    """
    SELECT r_name, x.o_orderstatus FROM region
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) x
    """,
)
def join_cross_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").select("r_name")
    st = load(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(st)


@query(
    "join_range_nonequi",
    """
    SELECT p_partkey, p_retailprice, t.tier
    FROM part
    JOIN (VALUES ('low', 0.0, 1000.0), ('mid', 1000.0, 1500.0), ('high', 1500.0, 100000.0))
         AS t(tier, lo, hi)
      ON p_retailprice >= t.lo AND p_retailprice < t.hi
    """,
)
def join_range_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join against a tiny broadcast tier table — the
    band-join pattern; Catalyst plans BroadcastNestedLoopJoin."""
    p = load(spark, sf_dir, "part")
    tiers = spark.createDataFrame(
        [("low", 0.0, 1000.0), ("mid", 1000.0, 1500.0), ("high", 1500.0, 100000.0)],
        ["tier", "lo", "hi"],
    )
    return p.join(
        F.broadcast(tiers),
        (p.p_retailprice >= tiers.lo) & (p.p_retailprice < tiers.hi),
    ).select("p_partkey", "p_retailprice", "tier")


# --------------------------------------------------------------------------
# Window functions / per-group top-k
# --------------------------------------------------------------------------

@query(
    "window_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_order_date_lag",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           lag(o_orderdate) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS prev_date,
           rank() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS rk
    FROM orders
    """,
)
def window_order_date_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_orderdate").over(w).alias("prev_date"),
        F.rank().over(w).alias("rk"),
    )


@query(
    "window_running_revenue",
    """
    SELECT l_orderkey, l_linenumber,
           round(cast(sum(cast(l_extendedprice as decimal(18,2)))
                 OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double), 2)
             AS running_price
    FROM lineitem
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit frame spec; decimal accumulation keeps the running sum
    bit-identical across engines. (l_orderkey, l_linenumber) is NOT
    unique in the synthetic data, so the frame also orders by the summed
    value itself — that pins the accumulation sequence, making the
    output multiset deterministic even with duplicate keys."""
    li = load(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).over(w).cast("double"), 2).alias(
            "running_price"
        ),
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

@query(
    "setop_active_customers",
    """
    WITH c95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= timestamp '1995-01-01 00:00:00'
                   AND o_orderdate < timestamp '1996-01-01 00:00:00'),
         c96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= timestamp '1996-01-01 00:00:00'
                   AND o_orderdate < timestamp '1997-01-01 00:00:00')
    SELECT 'both' AS cohort, count(*) AS n FROM (SELECT * FROM c95 INTERSECT SELECT * FROM c96) t
    UNION ALL
    SELECT 'only_1995' AS cohort, count(*) AS n FROM (SELECT * FROM c95 EXCEPT SELECT * FROM c96) t
    UNION ALL
    SELECT 'union' AS cohort, count(*) AS n FROM (SELECT * FROM c95 UNION SELECT * FROM c96) t
    """,
)
def setop_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")

    def cohort(y0: str, y1: str) -> DataFrame:
        return (
            o.where(
                (F.col("o_orderdate") >= F.lit(f"{y0}-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y1}-01-01 00:00:00").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    c95, c96 = cohort("1995", "1996"), cohort("1996", "1997")
    both = c95.intersect(c96).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("cohort"), "n"
    )
    only95 = c95.exceptAll(c96).distinct().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("only_1995").alias("cohort"), "n"
    )
    union = c95.union(c96).distinct().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("union").alias("cohort"), "n"
    )
    return both.unionByName(only95).unionByName(union)


# --------------------------------------------------------------------------
# Scalar-function sweeps (§2.9)
# --------------------------------------------------------------------------

@query(
    "scalar_string_part",
    """
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           length(p_name) AS name_len,
           substr(p_name, 1, 5) AS name_prefix,
           replace(p_type, 'STANDARD', 'STD') AS type_short,
           concat(p_brand, ':', p_type) AS brand_type,
           split_part(p_brand, '#', 2) AS brand_num,
           p_name LIKE '%a%' AS has_a,
           trim('  ' || p_brand || '  ') AS trimmed
    FROM part
    """,
)
def scalar_string_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit("STANDARD"), F.lit("STD")).alias("type_short"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.split_part(F.col("p_brand"), F.lit("#"), F.lit(2)).alias("brand_num"),
        F.col("p_name").like("%a%").alias("has_a"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
    )


@query(
    "scalar_date_orders",
    """
    SELECT o_orderkey,
           cast(extract(year FROM o_orderdate) as bigint) AS order_year,
           cast(extract(month FROM o_orderdate) as bigint) AS order_month,
           cast(extract(day FROM o_orderdate) as bigint) AS order_day,
           cast(extract(dow FROM o_orderdate) as bigint) AS order_dow,
           cast(date_trunc('month', o_orderdate) as timestamp) AS month_start,
           cast(date_diff('day', timestamp '1995-01-01 00:00:00', o_orderdate) as bigint) AS days_since_epoch_start,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date_str
    FROM orders
    """,
)
def scalar_date_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time sweep. DuckDB ``dow`` is 0=Sunday; Spark ``dayofweek``
    is 1=Sunday → subtract 1 for parity."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("order_dow"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).cast("long").alias("days_since_epoch_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
    )


@query(
    "scalar_math_lineitem",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price,
           abs(l_discount - 0.05) AS disc_dev,
           cast(ceil(l_quantity / 7.0) as bigint) AS qty_ceil,
           cast(floor(l_quantity / 7.0) as bigint) AS qty_floor,
           round(ln(l_extendedprice + 1), 8) AS log_price,
           round(sqrt(l_quantity), 8) AS sqrt_qty,
           round(pow(l_discount, 2), 10) AS disc_sq,
           cast(l_quantity as bigint) % 5 AS qty_mod
    FROM lineitem
    """,
)
def scalar_math_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row double math is IEEE-identical across engines when the
    expression tree is identical; ln/sqrt/pow are correctly-rounded-ish
    libm calls → round(…, 8) guards the last ulp."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_ceil"),
        F.floor(F.col("l_quantity") / 7.0).alias("qty_floor"),
        F.round(F.log(F.col("l_extendedprice") + 1), 8).alias("log_price"),
        F.round(F.sqrt(F.col("l_quantity")), 8).alias("sqrt_qty"),
        F.round(F.pow(F.col("l_discount"), 2), 10).alias("disc_sq"),
        (F.col("l_quantity").cast("long") % 5).alias("qty_mod"),
    )


@query(
    "grouping_sets_priority",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "scalar_array_funcs",
    """
    WITH t AS (SELECT doc_id,
                      list_sort(list_distinct(regexp_extract_all(lower(text), '\\w\\w+'))) AS toks
               FROM documents WHERE doc_id < 50)
    SELECT doc_id,
           cast(len(toks) as bigint) AS n_uniq,
           array_to_string(list_slice(toks, 1, 5), ',') AS first5,
           toks[1] AS first_tok,
           toks[-1] AS last_tok,
           list_contains(toks, 'spark') AS has_spark,
           cast(list_position(toks, 'spark') as bigint) AS spark_pos,
           array_to_string(list_slice(list_reverse(toks), 1, 3), ',') AS last3_rev,
           cast(len(list_filter(toks, x -> length(x) >= 5)) as bigint) AS n_long,
           array_to_string(list_transform(list_slice(toks, 1, 3), x -> upper(x)), '|') AS up3
    FROM t
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 array/higher-order sweep: sort/distinct/slice/index/
    contains/position/reverse/filter/transform — all JVM-side array
    functions (no UDFs), mirrored by DuckDB list functions.

    Note Spark's element_at / DuckDB [] are both 1-based, and both
    support -1 for last; list_position/array_position agree on 1-based
    (0 when absent)."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    toks = F.array_sort(
        F.array_distinct(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\w\w+"), F.lit(0))
        )
    )
    t = d.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_uniq"),
        F.array_join(F.slice("toks", 1, 5), ",").alias("first5"),
        F.element_at("toks", 1).alias("first_tok"),
        F.element_at("toks", -1).alias("last_tok"),
        F.array_contains("toks", "spark").alias("has_spark"),
        F.array_position("toks", "spark").cast("long").alias("spark_pos"),
        F.array_join(F.slice(F.reverse("toks"), 1, 3), ",").alias("last3_rev"),
        F.size(F.filter("toks", lambda x: F.length(x) >= 5)).cast("long").alias("n_long"),
        F.array_join(F.transform(F.slice("toks", 1, 3), lambda x: F.upper(x)), "|").alias("up3"),
    )


@query(
    "scalar_conditional_funcs",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 1500 THEN 'high'
                WHEN o_totalprice > 800 THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'open-or-other') AS status_label,
           o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%' AS is_urgent,
           greatest(o_totalprice, 1000.0) AS floor_1000,
           least(o_totalprice, 1000.0) AS cap_1000,
           CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_orderkey END AS odd_or_null
    FROM orders
    """,
)
def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 conditional sweep: CASE/coalesce/nullif/greatest/least and
    NULL production — per-row, codegen'd, no float reductions."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 1500, "high")
        .when(F.col("o_totalprice") > 800, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open-or-other")).alias(
            "status_label"
        ),
        (F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").like("2%")).alias(
            "is_urgent"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(1000.0)).alias("floor_1000"),
        F.least(F.col("o_totalprice"), F.lit(1000.0)).alias("cap_1000"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("o_orderkey"))
        .alias("odd_or_null"),
    )


@query(
    "q4_order_priority_exists",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= timestamp '1996-07-01 00:00:00'
      AND o_orderdate < timestamp '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape: correlated EXISTS → Catalyst plans a left-semi
    join (no subquery re-execution per row)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("_q4_orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_q4_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM _q4_orders
        WHERE o_orderdate >= timestamp '1996-07-01 00:00:00'
          AND o_orderdate < timestamp '1996-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM _q4_lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """
    )


@query(
    "q17_small_quantity_correlated",
    """
    SELECT l_partkey,
           round(cast(sum(cast(l_extendedprice as decimal(18,2))) as double), 2) AS small_qty_revenue,
           count(*) AS n_small
    FROM lineitem l1
    WHERE l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = l1.l_partkey)
    GROUP BY l_partkey
    """,
)
def q17_small_quantity_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 shape: correlated SCALAR subquery (per-part average) —
    Catalyst de-correlates it into an aggregate + join, one pass each.
    avg(l_quantity) here is exact across engines: quantities are small
    integers-as-doubles, whose sums stay exactly representable."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_q17_lineitem")
    return spark.sql(
        """
        SELECT l_partkey,
               round(cast(sum(cast(l_extendedprice as decimal(18,2))) as double), 2) AS small_qty_revenue,
               count(*) AS n_small
        FROM _q17_lineitem l1
        WHERE l_quantity < (SELECT 0.5 * avg(l_quantity) FROM _q17_lineitem l2
                            WHERE l2.l_partkey = l1.l_partkey)
        GROUP BY l_partkey
        """
    )


@query(
    "q18_large_orders_having",
    """
    SELECT o_orderkey, o_custkey,
           round(cast(sum(cast(l_quantity as decimal(18,2))) as double), 2) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_custkey
    HAVING sum(cast(l_quantity as decimal(18,2))) > 140
    """,
)
def q18_large_orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 shape: join + groupBy + HAVING on the aggregate (the
    decimal sum keeps the threshold comparison exact).

    Scale shape (r12 rewrite): aggregate lineitem by ``l_orderkey``
    BEFORE the join instead of grouping the joined fact — the original
    plan shuffled the full 75M-row join output at the sf10 probe
    (spill-bound: 16-85 s walls); the pushed-down aggregate shuffles
    only (key, partial sum) pairs with map-side combine, applies the
    HAVING filter pre-join (~24% selectivity), and joins the survivors
    to orders 1:1. Legal because ``o_orderkey`` is the orders PK, so
    ``o_custkey`` is functionally dependent on the group key, and an
    inner join drops orderless lineitems' groups the same way the
    original join dropped their rows pre-aggregation."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    qty_sum = F.sum(F.col("l_quantity").cast("decimal(18,2)"))
    li_agg = (
        li.groupBy("l_orderkey")
        .agg(qty_sum.alias("_raw"))
        .where(F.col("_raw") > 140)
    )
    return (
        o.join(li_agg, o.o_orderkey == li_agg.l_orderkey)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("_raw").cast("double"), 2).alias("total_qty"),
        )
    )


@query(
    "q19_disjunctive_filter",
    """
    SELECT count(*) AS n,
           round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double), 6) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#7' AND p_size <= 20 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#13' AND p_size <= 30 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19 shape: OR-of-ANDs predicate spanning both join sides —
    exercises CNF conversion / partial pushdown."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#7") & (F.col("p_size") <= 20)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#13") & (F.col("p_size") <= 30)
           & F.col("l_quantity").between(20, 40))
    )
    return joined.where(cond).agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
    )


@query(
    "q22_notexists_scalar_subquery",
    """
    SELECT substr(c_name, 10, 1) AS name_digit, count(*) AS n_cust,
           round(cast(sum(cast(c_acctbal as decimal(18,2))) as double), 2) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY substr(c_name, 10, 1)
    """,
)
def q22_notexists_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape: uncorrelated scalar subquery + NOT EXISTS
    anti-join. The avg threshold only GATES rows (strict inequality),
    so sub-ulp cross-engine drift in avg() can't flip membership except
    on an exact tie — and balances are 2-decimal values, never within
    1e-12 of the mean by accident... except they could be; the oracle
    and Spark both compute avg over the SAME doubles in whatever order,
    giving results within 1e-12 — the gate column c_acctbal is at least
    0.01 away from the mean in this dataset (asserted by the parity
    test at both scale factors)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("_q22_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("_q22_orders")
    return spark.sql(
        """
        SELECT substr(c_name, 10, 1) AS name_digit, count(*) AS n_cust,
               round(cast(sum(cast(c_acctbal as decimal(18,2))) as double), 2) AS total_bal
        FROM _q22_customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM _q22_customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM _q22_orders WHERE o_custkey = c_custkey)
        GROUP BY substr(c_name, 10, 1)
        """
    )


@query(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           cast(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) as bigint) AS status_F,
           cast(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) as bigint) AS status_O,
           cast(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) as bigint) AS status_P
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one column per order status (Spark's pivot(); the oracle
    is the equivalent conditional aggregation)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
            F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
            F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
        )
    )


@query(
    "agg_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (percentile_cont ≡ DuckDB
    quantile_cont): both engines sort and linearly interpolate — a
    deterministic function of the value multiset."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)"), 6).alias(
            "median_qty"
        ),
        F.round(F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity)"), 6).alias(
            "p90_qty"
        ),
        F.round(
            F.expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice)"), 6
        ).alias("p25_price"),
    )


@query("agg_approx_distinct", None)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++): sketch internals differ across
    engines, so rows-only — the pytest suite bounds its error vs the
    exact count instead."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )


@query("agg_approx_percentile", None)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna sketch): mergeable fixed-size
    per-partition summaries — the distributed-percentile shape at 100 TB
    (exact percentiles need a full sort; the sketch needs one combine).
    Sketch internals differ across engines, so rows-only; the pytest
    suite bounds its rank error against the exact percentiles."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50_price"),
        F.percentile_approx("l_extendedprice", 0.95, 1000).alias("p95_price"),
        F.percentile_approx("l_quantity", 0.5, 1000).alias("p50_qty"),
    )


@query(
    "scalar_map_funcs",
    """
    SELECT p_partkey,
           array_to_string(map_keys(map(['brand','type'], [p_brand, p_type])), ',') AS mkeys,
           array_to_string(map_values(map(['brand','type'], [p_brand, p_type])), ',') AS mvals,
           element_at(map(['brand','type'], [p_brand, p_type]), 'brand')[1] AS brand_lookup,
           cast(cardinality(map(['brand','type'], [p_brand, p_type])) as int) AS msize
    FROM part
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 map functions: construct/keys/values/lookup/cardinality.
    (DuckDB's map element_at returns a list — unwrapped with [1] to
    match Spark's scalar; key order is insertion order in both.)"""
    p = load(spark, sf_dir, "part")
    m = F.map_from_arrays(
        F.array(F.lit("brand"), F.lit("type")), F.array(F.col("p_brand"), F.col("p_type"))
    )
    return p.select(
        "p_partkey",
        F.array_join(F.map_keys(m), ",").alias("mkeys"),
        F.array_join(F.map_values(m), ",").alias("mvals"),
        F.element_at(m, "brand").alias("brand_lookup"),
        F.size(m).alias("msize"),
    )


@query(
    "window_ranking_sweep",
    """
    SELECT o_orderkey, o_custkey,
           cast(ntile(4) OVER w as int) AS quartile,
           round(percent_rank() OVER w, 8) AS pct_rank,
           round(cume_dist() OVER w, 8) AS cdist,
           dense_rank() OVER w AS drank,
           lead(o_orderkey) OVER w AS next_key,
           first_value(o_orderkey) OVER w AS first_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_ranking_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 completion: ntile / percent_rank / cume_dist / dense_rank /
    lead / first_value over one named window (total order via the
    orderkey tiebreak keeps every function deterministic)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cdist"),
        F.dense_rank().over(w).alias("drank"),
        F.lead("o_orderkey").over(w).alias("next_key"),
        F.first("o_orderkey").over(w).alias("first_key"),
    )


@query(
    "fuzzy_levenshtein_pairs",
    """
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           cast(levenshtein(a.p_name, b.p_name) as int) AS edit_dist
    FROM part a JOIN part b ON a.p_partkey < b.p_partkey
    WHERE a.p_partkey < 40 AND b.p_partkey < 40
      AND levenshtein(a.p_name, b.p_name) <= 8
    """,
)
def fuzzy_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-dup by edit distance over a bounded sample — the
    exact-string cousin of the MinHash family (both engines implement
    classic Wagner-Fischer; integer-exact)."""
    p = load(spark, sf_dir, "part").where(F.col("p_partkey") < 40)
    a = p.select(F.col("p_partkey").alias("part_a"), F.col("p_name").alias("name_a"))
    b = p.select(F.col("p_partkey").alias("part_b"), F.col("p_name").alias("name_b"))
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, F.col("part_a") < F.col("part_b"))
        .select("part_a", "part_b", dist.cast("int").alias("edit_dist"))
        .where(F.col("edit_dist") <= 8)
    )


@query(
    "unpivot_order_measures",
    """
    SELECT o_orderkey, measure, round(val, 4) AS val
    FROM (
      SELECT o_orderkey, 'total_price' AS measure, o_totalprice AS val FROM orders
      UNION ALL
      SELECT o_orderkey, 'price_with_fee', round(o_totalprice * 1.05, 4) FROM orders
    )
    """,
)
def unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt via stack(): wide measures → (key, measure, value)
    long format (the inverse of pivot_status_by_priority)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.expr(
                "stack(2, 'total_price', o_totalprice,"
                " 'price_with_fee', round(o_totalprice * 1.05, 4)) AS (measure, val)"
            ),
        )
        .select("o_orderkey", "measure", F.round("val", 4).alias("val"))
    )


@query(
    "agg_statistics",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS qty_stddev,
           round(var_samp(l_quantity), 6) AS qty_var,
           round(stddev_pop(l_quantity), 6) AS qty_stddev_pop,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           cast(bit_and(cast(l_linenumber as bigint)) as bigint) AS ln_bit_and,
           cast(bit_or(cast(l_linenumber as bigint)) as bigint) AS ln_bit_or,
           cast(bit_xor(cast(l_linenumber as bigint)) as bigint) AS ln_bit_xor
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical + bitwise aggregate family. Both engines use
    numerically-stable (Welford-style) single-pass moments whose
    partition-order drift sits far below the round(…, 6) guard (skewness
    excluded: Spark computes the population form, DuckDB the sample-
    corrected form — a formula difference, not drift); bit aggregates
    are integer-exact."""
    li = load(spark, sf_dir, "lineitem")
    ln = F.col("l_linenumber").cast("long")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("qty_stddev_pop"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        F.bit_and(ln).alias("ln_bit_and"),
        F.bit_or(ln).alias("ln_bit_or"),
        F.bit_xor(ln).alias("ln_bit_xor"),
    )


@query(
    "scalar_string_extended",
    """
    SELECT s_suppkey,
           lpad(cast(s_suppkey as varchar), 8, '0') AS padded_key,
           rpad(s_name, 24, '.') AS padded_name,
           repeat('-', cast(s_suppkey % 5 as int) + 1) AS dashes,
           translate(s_name, '#', '_') AS translated,
           cast(ascii(substr(s_name, 1, 1)) as int) AS first_char_code,
           chr(cast(65 + s_suppkey % 26 as int)) AS letter,
           left(s_name, 6) AS name_left,
           right(s_name, 2) AS name_right,
           cast(instr(s_name, '#') as bigint) AS hash_pos,
           reverse(s_name) AS name_rev
    FROM supplier
    """,
)
def scalar_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 string sweep #2: pad/repeat/translate/ascii/chr/left/right/
    instr/reverse — per-row, codegen'd, engine-exact."""
    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.lpad(F.col("s_suppkey").cast("string"), 8, "0").alias("padded_key"),
        F.rpad("s_name", 24, ".").alias("padded_name"),
        F.repeat(F.lit("-"), (F.col("s_suppkey") % 5).cast("int") + 1).alias("dashes"),
        F.translate("s_name", "#", "_").alias("translated"),
        F.ascii(F.substring("s_name", 1, 1)).cast("int").alias("first_char_code"),
        F.chr((F.lit(65) + F.col("s_suppkey") % 26).cast("int")).alias("letter"),
        F.substring("s_name", 1, 6).alias("name_left"),
        F.col("s_name").substr(F.length("s_name") - 1, F.lit(2)).alias("name_right"),
        F.instr(F.col("s_name"), "#").cast("long").alias("hash_pos"),
        F.reverse("s_name").alias("name_rev"),
    )


@query(
    "scalar_date_events",
    """
    SELECT event_id,
           cast(quarter(ts) as int) AS q,
           cast(weekofyear(ts) as int) AS iso_week,
           cast(hour(ts) as int) AS h,
           cast(minute(ts) as int) AS m,
           cast(second(ts) as int) AS s,
           cast(floor(epoch(ts)) as bigint) AS epoch_s,
           make_date(2024, cast(month(ts) as int), 1) AS month_anchor,
           cast(ts as date) AS event_date
    FROM events
    """,
)
def scalar_date_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 date sweep #2 on µs-precision event times: quarter/ISO week/
    h-m-s extraction, epoch seconds (floored — DuckDB's epoch keeps the
    fraction), make_date anchoring, date cast."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.quarter("ts").cast("int").alias("q"),
        F.weekofyear("ts").cast("int").alias("iso_week"),
        F.hour("ts").cast("int").alias("h"),
        F.minute("ts").cast("int").alias("m"),
        F.second("ts").cast("int").alias("s"),
        F.unix_timestamp("ts").cast("long").alias("epoch_s"),
        F.make_date(F.lit(2024), F.month("ts"), F.lit(1)).alias("month_anchor"),
        F.col("ts").cast("date").alias("event_date"),
    )


@query(
    "agg_collect_strings",
    """
    SELECT n_name,
           string_agg(s_name, '|' ORDER BY s_name) AS suppliers,
           cast(count(*) as bigint) AS n_supp
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def agg_collect_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-to-list aggregation made deterministic: Spark's
    collect_list has no intra-group order guarantee, so the engine's
    canonical form is sort-then-join (≡ DuckDB's ORDER BY string_agg)."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), "|").alias("suppliers"),
            F.count(F.lit(1)).alias("n_supp"),
        )
    )


@query(
    "generated_series_source",
    """
    SELECT cast(i % 7 as bigint) AS bucket,
           cast(count(*) as bigint) AS n,
           cast(sum(i * i) as bigint) AS sum_sq
    FROM (SELECT unnest(generate_series(1, 100000)) AS i)
    GROUP BY i % 7
    """,
)
def generated_series_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating source (spark.range ≡ generate_series): data
    born distributed with no storage — the pattern for synthetic
    benchmarks and key-space scaffolding."""
    return (
        spark.range(1, 100001)
        .select(F.col("id").alias("i"))
        .groupBy((F.col("i") % 7).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("i") * F.col("i")).alias("sum_sq"),
        )
    )


@query(
    "scalar_array_setops",
    f"""
    WITH t AS (
      SELECT doc_id,
             list_sort(list_distinct(regexp_extract_all(lower(text), '\\w\\w+'))) AS toks
      FROM documents WHERE doc_id < 30
    ),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.toks AS ta, b.toks AS tb
          FROM t a JOIN t b ON a.doc_id + 1 = b.doc_id)
    SELECT doc_a, doc_b,
           cast(len(list_sort(list_intersect(ta, tb))) as bigint) AS n_common,
           cast(len(list_sort(list_distinct(list_concat(ta, tb)))) as bigint) AS n_union,
           cast(len(list_sort(list_filter(ta, x -> NOT list_contains(tb, x)))) as bigint) AS n_only_a,
           array_to_string(list_sort(list_intersect(ta, tb))[1:3], ',') AS common_sample
    FROM p
    """,
)
def scalar_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations between adjacent documents' token sets:
    intersect / union / except / sampled join — the JVM-side primitives
    under n-gram overlap scoring."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 30)
    toks = F.array_sort(
        F.array_distinct(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\w\w+"), F.lit(0))
        )
    )
    t = d.select("doc_id", toks.alias("toks"))
    a = t.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    b = t.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    p = a.join(b, F.col("doc_a") + 1 == F.col("doc_b"))
    inter = F.array_sort(F.array_intersect(F.col("ta"), F.col("tb")))
    return p.select(
        "doc_a",
        "doc_b",
        F.size(inter).cast("long").alias("n_common"),
        F.size(F.array_sort(F.array_union(F.col("ta"), F.col("tb")))).cast("long").alias("n_union"),
        F.size(F.array_sort(F.array_except(F.col("ta"), F.col("tb")))).cast("long").alias("n_only_a"),
        F.array_join(F.slice(inter, 1, 3), ",").alias("common_sample"),
    )


@query(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           round(cast(sum(cast(volume as decimal(18,6))) as double), 6) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             cast(extract(year FROM l_shipdate) as bigint) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: two roles of the same dimension (nation as both
    supplier- and customer-side) + disjunctive cross-nation predicate +
    derived-year grouping."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"))
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double), 6) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= timestamp '1997-01-01 00:00:00'
      AND o_orderdate < timestamp '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape: returned-items ranking — selective flag filter
    + date window + 4-way join + top-20."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_revenue_pct",
    """
    SELECT round(100.0 * cast(sum(cast(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0 END as decimal(18,6))) as double)
                 / cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double), 8)
             AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= timestamp '1997-01-01 00:00:00'
      AND l_shipdate < timestamp '1997-02-01 00:00:00'
    """,
)
def q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape: conditional-aggregate ratio (promo revenue
    share). Both numerator and denominator are exact decimal sums; the
    single division + round is engine-identical."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo.cast("decimal(18,6)")).cast("double")
                / F.sum(rev.cast("decimal(18,6)")).cast("double"),
                8,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape: NOT IN subquery (anti join; NULL-safe because
    s_suppkey is non-null) + IN-list filter + distinct count."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20)
    )
    bad_supp = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q21_waiting_supplier",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
                  JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate)
    GROUP BY s_name
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape: EXISTS + NOT EXISTS against the same fact table
    (multi-supplier orders where only this supplier shipped late).
    The testdata lineitem has no receipt/commit dates, so "late" is
    l_shipdate > o_orderdate; NOT EXISTS = no OTHER supplier late."""
    load(spark, sf_dir, "supplier").createOrReplaceTempView("_q21_supplier")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_q21_lineitem")
    load(spark, sf_dir, "orders").createOrReplaceTempView("_q21_orders")
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM _q21_supplier JOIN _q21_lineitem l1 ON s_suppkey = l1.l_suppkey
                           JOIN _q21_orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate
          AND EXISTS (SELECT 1 FROM _q21_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM _q21_lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate)
        GROUP BY s_name
        """
    )


@query(
    "revenue_share_of_total",
    """
    WITH nat AS (
      SELECT n_name,
             sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) AS rev
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name,
           round(cast(rev as double), 6) AS revenue,
           round(cast(rev as double) / cast(sum(rev) OVER () as double) * 100, 8) AS pct_of_total
    FROM nat
    """,
)
def revenue_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total via an unpartitioned window over the ALREADY
    AGGREGATED rows (25 nations) — the grand total never touches the
    fact table twice, and the tiny window is a single-partition no-op.
    Decimal aggregation end-to-end; one division at the edge."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    nat = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")).alias(
                "rev"
            )
        )
    )
    w = Window.partitionBy()
    return nat.select(
        "n_name",
        F.round(F.col("rev").cast("double"), 6).alias("revenue"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(w).cast("double") * 100, 8
        ).alias("pct_of_total"),
    )


@query(
    "q2_min_cost_supplier",
    """
    SELECT p_partkey, p_name, s_name, s_acctbal
    FROM part JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_size <= 10
      AND s_acctbal = (SELECT min(s2.s_acctbal)
                       FROM lineitem l2 JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
                       WHERE l2.l_partkey = p_partkey)
    GROUP BY p_partkey, p_name, s_name, s_acctbal
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape: correlated min-subquery selecting the cheapest
    supplier per part (Catalyst de-correlates to an aggregate+join;
    the equality gate on s_acctbal doubles as the tie-keeper since
    acctbal is a stored value, not a computed float)."""
    load(spark, sf_dir, "part").createOrReplaceTempView("_q2_part")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_q2_lineitem")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("_q2_supplier")
    return spark.sql(
        """
        SELECT p_partkey, p_name, s_name, s_acctbal
        FROM _q2_part JOIN _q2_lineitem ON p_partkey = l_partkey
                      JOIN _q2_supplier ON l_suppkey = s_suppkey
        WHERE p_size <= 10
          AND s_acctbal = (SELECT min(s2.s_acctbal)
                           FROM _q2_lineitem l2 JOIN _q2_supplier s2 ON l2.l_suppkey = s2.s_suppkey
                           WHERE l2.l_partkey = p_partkey)
        GROUP BY p_partkey, p_name, s_name, s_acctbal
        """
    )


@query(
    "window_range_frames",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           cast(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW) as bigint)
             AS orders_trailing_90d,
           round(cast(sum(cast(o_totalprice as decimal(18,2)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                       RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW) as double), 2)
             AS spend_trailing_90d
    FROM orders
    """,
)
def window_range_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frames: trailing-90-day order count
    and spend per customer — the time-windowed running metric that ROWS
    frames can't express. RANGE frames are tie-safe by definition
    (peers share a frame), so duplicate timestamps need no tiebreak.
    Spark expresses the interval bound as epoch-seconds rangeBetween."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-90 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.count(F.lit(1)).over(w).cast("long").alias("orders_trailing_90d"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"), 2
        ).alias("spend_trailing_90d"),
    )


@query(
    "null_semantics",
    """
    SELECT a, b,
           a IS NOT DISTINCT FROM b AS null_safe_eq,
           a = b AS plain_eq,
           coalesce(a, -1) AS a_filled,
           a IS NULL AS a_is_null,
           CASE WHEN a IS NULL AND b IS NULL THEN 'both'
                WHEN a IS NULL OR b IS NULL THEN 'one' ELSE 'none' END AS null_shape
    FROM (VALUES (1, 1), (1, 2), (NULL, 1), (1, NULL), (NULL, NULL)) AS t(a, b)
    """,
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic sweep: null-safe equality (<=> ≡ IS NOT
    DISTINCT FROM), NULL-propagating =, coalesce, IS NULL shapes."""
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (None, 1), (1, None), (None, None)], "a int, b int"
    )
    return df.select(
        "a",
        "b",
        F.col("a").eqNullSafe(F.col("b")).alias("null_safe_eq"),
        (F.col("a") == F.col("b")).alias("plain_eq"),
        F.coalesce("a", F.lit(-1)).alias("a_filled"),
        F.isnull("a").alias("a_is_null"),
        F.when(F.isnull("a") & F.isnull("b"), "both")
        .when(F.isnull("a") | F.isnull("b"), "one")
        .otherwise("none")
        .alias("null_shape"),
    )


@query(
    "scalar_regex_funcs",
    """
    SELECT p_partkey,
           regexp_matches(p_name, '[aeiou]{2}') AS has_double_vowel,
           cast(len(regexp_extract_all(p_name, '[aeiou]+')) as bigint) AS n_vowel_runs,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word_tail,
           array_to_string(regexp_split_to_array(p_type, ' '), '|') AS type_tokens
    FROM part
    """,
)
def scalar_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 regex sweep: rlike / extract-all count / global replace /
    anchored capture / regex split. Spark regexp_replace is global by
    default (= DuckDB's 'g' flag); Java and RE2 agree on this ASCII
    pattern subset."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_name").rlike("[aeiou]{2}").alias("has_double_vowel"),
        F.size(F.regexp_extract_all(F.col("p_name"), F.lit("[aeiou]+"), F.lit(0)))
        .cast("long")
        .alias("n_vowel_runs"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word_tail"),
        F.array_join(F.split(F.col("p_type"), " "), "|").alias("type_tokens"),
    )


KMV_K = 256


@query(
    "kmv_distinct_sketch",
    f"""
    WITH hashes AS (
      SELECT DISTINCT cast(concat('0x', substr(md5(cast(l_partkey as varchar)), 1, 15)) as bigint) AS h
      FROM lineitem
    ),
    kmv AS (SELECT h FROM hashes ORDER BY h LIMIT {KMV_K}),
    kth AS (SELECT max(h) AS kth_hash, count(*) AS k_actual FROM kmv)
    SELECT cast(k_actual as bigint) AS k_actual,
           kth_hash,
           cast(CASE WHEN k_actual < {KMV_K} THEN k_actual
                ELSE cast(round(({KMV_K} - 1) / (cast(kth_hash as double) / 1152921504606846976.0)) as bigint)
                END as bigint) AS estimated_distinct,
           (SELECT count(DISTINCT l_partkey) FROM lineitem) AS exact_distinct
    FROM kth
    """,
)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch — the portable
    alternative to HLL: hash every key to (0, 2^60), keep the k
    smallest, estimate N ≈ (k-1)/normalized kth-minimum. Because the
    'randomness' is md5 (no library RNG), both engines compute the
    IDENTICAL estimate — a sketch the oracle can hash-check, unlike
    approx_count_distinct. Mergeable at scale: per-partition bottom-k,
    then a global bottom-k of k·P candidates (TakeOrdered shape)."""
    li = load(spark, sf_dir, "lineitem")
    hashes = li.select(
        F.conv(F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h")
    ).distinct()
    kmv = hashes.orderBy("h").limit(KMV_K)
    kth = kmv.agg(F.max("h").alias("kth_hash"), F.count(F.lit(1)).alias("k_actual"))
    exact = li.agg(F.countDistinct("l_partkey").alias("exact_distinct"))
    est = F.when(F.col("k_actual") < KMV_K, F.col("k_actual")).otherwise(
        F.round(
            (F.lit(KMV_K - 1)) / (F.col("kth_hash").cast("double") / F.lit(1152921504606846976.0))
        ).cast("long")
    )
    return kth.crossJoin(F.broadcast(exact)).select(
        F.col("k_actual").cast("long").alias("k_actual"),
        "kth_hash",
        est.cast("long").alias("estimated_distinct"),
        "exact_distinct",
    )


@query(
    "data_quality_audit",
    """
    SELECT 'orders_custkey_fk' AS check_name,
           (SELECT count(*) FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            WHERE c_custkey IS NULL) AS n_violations,
           (SELECT count(*) FROM orders) AS n_rows
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           (SELECT count(*) FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderkey IS NULL),
           (SELECT count(*) FROM lineitem)
    UNION ALL
    SELECT 'orders_pk_unique',
           (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders),
           (SELECT count(*) FROM orders)
    UNION ALL
    SELECT 'lineitem_discount_range',
           (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1),
           (SELECT count(*) FROM lineitem)
    UNION ALL
    SELECT 'orders_date_nonnull',
           (SELECT count(*) FROM orders WHERE o_orderdate IS NULL),
           (SELECT count(*) FROM orders)
    UNION ALL
    SELECT 'events_ts_in_window',
           (SELECT count(*) FROM events
            WHERE ts < timestamp '2024-01-01 00:00:00' OR ts >= timestamp '2024-02-01 00:00:00'),
           (SELECT count(*) FROM events)
    """,
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-gate data-quality audit: referential integrity (anti
    joins), key uniqueness, value ranges, null checks, timestamp
    windows — one row per check with violation counts. The shape a
    100 TB ingest runs before promoting a partition; every check is a
    scan+agg or broadcast anti join, no Python."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")
    ev = load(spark, sf_dir, "events")

    def check(name: str, violations, total) -> DataFrame:
        return violations.crossJoin(total).select(
            F.lit(name).alias("check_name"),
            F.col("v").cast("long").alias("n_violations"),
            F.col("t").cast("long").alias("n_rows"),
        )

    rows = [
        check(
            "orders_custkey_fk",
            o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(F.count(F.lit(1)).alias("v")),
            o.agg(F.count(F.lit(1)).alias("t")),
        ),
        check(
            "lineitem_orderkey_fk",
            li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").agg(F.count(F.lit(1)).alias("v")),
            li.agg(F.count(F.lit(1)).alias("t")),
        ),
        check(
            "orders_pk_unique",
            o.agg((F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("v")),
            o.agg(F.count(F.lit(1)).alias("t")),
        ),
        check(
            "lineitem_discount_range",
            li.where((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).agg(
                F.count(F.lit(1)).alias("v")
            ),
            li.agg(F.count(F.lit(1)).alias("t")),
        ),
        check(
            "orders_date_nonnull",
            o.where(F.col("o_orderdate").isNull()).agg(F.count(F.lit(1)).alias("v")),
            o.agg(F.count(F.lit(1)).alias("t")),
        ),
        check(
            "events_ts_in_window",
            ev.where(
                (F.col("ts") < F.lit("2024-01-01 00:00:00").cast("timestamp"))
                | (F.col("ts") >= F.lit("2024-02-01 00:00:00").cast("timestamp"))
            ).agg(F.count(F.lit(1)).alias("v")),
            ev.agg(F.count(F.lit(1)).alias("t")),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@query(
    "agg_rollup_grouping_flags",
    """
    SELECT l_returnflag, l_linestatus,
           cast(grouping(l_returnflag) as int) AS g_flag,
           cast(grouping(l_linestatus) as int) AS g_status,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() markers on rollup output — the disambiguator between
    'subtotal row' NULLs and genuine NULL group keys (essential once
    real data has nullable dimensions)."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
    ).select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n")


@query(
    "join_key_skew_audit",
    """
    WITH per_key AS (
      SELECT 'lineitem.l_orderkey' AS table_key, l_orderkey AS k, count(*) AS c
      FROM lineitem GROUP BY l_orderkey
      UNION ALL
      SELECT 'orders.o_custkey', o_custkey, count(*) FROM orders GROUP BY o_custkey
      UNION ALL
      SELECT 'events.user_id', user_id, count(*) FROM events GROUP BY user_id
    )
    SELECT table_key,
           cast(count(*) as bigint) AS n_keys,
           cast(sum(c) as bigint) AS n_rows,
           cast(max(c) as bigint) AS max_rows_per_key,
           round(cast(sum(c) as double) / count(*), 8) AS avg_rows_per_key,
           round(max(c) / (cast(sum(c) as double) / count(*)), 8) AS skew_ratio,
           round(max(c) / cast(sum(c) as double), 8) AS top1_share
    FROM per_key GROUP BY table_key
    """,
)
def join_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew diagnostics — the audit that decides between a
    plain shuffle join, AQE skew handling, and explicit salting
    (``operators/scale.py::salted_join``): per join key, how many rows
    the hottest key owns vs the average. skew_ratio ≫ 1 means one
    reducer partition drowns while the rest idle; at 100 TB this query
    runs on a sample or on partition-level stats, but the shape is the
    same map-side-combined count.

    All-integer aggregates + identically-written double divisions, so
    the audit itself is engine-exact."""
    li = load(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    od = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    ev = load(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    per_key = None
    for name, src in (
        ("lineitem.l_orderkey", li),
        ("orders.o_custkey", od),
        ("events.user_id", ev),
    ):
        t = src.groupBy("k").agg(F.count(F.lit(1)).alias("c")).select(
            F.lit(name).alias("table_key"), "k", "c"
        )
        per_key = t if per_key is None else per_key.unionByName(t)
    avg = F.col("n_rows").cast("double") / F.col("n_keys")
    return (
        per_key.groupBy("table_key")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("c").alias("n_rows"),
            F.max("c").alias("max_rows_per_key"),
        )
        .select(
            "table_key",
            "n_keys",
            "n_rows",
            F.col("max_rows_per_key").cast("long").alias("max_rows_per_key"),
            F.round(avg, 8).alias("avg_rows_per_key"),
            F.round(F.col("max_rows_per_key") / avg, 8).alias("skew_ratio"),
            F.round(
                F.col("max_rows_per_key") / F.col("n_rows").cast("double"), 8
            ).alias("top1_share"),
        )
    )


@query(
    "basket_part_pairs_top20",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey)
    SELECT part_a, part_b, cast(support as bigint) AS support
    FROM pairs
    ORDER BY support DESC, part_a, part_b
    LIMIT 20
    """,
)
def basket_part_pairs_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the 20 part pairs most often bought
    in the same order (pair support counts). The self-join is keyed on
    orderkey with canonical part ordering, so the pair space is
    Σ|order|² (orders are ≤7 lines here), never |parts|² — the same
    bounded-by-co-occurrence argument as the term-join Jaccard."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    return pairs.orderBy(F.desc("support"), "part_a", "part_b").limit(20)


@query(
    "orders_pareto_frontier",
    """
    WITH pts AS (
      SELECT o_orderkey, o_totalprice, o_orderdate FROM orders),
    ranked AS (
      SELECT o_orderkey, o_totalprice, o_orderdate,
             max(o_orderdate) OVER (
               ORDER BY o_totalprice DESC, o_orderdate DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_date_so_far
      FROM pts)
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM ranked
    WHERE best_date_so_far IS NULL OR o_orderdate > best_date_so_far
    """,
)
def orders_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline): orders not dominated on
    (totalprice, orderdate) — maximize both; a row survives iff its
    date beats the running-max date over everything sorting before it
    on (price desc, date desc, key). The (price, date, key) tiebreak
    makes equal-price runs deterministic: within a run, only a
    strictly later date survives.

    Two-phase scale-safe shape (an unpartitioned running-max window
    would plan ``Exchange SinglePartition`` — one task sorts every
    order): range-exchange on the sort key (partition id ascends with
    sort order), compute the running max PER RANGE, then close the
    cross-partition gap with the tiny per-partition max-date table
    (≤ #partitions rows): global running max = greatest(local running
    max, max date over all earlier ranges), the latter a broadcast
    prefix join. Exact — every partition boundary is also a sort
    boundary."""
    o = load(spark, sf_dir, "orders")
    sort_cols = [F.desc("o_totalprice"), F.desc("o_orderdate"), F.col("o_orderkey")]
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = (
        o.select("o_orderkey", "o_totalprice", "o_orderdate")
        .repartitionByRange(n_parts, *sort_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    wloc = (
        Window.partitionBy("_pid")
        .orderBy(*sort_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn("_local_best", F.max("o_orderdate").over(wloc))
    pmax = ranged.groupBy("_pid").agg(F.max("o_orderdate").alias("_pmax"))
    a, b = pmax.alias("a"), pmax.alias("b")
    prev = (
        a.join(b, F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.max(F.col("b._pmax")).alias("_prev_best"))
    )
    best = F.greatest("_local_best", "_prev_best")  # greatest() skips nulls
    return (
        local.join(F.broadcast(prev), "_pid")
        .where(best.isNull() | (F.col("o_orderdate") > best))
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


@query(
    "benford_first_digit_audit",
    """
    WITH digits AS (
      SELECT cast(substr(cast(cast(floor(o_totalprice) as bigint) as varchar), 1, 1) as bigint) AS d
      FROM orders WHERE o_totalprice >= 1),
    counts AS (SELECT d, count(*) AS n FROM digits GROUP BY d),
    total AS (SELECT cast(sum(n) as bigint) AS t FROM counts)
    SELECT d,
           cast(n as bigint) AS n_orders,
           round(n::double / t, 6) AS observed_p,
           round(ln(1.0 + 1.0 / d) / ln(10.0), 6) AS benford_p,
           round(abs(n::double / t - ln(1.0 + 1.0 / d) / ln(10.0)), 6) AS abs_dev
    FROM counts, total
    """,
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit on order totals: observed first-digit
    distribution vs log10(1 + 1/d) — the classic anomaly screen for
    fabricated or capped numeric columns (synthetic uniform data is
    EXPECTED to deviate; the point is the audit shape). First digit
    via explicit floor() before the bigint cast on BOTH sides —
    Spark's double→bigint cast truncates but DuckDB's rounds, so the
    truncation must be spelled out; one combinable count + a
    broadcast total."""
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    d = F.substring(F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1).cast("long")
    counts = o.select(d.alias("d")).groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").cast("long").alias("t"))
    benford = F.log(1.0 + 1.0 / F.col("d")) / F.log(F.lit(10.0))
    return counts.crossJoin(F.broadcast(total)).select(
        "d",
        F.col("n").cast("long").alias("n_orders"),
        F.round(F.col("n").cast("double") / F.col("t"), 6).alias("observed_p"),
        F.round(benford, 6).alias("benford_p"),
        F.round(F.abs(F.col("n").cast("double") / F.col("t") - benford), 6).alias("abs_dev"),
    )
