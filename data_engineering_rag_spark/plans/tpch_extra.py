"""TPC-H shapes q6/q8/q9/q12/q13/q15/q20 adapted to the synthetic
testdata schema (no partsupp/receiptdate/commitdate/shipmode columns —
adaptations noted per query). Completes the q1-q22 sweep started in
``relational.py``; EXT breadth, not reference parity (the reference has
no relational engine — BASELINE.json).

Determinism: every double aggregate goes through the exact-decimal
accumulate → deterministic double conversion pattern (``_dsum``); every
ratio divides two already-deterministic doubles and rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, query
from .relational import _dsum


@query(
    "q6_forecast_revenue",
    """
    SELECT round(cast(sum(cast(l_extendedprice * l_discount as decimal(18,6))) as double), 6) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= timestamp '1996-01-01 00:00:00'
      AND l_shipdate < timestamp '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6: pure filter + global agg — the canonical predicate-
    pushdown query. All four predicates reach the parquet scan
    (min/max row-group pruning on shipdate); no shuffle at all beyond
    the single-row final agg."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q8_market_share",
    """
    WITH all_nations AS (
      SELECT year(o_orderdate) AS o_year,
             cast(l_extendedprice * (1 - l_discount) as decimal(18,6)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
    )
    SELECT o_year,
           round(cast(coalesce(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume END),
                               cast(0 as decimal(18,6))) as double)
                 / cast(sum(volume) as double), 8) AS mkt_share
    FROM all_nations GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 national market share (adapted: no ps_supplycost).
    Star-join: every dimension (part/supplier/customer/nation/region)
    broadcasts after its filter; the only shuffles are lineitem⋈orders
    on orderkey and the final 7-group agg. Share = decimal-exact
    conditional sum / decimal-exact total, divided as doubles."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    part = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supp = load(spark, sf_dir, "supplier")
    n1 = nat.alias("n1")
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("supp_nation")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(reg), F.col("n1.n_regionkey") == reg.r_regionkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == n2.n2_nationkey)
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
    )
    num = F.coalesce(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))),
        F.lit(0).cast("decimal(18,6)"),
    )
    return joined.groupBy("o_year").agg(
        F.round(num.cast("double") / F.sum("volume").cast("double"), 8).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    """
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double), 6) AS profit
    FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN part     ON l_partkey = p_partkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 product-type profit (adapted: profit term drops
    ps_supplycost — no partsupp table). part(LIKE-filtered), supplier,
    nation broadcast; lineitem⋈orders is the single big shuffle."""
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("profit"))
    )


@query(
    "q12_late_shipment_priority",
    """
    SELECT l_returnflag AS ship_class,
           cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) as bigint) AS high_line_count,
           cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) as bigint) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= timestamp '1996-01-01 00:00:00'
      AND l_shipdate < timestamp '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape (adapted: no l_shipmode/l_receiptdate — classes
    come from l_returnflag, 'late' is shipped >60 days after order).
    Join + conditional-count agg; the date filters push to the scan,
    the lateness predicate evaluates post-join."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "q13_customer_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
          GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 customer distribution: left join with an extra join
    predicate (not a post-filter — unmatched customers must survive
    with count 0), two-level aggregation. count(o_orderkey) counts
    non-null keys only, so customers with no qualifying orders land in
    the c_count=0 bucket in both engines."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double), 6) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= timestamp '1996-01-01 00:00:00'
        AND l_shipdate < timestamp '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 top supplier: derived revenue view + scalar-subquery
    max. The max is a 1-row broadcast; equality compares the SAME
    deterministically-rounded doubles on both sides, so ties (all
    argmax rows) surface identically in both engines."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = load(spark, sf_dir, "supplier")
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q20_dominant_part_suppliers",
    """
    WITH part_supp_qty AS (
      SELECT l_partkey, l_suppkey,
             sum(cast(l_quantity as decimal(18,2))) AS supp_qty
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    with_totals AS (
      SELECT l_partkey, l_suppkey, supp_qty,
             sum(supp_qty) OVER (PARTITION BY l_partkey) AS total_qty,
             count(*) OVER (PARTITION BY l_partkey) AS n_supp
      FROM part_supp_qty)
    SELECT s_suppkey, s_name, count(*) AS n_dominant_parts
    FROM supplier JOIN with_totals ON s_suppkey = l_suppkey
    WHERE n_supp * supp_qty > 2 * total_qty
    GROUP BY s_suppkey, s_name
    """,
)
def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20 shape (adapted: no partsupp.availqty — 'dominant' on a
    part means shipping more than 2× the part's mean per-supplier
    quantity; an absolute >50%%-share gate is structurally empty on this
    synthetic data where every part has ~40 suppliers). Emits how many
    parts each supplier dominates. Part totals come from a WINDOW over
    the per-(part,supplier) agg — not a second groupBy + self-join —
    saving one exchange and the join. ``n·qty > 2·total`` keeps the
    comparison in exact decimal×integer arithmetic — no double factor."""
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    psq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("supp_qty")
    )
    w = Window.partitionBy("l_partkey")
    supp = load(spark, sf_dir, "supplier")
    return (
        psq.withColumn("total_qty", F.sum("supp_qty").over(w))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .where(F.col("n_supp") * F.col("supp_qty") > F.lit(2) * F.col("total_qty"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_dominant_parts"))
    )


@query(
    "orders_rfm_segments",
    """
    WITH rfm AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS freq,
             sum(cast(o_totalprice as decimal(18,2))) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, monetary,
             ntile(5) OVER (ORDER BY last_order, o_custkey) AS r_score,
             ntile(5) OVER (ORDER BY freq, o_custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score
      FROM rfm
    )
    SELECT concat(cast(r_score as varchar), cast(f_score as varchar),
                  cast(m_score as varchar)) AS segment,
           cast(count(*) as bigint) AS n_customers,
           round(cast(sum(monetary) as double), 2) AS total_monetary
    FROM scored GROUP BY 1
    """,
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary
    quintiles (ntile with key tie-breaks — deterministic in both
    engines), rolled up per 3-digit segment. Each quintile is exact
    positional ntile computed scale-safely over the |customers|-row agg
    table (``with_global_ntile``: range exchange + per-range rank +
    broadcast prefix counts — never a single-partition window sort);
    the three scores re-join on the customer key. Monetary sums stay
    decimal-exact until the final display cast."""
    from ..operators.scale import with_global_ntile

    o = load(spark, sf_dir, "orders")

    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    # r17 OPTIMIZATION (guide §2.4/§5): the RFM aggregate feeds SEVEN
    # subtree evaluations — each ntile branch reads it twice (the
    # repartitionByRange SAMPLING job plus the real exchange) and the
    # final scored join reads it again — so un-materialized it re-ran
    # the orders scan+groupBy up to 8x. A lazy persist() shares one
    # materialization without the eager-checkpoint barrier r16 measured
    # as a net LOSS (interleaved A/B, plans/r17/ab_orders_rfm.json:
    # plain 1.48 s / persist 1.44 s / durable_checkpoint 2.89 s).
    from pyspark import StorageLevel

    rfm = rfm.persist(StorageLevel.MEMORY_AND_DISK)
    r = with_global_ntile(
        rfm.select("o_custkey", "last_order"), 5, ["last_order", "o_custkey"], "r_score"
    ).select("o_custkey", "r_score")
    f = with_global_ntile(
        rfm.select("o_custkey", "freq"), 5, ["freq", "o_custkey"], "f_score"
    ).select("o_custkey", "f_score")
    m = with_global_ntile(
        rfm.select("o_custkey", "monetary"), 5, ["monetary", "o_custkey"], "m_score"
    ).select("o_custkey", "m_score")
    scored = (
        rfm.select("o_custkey", "monetary").join(r, "o_custkey").join(f, "o_custkey").join(m, "o_custkey")
    )
    return scored.groupBy(
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(F.sum("monetary").cast("double"), 2).alias("total_monetary"),
    )


@query(
    "q11_important_parts",
    """
    WITH part_value AS (
      SELECT l_partkey,
             round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double), 6) AS part_value
      FROM lineitem GROUP BY l_partkey),
    total AS (
      SELECT cast(sum(cast(part_value as decimal(18,6))) as double) AS total_value,
             cast(count(*) as bigint) AS n_parts
      FROM part_value)
    SELECT l_partkey, part_value
    FROM part_value, total
    WHERE part_value > 1.5 * total_value / n_parts
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11 shape (adapted: no partsupp table in the testdata, so
    'value' is shipped revenue per part instead of supplycost×availqty).
    Completes the q1-q22 sweep. The gate follows TPC-H's own rule that
    the fraction must SCALE (spec: 0.0001/SF): a fixed 0.001·total cut
    was vacuously empty at sf ≥ 0.01 (per-part share shrinks as 1/|parts|,
    so no part ever crossed it — caught by the round-7 signal audit);
    the scale-invariant spelling keeps parts carrying > 1.5× the
    AVERAGE per-part revenue (29 parts at sf0.01, 252 at sf0.1).

    Plan shape: one groupBy(partkey) partial-aggregated scan for the
    per-part values; the (total, n_parts) scalar reduces the part-value
    relation to ONE row and broadcasts into the HAVING-style filter —
    never a window over all parts, never a self-join on partkey. The
    total sums the already-rounded part values as exact decimals, so
    the strict `>` resolves identically in both engines at any scale."""
    li = load(spark, sf_dir, "lineitem")
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    part_value = li.groupBy("l_partkey").agg(_dsum(value, 6).alias("part_value"))
    total = part_value.agg(
        F.sum(F.col("part_value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        F.count(F.lit(1)).cast("long").alias("n_parts"),
    )
    return (
        part_value.join(F.broadcast(total))
        .where(F.col("part_value") > 1.5 * F.col("total_value") / F.col("n_parts"))
        .select("l_partkey", "part_value")
    )
