"""Round-6 forward batch: business/ops analytics extensions —
association-rule lift, cohort LTV, supplier scorecards, OLS trend
fitting, EWMA smoothing, seasonal anomaly detection, readability
scoring, and the window value-function sweep.

These widen the §2 relational/analytics surface with the standard
warehouse-analytics shapes (all public: Agrawal association rules,
cohort LTV curves, Flesch readability, OLS normal equations). Same
cross-engine determinism discipline as plans/__init__.py — notably the
EWMA uses dyadic weights (2^-k is an EXACT double) and decimal-exact
product accumulation, and OLS runs entirely on integer sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.tfidf import TOKEN_PATTERN
from . import load, query

# --------------------------------------------------------------------------
# Association rules: lift/confidence on top of pair support
# --------------------------------------------------------------------------

LIFT_MIN_SUPPORT = 2


@query(
    "basket_pair_lift_top20",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
    per AS (SELECT l_partkey, count(*) AS cnt FROM items GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING count(*) >= {LIFT_MIN_SUPPORT})
    SELECT part_a, part_b, cast(support as bigint) AS support,
           round(support::double / pa.cnt, 6) AS confidence_a_to_b,
           round(support::double * n.n_orders / (pa.cnt * pb.cnt), 6) AS lift
    FROM pairs
    JOIN per pa ON pa.l_partkey = part_a
    JOIN per pb ON pb.l_partkey = part_b
    CROSS JOIN n
    ORDER BY lift DESC, part_a, part_b
    LIMIT 20
    """,
)
def basket_pair_lift_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule METRICS on top of ``basket_part_pairs_top20``'s
    raw support: confidence P(b|a) and lift P(ab)/(P(a)P(b)) — support
    ranks popular pairs, lift ranks SURPRISING ones (the actual
    recommendation signal; support alone just re-finds the two
    best-selling parts). Min-support {LIFT_MIN_SUPPORT} prunes the
    singleton-pair noise floor before ranking.

    Shape: the pair space stays bounded by co-occurrence (orderkey
    equi-join, canonical part order); per-part counts broadcast back;
    final ranking is TakeOrdered(20), never a global sort."""
    from pyspark import StorageLevel

    # the distinct item set feeds the order count, per-part counts, and
    # both sides of the pair join — materialize it once
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    per = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= LIFT_MIN_SUPPORT)
    )
    out = (
        pairs.join(
            F.broadcast(per.select(F.col("l_partkey").alias("part_a"), F.col("cnt").alias("ca"))),
            "part_a",
        )
        .join(
            F.broadcast(per.select(F.col("l_partkey").alias("part_b"), F.col("cnt").alias("cb"))),
            "part_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("support").cast("long").alias("support"),
            F.round(F.col("support").cast("double") / F.col("ca"), 6).alias("confidence_a_to_b"),
            F.round(
                F.col("support").cast("double") * F.col("n_orders") / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )
    return out.orderBy(F.desc("lift"), "part_a", "part_b").limit(20)


# --------------------------------------------------------------------------
# Cohort lifetime value
# --------------------------------------------------------------------------


@query(
    "customer_ltv_cohort",
    """
    WITH fo AS (
      SELECT o_custkey, date_trunc('month', min(o_orderdate)) AS cohort
      FROM orders GROUP BY o_custkey),
    sz AS (SELECT cohort, count(*) AS n_customers FROM fo GROUP BY cohort),
    spend AS (
      SELECT f.cohort,
             date_diff('month', f.cohort, date_trunc('month', o.o_orderdate)) AS m_off,
             sum(cast(o.o_totalprice as decimal(18,6))) AS s
      FROM orders o JOIN fo f ON o.o_custkey = f.o_custkey
      GROUP BY f.cohort, date_diff('month', f.cohort, date_trunc('month', o.o_orderdate))),
    cum AS (
      SELECT a.cohort, a.m_off, sum(b.s) AS cum_s
      FROM spend a JOIN spend b ON b.cohort = a.cohort AND b.m_off <= a.m_off
      GROUP BY a.cohort, a.m_off)
    SELECT cast(c.cohort as date) AS cohort,
           cast(c.m_off as bigint) AS month_offset,
           cast(z.n_customers as bigint) AS n_customers,
           round(cast(c.cum_s as double) / z.n_customers, 6) AS avg_cum_ltv
    FROM cum c JOIN sz z USING (cohort)
    """,
)
def customer_ltv_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LIFETIME-VALUE curve: customers grouped by first-order
    month, average CUMULATIVE spend per customer at each month offset —
    the revenue twin of ``events_cohort_retention`` (which counts
    presence; this integrates money). Reading down a column compares
    cohort quality at equal age; the curve flattening is churn.

    Shape: two partial-aggregable groupBys; the cumulative sum runs as
    a triangle self-join over the (cohort, offset) AGGREGATE (≤
    cohorts·offsets rows — tiny), never a window over raw orders.
    Spend accumulates as exact decimals."""
    o = load(spark, sf_dir, "orders")
    from pyspark import StorageLevel

    fo = (
        o.groupBy("o_custkey")
        .agg(F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("cohort"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )  # feeds cohort sizes AND the per-order rejoin
    sz = fo.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_customers"))
    spend = (
        o.join(fo, "o_custkey")
        .groupBy(
            "cohort",
            (
                F.months_between(
                    F.date_trunc("month", F.col("o_orderdate")), F.col("cohort")
                )
            )
            .cast("long")
            .alias("m_off"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("s"))
    )
    a = spend.select("cohort", "m_off", "s")
    b = spend.select(F.col("cohort").alias("cohort"), F.col("m_off").alias("b_off"), F.col("s").alias("bs"))
    cum = (
        a.drop("s")
        .join(b, "cohort")
        .where(F.col("b_off") <= F.col("m_off"))
        .groupBy("cohort", "m_off")
        .agg(F.sum("bs").alias("cum_s"))
    )
    return cum.join(F.broadcast(sz), "cohort").select(
        "cohort",
        F.col("m_off").cast("long").alias("month_offset"),
        F.col("n_customers").cast("long").alias("n_customers"),
        F.round(F.col("cum_s").cast("double") / F.col("n_customers"), 6).alias("avg_cum_ltv"),
    )


# --------------------------------------------------------------------------
# Supplier scorecard
# --------------------------------------------------------------------------


SLOW_SHIP_DAYS = 60  # shipped this long after order placement = slow


@query(
    "supplier_scorecard",
    f"""
    SELECT l.l_suppkey AS suppkey,
           any_value(s.s_name) AS s_name,
           cast(count(*) as bigint) AS n_lines,
           round(cast(sum(cast(l.l_extendedprice * (1 - l.l_discount) as decimal(18,4)))
                      as double), 2) AS revenue,
           round(sum(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                          > {SLOW_SHIP_DAYS} THEN 1 ELSE 0 END)::double
                 / count(*), 6) AS slow_ship_rate,
           round(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)::double
                 / count(*), 6) AS return_rate
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY l.l_suppkey
    """,
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier OPERATIONS scorecard: revenue, slow-shipment rate
    (shipped > {SLOW_SHIP_DAYS} days after order placement), and return
    rate per supplier in one pass — the multi-metric rollup a
    procurement dashboard refreshes nightly. One combinable groupBy
    over the lineitem⋈orders fact join + a broadcast supplier-name
    join; revenue uses the q1 exact-decimal discipline."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load(spark, sf_dir, "supplier")
    slow = (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > SLOW_SHIP_DAYS).cast("int")
    ret = (F.col("l_returnflag") == "R").cast("int")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s.select("s_suppkey", "s_name")), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.first("s_name").alias("s_name"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
                ).cast("double"),
                2,
            ).alias("revenue"),
            F.round(F.sum(slow).cast("double") / F.count(F.lit(1)), 6).alias("slow_ship_rate"),
            F.round(F.sum(ret).cast("double") / F.count(F.lit(1)), 6).alias("return_rate"),
        )
    )


# --------------------------------------------------------------------------
# OLS trend per order status
# --------------------------------------------------------------------------


@query(
    "orders_status_trend_ols",
    """
    WITH m0 AS (SELECT date_trunc('month', min(o_orderdate)) AS mn FROM orders),
    series AS (
      SELECT o_orderstatus AS status,
             date_diff('month', mn, date_trunc('month', o_orderdate)) AS x,
             count(*) AS y
      FROM orders, m0
      GROUP BY o_orderstatus, date_diff('month', mn, date_trunc('month', o_orderdate))),
    sums AS (
      SELECT status, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM series GROUP BY status)
    SELECT status,
           cast(n as bigint) AS n_months,
           round((n * sxy - sx * sy)::double / (n * sxx - sx * sx), 6) AS slope,
           round((sy::double - ((n * sxy - sx * sy)::double / (n * sxx - sx * sx)) * sx) / n, 6)
             AS intercept
    FROM sums
    """,
)
def orders_status_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares TREND per order status: monthly counts regressed
    on month index via the closed-form normal equations — slope answers
    'is the F/O/P mix drifting' with a number instead of a chart. Every
    Σ is an INTEGER sum (counts × indices), so the only float ops are
    two final divisions — bit-identical everywhere, no numerically
    fragile centering pass needed.

    Shape: one groupBy to monthly counts (tiny), one groupBy to the
    five sufficient statistics — the classic 'reduce to sums, solve on
    the driver-sized result' pattern that scales to any event volume."""
    o = load(spark, sf_dir, "orders")
    m0 = o.agg(F.date_trunc("month", F.min("o_orderdate")).alias("mn"))
    series = (
        o.crossJoin(F.broadcast(m0))
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.months_between(F.date_trunc("month", F.col("o_orderdate")), F.col("mn"))
            .cast("long")
            .alias("x"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    sums = series.groupBy("status").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        "status",
        F.col("n").cast("long").alias("n_months"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


# --------------------------------------------------------------------------
# EWMA with exact dyadic weights
# --------------------------------------------------------------------------

EWMA_MAX_LAG = 32  # 2^-k underflows relevance long before k=32


@query(
    "ewma_user_value",
    f"""
    WITH ranked AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) - 1 AS k
      FROM events),
    recent AS (SELECT * FROM ranked WHERE k < {EWMA_MAX_LAG})
    SELECT user_id,
           cast(count(*) as bigint) AS n_used,
           round(cast(sum(cast(value / (1::BIGINT << k) as decimal(38,18))) as double)
                 / cast(sum(cast(1.0 / (1::BIGINT << k) as decimal(38,18))) as double), 6)
             AS ewma_value
    FROM recent GROUP BY user_id
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's value
    stream (α = 1/2), newest first — the recency-weighted state a
    feature store keeps per entity. The determinism trick: α = 1/2
    makes every weight 2^-k, an EXACT dyadic double (integer shift +
    one division — no pow(), no libm variance across engines), and the
    weighted products accumulate as exact decimals. Lags ≥
    {EWMA_MAX_LAG} are dropped: their weight is below 2^-31 ≈ 5e-10,
    under the output rounding.

    Shape: one row_number window on the HIGH-cardinality user key,
    truncated to the last {EWMA_MAX_LAG} rows per user before any
    arithmetic — bounded state per user at any history length."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    ev = load(spark, sf_dir, "events")
    recent = (
        ev.select("user_id", "value", (F.row_number().over(w) - 1).alias("k"))
        .where(F.col("k") < EWMA_MAX_LAG)
    )
    wgt_num = (F.col("value") / F.expr("shiftleft(1L, k)")).cast("decimal(38,18)")
    wgt_den = (F.lit(1.0) / F.expr("shiftleft(1L, k)")).cast("decimal(38,18)")
    return recent.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_used"),
        F.round(F.sum(wgt_num).cast("double") / F.sum(wgt_den).cast("double"), 6).alias(
            "ewma_value"
        ),
    )


# --------------------------------------------------------------------------
# Seasonal anomaly detection on hourly counts
# --------------------------------------------------------------------------

ANOM_TOP = 10  # review-queue size: the K most anomalous slots


@query(
    "events_hourly_anomaly",
    f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_start, count(*) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)),
    keyed AS (
      SELECT event_type, hour_start, n,
             dayofweek(hour_start) AS dow, hour(hour_start) AS hod
      FROM hourly),
    base AS (
      SELECT event_type, dow, hod, count(*) AS m,
             sum(n) AS s1, sum(n * n) AS s2
      FROM keyed GROUP BY event_type, dow, hod
      HAVING count(*) >= 3),
    scored AS (
      SELECT k.event_type, k.hour_start, k.n,
             round(b.s1::double / b.m, 6) AS expected,
             round((k.n - b.s1::double / b.m)
                   / sqrt((b.s2 - b.s1::double * b.s1 / b.m) / (b.m - 1)), 6) AS zscore
      FROM keyed k JOIN base b
        ON b.event_type = k.event_type AND b.dow = k.dow AND b.hod = k.hod
      WHERE (b.s2 - b.s1::double * b.s1 / b.m) / (b.m - 1) > 0)
    SELECT event_type, hour_start, cast(n as bigint) AS n_events, expected, zscore
    FROM scored ORDER BY abs(zscore) DESC, event_type, hour_start LIMIT {ANOM_TOP}
    """,
)
def events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL anomaly detection: each (type, hour) count scored
    against the baseline of the SAME weekday+hour slot across history —
    so Friday 20:00 compares to Friday 20:00s, not to 04:00 (the
    day/week cycle is signal, not noise). Emits the {ANOM_TOP} most
    anomalous slots by |z| — the ops REVIEW QUEUE spelling (a fixed
    |z| ≥ 2 cut was vacuously empty at every SF on the smooth synthetic
    counts, max |z| ≈ 1.8 — round-7 signal audit; top-K always carries
    hash signal and is what an on-call dashboard shows anyway), from a
    baseline needing ≥3 observations and positive variance. The rank is
    a TakeOrdered over the scored slot table (bounded: |types|×|hours|
    aggregate, never raw events).

    Determinism: mean and variance come from INTEGER sufficient
    statistics (Σn, Σn² — exact at any scale, combinable map-side),
    never a float stddev whose accumulation order could differ. Shape:
    two partial-aggregable groupBys + an equi-join on the slot key."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_start")
    ).agg(F.count(F.lit(1)).alias("n"))
    from pyspark import StorageLevel

    keyed = hourly.select(
        "event_type",
        "hour_start",
        "n",
        F.dayofweek("hour_start").alias("dow"),
        F.hour("hour_start").alias("hod"),
    ).persist(StorageLevel.MEMORY_AND_DISK)  # feeds baseline AND scoring
    base = (
        keyed.groupBy("event_type", "dow", "hod")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum("n").alias("s1"),
            F.sum(F.col("n") * F.col("n")).alias("s2"),
        )
        .where(F.col("m") >= 3)
    )
    var = (F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("m")) / (
        F.col("m") - 1
    )
    scored = (
        keyed.join(F.broadcast(base), ["event_type", "dow", "hod"])
        .where(var > 0)
        .select(
            "event_type",
            "hour_start",
            F.col("n").cast("long").alias("n_events"),
            F.round(F.col("s1").cast("double") / F.col("m"), 6).alias("expected"),
            F.round(
                (F.col("n") - F.col("s1").cast("double") / F.col("m")) / F.sqrt(var), 6
            ).alias("zscore"),
        )
    )
    return scored.orderBy(
        F.abs(F.col("zscore")).desc(), "event_type", "hour_start"
    ).limit(ANOM_TOP)


# --------------------------------------------------------------------------
# Readability scoring
# --------------------------------------------------------------------------


@query(
    "text_readability_scores",
    f"""
    WITH feats AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS n_words,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
             greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS n_syllables
      FROM documents)
    SELECT doc_id,
           cast(n_words as bigint) AS n_words,
           cast(n_sentences as bigint) AS n_sentences,
           cast(n_syllables as bigint) AS n_syllables,
           round(206.835 - 1.015 * (n_words::double / n_sentences)
                        - 84.6 * (n_syllables::double / n_words), 4) AS flesch_score
    FROM feats WHERE n_words > 0
    """,
)
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLESCH reading-ease per document, with vowel-group runs as the
    engine-portable syllable proxy (the classic approximation — exact
    syllabification needs a dictionary; the proxy preserves the
    ranking) — the readability axis of corpus quality scoring, next to
    ``quality_scores``'s length/punct heuristics: too-low targets
    legalese/spec dumps, implausibly-high flags word-salad.

    Shape: three regexp counts per row + per-row double arithmetic
    written identically in both dialects — a pure narrow map, no
    shuffle at all."""
    d = load(spark, sf_dir, "documents")
    feats = d.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0))
        ).alias("n_words"),
        F.greatest(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), F.lit(0))), F.lit(1)
        ).alias("n_sentences"),
        F.greatest(
            F.size(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), F.lit(0))
            ),
            F.lit(1),
        ).alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    return feats.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_sentences").cast("long").alias("n_sentences"),
        F.col("n_syllables").cast("long").alias("n_syllables"),
        F.round(
            F.lit(206.835)
            - 1.015 * (F.col("n_words").cast("double") / F.col("n_sentences"))
            - 84.6 * (F.col("n_syllables").cast("double") / F.col("n_words")),
            4,
        ).alias("flesch_score"),
    )


# --------------------------------------------------------------------------
# Window value-function sweep
# --------------------------------------------------------------------------

WVF_MAX_CUST = 100


@query(
    "window_value_functions",
    f"""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_key,
           nth_value(o_orderkey, 2) OVER w AS second_key,
           last_value(o_orderkey) OVER w AS last_key,
           lag(o_totalprice, 1, 0.0) OVER w AS prev_price
    FROM orders
    WHERE o_custkey < {WVF_MAX_CUST}
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VALUE window-function sweep — first_value / nth_value(2) /
    last_value over an explicit full-partition frame, plus lag with a
    default — completing §2.9's window coverage beyond the ranking and
    running-frame sweeps (last_value without the explicit frame is the
    classic running-frame footgun; the full frame here pins the
    correct spelling in both dialects). Per-customer partitions are
    HIGH-cardinality, so the window parallelizes; the custkey filter
    just keeps the driver compare small."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    # lag is frame-less by definition in Spark — same window, no frame
    wl = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") < WVF_MAX_CUST)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
        F.lag("o_totalprice", 1, 0.0).over(wl).alias("prev_price"),
    )


# --------------------------------------------------------------------------
# Weighted median, rolling distinct actives, degree power law,
# quantile normalization
# --------------------------------------------------------------------------


@query(
    "weighted_median_price_by_flag",
    """
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS price,
             cast(l_quantity as bigint) AS qty,
             sum(cast(l_quantity as bigint)) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
      FROM lineitem),
    tot AS (SELECT l_returnflag, sum(qty) AS t FROM w GROUP BY l_returnflag),
    firsts AS (
      SELECT w.l_returnflag, min(w.price) AS wmedian
      FROM w JOIN tot USING (l_returnflag)
      WHERE 2 * w.cumw >= tot.t
      GROUP BY w.l_returnflag)
    SELECT f.l_returnflag,
           cast(t.t as bigint) AS total_weight,
           round(f.wmedian, 6) AS weighted_median_price
    FROM firsts f JOIN tot t USING (l_returnflag)
    """,
)
def weighted_median_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTITY-weighted median price per return flag — each line votes
    with its quantity, so the median reflects units actually moved, not
    line-count (the difference between 'median line' and 'median unit
    sold'). Defined as the first price where cumulative weight reaches
    half the total — exact, no interpolation.

    Scale shape: return flags are a LOW-cardinality key, so the
    cumulative weight comes from ``grouped_prefix_sum`` (range-exchange
    kernel) instead of a 3-task partitionBy window; the threshold pick
    is then a partial-aggregable conditional min."""
    from ..operators.scale import grouped_prefix_sum

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    w = grouped_prefix_sum(
        li, ["l_returnflag"], ["price", "l_orderkey", "l_linenumber"], "qty", out_col="_pfx"
    ).withColumn("cumw", F.col("_pfx") + F.col("qty"))
    tot = w.groupBy("l_returnflag").agg(F.sum("qty").alias("t"))
    firsts = (
        w.join(F.broadcast(tot), "l_returnflag")
        .where(2 * F.col("cumw") >= F.col("t"))
        .groupBy("l_returnflag")
        .agg(F.min("price").alias("wmedian"))
    )
    return firsts.join(F.broadcast(tot), "l_returnflag").select(
        "l_returnflag",
        F.col("t").cast("long").alias("total_weight"),
        F.round("wmedian", 6).alias("weighted_median_price"),
    )


ROLLING_DAYS = 7


@query(
    "rolling_7d_active_users",
    f"""
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('day', ts)::date AS d FROM events),
    days AS (SELECT DISTINCT d FROM act),
    fan AS (
      SELECT DISTINCT days.d AS window_day, act.user_id
      FROM days JOIN act
        ON act.d <= days.d AND act.d > days.d - {ROLLING_DAYS})
    SELECT window_day, cast(count(*) as bigint) AS active_users_7d
    FROM fan GROUP BY window_day
    """,
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {ROLLING_DAYS}-day ACTIVE USERS per day — the DAU/WAU
    staple that a naive window can't do (count(DISTINCT) isn't valid
    over a running frame): distinct (user, day) activity fans out to
    the ≤{ROLLING_DAYS} window-days it supports, then a distinct +
    count per window day. The fan-out is a bounded range join (≤
    {ROLLING_DAYS}× the activity table, independent of event volume —
    events dedupe to user-days FIRST), all partial-aggregable."""
    ev = load(spark, sf_dir, "events")
    from pyspark import StorageLevel

    act = (
        ev.select("user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )  # feeds the day list AND the fan-out join
    days = act.select("d").distinct().select(F.col("d").alias("window_day"))
    fan = (
        act.join(
            F.broadcast(days),
            (F.col("d") <= F.col("window_day"))
            & (F.col("d") > F.date_sub(F.col("window_day"), ROLLING_DAYS)),
        )
        .select("window_day", "user_id")
        .distinct()
    )
    return fan.groupBy("window_day").agg(
        F.count(F.lit(1)).cast("long").alias("active_users_7d")
    )


def _degree_powerlaw_oracle() -> str:
    from . import REGISTRY
    from .vectors import KNN_UNIVERSE

    edges = REGISTRY["knn_graph_by_label"].oracle
    return f"""
    WITH edges AS (SELECT src, dst FROM ({edges}) e),
    deg AS (SELECT dst AS v, count(*) AS d FROM edges GROUP BY dst),
    hist AS (SELECT d, count(*) AS n_nodes FROM deg GROUP BY d),
    pts AS (SELECT ln(d::double) AS x, ln(n_nodes::double) AS y FROM hist),
    sums AS (
      SELECT count(*) AS n,
             sum(cast(x as decimal(28,14))) AS sx,
             sum(cast(y as decimal(28,14))) AS sy,
             sum(cast(x * y as decimal(28,14))) AS sxy,
             sum(cast(x * x as decimal(28,14))) AS sxx
      FROM pts)
    SELECT cast(n as bigint) AS n_points,
           round((n * cast(sxy as double) - cast(sx as double) * cast(sy as double))
                 / (n * cast(sxx as double) - cast(sx as double) * cast(sx as double)), 6)
             AS loglog_slope,
           cast({KNN_UNIVERSE} as bigint) AS knn_universe
    FROM sums
    """


@query("knn_degree_powerlaw", _degree_powerlaw_oracle())
def knn_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-degree distribution of the k-NN graph with a log-log OLS
    slope — the power-law exponent estimate that says whether the
    neighbor graph has hubs (heavy tail → a few vectors dominate
    neighbor lists, and dedup/ANN quality degrades around them) or is
    degree-homogeneous. Out-degree is fixed at k by construction;
    in-degree is the informative side.

    Determinism: ln() of small INTEGERS only — identical doubles on
    both engines (same libm-correct values for the same exact inputs,
    pinned by the parity gate) — then decimal-exact sums into the
    closed-form slope. Histogram is tiny; the heavy step is the degree
    groupBy on the edge list."""
    from .vectors import KNN_UNIVERSE, knn_graph_by_label

    edges = knn_graph_by_label(spark, sf_dir).select("src", "dst")
    deg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
    hist = deg.groupBy("d").agg(F.count(F.lit(1)).alias("n_nodes"))
    pts = hist.select(
        F.log(F.col("d").cast("double")).alias("x"),
        F.log(F.col("n_nodes").cast("double")).alias("y"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(28,14)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(28,14)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(28,14)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,14)")).alias("sxx"),
    )
    return sums.select(
        F.col("n").cast("long").alias("n_points"),
        F.round(
            (F.col("n") * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
            / (F.col("n") * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")),
            6,
        ).alias("loglog_slope"),
        F.lit(KNN_UNIVERSE).cast("long").alias("knn_universe"),
    )


def _decile_normalize_oracle() -> str:
    bounds_union = " UNION ALL ".join(
        f"SELECT {i} AS decile, round(quantile_cont(n_chars, {i / 10.0}), 6) AS corpus_upper"
        f" FROM documents"
        for i in range(1, 11)
    )
    # rank-arithmetic bucket ((rank-1)*10 // n) + 1, NOT ntile():
    # the Spark side computes the rank with the grouped kernel, and
    # this closed form is partitioning-independent on both engines
    return f"""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rnk,
             count(*) OVER (PARTITION BY source) AS n_src
      FROM documents),
    bucketed AS (
      SELECT source, n_chars, ((rnk - 1) * 10) // n_src + 1 AS src_decile FROM ranked),
    bounds AS ({bounds_union})
    SELECT r.source, cast(r.src_decile as bigint) AS src_decile,
           cast(count(*) as bigint) AS n_docs,
           cast(max(r.n_chars) as bigint) AS src_upper,
           any_value(b.corpus_upper) AS corpus_upper
    FROM bucketed r JOIN bounds b ON b.decile = r.src_decile
    GROUP BY r.source, r.src_decile
    """


@query("length_decile_normalize", _decile_normalize_oracle())
def length_decile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE-NORMALIZATION map for doc lengths: each source's decile
    boundary next to the corpus-wide boundary at the same quantile —
    the lookup table that maps 'long for src17' onto 'long for the
    corpus' (sources with different length regimes otherwise make one
    global length filter over- or under-prune per source). Reading a
    row: src_upper far below corpus_upper → that source's decile is
    globally short.

    Shape: sources are a LOW-cardinality key, so the within-source
    rank comes from ``grouped_prefix_sum`` (range-exchange kernel),
    and the decile is the closed-form ((rank-1)*10)//n + 1 — NOT an
    ntile window that would funnel all docs into |sources| tasks.
    Corpus boundaries are 10 exact percentiles from ONE aggregate
    pass, broadcast back."""
    from ..operators.scale import grouped_prefix_sum

    d = load(spark, sf_dir, "documents").withColumn("_one", F.lit(1))
    sizes = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    ranked = (
        grouped_prefix_sum(d, ["source"], ["n_chars", "doc_id"], "_one", out_col="_pfx")
        .join(F.broadcast(sizes), "source")
        .select(
            "source",
            "n_chars",
            # _pfx is the EXCLUSIVE prefix count = rank-1; integer div
            (F.expr("(_pfx * 10) div n_src") + 1).alias("src_decile"),
        )
    )
    deciles = [i / 10.0 for i in range(1, 11)]
    bounds = (
        d.agg(
            *[
                F.round(
                    F.expr(f"percentile_cont({q}) WITHIN GROUP (ORDER BY n_chars)"), 6
                ).alias(f"q{i}")
                for i, q in enumerate(deciles, start=1)
            ]
        )
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(i).alias("decile"), F.col(f"q{i}").alias("corpus_upper"))
                        for i in range(1, 11)
                    ]
                )
            ).alias("s")
        )
        .select(F.col("s.decile").alias("src_decile"), F.col("s.corpus_upper"))
    )
    return (
        ranked.groupBy("source", "src_decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("n_chars").cast("long").alias("src_upper"),
        )
        .join(F.broadcast(bounds), "src_decile")
        .select(
            "source",
            F.col("src_decile").cast("long").alias("src_decile"),
            "n_docs",
            "src_upper",
            "corpus_upper",
        )
    )


# --------------------------------------------------------------------------
# Spark-4 VARIANT type + grouped-agg pandas UDAF surface
# --------------------------------------------------------------------------

VARIANT_MAX_ID = 2000


@query(
    "scalar_variant_events",
    f"""
    SELECT event_id,
           cast(json_extract(props, '$.k') as bigint) AS k,
           cast(NULL as bigint) AS k_missing,
           cast(json_extract('[' || (cast(json_extract(props, '$.k') as bigint) * 2) || ','
                             || (cast(json_extract(props, '$.k') as bigint) * 3) || ']',
                             '$[1]') as bigint) AS nested_pick
    FROM events WHERE event_id < {VARIANT_MAX_ID}
    """,
)
def scalar_variant_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface (§2.9 semi-structured): ``parse_json``
    into an open-schema VARIANT, typed path extraction with
    ``variant_get``, absent-path behavior with ``try_variant_get``
    (NULL, never an error), and extraction from a CONSTRUCTED variant
    (a JSON array built row-side, picked by index) — the engine-native
    path for schema-on-read telemetry where get_json_object re-parses
    the string per access but a variant parses once. The DuckDB oracle
    speaks json_extract over the same paths — identical typed values.

    Shape: pure per-row projection, codegen end-to-end; the event_id
    cut only keeps the driver compare small."""
    ev = load(spark, sf_dir, "events").where(F.col("event_id") < VARIANT_MAX_ID)
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'long')").alias("k"),
        F.expr("try_variant_get(parse_json(props), '$.absent', 'long')").alias("k_missing"),
        F.expr(
            "variant_get(parse_json(concat('[', "
            "cast(variant_get(parse_json(props), '$.k', 'long') * 2 as string), ',', "
            "cast(variant_get(parse_json(props), '$.k', 'long') * 3 as string), ']')), "
            "'$[1]', 'long')"
        ).alias("nested_pick"),
    )


@query(
    "pandas_udaf_geomean",
    """
    SELECT event_type,
           cast(count(*) as bigint) AS n,
           round(cast(sum(cast(round(ln(value), 9) as decimal(28,14))) as double) / count(*), 6)
             AS mean_log_value
    FROM events WHERE value > 0
    GROUP BY event_type
    """,
)
def pandas_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDAF (§2.11): the per-group mean log-value
    (the log of the geometric mean) computed in an Arrow-batched
    Python aggregate — the escape hatch for aggregations with no
    built-in (here deliberately one WITH a SQL spelling, so the DuckDB
    oracle can hash-check the UDAF byte-for-byte). Determinism inside
    Python mirrors the engine discipline: per-value ln rounded to 9 dp,
    summed as exact Decimals (never float-accumulated, so pandas'
    arrival order can't leak), then one rounded division.

    Scale note: GROUPED_AGG is NOT partial-aggregable — each group's
    values ship to one task. Safe here (event_type groups stream
    through Arrow in bounded batches); for a 100 TB general-purpose
    geomean the decimal-sum SQL spelling in the oracle IS the scale
    path. That asymmetry is the point of pinning them equal."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: with lazy annotations (PEP 563) the
    # signature-inference path can't see pd.Series
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def mean_log(v):
        import math
        from decimal import ROUND_HALF_UP, Decimal

        q14 = Decimal("0.00000000000001")  # decimal(28,14) grid
        total = Decimal(0)
        n = 0
        for x in v:
            total += Decimal(repr(round(math.log(x), 9))).quantize(q14, rounding=ROUND_HALF_UP)
            n += 1
        return float(total) / n

    ev = load(spark, sf_dir, "events").where(F.col("value") > 0)
    # a GROUPED_AGG UDF can't mix with built-in aggregates in one agg()
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    logs = ev.groupBy("event_type").agg(
        F.round(mean_log(F.col("value")), 6).alias("mean_log_value")
    )
    return counts.join(logs, "event_type").select("event_type", "n", "mean_log_value")


# --------------------------------------------------------------------------
# Spark-4 Python Data Source API
# --------------------------------------------------------------------------

PYDS_ROWS = 5000
PYDS_PARTS = 8


@query(
    "pyds_telemetry_agg",
    f"""
    WITH t AS (
      SELECT i AS reading_id, cast(i % 50 as int) AS sensor_id,
             ((i * i) % 97) / 7.0 AS reading
      FROM generate_series(0, {PYDS_ROWS - 1}) s(i))
    SELECT sensor_id,
           cast(count(*) as bigint) AS n_readings,
           round(cast(sum(cast(reading as decimal(18,12))) as double) / count(*), 6)
             AS avg_reading,
           round(max(reading), 6) AS max_reading
    FROM t GROUP BY sensor_id
    """,
)
def pyds_telemetry_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over a CUSTOM Python Data Source (§2.1, Spark 4
    ``pyspark.sql.datasource``): the ``synthetic_telemetry`` format in
    ``sources/pydatasource.py`` streams {PYDS_ROWS} generated rows out
    of {PYDS_PARTS} range-split InputPartitions (one parallel read()
    task each), and this query rolls them up per sensor. The DuckDB
    oracle replays the generator arithmetic with generate_series — so
    the whole connector path (options → partitions() → read()
    generators → Arrow batches → groupBy) is hash-checked end-to-end.

    The per-row generator is pure integer math + one double division;
    the mean accumulates as exact decimals."""
    from ..sources.pydatasource import read_telemetry

    t = read_telemetry(spark, rows=PYDS_ROWS, partitions=PYDS_PARTS)
    return t.groupBy("sensor_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_readings"),
        F.round(
            F.sum(F.col("reading").cast("decimal(18,12)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_reading"),
        F.round(F.max("reading"), 6).alias("max_reading"),
    )


# --------------------------------------------------------------------------
# Two-hop reach, repeat-purchase cadence, bounce rate, chi-square
# --------------------------------------------------------------------------


def _two_hop_oracle() -> str:
    from . import REGISTRY
    from .vectors import KNN_UNIVERSE

    edges = REGISTRY["knn_graph_by_label"].oracle
    return f"""
    WITH edges AS (SELECT src, dst FROM ({edges}) e),
    two_hop AS (
      SELECT DISTINCT a.src, b.dst AS hop2
      FROM edges a JOIN edges b ON a.dst = b.src
      WHERE b.dst <> a.src)
    SELECT src AS vec_id, cast(count(*) as bigint) AS n_two_hop,
           cast({KNN_UNIVERSE} as bigint) AS knn_universe
    FROM two_hop GROUP BY src
    """


@query("knn_two_hop_reach", _two_hop_oracle())
def knn_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 2-HOP reach per vector (friends-of-friends minus self)
    over the k-NN graph — the neighborhood-expansion factor that sizes
    a graph-based ANN search (HNSW-style beam search visits ~reach
    nodes per hop) and flags near-duplicate clumps (reach ≪ k² means
    neighbors share neighbors). One edge-edge equi-join bounded by
    k·|E|, then distinct + count — never |V|² anything."""
    from .vectors import KNN_UNIVERSE, knn_graph_by_label

    from pyspark import StorageLevel

    edges = (
        knn_graph_by_label(spark, sf_dir)
        .select("src", "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )  # both sides of the hop join
    two_hop = (
        edges.select(F.col("src"), F.col("dst").alias("mid"))
        .join(edges.select(F.col("src").alias("mid"), F.col("dst").alias("hop2")), "mid")
        .where(F.col("hop2") != F.col("src"))
        .select("src", "hop2")
        .distinct()
    )
    return (
        two_hop.groupBy(F.col("src").alias("vec_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_two_hop"))
        .withColumn("knn_universe", F.lit(KNN_UNIVERSE).cast("long"))
    )


@query(
    "repeat_purchase_intervals",
    """
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap_d
      FROM orders)
    SELECT cast(count(*) as bigint) AS n_intervals,
           round(quantile_cont(gap_d, 0.5), 6) AS p50_days,
           round(quantile_cont(gap_d, 0.9), 6) AS p90_days,
           round(sum(gap_d)::double / count(*), 6) AS avg_days
    FROM gaps WHERE gap_d IS NOT NULL
    """,
)
def repeat_purchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase CADENCE: the distribution of day gaps between a
    customer's consecutive orders (p50/p90/mean) — the reorder-cycle
    input to inventory and churn models ('overdue' only means
    something relative to this curve). One lag() window on the
    HIGH-cardinality custkey, integer day gaps, exact percentiles on
    the single-row rollup."""
    from pyspark.sql.window import Window as W

    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap_d")
    ).where(F.col("gap_d").isNotNull())
    return gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.round(F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY gap_d)"), 6).alias("p50_days"),
        F.round(F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY gap_d)"), 6).alias("p90_days"),
        F.round(F.sum("gap_d").cast("double") / F.count(F.lit(1)), 6).alias("avg_days"),
    )


@query(
    "sessions_bounce_rate_daily",
    """
    WITH seq AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
             event_id
      FROM events),
    numbered AS (
      SELECT user_id, ts,
             sum(CASE WHEN prev_ts IS NULL
                       OR date_diff('second', prev_ts, ts) > 600 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM seq),
    sess AS (
      SELECT user_id, session_id,
             date_trunc('day', min(ts))::date AS d, count(*) AS n_events
      FROM numbered GROUP BY user_id, session_id)
    SELECT d,
           cast(count(*) as bigint) AS n_sessions,
           cast(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) as bigint) AS n_bounces,
           round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::double / count(*), 6)
             AS bounce_rate
    FROM sess GROUP BY d
    """,
)
def sessions_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily BOUNCE rate: fraction of sessions (10-min gap rule, same
    islands as ``events_sessionize_batch``) containing exactly one
    event, keyed by session start day — the engagement tripwire that a
    raw event count hides (traffic can rise while every visit
    bounces). Reuses the sessionize kernel: one user-keyed window
    pass, then combinable rollups."""
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    numbered = ev.select(
        "user_id",
        "ts",
        F.when(F.lag("ts").over(w).isNull() | (gap_s > 600), 1).otherwise(0).alias("new_s"),
        "event_id",
    ).withColumn("session_id", F.sum("new_s").over(wsum))
    sess = numbered.groupBy("user_id", "session_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("d"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounce = (F.col("n_events") == 1).cast("int")
    return sess.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(bounce).cast("long").alias("n_bounces"),
        F.round(F.sum(bounce).cast("double") / F.count(F.lit(1)), 6).alias("bounce_rate"),
    )


@query(
    "lang_source_chisq",
    """
    WITH obs AS (
      SELECT lang, source, count(*) AS o FROM documents GROUP BY lang, source),
    margins AS (
      SELECT lang, sum(o) AS rl FROM obs GROUP BY lang),
    cmargins AS (
      SELECT source, sum(o) AS cl FROM obs GROUP BY source),
    tot AS (SELECT sum(o) AS t FROM obs),
    cells AS (
      SELECT o.lang, o.source, o.o,
             m.rl * c.cl / tot.t::double AS e
      FROM obs o JOIN margins m USING (lang) JOIN cmargins c USING (source), tot),
    terms AS (
      SELECT cast(round((o - e) * (o - e) / e, 9) as decimal(28,14)) AS term FROM cells)
    SELECT cast((SELECT count(*) FROM cells) as bigint) AS n_cells,
           round(cast(sum(term) as double), 6) AS chi_square
    FROM terms
    """,
)
def lang_source_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson CHI-SQUARE independence statistic for the lang x source
    contingency table — 'does language mix depend on source?' asked as
    one number (compare to the chi2 critical value at
    (|langs|-1)(|sources|-1) dof). High chi2 = sources are language-
    skewed, so per-source sampling changes the language mix — the
    audit to run BEFORE trusting ``stratified_rebalance`` knobs.

    Shape: the contingency table is one combinable groupBy; margins
    broadcast back; per-cell terms round to 9 dp then accumulate as
    exact decimals (both engines sum identical grids)."""
    d = load(spark, sf_dir, "documents")
    from pyspark import StorageLevel

    obs = (
        d.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("o"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )  # feeds both margins, the total, and the cells
    margins = obs.groupBy("lang").agg(F.sum("o").alias("rl"))
    cmargins = obs.groupBy("source").agg(F.sum("o").alias("cl"))
    tot = obs.agg(F.sum("o").alias("t"))
    cells = (
        obs.join(F.broadcast(margins), "lang")
        .join(F.broadcast(cmargins), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "o",
            (F.col("rl") * F.col("cl") / F.col("t").cast("double")).alias("e"),
        )
    )
    terms = cells.select(
        F.round((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"), 9)
        .cast("decimal(28,14)")
        .alias("term")
    )
    n_cells = cells.agg(F.count(F.lit(1)).alias("n_cells"))
    return (
        terms.agg(F.round(F.sum("term").cast("double"), 6).alias("chi_square"))
        .crossJoin(F.broadcast(n_cells))
        .select(F.col("n_cells").cast("long").alias("n_cells"), "chi_square")
    )


# --------------------------------------------------------------------------
# ABC (Pareto) inventory classification — the 80/95 revenue-share cut,
# classified with EXACT decimal comparisons on the scale-safe global
# prefix-sum kernel
# --------------------------------------------------------------------------


@query(
    "part_abc_classification",
    """
    WITH rev AS (
      SELECT l_partkey,
             sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) AS rv
      FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT sum(rv) AS t FROM rev),
    c AS (
      SELECT l_partkey, rv,
             sum(rv) OVER (ORDER BY rv DESC, l_partkey) AS cum
      FROM rev)
    SELECT c.l_partkey, cast(c.rv as double) AS revenue,
           floor(cast(c.cum as double) / cast(tot.t as double) * 1000000.0 + 0.5)
             / 1000000.0 AS cum_share,
           CASE WHEN c.cum * 100 <= 80 * tot.t THEN 'A'
                WHEN c.cum * 100 <= 95 * tot.t THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c CROSS JOIN tot
    """,
)
def part_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification: rank parts by revenue,
    class A while the running share is ≤80%, B to 95%, C beyond — the
    classic stock-priority report. The oracle spells the obvious
    unpartitioned running sum; the Spark side must NOT (single-task
    funnel) and instead uses ``grouped_prefix_sum`` with one synthetic
    group — exactly the low-cardinality case the kernel exists for.

    Exactness: revenue aggregates as decimals; the class boundary
    compares ``cum·100 ≤ 80·total`` in DECIMAL — integer-scaled, no
    float ever decides a class. The emitted share uses the floor-based
    half-up quotient spelling."""
    from pyspark import StorageLevel

    from ..operators.scale import grouped_prefix_sum

    li = load(spark, sf_dir, "lineitem")
    # per-part revenue feeds the grand total AND the ranked branch
    rev = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
            ).alias("rv")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = rev.agg(F.sum("rv").alias("t"))
    # descending order via exact decimal negation (the kernel sorts asc)
    keyed = rev.select("l_partkey", "rv", (-F.col("rv")).alias("negrv"), F.lit(1).alias("_g"))
    pre = grouped_prefix_sum(
        keyed, ["_g"], ["negrv", "l_partkey"], "rv", out_col="_pfx"
    )
    cum = F.col("_pfx") + F.col("rv")
    return (
        pre.crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            F.col("rv").cast("double").alias("revenue"),
            (
                F.floor(cum.cast("double") / F.col("t").cast("double") * 1000000.0 + 0.5)
                .cast("double")
                / 1000000.0
            ).alias("cum_share"),
            F.when(cum * 100 <= F.col("t") * 80, F.lit("A"))
            .when(cum * 100 <= F.col("t") * 95, F.lit("B"))
            .otherwise(F.lit("C"))
            .alias("abc_class"),
        )
    )


# --------------------------------------------------------------------------
# Round 6j — Spark-4 SQL syntax surface: recursive CTEs + pipe syntax
# --------------------------------------------------------------------------

BFS_SEED_MOD = 97
BFS_MAX_HOPS = 3


def _bfs_oracle() -> str:
    from . import REGISTRY
    from .vectors import KNN_UNIVERSE

    edges = REGISTRY["knn_graph_by_label"].oracle
    return f"""
    WITH RECURSIVE edges AS (SELECT src, dst FROM ({edges}) e),
    reach(vec_id, depth) AS (
      SELECT DISTINCT src AS vec_id, 0 AS depth FROM edges
      WHERE src % {BFS_SEED_MOD} = 0
      UNION ALL
      SELECT e.dst AS vec_id, r.depth + 1 AS depth
      FROM reach r JOIN edges e ON e.src = r.vec_id
      WHERE r.depth < {BFS_MAX_HOPS}
    )
    SELECT vec_id, cast(min(depth) as bigint) AS hops,
           cast(count(*) as bigint) AS n_paths,
           cast({KNN_UNIVERSE} as bigint) AS knn_universe
    FROM reach GROUP BY vec_id
    """


@query("recursive_cte_bfs_hops", _bfs_oracle())
def recursive_cte_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop BFS over the k-NN graph via Spark 4's ``WITH
    RECURSIVE`` (§2.9 SQL surface; SPARK-24497): min-hop distance and
    path count from a deterministic seed set (vec_id % {BFS_SEED_MOD}
    == 0), depth-capped at {BFS_MAX_HOPS}. DuckDB runs the SAME
    recursive SQL, so the whole recursive-execution path (UnionLoop
    iterations, depth predicate pushin, the final re-aggregation) is
    hash-checked cross-engine.

    Scale shape: UNION ALL recursion enumerates PATHS, so the row count
    is seeds x k^depth — bounded here BY CONSTRUCTION (out-degree is
    exactly KNN_K, depth <= {BFS_MAX_HOPS}, seeds are a ~1% slice). For
    unbounded-depth or high-fan-out graphs the iterative
    frontier-dedup twin (``lpa_communities_2iter`` /
    ``dedup_cluster``'s label propagation) is the 100 TB path: it
    carries each node ONCE per round, not once per path; Spark's
    recursion row/level limits guard against the degenerate case, not
    replace the rewrite."""
    from pyspark import StorageLevel

    from .vectors import KNN_UNIVERSE, knn_graph_by_label

    # The recursion re-reads the edge relation every iteration (seed
    # scan + one join per depth); without materialization each read
    # re-runs the full kNN-graph build. Persist once — the loop then
    # touches only the cached |E| rows (5× faster at sf0.1).
    edges = (
        knn_graph_by_label(spark, sf_dir)
        .select("src", "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.createOrReplaceTempView("rec_knn_edges")
    return spark.sql(
        f"""
        WITH RECURSIVE reach(vec_id, depth) AS (
          SELECT DISTINCT src AS vec_id, 0 AS depth FROM rec_knn_edges
          WHERE src % {BFS_SEED_MOD} = 0
          UNION ALL
          SELECT e.dst AS vec_id, r.depth + 1 AS depth
          FROM reach r JOIN rec_knn_edges e ON e.src = r.vec_id
          WHERE r.depth < {BFS_MAX_HOPS}
        )
        SELECT vec_id, cast(min(depth) as bigint) AS hops,
               cast(count(*) as bigint) AS n_paths,
               cast({KNN_UNIVERSE} as bigint) AS knn_universe
        FROM reach GROUP BY vec_id
        """
    )


@query(
    "pipe_syntax_returns_summary",
    """
    SELECT l_returnflag, l_linestatus,
           cast(count(*) as bigint) AS n_items,
           round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6)))
                 as double), 6) AS revenue,
           round(round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6)))
                 as double), 6) / cast(count(*) as bigint), 6) AS avg_item_revenue
    FROM lineitem
    WHERE l_shipdate >= timestamp '1995-01-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pipe_syntax_returns_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q1-family pricing rollup spelled in Spark 4's SQL PIPE
    syntax (§2.9; SPARK-49555): ``FROM |> WHERE |> EXTEND |> AGGREGATE
    ... GROUP BY |> EXTEND`` — each operator applies in reading order,
    which is the public migration target for dbt-style transform
    chains. The oracle is the equivalent ANSI spelling, so this pins
    that the pipe-syntax parser lowers to exactly the classic plan
    (same filter pushdown, same partial aggregation).

    Determinism: revenue accumulates as exact decimals before ONE
    rounded cast; the per-item mean divides the already-rounded double
    by the bigint count identically in both dialects."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("pipe_lineitem")
    return spark.sql(
        """
        FROM pipe_lineitem
        |> WHERE l_shipdate >= timestamp '1995-01-01'
        |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
        |> AGGREGATE cast(count(*) as bigint) AS n_items,
                     round(cast(sum(cast(disc_price as decimal(18,6))) as double), 6)
                       AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> EXTEND round(revenue / n_items, 6) AS avg_item_revenue
        """
    )


@query(
    "pyds_stream_telemetry_agg",
    f"""
    WITH t AS (
      SELECT i AS reading_id, cast(i % 50 as int) AS sensor_id,
             ((i * i) % 97) / 7.0 AS reading
      FROM generate_series(0, {PYDS_ROWS - 1}) s(i))
    SELECT sensor_id,
           cast(count(*) as bigint) AS n_readings,
           round(cast(sum(cast(reading as decimal(18,12))) as double) / count(*), 6)
             AS avg_reading,
           round(max(reading), 6) AS max_reading
    FROM t GROUP BY sensor_id
    """,
)
def pyds_stream_telemetry_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING half of the Python Data Source surface (§2.1 /
    §2.10, Spark 4 ``DataSourceStreamReader``): the same telemetry
    generator exposed as a micro-batch stream — row-position offsets,
    ``latestOffset`` advancing {PYDS_ROWS // 5} rows per trigger,
    per-batch range-split partitions — drained to a memory sink and
    rolled up per sensor. Matching the batch oracle pins the
    connector's exactly-once offset contract end-to-end: the union of
    all micro-batch reads is exactly [0, rows) — no duplicated, no
    dropped offsets across the 5 triggers."""
    import uuid as _uuid

    from ..sources.pydatasource import read_telemetry_stream

    stream = read_telemetry_stream(
        spark, rows=PYDS_ROWS, batch_rows=PYDS_ROWS // 5, partitions=4
    )
    name = f"pyds_mem_{_uuid.uuid4().hex[:12]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return (
        spark.table(name)
        .groupBy("sensor_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_readings"),
            F.round(
                F.sum(F.col("reading").cast("decimal(18,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_reading"),
            F.round(F.max("reading"), 6).alias("max_reading"),
        )
    )


# --------------------------------------------------------------------------
# Poisson bootstrap: resampling-based uncertainty at data scale
# --------------------------------------------------------------------------

BOOT_B = 100
BOOT_SALT = "boot1|"
_BOOT_TWO_POW_60 = 1152921504606846976
# P(Poisson(1) <= k), k = 0..6 — shared literal thresholds; u beyond the
# last takes k=7 (truncation mass ~1e-5, documented)
_POIS_CUM = [
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.9999167588507119",
]


def _boot_case_sql(u: str) -> str:
    clauses = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CUM)
    )
    return f"(CASE {clauses} ELSE 7 END)"


def _boot_oracle() -> str:
    u = (
        f"(cast(concat('0x', substr(md5(concat('{BOOT_SALT}', cast(o_orderkey as varchar), "
        f"'|', cast(b as varchar))), 1, 15)) as bigint) + 1) "
        f"/ cast({_BOOT_TWO_POW_60} as double)"
    )
    return f"""
    WITH fan AS (
      SELECT o_orderkey, o_totalprice, b,
             {_boot_case_sql(u)} AS k
      FROM orders CROSS JOIN generate_series(1, {BOOT_B}) s(b)),
    reps AS (
      SELECT b,
             floor(cast(sum(cast(o_totalprice as decimal(18,2)) * k) as double)
                   / sum(k) * 100000000.0 + 0.5) / 100000000.0 AS m
      FROM fan GROUP BY b HAVING sum(k) > 0),
    ranked AS (
      SELECT m, row_number() OVER (ORDER BY m) AS rn, count(*) OVER () AS nb FROM reps),
    full_mean AS (
      SELECT floor(cast(sum(cast(o_totalprice as decimal(18,2))) as double)
                   / count(*) * 100000000.0 + 0.5) / 100000000.0 AS fm
      FROM orders)
    SELECT cast(nb as bigint) AS n_replicates, fm AS mean_totalprice,
           min(CASE WHEN rn = cast(ceil(0.025 * nb) as bigint) THEN m END) AS ci_lo,
           min(CASE WHEN rn = cast(ceil(0.975 * nb) as bigint) THEN m END) AS ci_hi
    FROM ranked CROSS JOIN full_mean
    GROUP BY nb, fm
    """


@query("bootstrap_mean_ci_poisson", _boot_oracle())
def bootstrap_mean_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", Google 2012) 95% CI for mean order value:
    classic with-replacement resampling needs N draws per replicate
    from one coordinated RNG — unshardable; the Poisson trick gives
    every (row, replicate) an INDEPENDENT Poisson(1) multiplicity, so
    a replicate is just a weighted aggregate and all {BOOT_B}
    replicates ride ONE combinable groupBy over a ×{BOOT_B} narrow
    fan-out. No RNG: multiplicities come from salted-md5 uniforms
    through literal inverse-CDF thresholds (k capped at 7, truncated
    mass ~1e-5 — documented, shared by both engines).

    Exactness: replicate means accumulate decimal(18,2)·k exactly and
    round with the floor-half-up spelling; the CI picks nearest-rank
    order statistics over the {BOOT_B}-row replicate table (bounded —
    the rank window is fine), never interpolated percentiles whose
    arithmetic differs across engines."""
    return _bootstrap_mean_ci(spark, sf_dir, hash_mode="md5")


@query("bootstrap_mean_ci_poisson_xxh", None)
def bootstrap_mean_ci_poisson_xxh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production twin of ``bootstrap_mean_ci_poisson``: identical
    shardable-resampling plan with the |orders|×B md5→hex→conv uniform
    replaced by ``xxhash64`` pmod 2⁶⁰ — pure JVM integer path, no hex
    string materialized (2⁶⁴ is an exact multiple of 2⁶⁰, so the pmod
    is exactly uniform). Rows-only: DuckDB has no xxhash64; the check
    is tests/test_analytics_extra.py pinning the Poisson(1)
    multiplicity distribution (mean/variance/pmf) against the md5
    spelling and the Poisson pmf itself."""
    return _bootstrap_mean_ci(spark, sf_dir, hash_mode="xxhash64")


def _boot_uniform(hash_mode: str):
    """(0,1]-uniform per (o_orderkey, b) — md5 is the oracle spelling,
    xxhash64 the production one (~|orders|×B fewer hex conversions)."""
    if hash_mode == "md5":
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(BOOT_SALT),
                            F.col("o_orderkey").cast("string"),
                            F.lit("|"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            + 1
        ).cast("double") / F.lit(float(_BOOT_TWO_POW_60))
    if hash_mode == "xxhash64":
        return (
            F.pmod(
                F.xxhash64(F.lit(BOOT_SALT), F.col("o_orderkey"), F.col("b")),
                F.lit(_BOOT_TWO_POW_60),
            )
            + 1
        ).cast("double") / F.lit(float(_BOOT_TWO_POW_60))
    raise ValueError(f"hash_mode must be 'md5' or 'xxhash64', got {hash_mode!r}")


def _boot_multiplicities(spark: SparkSession, sf_dir: str, hash_mode: str) -> DataFrame:
    """The (o_orderkey, b, k) fan-out stage, exposed so tests can pin
    the multiplicity distribution of both hash modes."""
    o = load(spark, sf_dir, "orders")
    fan = o.select("o_orderkey", "o_totalprice").crossJoin(
        spark.range(1, BOOT_B + 1).select(F.col("id").alias("b"))
    )
    return fan.withColumn("_u", _boot_uniform(hash_mode)).withColumn(
        "k", F.expr(_boot_case_sql("_u"))
    )


def _bootstrap_mean_ci(spark: SparkSession, sf_dir: str, hash_mode: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    reps = (
        _boot_multiplicities(spark, sf_dir, hash_mode)
        .groupBy("b")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * F.col("k")).alias("s"),
            F.sum("k").alias("n"),
        )
        .where(F.col("n") > 0)
        .select(
            (F.floor(F.col("s").cast("double") / F.col("n") * 100000000.0 + 0.5) / 100000000.0).alias("m")
        )
        # no-op bound (<= BOOT_B rows exist): makes the pool's
        # boundedness visible to the global-window plan gate
        .limit(BOOT_B)
    )
    ranked = reps.select(
        "m",
        F.row_number().over(Window.orderBy("m")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nb"),
    )
    full_mean = o.agg(
        (
            F.floor(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
                * 100000000.0
                + 0.5
            )
            / 100000000.0
        ).alias("fm")
    )
    return (
        ranked.crossJoin(F.broadcast(full_mean))
        .groupBy(F.col("nb").cast("long").alias("n_replicates"), F.col("fm").alias("mean_totalprice"))
        .agg(
            F.min(F.when(F.col("rn") == F.ceil(0.025 * F.col("nb")).cast("long"), F.col("m"))).alias("ci_lo"),
            F.min(F.when(F.col("rn") == F.ceil(0.975 * F.col("nb")).cast("long"), F.col("m"))).alias("ci_hi"),
        )
    )
