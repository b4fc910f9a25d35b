"""Time-series decomposition, drift detection and forecasting (split
from round8q.py, VERDICT r9 item 7 — registry names and oracle SQL
byte-identical): Page-Hinkley drift, autocorrelation function, Holt
linear-trend forecasts (global and per-key), and the moving-average
STL-style weekly decomposition.

Shared scale contract: every estimator reduces the raw fact table to a
CALENDAR-BOUNDED daily rollup via combinable aggregates first (loud
cap), then runs the inherently sequential recursion over that bounded
series inside a single applyInPandas task — per-series recursion over
a bounded aggregate, never over raw rows.

No reference twin: engine-side capacity-planning operators a 100 TB
ingest pipeline needs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from . import load, query


# --------------------------------------------------------------------------
# Sequential drift detection: Page-Hinkley over the daily event series
# (the ONLINE complement of the retrospective changepoint query)
# --------------------------------------------------------------------------

PH_DELTA = 5.0  # magnitude tolerance: drifts smaller than this are noise
PH_LAMBDA_SIGMAS = 2.0  # alarm when PH exceeds this many global stddevs


@query(
    "page_hinkley_daily_drift",
    f"""
    WITH daily AS (
      SELECT cast(date_trunc('day', ts) as date) AS day,
             cast(count(*) as bigint) AS x
      FROM events GROUP BY day),
    gsd AS (
      SELECT sqrt(cast(sum(x * x) as double) / count(*)
                  - (cast(sum(x) as double) / count(*))
                    * (cast(sum(x) as double) / count(*))) AS sd
      FROM daily),
    pref AS (
      SELECT day, x,
             cast(sum(x) OVER w as double)
               / cast(count(*) OVER w as double) AS mu
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    m AS (
      SELECT day, x, mu,
             sum(x - mu - {PH_DELTA}) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mt
      FROM pref),
    ph AS (
      SELECT day, x, mu, mt,
             mt - min(mt) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph
      FROM m)
    SELECT p.day, p.x AS n_events, round(p.mu, 6) AS prefix_mean,
           round(p.ph, 6) AS ph_stat,
           p.ph > {PH_LAMBDA_SIGMAS} * g.sd AS drift_alarm
    FROM ph p CROSS JOIN gsd g
    """,
)
def page_hinkley_daily_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGE-HINKLEY sequential drift detection over the daily event
    volume — the streaming-monitor complement to the retrospective
    ``changepoint_daily_events`` (binary segmentation): PH_t = m_t −
    min_{{s≤t}} m_s with m_t = Σ(x_s − μ_s − δ), alarming when the
    cumulative positive drift exceeds λ = {PH_LAMBDA_SIGMAS}σ. Every
    term is a prefix-window expression over the CALENDAR-BOUNDED daily
    rollup (same |days| bound as theil_sen), and the float chain is
    identical ordered arithmetic in both engines — prefix sums fix the
    addition order by construction."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    glob = daily.agg(
        F.sqrt(
            F.sum(F.col("x") * F.col("x")).cast("double") / F.count(F.lit(1))
            - (F.sum("x").cast("double") / F.count(F.lit(1)))
            * (F.sum("x").cast("double") / F.count(F.lit(1)))
        ).alias("sd")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pref = daily.select(
        "day",
        "x",
        (F.sum("x").over(w).cast("double") / F.count(F.lit(1)).over(w).cast("double")).alias("mu"),
    )
    m = pref.withColumn(
        "mt", F.sum(F.col("x") - F.col("mu") - PH_DELTA).over(w)
    )
    ph = m.withColumn("ph", F.col("mt") - F.min("mt").over(w))
    return ph.crossJoin(F.broadcast(glob)).select(
        "day",
        F.col("x").alias("n_events"),
        F.round("mu", 6).alias("prefix_mean"),
        F.round("ph", 6).alias("ph_stat"),
        (F.col("ph") > PH_LAMBDA_SIGMAS * F.col("sd")).alias("drift_alarm"),
    )


#: ACF maximum lag (days).
ACF_MAX_LAG = 7


@query(
    "daily_count_acf",
    f"""
    WITH d AS (
      SELECT event_type,
             datediff('day', DATE '1970-01-01', cast(ts as date)) AS di,
             cast(count(*) as bigint) AS c
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, cast(count(*) as bigint) AS n,
             cast(sum(c) as bigint) AS sc,
             cast(sum(c * c) as bigint) AS scc
      FROM d GROUP BY 1),
    lags AS (SELECT unnest(generate_series(1, {ACF_MAX_LAG})) AS k),
    prod AS (
      SELECT a.event_type, l.k,
             cast(count(*) as bigint) AS npairs,
             cast(sum(a.c * b.c) as bigint) AS sxy,
             cast(sum(a.c) as bigint) AS sh,
             cast(sum(b.c) as bigint) AS st
      FROM d a
        CROSS JOIN lags l
        JOIN d b ON b.event_type = a.event_type AND b.di = a.di + l.k
      GROUP BY a.event_type, l.k)
    SELECT p.event_type, cast(p.k as bigint) AS lag, p.npairs,
           round((p.sxy - (cast(s.sc as double) / s.n) * (p.sh + p.st)
                  + p.npairs * (cast(s.sc as double) / s.n)
                    * (cast(s.sc as double) / s.n))
                 / (s.scc - cast(s.sc as double) * s.sc / s.n), 8) AS acf
    FROM prod p JOIN s ON p.event_type = s.event_type
    ORDER BY p.event_type, lag
    """,
)
def daily_count_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTOCORRELATION FUNCTION of daily event counts per type, lags
    1..{ACF_MAX_LAG} — the dependence diagnostic behind seasonality
    detection and anomaly-threshold tuning (lag-1 = AR(1) persistence,
    lag-7 = weekly cycle). Uses the centered-product identity
    acf_k = (Σx_t·x_(t+k) - m(Σhead+Σtail) + n_k·m²) / Σ(x-m)² so every
    data-dependent sum is an exact bigint (counts and their products);
    the mean enters once as an identical double expression. Scale: the
    daily rollup is |types|x|days| rows; the lag join is an equi-join
    on (type, day+k) over that tiny table — the raw events are touched
    once."""
    e = load(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("1970-01-01"))).alias("di"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    from ..operators.scale import durable_checkpoint

    d = durable_checkpoint(d)  # consumed by s and both sides of the lag join
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("scc"),
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("k"))
    a = d.select("event_type", "di", F.col("c").alias("ca"))
    b = d.select(
        F.col("event_type").alias("event_type_b"),
        F.col("di").alias("dib"),
        F.col("c").alias("cb"),
    )
    prod = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("event_type_b") == F.col("event_type"))
            & (F.col("dib") == F.col("di") + F.col("k")),
        )
        .groupBy("event_type", "k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("npairs"),
            F.sum(F.col("ca") * F.col("cb")).cast("long").alias("sxy"),
            F.sum("ca").cast("long").alias("sh"),
            F.sum("cb").cast("long").alias("st"),
        )
    )
    m = F.col("sc").cast("double") / F.col("n")
    return (
        prod.join(s, "event_type")
        .select(
            "event_type",
            F.col("k").cast("long").alias("lag"),
            "npairs",
            F.round(
                (F.col("sxy") - m * (F.col("sh") + F.col("st")) + F.col("npairs") * m * m)
                / (F.col("scc") - F.col("sc").cast("double") * F.col("sc") / F.col("n")),
                8,
            ).alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


# ==========================================================================
# Round-8 batch 7: time-series decomposition/forecast, density outliers,
# first-digit data audit
# ==========================================================================

HOLT_ALPHA = 0.5
HOLT_BETA = 0.3
CALENDAR_CAP_DAYS = 36600  # ~100 years of daily rows — the bounded-series guard


@query(
    "holt_linear_daily_forecast",
    f"""
    WITH RECURSIVE daily AS (
      SELECT cast(date_trunc('day', o_orderdate) as date) AS d,
             cast(count(*) as bigint) AS y
      FROM orders GROUP BY 1),
    arr AS (SELECT list(y ORDER BY d) AS a, cast(count(*) as bigint) AS n FROM daily),
    rec(t, l, b) AS (
      SELECT cast(1 as bigint),
             cast(a[1] as double),
             cast(a[2] as double) - cast(a[1] as double)
      FROM arr
      UNION ALL
      SELECT r.t + 1,
             {HOLT_ALPHA} * cast(a[r.t + 1] as double) + {1 - HOLT_ALPHA} * (r.l + r.b),
             {HOLT_BETA} * (({HOLT_ALPHA} * cast(a[r.t + 1] as double)
                             + {1 - HOLT_ALPHA} * (r.l + r.b)) - r.l)
               + {1 - HOLT_BETA} * r.b
      FROM rec r, arr WHERE r.t < arr.n),
    fin AS (SELECT r.l, r.b FROM rec r, arr WHERE r.t = arr.n)
    SELECT arr.n AS n_days,
           round(fin.l, 6) AS level,
           round(fin.b, 6) AS trend,
           round(fin.l + 1 * fin.b, 6) AS fc_1,
           round(fin.l + 7 * fin.b, 6) AS fc_7,
           round(fin.l + 28 * fin.b, 6) AS fc_28
    FROM fin CROSS JOIN arr
    """,
)
def holt_linear_daily_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT LINEAR-TREND FORECAST (double exponential smoothing,
    alpha={HOLT_ALPHA} beta={HOLT_BETA}) of daily order volume with
    1/7/28-day-ahead forecasts — the capacity-planning estimator one
    rung above the EWMA level tracker (``ewma_user_value``): it carries
    an explicit trend state, so a steadily growing ingest rate
    extrapolates instead of lagging. Classic init l1=y1, b1=y2-y1
    (Hyndman & Athanasopoulos, FPP3 §8.2).

    Distributed shape: the 100 TB fact table reduces to a daily rollup
    via one combinable count (map-side partials), and the inherently
    sequential recursion runs over that CALENDAR-BOUNDED series (loud
    {CALENDAR_CAP_DAYS}-day cap, same contract as
    ``theil_sen_daily_trend``) inside a single applyInPandas task —
    per-series recursion over a bounded aggregate, never over raw
    rows; with per-tenant series this becomes one group per key,
    embarrassingly parallel. Cross-engine: the recursion is pure
    per-step double arithmetic written identically here and in the
    recursive-CTE oracle (no float reductions), so the states match
    bitwise and round once at the end."""
    import pandas as pd

    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        n = len(pdf)
        if n > CALENDAR_CAP_DAYS:
            raise ValueError(
                "holt_linear_daily_forecast: daily rollup exceeds the "
                f"{CALENDAR_CAP_DAYS}-day calendar cap"
            )
        if n < 2:
            raise ValueError("holt_linear_daily_forecast: need >= 2 days to init trend")
        y = pdf["y"].to_numpy(dtype="float64")
        lvl = y[0]
        tr = y[1] - y[0]
        for t in range(1, n):
            lvl_new = HOLT_ALPHA * y[t] + (1 - HOLT_ALPHA) * (lvl + tr)
            tr = HOLT_BETA * (lvl_new - lvl) + (1 - HOLT_BETA) * tr
            lvl = lvl_new
        return pd.DataFrame({"n_days": [n], "l_raw": [lvl], "b_raw": [tr]})

    fit = (
        daily.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            lambda _, pdf: holt(pdf.drop(columns=["g"])),
            "n_days bigint, l_raw double, b_raw double",
        )
    )
    return fit.select(
        "n_days",
        F.round("l_raw", 6).alias("level"),
        F.round("b_raw", 6).alias("trend"),
        F.round(F.col("l_raw") + 1 * F.col("b_raw"), 6).alias("fc_1"),
        F.round(F.col("l_raw") + 7 * F.col("b_raw"), 6).alias("fc_7"),
        F.round(F.col("l_raw") + 28 * F.col("b_raw"), 6).alias("fc_28"),
    )


@query(
    "stl_weekly_decompose_events",
    """
    WITH daily AS (
      SELECT cast(date_trunc('day', ts) as date) AS d,
             cast(count(*) as bigint) AS y
      FROM events GROUP BY 1),
    tr AS (
      SELECT d, y,
             cast(isodow(d) as bigint) AS dow,
             sum(y) OVER w AS s7, count(*) OVER w AS c7
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    full7 AS (
      SELECT d, y, dow, round(s7 / 7.0, 6) AS trend
      FROM tr WHERE c7 = 7),
    seas AS (
      SELECT d, y, dow, trend,
             round(cast(sum(cast(round(y - trend, 6) as decimal(18,6)))
                          OVER (PARTITION BY dow) as double)
                   / count(*) OVER (PARTITION BY dow), 6) AS seasonal
      FROM full7)
    SELECT d AS day, y AS n_events, dow, trend, seasonal,
           round(y - trend - seasonal, 6) AS remainder
    FROM seas
    """,
)
def stl_weekly_decompose_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-LITE SEASONAL DECOMPOSITION of daily event volume into
    trend + weekly seasonal + remainder (classical additive
    decomposition, the moving-average core of STL without the loess
    refinement): trend = centered 7-day moving average (full windows
    only), weekly seasonal = per-ISO-weekday mean of the detrended
    series, remainder = what neither explains — the decomposition that
    separates "traffic is growing" from "it's just Saturday" before
    any anomaly rule fires (``events_hourly_anomaly`` consumes exactly
    such residuals). Distributed shape: the raw stream reduces via one
    combinable daily count; the single-partition moving-average window
    rides the CALENDAR-BOUNDED rollup (<= 36 600 rows/century — the
    documented bounded-global-window class, pinned in
    test_plan_shapes), and the seasonal mean is a dow-PARTITIONED
    window over the same rollup (7 partitions, no self-join — a
    join-on-dow variant would recompute the whole subtree per branch
    and scan the fact table twice). Cross-engine: the 7-day sum is
    exact bigint, /7.0 is one
    identical double op, detrended values round to 6 dp then sum as
    exact decimals, and the remainder is per-row double arithmetic on
    already-identical inputs."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "y",
        (((F.dayofweek("d") + 5) % 7) + 1).cast("long").alias("dow"),
        F.sum("y").over(w7).alias("s7"),
        F.count(F.lit(1)).over(w7).alias("c7"),
    )
    full7 = tr.where(F.col("c7") == 7).select(
        "d", "y", "dow", F.round(F.col("s7") / 7.0, 6).alias("trend")
    )
    wd = Window.partitionBy("dow")
    seas = full7.withColumn(
        "seasonal",
        F.round(
            F.sum(F.round(F.col("y") - F.col("trend"), 6).cast("decimal(18,6)"))
            .over(wd)
            .cast("double")
            / F.count(F.lit(1)).over(wd),
            6,
        ),
    )
    return seas.select(
        F.col("d").alias("day"),
        F.col("y").alias("n_events"),
        "dow",
        "trend",
        "seasonal",
        F.round(F.col("y") - F.col("trend") - F.col("seasonal"), 6).alias("remainder"),
    )


@query(
    "holt_forecast_by_event_type",
    f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, cast(date_trunc('day', ts) as date) AS d,
             cast(count(*) as bigint) AS y
      FROM events GROUP BY 1, 2),
    arr AS (
      SELECT event_type, list(y ORDER BY d) AS a, cast(count(*) as bigint) AS n
      FROM daily GROUP BY 1),
    rec(event_type, t, l, b) AS (
      SELECT event_type, cast(1 as bigint),
             cast(a[1] as double),
             cast(a[2] as double) - cast(a[1] as double)
      FROM arr WHERE n >= 2
      UNION ALL
      SELECT r.event_type, r.t + 1,
             {HOLT_ALPHA} * cast(a[r.t + 1] as double) + {1 - HOLT_ALPHA} * (r.l + r.b),
             {HOLT_BETA} * (({HOLT_ALPHA} * cast(a[r.t + 1] as double)
                             + {1 - HOLT_ALPHA} * (r.l + r.b)) - r.l)
               + {1 - HOLT_BETA} * r.b
      FROM rec r JOIN arr USING (event_type) WHERE r.t < arr.n)
    SELECT r.event_type, arr.n AS n_days,
           round(r.l, 6) AS level,
           round(r.b, 6) AS trend,
           round(r.l + 7 * r.b, 6) AS fc_7
    FROM rec r JOIN arr USING (event_type)
    WHERE r.t = arr.n
    """,
)
def holt_forecast_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED Holt forecasts — one independent level+trend recursion
    PER EVENT TYPE, realizing the per-tenant/per-series scale claim of
    ``holt_linear_daily_forecast`` concretely: the fact table reduces
    to |types| x |days| calendar-bounded rollups in one combinable
    pass, then applyInPandas runs each series' recursion as its own
    task — thousands of tenants forecast in parallel with zero
    cross-series coordination. The oracle steps ALL series in lockstep
    inside one recursive CTE (groups terminate at their own n via the
    t < n guard), pinning every per-series state bitwise."""
    import pandas as pd

    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )

    def holt_one(key, pdf):
        pdf = pdf.sort_values("d").reset_index(drop=True)
        n = len(pdf)
        if n > CALENDAR_CAP_DAYS:
            raise ValueError(
                "holt_forecast_by_event_type: daily rollup exceeds the "
                f"{CALENDAR_CAP_DAYS}-day calendar cap"
            )
        if n < 2:
            return pd.DataFrame(
                {"event_type": pd.Series(dtype="object"),
                 "n_days": pd.Series(dtype="int64"),
                 "l_raw": pd.Series(dtype="float64"),
                 "b_raw": pd.Series(dtype="float64")}
            )
        y = pdf["y"].to_numpy(dtype="float64")
        lvl = y[0]
        tr = y[1] - y[0]
        for t in range(1, n):
            lvl_new = HOLT_ALPHA * y[t] + (1 - HOLT_ALPHA) * (lvl + tr)
            tr = HOLT_BETA * (lvl_new - lvl) + (1 - HOLT_BETA) * tr
            lvl = lvl_new
        return pd.DataFrame(
            {"event_type": [key[0]], "n_days": [n], "l_raw": [lvl], "b_raw": [tr]}
        )

    fit = daily.groupBy("event_type").applyInPandas(
        holt_one, "event_type string, n_days bigint, l_raw double, b_raw double"
    )
    return fit.select(
        "event_type",
        "n_days",
        F.round("l_raw", 6).alias("level"),
        F.round("b_raw", 6).alias("trend"),
        F.round(F.col("l_raw") + 7 * F.col("b_raw"), 6).alias("fc_7"),
    )


# --------------------------------------------------------------------------
# Two-sample drift: binned Kolmogorov–Smirnov between corpus epochs
# --------------------------------------------------------------------------

KS_SPLIT_DATE = "1998-01-01"
KS_BIN_WIDTH = 2500.0
KS_N_BINS = 200
KS_C_ALPHA = 1.358  # α = 0.05


@query(
    "orders_drift_ks_binned",
    f"""
    WITH binned AS (
      SELECT CASE WHEN o_orderdate < timestamp '{KS_SPLIT_DATE}' THEN 0 ELSE 1 END AS half,
             least(cast(floor(o_totalprice / {KS_BIN_WIDTH}) as bigint), {KS_N_BINS - 1}) AS bin
      FROM orders),
    counts AS (
      SELECT bin,
             cast(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) as bigint) AS ca,
             cast(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) as bigint) AS cb
      FROM binned GROUP BY bin),
    tot AS (
      SELECT cast(sum(ca) as bigint) AS n1, cast(sum(cb) as bigint) AS n2 FROM counts),
    cdf AS (
      SELECT sum(ca) OVER (ORDER BY bin) AS cuma,
             sum(cb) OVER (ORDER BY bin) AS cumb
      FROM counts)
    SELECT t.n1, t.n2,
           round(max(abs(c.cuma::double / t.n1 - c.cumb::double / t.n2)), 6) AS d_stat,
           round({KS_C_ALPHA} * sqrt((t.n1 + t.n2)::double / (t.n1 * t.n2)), 6)
             AS ks_threshold,
           max(abs(c.cuma::double / t.n1 - c.cumb::double / t.n2))
             > {KS_C_ALPHA} * sqrt((t.n1 + t.n2)::double / (t.n1 * t.n2)) AS drift_detected
    FROM cdf c CROSS JOIN tot t
    GROUP BY t.n1, t.n2
    """,
)
def orders_drift_ks_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift test between corpus epochs
    (orders before vs after {KS_SPLIT_DATE}) over the totalprice
    distribution — the train/serve drift check a data pipeline runs
    between snapshot releases. BINNED ECDFs ({KS_N_BINS} fixed-width
    buckets) keep it one combinable groupBy plus a window over a
    ≤{KS_N_BINS}-row aggregate (bounded by construction — never a
    global sort of raw rows); binning makes D a lower bound of the
    exact statistic, conservative for rejection at this bin width.
    Compares D against the α=0.05 asymptotic critical value
    c(α)·√((n₁+n₂)/n₁n₂)."""
    o = load(spark, sf_dir, "orders")
    binned = o.select(
        F.when(F.col("o_orderdate") < F.lit(KS_SPLIT_DATE).cast("timestamp"), 0)
        .otherwise(1)
        .alias("half"),
        F.least(
            F.floor(F.col("o_totalprice") / KS_BIN_WIDTH).cast("long"), F.lit(KS_N_BINS - 1)
        ).alias("bin"),
    )
    counts = (
        binned.groupBy("bin")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("long").alias("ca"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long").alias("cb"),
        )
        # ≤ KS_N_BINS rows exist; the limit is a no-op that makes the
        # pool's boundedness visible (same idiom as the bootstrap
        # replicate table)
        .limit(KS_N_BINS)
    )
    tot = counts.agg(
        F.sum("ca").cast("long").alias("n1"), F.sum("cb").cast("long").alias("n2")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cdf = counts.select(
        F.sum("ca").over(w).alias("cuma"), F.sum("cb").over(w).alias("cumb")
    )
    diff = F.abs(
        F.col("cuma").cast("double") / F.col("n1") - F.col("cumb").cast("double") / F.col("n2")
    )
    thresh = F.lit(KS_C_ALPHA) * F.sqrt(
        (F.col("n1") + F.col("n2")).cast("double") / (F.col("n1") * F.col("n2"))
    )
    return (
        cdf.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.round(F.max(diff), 6).alias("d_stat"),
            F.round(F.first(thresh), 6).alias("ks_threshold"),
            (F.max(diff) > F.first(thresh)).alias("drift_detected"),
        )
        .select("n1", "n2", "d_stat", "ks_threshold", "drift_detected")
    )


# --------------------------------------------------------------------------
# Changepoint detection: single-breakpoint variance-reduction scan
# --------------------------------------------------------------------------


@query(
    "changepoint_daily_events",
    """
    WITH daily AS (
      SELECT cast(date_trunc('day', ts) as date) AS day, cast(count(*) as bigint) AS c
      FROM events GROUP BY 1),
    cum AS (
      SELECT day, c,
             sum(c) OVER (ORDER BY day) AS s1,
             sum(c * c) OVER (ORDER BY day) AS s2,
             count(*) OVER (ORDER BY day) AS k,
             sum(c) OVER () AS t1, sum(c * c) OVER () AS t2, count(*) OVER () AS m
      FROM daily),
    cand AS (
      SELECT day AS split_day, cast(k as bigint) AS n_left, cast(m - k as bigint) AS n_right,
             (s2 - s1 * s1 / cast(k as double))
             + ((t2 - s2) - (t1 - s1) * (t1 - s1) / cast(m - k as double)) AS sse_split,
             t2 - t1 * t1 / cast(m as double) AS sse_total
      FROM cum WHERE k < m)
    SELECT split_day, n_left, n_right,
           round(sse_total, 4) AS sse_total,
           round(sse_split, 4) AS sse_split,
           round(1.0 - sse_split / sse_total, 6) AS variance_explained
    FROM cand ORDER BY sse_split, split_day LIMIT 1
    """,
)
def changepoint_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-breakpoint CHANGEPOINT detection on the daily event
    series — the level-shift scan that tells a pipeline owner WHEN a
    source's volume regime changed (binary-segmentation's inner step):
    for every candidate split day, SSE of a two-mean model from
    cumulative integer sufficient statistics (Σc, Σc² prefix sums —
    exact, no float accumulation), argmin by TakeOrdered with the day
    as tie-break. Everything past the daily rollup operates on the
    ≤|days| bounded aggregate; variance_explained is the effect-size
    readout (near 0 on the stationary synthetic series — the honest
    null result — and large on any real regime shift)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).limit(36600)  # calendar-bounded pool marker (one row per day)
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = daily.select(
        "day",
        F.sum("c").over(w_cum).alias("s1"),
        F.sum(F.col("c") * F.col("c")).over(w_cum).alias("s2"),
        F.count(F.lit(1)).over(w_cum).alias("k"),
        F.sum("c").over(w_all).alias("t1"),
        F.sum(F.col("c") * F.col("c")).over(w_all).alias("t2"),
        F.count(F.lit(1)).over(w_all).alias("m"),
    )
    sse_split = (
        F.col("s2") - F.col("s1") * F.col("s1") / F.col("k").cast("double")
    ) + (
        (F.col("t2") - F.col("s2"))
        - (F.col("t1") - F.col("s1"))
        * (F.col("t1") - F.col("s1"))
        / (F.col("m") - F.col("k")).cast("double")
    )
    sse_total = F.col("t2") - F.col("t1") * F.col("t1") / F.col("m").cast("double")
    cand = (
        cum.where(F.col("k") < F.col("m"))
        .select(
            F.col("day").alias("split_day"),
            F.col("k").cast("long").alias("n_left"),
            (F.col("m") - F.col("k")).cast("long").alias("n_right"),
            sse_split.alias("ss"),
            sse_total.alias("st"),
        )
        .orderBy("ss", "split_day")
        .limit(1)
    )
    return cand.select(
        "split_day",
        "n_left",
        "n_right",
        F.round("st", 4).alias("sse_total"),
        F.round("ss", 4).alias("sse_split"),
        F.round(F.lit(1.0) - F.col("ss") / F.col("st"), 6).alias("variance_explained"),
    )


# --------------------------------------------------------------------------
# Robust trend: Theil–Sen slope over the daily series
# --------------------------------------------------------------------------

#: ~100 years of daily rollup rows; the |days|² pairwise-slope join is
#: safe only below this. Module-level so the guard test can lower it.
TS_CALENDAR_CAP = 36600


@query(
    "theil_sen_daily_trend",
    """
    WITH daily AS (
      SELECT date_diff('day', DATE '1990-01-01', cast(date_trunc('day', ts) as date)) AS x,
             cast(count(*) as bigint) AS y
      FROM events GROUP BY 1),
    slopes AS (
      SELECT (b.y - a.y) / cast(b.x - a.x as double) AS m
      FROM daily a JOIN daily b ON a.x < b.x),
    ts_fit AS (
      SELECT round(quantile_cont(m, 0.5), 6) AS ts_slope FROM slopes),
    ols AS (
      SELECT round((count(*) * sum(x * y) - sum(x) * sum(y))
                   / cast(count(*) * sum(x * x) - sum(x) * sum(x) as double), 6)
               AS ols_slope,
             cast(count(*) as bigint) AS n_days
      FROM daily)
    SELECT o.n_days, t.ts_slope, o.ols_slope
    FROM ts_fit t CROSS JOIN ols o
    """,
)
def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL–SEN robust trend of daily event volume — the median of all
    pairwise slopes, which one corrupted ingestion day cannot move
    (OLS, reported alongside, chases it with breakdown point 0). The
    pair space is the DAILY AGGREGATE squared (≤|days|² — calendar-
    bounded by construction, ~400 pairs a month, never a row-level
    join), so the robust estimator costs one tiny self-join after one
    combinable rollup; integer (x, y) pairs make every slope an exact
    ratio of identical integers in both engines, and the median is the
    only float reduction (rounded once)."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.datediff(
                F.date_trunc("day", "ts").cast("date"), F.lit("1990-01-01").cast("date")
            ).alias("x")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    a = daily.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = a.join(b, F.col("xa") < F.col("xb")).select(
        ((F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa")).cast("double")).alias("m")
    )
    ts_fit = slopes.agg(
        F.round(
            F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY m)"), 6
        ).alias("ts_slope")
    )
    ols = daily.agg(
        F.round(
            (
                F.count(F.lit(1)) * F.sum(F.col("x") * F.col("y"))
                - F.sum("x") * F.sum("y")
            )
            / (
                F.count(F.lit(1)) * F.sum(F.col("x") * F.col("x"))
                - F.sum("x") * F.sum("x")
            ).cast("double"),
            6,
        ).alias("ols_slope"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    # Loud calendar-cap guard: the pairwise-slope space is |days|²,
    # safe only because a daily rollup is calendar-bounded. The guard
    # is threaded through the CONSUMED n_days output column (ADVICE
    # r8: an assert_true column dropped right after creation is pruned
    # by Catalyst and never evaluates) — beyond ~100 years of days the
    # job fails via raise_error instead of computing a truncated
    # median.
    ols = ols.select(
        F.when(F.col("n_days") <= F.lit(TS_CALENDAR_CAP), F.col("n_days"))
        .otherwise(
            F.raise_error(
                F.lit(
                    "theil_sen_daily_trend: daily rollup exceeds the "
                    f"{TS_CALENDAR_CAP}-day calendar cap"
                )
            )
        )
        .alias("n_days"),
        "ols_slope",
    )
    return ts_fit.crossJoin(F.broadcast(ols)).select("n_days", "ts_slope", "ols_slope")
