"""Event-stream analytics (SURVEY.md §2.10): batch twins with DuckDB
oracles, plus the Structured-Streaming versions as rows-only entries.

``events.ts`` is ns-precision in Parquet; Spark truncates to µs on
read and DuckDB's TIMESTAMP is µs — both sides see identical values
(FIXTURES.md note), so no extra casting is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..streaming.events import (
    dedup_events_stream,
    hourly_event_stats_stream,
    session_journeys_stream,
    sessionize_stream,
    sliding_counts_stream,
    user_totals_stateful_stream,
    view_purchase_funnel_stream,
)
from . import load, query


@query(
    "events_hourly_stats",
    """
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           count(*) AS n_events,
           round(cast(sum(cast(value as decimal(18,6))) as double), 6) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming tumbling-window aggregation."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias("sum_value"),
    )


@query(
    "events_json_props",
    """
    SELECT event_type,
           count(*) AS n,
           cast(sum(cast(json_extract(props, '$.k') as bigint)) as bigint) AS sum_k,
           min(cast(json_extract(props, '$.k') as bigint)) AS min_k,
           max(cast(json_extract(props, '$.k') as bigint)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop extraction (§2.9 JSON row): stays JVM-side via
    get_json_object — no Python, pushes through codegen."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "events_user_activity",
    """
    SELECT user_id, count(*) AS n_events,
           count(DISTINCT event_type) AS n_types,
           min(ts) AS first_seen, max(ts) AS last_seen,
           cast(date_diff('second', min(ts), max(ts)) as bigint) AS active_seconds
    FROM events GROUP BY user_id
    """,
)
def events_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("long")
        .alias("active_seconds"),
    )


@query(
    "events_sessionize_batch",
    """
    WITH seq AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
             event_id
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                       OR date_diff('second', prev_ts, ts) > 600 THEN 1 ELSE 0 END AS new_session
      FROM seq
    ),
    numbered AS (
      SELECT user_id, ts, event_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, cast(session_id as bigint) AS session_id,
           min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
)
def events_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (10-min gap) as windows over lag — the
    batch twin of ``session_window``. The classic gaps-and-islands plan:
    one shuffle on user_id, two window passes, then groupBy."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.lag("ts").over(w).isNull() | (gap_s > 600), 1).otherwise(0).alias("new_session"),
    )
    numbered = flagged.withColumn("session_id", F.sum("new_session").over(wsum))
    return numbered.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---- Structured Streaming versions: rows-only checks (no oracle; the
# pytest batch-equivalence suite pins their semantics instead).

@query("stream_hourly_stats", None)
def stream_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_event_stats_stream(spark, sf_dir)


@query("stream_sessionize", None)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize_stream(spark, sf_dir)


@query("stream_session_journeys", None)
def stream_session_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, session) journey strings as a streaming session_window
    aggregate (rows-only: collect-in-session-window is not
    SQL-expressible for DuckDB; the equivalence test pins it to the
    batch gaps-and-islands journeys over finalized sessions)."""
    return session_journeys_stream(spark, sf_dir)


@query(
    "events_sliding_counts",
    """
    WITH wins AS (
      SELECT event_type, ts,
             unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts - interval 30 minute) + interval 30 minute]) AS win_start
      FROM events
    )
    SELECT win_start, win_start + interval 1 hour AS win_end, event_type, count(*) AS n_events
    FROM wins
    WHERE ts >= win_start AND ts < win_start + interval 1 hour
    GROUP BY win_start, event_type
    """,
)
def events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the sliding-window stream: every event maps to the
    two 1-hour windows (slide 30 min) that contain it. Spark's window()
    does exactly this expansion; the oracle enumerates the same two
    candidate starts per event."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
        )
    )


@query("stream_sliding_counts", None)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts_stream(spark, sf_dir)


@query("stream_dedup_first_arrivals", None)
def stream_dedup_first_arrivals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_events_stream(spark, sf_dir)


@query(
    "events_view_purchase_funnel",
    """
    SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
           v.ts AS view_ts, p.ts AS purchase_ts
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + interval 30 minute
    """,
)
def events_view_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream funnel join: time-bounded self
    join (view precedes purchase by ≤30 min, same user)."""
    ev = load(spark, sf_dir, "events")
    v = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        v.join(
            p,
            (v.user_id == p.p_user)
            & (p.purchase_ts >= v.view_ts)
            & (p.purchase_ts <= v.view_ts + F.expr("INTERVAL 30 MINUTES")),
        )
        .select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")
    )


@query("stream_view_purchase_funnel", None)
def stream_view_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return view_purchase_funnel_stream(spark, sf_dir)


@query("stream_user_totals_stateful", None)
def stream_user_totals_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_totals_stateful_stream(spark, sf_dir)


@query(
    "events_enriched_static",
    """
    WITH hist AS (
      SELECT user_id, count(*) AS hist_events, min(ts) AS first_seen
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.event_type, h.hist_events, h.first_seen
    FROM events e LEFT JOIN hist h ON e.user_id = h.user_id
    """,
)
def events_enriched_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join."""
    ev = load(spark, sf_dir, "events")
    hist = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("hist_events"), F.min("ts").alias("first_seen")
    )
    return ev.join(F.broadcast(hist), "user_id", "left").select(
        "event_id", "user_id", "event_type", "hist_events", "first_seen"
    )


@query("stream_enriched_static", None)
def stream_enriched_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import enriched_events_stream

    return enriched_events_stream(spark, sf_dir)


@query(
    "events_asof_last_view",
    """
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           v.event_id AS last_view_id,
           cast(CASE WHEN v.ts IS NULL THEN NULL
                     ELSE date_diff('second', v.ts, p.ts) END as bigint) AS seconds_since_view
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def events_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN (custom operator — Spark has no native form): each
    purchase gets the same user's most recent preceding view. Spark
    runs the union+window sweep from ``operators.asof``; the oracle is
    DuckDB's native ASOF LEFT JOIN — independent implementations, one
    answer."""
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("last_view_id"),
        F.col("ts").alias("view_ts"),
    )
    joined = asof_join(
        purchases,
        views,
        key="user_id",
        left_time="purchase_ts",
        right_time="view_ts",
        right_value_cols=["last_view_id", "view_ts"],
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "last_view_id",
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts"))
        .cast("long")
        .alias("seconds_since_view"),
    )


@query(
    "events_hourly_gapfill",
    """
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, interval 1 hour)) AS hour_start FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT hour_start, event_type FROM spine CROSS JOIN types),
    actual AS (
      SELECT date_trunc('hour', ts) AS hour_start, event_type, count(*) AS n
      FROM events GROUP BY date_trunc('hour', ts), event_type
    )
    SELECT g.hour_start, g.event_type,
           cast(coalesce(a.n, 0) as bigint) AS n_events,
           round(cast(sum(coalesce(a.n, 0)) OVER (PARTITION BY g.event_type ORDER BY g.hour_start
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) as double) / 3, 6) AS moving_avg_3h
    FROM grid g LEFT JOIN actual a
      ON g.hour_start = a.hour_start AND g.event_type = a.event_type
    """,
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a generated hour×type spine left-joined
    against actual counts (missing hours become explicit zeros), then a
    3-hour moving average over the now-dense series — the prerequisite
    for any window math over sparse event data. The spine is generated,
    never stored; the join is broadcast (spine ≪ facts)."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour_start")
    )
    types = ev.select("event_type").distinct()
    grid = spine.crossJoin(types)
    actual = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(-2, Window.currentRow)
    )
    dense = (
        grid.join(actual, ["hour_start", "event_type"], "left")
        .select(
            "hour_start",
            "event_type",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        )
    )
    return dense.select(
        "hour_start",
        "event_type",
        "n_events",
        F.round(F.sum("n_events").over(w).cast("double") / 3, 6).alias("moving_avg_3h"),
    )


@query(
    "events_weekly_retention",
    """
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
    )
    SELECT cast(f.cohort_week as timestamp) AS cohort_week,
           cast(date_diff('week', f.cohort_week, a.active_week) as bigint) AS weeks_since_first,
           count(DISTINCT a.user_id) AS n_users
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY f.cohort_week, date_diff('week', f.cohort_week, a.active_week)
    """,
)
def events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted in
    each subsequent active week — the canonical product-analytics
    rollup (two aggregations + one equi-join on user)."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    weeks_since = (
        F.datediff(F.col("active_week").cast("date"), F.col("cohort_week").cast("date")) / 7
    ).cast("long")
    return (
        firsts.join(activity, "user_id")
        .groupBy("cohort_week", weeks_since.alias("weeks_since_first"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "events_value_histogram",
    """
    SELECT event_type,
           cast(floor(value / 10) as bigint) AS bucket,
           count(*) AS n,
           round(cast(sum(cast(value as decimal(18,6))) as double), 6) AS bucket_sum
    FROM events
    GROUP BY event_type, floor(value / 10)
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram per event type (floor-division bucketing;
    the build side of width_bucket-style binning)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.floor(F.col("value") / 10).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias("bucket_sum"),
    )


@query(
    "events_longest_gap_pandas",
    """
    WITH gaps AS (
      SELECT user_id,
             date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
               AS gap_s
      FROM events
    )
    SELECT user_id,
           cast(max(gap_s) as bigint) AS longest_gap_s,
           cast(count(gap_s) as bigint) AS n_gaps
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY user_id
    """,
)
def events_longest_gap_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 applyInPandas (per-group pandas UDF, the batch custom-
    aggregation escape hatch): longest inter-event gap per user,
    computed imperatively in pandas — and checked against the oracle's
    declarative lag-window formulation. Arrow moves each group once;
    groups shard by the groupBy key at scale."""
    import pandas as pd

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")

    def longest_gap(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        # second-BOUNDARY count (truncate each endpoint to the second,
        # then diff) — matches SQL date_diff('second', …) semantics,
        # which counts crossings, not elapsed-time truncation.
        secs = pdf["ts"].dt.floor("s")
        gaps = secs.diff().dropna()
        if len(gaps) == 0:
            return pd.DataFrame(columns=["user_id", "longest_gap_s", "n_gaps"])
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "longest_gap_s": [int(gaps.max().total_seconds())],
                "n_gaps": [len(gaps)],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        longest_gap, "user_id bigint, longest_gap_s bigint, n_gaps bigint"
    )


@query(
    "events_conversion_cogroup",
    """
    WITH v AS (SELECT user_id, min(ts) AS first_view, count(*) AS n_views
               FROM events WHERE event_type = 'view' GROUP BY user_id),
         p AS (SELECT user_id, min(ts) AS first_purchase, count(*) AS n_purchases
               FROM events WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT coalesce(v.user_id, p.user_id) AS user_id,
           cast(coalesce(n_views, 0) as bigint) AS n_views,
           cast(coalesce(n_purchases, 0) as bigint) AS n_purchases,
           cast(CASE WHEN first_view IS NULL OR first_purchase IS NULL
                     OR first_purchase < first_view THEN NULL
                ELSE date_diff('second', first_view, first_purchase) END as bigint)
             AS view_to_purchase_s
    FROM v FULL OUTER JOIN p ON v.user_id = p.user_id
    """,
)
def events_conversion_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 cogrouped applyInPandas (two keyed streams into one pandas
    function per key): views and purchases cogrouped per user, pandas
    computes the conversion delay — checked against the declarative
    full-outer-join oracle. Both sides shard by the key; each group
    pair crosses the Arrow boundary exactly once.

    The per-side value columns carry DISTINCT names (vts/pts), not a
    shared "ts": with bit-identical child plans on both cogroup sides,
    Spark 4.1's pruning/reuse sometimes delivered the right side
    without its value column at multi-file scale (KeyError 'ts' in the
    worker, flaky at sf0.1, never at single-file SFs) — distinct
    schemas keep the two subplans from being unified."""
    import pandas as pd

    ev = load(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )

    def conv(key, vdf: pd.DataFrame, pdf_: pd.DataFrame) -> pd.DataFrame:
        n_v, n_p = len(vdf), len(pdf_)
        delay = None
        if n_v and n_p:
            fv = vdf["vts"].min().floor("s")
            fp = pdf_["pts"].min().floor("s")
            if fp >= fv:
                delay = int((fp - fv).total_seconds())
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_views": [n_v],
                "n_purchases": [n_p],
                "view_to_purchase_s": [delay],
            }
        )

    return (
        views.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            conv,
            "user_id bigint, n_views bigint, n_purchases bigint, view_to_purchase_s bigint",
        )
    )


@query(
    "events_replay_filtered",
    """
    SELECT event_id, user_id, event_type
    FROM events WHERE event_id % 2 <> 0
    """,
)
def events_replay_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static replay filter (even event_ids
    play the already-processed set; the anti join keeps the rest)."""
    ev = load(spark, sf_dir, "events")
    seen = ev.where(F.col("event_id") % 2 == 0).select("event_id")
    return ev.join(F.broadcast(seen), "event_id", "left_anti").select(
        "event_id", "user_id", "event_type"
    )


@query("stream_replay_filtered", None)
def stream_replay_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import replay_filtered_stream

    return replay_filtered_stream(spark, sf_dir)


@query("stream_doc_dedup_gate", None)
def stream_doc_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``dedup_incremental_batch`` (rows-only; the
    batch twin carries the oracle): micro-batch text dedup against a
    static corpus-hash table + within-stream first-arrival dedup."""
    from ..streaming.events import doc_dedup_gate_stream

    return doc_dedup_gate_stream(spark, sf_dir)


@query(
    "events_rolling_zscore",
    """
    WITH hourly AS (
      SELECT event_type,
             cast(epoch(date_trunc('hour', ts)) // 3600 as bigint) AS hour_idx,
             cast(count(*) as bigint) AS cnt
      FROM events GROUP BY 1, 2
    ),
    win AS (
      SELECT event_type, hour_idx, cnt,
             cast(count(*) OVER w as bigint) AS n,
             cast(sum(cnt) OVER w as bigint) AS s1,
             cast(sum(cnt * cnt) OVER w as bigint) AS s2
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_idx
                   RANGE BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, hour_idx, cnt, n,
           round(cast(s1 as double) / n, 8) AS roll_mean,
           CASE WHEN n > 1
                  AND (cast(s2 as double) - (cast(s1 as double) * cast(s1 as double)) / n) / (n - 1) > 0
                THEN round((cnt - cast(s1 as double) / n)
                           / sqrt((cast(s2 as double) - (cast(s1 as double) * cast(s1 as double)) / n) / (n - 1)), 8)
                ELSE NULL END AS zscore
    FROM win
    """,
)
def events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling anomaly score: per event type, each hour's count against
    the trailing-24h mean/std. The moment sums (Σx, Σx²) are INTEGER
    window aggregates — exact in any engine and any accumulation order —
    and mean/variance derive from them in identical per-row double
    arithmetic, dodging the cross-engine hazard of native windowed
    ``stddev`` (incremental float accumulation differs engine to
    engine; catastrophic cancellation amplifies the drift).

    Scale: one shuffle to hourly buckets (map-side combined from the
    raw stream), one window shuffle on event_type; state per row is two
    longs regardless of window width."""
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600)
            .cast("long")
            .alias("hour_idx"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = W.partitionBy("event_type").orderBy("hour_idx").rangeBetween(-23, 0)
    win = hourly.select(
        "event_type",
        "hour_idx",
        "cnt",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cnt").over(w).alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    var = (F.col("s2").cast("double") - (s1d * s1d) / F.col("n")) / (F.col("n") - 1)
    return win.select(
        "event_type",
        "hour_idx",
        "cnt",
        "n",
        F.round(s1d / F.col("n"), 8).alias("roll_mean"),
        F.when(
            (F.col("n") > 1) & (var > 0),
            F.round((F.col("cnt") - s1d / F.col("n")) / F.sqrt(var), 8),
        ).alias("zscore"),
    )


@query(
    "events_asof_next_purchase",
    """
    SELECT v.event_id AS view_id, v.user_id, v.ts AS view_ts,
           p.event_id AS next_purchase_id,
           cast(CASE WHEN p.ts IS NULL THEN NULL
                     ELSE date_diff('second', v.ts, p.ts) END as bigint) AS seconds_to_purchase
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id AND v.ts <= p.ts
    """,
)
def events_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (``direction="forward"``): each view gets the
    same user's earliest following purchase — the time-to-conversion
    attribution shape. Oracle is DuckDB's native ASOF with the
    inequality flipped; the Spark side is the same union+window sweep
    run with a ``first_value`` forward window."""
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("view_ts")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("next_purchase_id"), F.col("ts").alias("p_ts")
    )
    joined = asof_join(
        views,
        purchases,
        key="user_id",
        left_time="view_ts",
        right_time="p_ts",
        right_value_cols=["next_purchase_id", "p_ts"],
        direction="forward",
    )
    return joined.select(
        "view_id",
        "user_id",
        "view_ts",
        "next_purchase_id",
        # NTZ→long is not castable directly (Spark 4); NTZ→timestamp is a
        # no-op under the session's pinned UTC, and timestamp→long is the
        # same epoch-second truncation DuckDB's date_diff('second', ..)
        # boundary-crossing count produces.
        (
            F.col("p_ts").cast("timestamp").cast("long")
            - F.col("view_ts").cast("timestamp").cast("long")
        ).alias("seconds_to_purchase"),
    )


@query(
    "events_winsorized_values",
    """
    WITH ev AS (
      SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM ev
    ),
    th AS (
      SELECT event_type, cast(max(n) as bigint) AS n,
             max(CASE WHEN rn = cast(ceil(0.01 * n) as bigint) THEN value END) AS p01,
             max(CASE WHEN rn = cast(ceil(0.99 * n) as bigint) THEN value END) AS p99
      FROM ranked GROUP BY event_type
    )
    SELECT ev.event_type, max(th.n) AS n, max(p01) AS p01, max(p99) AS p99,
           cast(sum(CASE WHEN value < p01 THEN 1 ELSE 0 END) as bigint) AS n_clipped_low,
           cast(sum(CASE WHEN value > p99 THEN 1 ELSE 0 END) as bigint) AS n_clipped_high
    FROM ev JOIN th ON ev.event_type = th.event_type
    GROUP BY ev.event_type
    """,
)
def events_winsorized_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization audit (feature-engineering outlier clipping): exact
    nearest-rank p01/p99 per event type, plus how many rows each tail
    clip would touch. Thresholds are stored values (no interpolation
    arithmetic) → engine-exact; tie order inside equal values cannot
    change the selected value.

    Scale: the exact per-type rank comes from ``grouped_prefix_sum``
    of ones (range exchange on (type, value, id) + per-range running
    count + broadcast per-(type, range) totals) — a window partitioned
    only by the ~5-value event_type would sort a fifth of all events
    in one task; per-type totals are a combinable groupBy, not a count
    window. At 100 TB ``approx_percentile`` (t-digest, mergeable)
    remains the cheaper option; this query pins the exact semantics
    the sketch is then judged against."""
    from ..operators.scale import grouped_prefix_sum

    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
    )
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = grouped_prefix_sum(
        ev.withColumn("_one", F.lit(1)),
        ["event_type"],
        ["value", "event_id"],
        "_one",
        "_rn0",
    ).join(F.broadcast(counts), "event_type")
    rn = F.col("_rn0") + 1
    sel = lambda frac: rn == F.ceil(F.lit(frac) * F.col("n")).cast("long")
    th = ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max(F.when(sel(0.01), F.col("value"))).alias("p01"),
        F.max(F.when(sel(0.99), F.col("value"))).alias("p99"),
    )
    return (
        ev.join(F.broadcast(th), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("p01").alias("p01"),
            F.max("p99").alias("p99"),
            F.sum(F.when(F.col("value") < F.col("p01"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_low"),
            F.sum(F.when(F.col("value") > F.col("p99"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_high"),
        )
    )


@query(
    "events_daily_rollup_merge",
    """
    WITH daily AS (
      SELECT cast(date_trunc('day', ts) as date) AS d, event_type,
             cast(count(*) as bigint) AS n,
             sum(cast(value as decimal(18,6))) AS sv
      FROM events GROUP BY 1, 2
    )
    SELECT cast(date_trunc('month', d) as date) AS month, event_type,
           cast(sum(n) as bigint) AS n_events,
           round(cast(sum(sv) as double), 6) AS sum_value
    FROM daily GROUP BY 1, 2
    """,
)
def events_daily_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-aggregation maintenance: raw events roll up to a DAILY
    partial-aggregate table; the monthly answer is re-aggregated from
    the daily partials (sums of sums — counts and decimal-exact value
    sums are mergeable by construction). The 100 TB contract: raw data
    is scanned ONCE per day ever; every repeat window/backfill query
    reads |days|×|types| rollup rows instead. This query materializes
    the merge path end-to-end so its algebra is value-checked."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("d"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
    )
    return daily.groupBy(
        F.date_trunc("month", F.col("d")).cast("date").alias("month"), "event_type"
    ).agg(
        F.sum("n").cast("long").alias("n_events"),
        F.round(F.sum("sv").cast("double"), 6).alias("sum_value"),
    )


@query("stream_daily_rollup", None)
def stream_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming daily pre-aggregate (rows-only: stateful watermark
    semantics aren't SQL; pinned to the batch algebra by
    ``tests/test_streaming.py::test_daily_rollup_stream_matches_batch``)."""
    from ..streaming.events import _run_to_memory, daily_rollup_stream

    return _run_to_memory(daily_rollup_stream(spark, sf_dir), "complete")


@query(
    "events_cohort_retention",
    """
    WITH firstday AS (
      SELECT user_id, min(cast(date_trunc('day', ts) as date)) AS cohort
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, cast(date_trunc('day', ts) as date) AS d FROM events
    )
    SELECT f.cohort, cast(date_diff('day', f.cohort, a.d) as bigint) AS day_offset,
           cast(count(*) as bigint) AS n_users
    FROM activity a JOIN firstday f ON a.user_id = f.user_id
    GROUP BY f.cohort, date_diff('day', f.cohort, a.d)
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day,
    counted on each subsequent active day offset — the product-
    analytics staple. Shapes: two map-side-combinable aggs + one
    equi-join on user_id (first-day table ≤ |users| rows, broadcast
    at any realistic user count vs event volume)."""
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    firstday = ev.groupBy("user_id").agg(F.min(day).alias("cohort"))
    activity = ev.select("user_id", day.alias("d")).distinct()
    return (
        activity.join(F.broadcast(firstday), "user_id")
        .groupBy("cohort", F.datediff(F.col("d"), F.col("cohort")).cast("long").alias("day_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@query(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type),
    totals AS (
      SELECT from_type, sum(n) AS total FROM trans GROUP BY from_type)
    SELECT t.from_type, t.to_type, cast(n as bigint) AS n_transitions,
           round(n::double / total, 6) AS p_transition
    FROM trans t JOIN totals USING (from_type)
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (lead window, (ts, event_id) tiebreak for the non-unique
    timestamps) — the sequence-analytics shape behind journey analysis
    and next-event prediction features.

    One shuffle to sessionless-order each user's history, then a
    map-side-combinable count; the row-normalizing totals join is a
    |types|² table → broadcast."""
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    totals = trans.groupBy("from_type").agg(F.sum("n").alias("total"))
    return trans.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n_transitions"),
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("p_transition"),
    )


@query(
    "events_errors_per_session",
    """
    WITH seq AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
             event_id
      FROM events),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                       OR date_diff('second', prev_ts, ts) > 600 THEN 1 ELSE 0 END AS new_session
      FROM seq),
    numbered AS (
      SELECT user_id, ts, event_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged),
    sessions AS (
      SELECT user_id, cast(session_id as bigint) AS session_id,
             min(ts) AS session_start, max(ts) AS session_end
      FROM numbered GROUP BY user_id, session_id),
    errors AS (SELECT user_id, ts FROM events WHERE event_type = 'error')
    SELECT s.user_id, s.session_id, s.session_start,
           cast(count(e.ts) as bigint) AS n_errors
    FROM sessions s LEFT JOIN errors e
      ON s.user_id = e.user_id AND e.ts >= s.session_start AND e.ts <= s.session_end
    GROUP BY s.user_id, s.session_id, s.session_start
    """,
)
def events_errors_per_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment attribution (errors → the session containing
    them) executed as a BINNED range join — the standard rewrite that
    turns a non-equi interval join into an equi-join so it hash-
    partitions at scale.

    The naive spelling joins on `user_id` + `ts BETWEEN start AND end`:
    Spark plans the BETWEEN as a post-filter on the user_id equi-join,
    which degrades when single users own long histories. Here each
    session explodes into the 1-hour buckets it covers (sessions are
    gap-bounded, so this is a tiny fan-out) and each error maps to its
    one bucket; the join key becomes (user_id, bucket) — strictly finer
    partitioning, the BETWEEN only refines within a bucket. The DuckDB
    oracle runs the NAIVE non-equi spelling: two different join
    strategies, one answer.

    LEFT join keeps zero-error sessions (count(e.ts) counts matches)."""
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    numbered = ev.select(
        "user_id",
        "ts",
        F.sum(
            F.when(F.lag("ts").over(w).isNull() | (gap_s > 600), 1).otherwise(0)
        ).over(wsum).alias("session_id"),
    )
    sessions = numbered.groupBy(
        "user_id", F.col("session_id").cast("long").alias("session_id")
    ).agg(F.min("ts").alias("session_start"), F.max("ts").alias("session_end"))

    bucket = lambda c: F.floor(F.unix_timestamp(c) / 3600)  # noqa: E731
    s_binned = sessions.withColumn(
        "bucket", F.explode(F.sequence(bucket(F.col("session_start")), bucket(F.col("session_end"))))
    )
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts"), bucket(F.col("ts")).alias("bucket")
    )
    joined = s_binned.join(
        errors,
        (F.col("user_id") == F.col("e_user"))
        & (s_binned.bucket == errors.bucket)
        & (F.col("e_ts") >= F.col("session_start"))
        & (F.col("e_ts") <= F.col("session_end")),
        "left",
    )
    return joined.groupBy("user_id", "session_id", "session_start").agg(
        F.count("e_ts").cast("long").alias("n_errors")
    )


@query(
    "events_first_type_occurrence",
    """
    SELECT user_id, event_type, ts AS first_ts, event_id AS first_event_id
    FROM (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events)
    WHERE rn = 1
    """,
)
def events_first_type_occurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the state-v2 novelty stream: argmin (ts, event_id)
    per (user, event_type). One shuffle, one window pass."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("first_ts"),
            F.col("event_id").alias("first_event_id"),
        )
    )


def _state_v2_available() -> bool:
    """transformWithStateInPandas drives its state server over protobuf;
    some environments (this container included) ship a broken
    google.protobuf. Gate the stream registration so the declared query
    surface only contains runnable queries — the batch twin above stays
    oracle-checked everywhere, and the equivalence test skips cleanly
    (tests/test_streaming.py)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


if _state_v2_available():

    @query("stream_first_type_occurrence", None)
    def stream_first_type_occurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..streaming.events import first_type_occurrence_stream

        return first_type_occurrence_stream(spark, sf_dir)

    @query("stream_user_totals_state_v2", None)
    def stream_user_totals_state_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..streaming.events import user_totals_state_v2_stream

        return user_totals_state_v2_stream(spark, sf_dir)


@query(
    "events_view_purchase_left",
    """
    SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
           v.ts AS view_ts, p.ts AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + interval 30 minute
    """,
)
def events_view_purchase_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the LEFT OUTER stream-stream join: every view
    row survives, purchase columns null when no same-user purchase
    lands in the 30-minute horizon."""
    ev = load(spark, sf_dir, "events")
    v = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return v.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left",
    ).select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")


@query("stream_view_purchase_left", None)
def stream_view_purchase_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import view_purchase_left_stream

    return view_purchase_left_stream(spark, sf_dir)


@query(
    "events_seasonal_profile",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, count(*) AS n
      FROM events GROUP BY date_trunc('hour', ts)),
    keyed AS (
      -- Spark dayofweek() is 1=Sunday..7=Saturday; DuckDB's is 0-based
      SELECT dayofweek(h) + 1 AS dow, hour(h) AS hod, n FROM hourly),
    profile AS (
      SELECT dow, hod,
             cast(count(*) as bigint) AS n_slots,
             round(cast(sum(cast(n as decimal(18,0))) as double) / count(*), 6) AS mean_events
      FROM keyed GROUP BY dow, hod)
    SELECT cast(dow as bigint) AS dow, cast(hod as bigint) AS hod,
           n_slots, mean_events
    FROM profile
    """,
)
def events_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality profile: mean hourly event volume per (day-of-week,
    hour-of-day) cell — the baseline an anomaly detector subtracts
    before looking at residuals (complements the rolling z-score,
    which is trend-local rather than calendar-aware). Two combinable
    aggregations, no joins."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        hourly.select(
            F.dayofweek("h").cast("long").alias("dow"),
            F.hour("h").cast("long").alias("hod"),
            "n",
        )
        .groupBy("dow", "hod")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_slots"),
            F.round(
                F.sum(F.col("n").cast("decimal(18,0)")).cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_events"),
        )
    )


@query(
    "events_funnel_steps_ordered",
    """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
    SELECT cast((SELECT count(*) FROM s1) as bigint) AS n_signup,
           cast((SELECT count(*) FROM s2) as bigint) AS n_then_view,
           cast((SELECT count(*) FROM s3) as bigint) AS n_then_purchase,
           round((SELECT count(*) FROM s2)::double
                 / greatest((SELECT count(*) FROM s1), 1), 6) AS view_rate,
           round((SELECT count(*) FROM s3)::double
                 / greatest((SELECT count(*) FROM s2), 1), 6) AS purchase_rate
    """,
)
def events_funnel_steps_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ORDERED 3-step funnel (signup → later view → later
    purchase): each stage anchors on the previous stage's first
    completion time, so out-of-order activity doesn't count — the
    semantics product funnels actually need (the 2-step join funnel
    only checks co-occurrence within a horizon).

    Shape: three user-keyed min-aggregations, each joined to the
    previous stage's anchor — combinable aggs + equi-joins, one
    single-row summary out."""
    ev = load(spark, sf_dir, "events")
    s1 = ev.where(F.col("event_type") == "signup").groupBy("user_id").agg(F.min("ts").alias("t1"))
    s2 = (
        ev.where(F.col("event_type") == "view")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c1 = s1.agg(F.count(F.lit(1)).alias("n_signup"))
    c2 = s2.agg(F.count(F.lit(1)).alias("n_then_view"))
    c3 = s3.agg(F.count(F.lit(1)).alias("n_then_purchase"))
    return (
        c1.crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(c3))
        .select(
            F.col("n_signup").cast("long").alias("n_signup"),
            F.col("n_then_view").cast("long").alias("n_then_view"),
            F.col("n_then_purchase").cast("long").alias("n_then_purchase"),
            F.round(
                F.col("n_then_view").cast("double") / F.greatest(F.col("n_signup"), F.lit(1)), 6
            ).alias("view_rate"),
            F.round(
                F.col("n_then_purchase").cast("double")
                / F.greatest(F.col("n_then_view"), F.lit(1)),
                6,
            ).alias("purchase_rate"),
        )
    )


@query(
    "events_journey_patterns",
    """
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS journey
      FROM events GROUP BY user_id)
    SELECT user_id,
           cast(length(journey) as bigint) AS n_steps,
           cast(len(regexp_extract_all(journey, 'vp')) as bigint) AS n_view_then_purchase,
           cast(len(regexp_extract_all(journey, 'e+')) as bigint) AS n_error_bursts,
           cast(length(regexp_extract(journey, 'e+')) as bigint) AS first_error_burst_len
    FROM seq
    """,
)
def events_journey_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern analytics without MATCH_RECOGNIZE: compress
    each user's ordered history into a journey string (one char per
    event type, (ts, event_id)-ordered), then count regex patterns —
    immediate view→purchase adjacencies, error bursts (maximal runs),
    first burst length. The compile-the-sequence-to-a-string trick
    turns sequential pattern queries into vectorized regex over one
    row per user.

    Shape: hierarchical collect — the heavy ordered collect happens per
    (user, SESSION) (10-min-gap sessions via the same gaps-and-islands
    windows as ``events_sessionize_batch``), so per-group state is
    bounded by session length, never a user's whole history; the
    per-user combine then concatenates the few per-session strings in
    session order. Exact: sessions partition the (ts, event_id)-ordered
    history contiguously (a session boundary is by construction a ts
    gap), so concatenating session journeys in order rebuilds the full
    journey string. Then a narrow regex map."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    numbered = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("ch"),
        F.when(F.lag("ts").over(w).isNull() | (gap_s > 600), 1).otherwise(0).alias("new_session"),
    ).withColumn("session_id", F.sum("new_session").over(wsum))
    session_journey = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "ch"))),
            lambda x: x.ch,
        ),
        "",
    )
    per_session = numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"), session_journey.alias("sj")
    )
    user_journey = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("session_id", "sj"))),
            lambda x: x.sj,
        ),
        "",
    )
    seq = per_session.groupBy("user_id").agg(user_journey.alias("journey"))
    return seq.select(
        "user_id",
        F.length("journey").cast("long").alias("n_steps"),
        F.size(F.regexp_extract_all(F.col("journey"), F.lit("vp"), F.lit(0)))
        .cast("long")
        .alias("n_view_then_purchase"),
        F.size(F.regexp_extract_all(F.col("journey"), F.lit("e+"), F.lit(0)))
        .cast("long")
        .alias("n_error_bursts"),
        F.length(F.regexp_extract(F.col("journey"), "e+", 0)).cast("long").alias(
            "first_error_burst_len"
        ),
    )


@query("stream_rolling_actives", None)
def stream_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct actives as a dedup→window-agg stateful
    chain (rows-only: two chained stateful operators aren't
    SQL-expressible; the equivalence test pins finalized days to
    ``rolling_7d_active_users``)."""
    from ..streaming.events import rolling_actives_stream

    return rolling_actives_stream(spark, sf_dir)


@query(
    "stream_state_introspection",
    """
    SELECT user_id, cast(count(*) as bigint) AS n_events
    FROM events GROUP BY user_id
    """,
)
def stream_state_introspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming STATE as a table (§2.10 ops surface, Spark 4
    ``statestore`` reader): drain the per-user count aggregate with
    availableNow, then read the checkpoint's raw state back. An
    unwatermarked aggregate never evicts, so the state snapshot must
    equal the batch ``GROUP BY user_id`` — giving the state-reader
    path a full cross-engine oracle instead of the usual rows-only
    streaming check. The debugging workflow this enables at scale
    (state cardinality / skew audits over a live query's checkpoint)
    needs no changes to the running job.

    Cleanup caveat (local-harness trade-off): the returned DataFrame is
    pinned by an EAGER ``localCheckpoint`` whose blocks live
    MEMORY_AND_DISK on executors — non-reliable storage. On a real
    cluster an executor loss after the ``rmtree`` below would make any
    later action unrecoverable (the state-store files are gone). If
    this query ever runs outside the single-JVM harness, defer the
    checkpoint-dir cleanup (or collect to rows / use a reliable
    checkpoint) instead."""
    import shutil
    import tempfile

    from ..streaming.events import user_totals_state_snapshot

    ckpt = tempfile.mkdtemp(prefix="state_introspect_")
    try:
        # eager localCheckpoint materializes the snapshot into block
        # storage so the checkpoint dir (state-store files included)
        # can be removed instead of leaking one dir per invocation
        return user_totals_state_snapshot(spark, sf_dir, ckpt).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


@query("hll_sketch_partition_merge", None)
def hll_sketch_partition_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count SKETCHES (Spark 3.5+/4 DataSketches
    functions, §2.6 sketch family): per-event-type HLL sketches of the
    user set (``hll_sketch_agg``) unioned into a global sketch
    (``hll_union_agg``) — the partial-aggregate algebra that lets 100 TB
    distinct counts maintain incrementally (per-partition/per-day
    sketches persist; every rollup is a cheap union, the raw data is
    never rescanned; lossless union unlike bounded KMV). Rows-only: the
    sketch binary is engine-internal — the error-bound test pins both
    the per-type and unioned estimates within HLL tolerance of exact,
    and union-vs-flat-sketch identity."""
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.lit("ALL").alias("event_type"),
    ).select("event_type", F.round("est", 2).alias("est_users"), F.lit(None).cast("long").alias("exact_users"))
    per = per_type.select(
        "event_type",
        F.round(F.hll_sketch_estimate("sk"), 2).alias("est_users"),
        F.col("exact_users").cast("long").alias("exact_users"),
    )
    return per.unionByName(merged)
