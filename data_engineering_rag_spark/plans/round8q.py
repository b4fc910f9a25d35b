"""Round-8 capability extensions (SURVEY.md §2.13 ⊕⊕⊕) — the
remaining grab-bag after the round-10 thematic split (VERDICT r9
item 7; registry names and oracle SQL byte-identical): pipeline
observability (CollectMetrics / ``df.observe``), Arrow-native batch
UDFs (``mapInArrow``), the t-closeness privacy audit, closed-form
multi-feature OLS and the ridge path, quantile normalization, PAVA
isotonic calibration, Markov removal-effect attribution, and the
SQL-surface sugar (SQL UDF, COLLATE, LISTAGG, mode/median).

Split-out siblings: classical hypothesis tests → ``stattestsq.py``;
time-series drift/forecasting → ``forecastq.py``; mergeable sketches /
integrity / IVM → ``sketchq.py``; similarity joins / linkage /
recommenders → ``linkageq.py``.

Cross-engine determinism rules as in ``plans/__init__``.

No reference twin: the reference (alexeygrigorev/data-engineering-rag)
stops at RAG glue; these are engine-side operations a 100 TB corpus /
experimentation platform additionally needs (observability metrics
ride the existing action instead of a second scan).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from . import load, query

# --------------------------------------------------------------------------
# Pipeline observability: CollectMetrics via df.observe — metrics ride
# the existing action; no second scan of the input
# --------------------------------------------------------------------------


@query(
    "observe_pipeline_metrics",
    """
    SELECT cast(count(*) as bigint) AS n_docs,
           cast(sum(n_chars) as bigint) AS total_chars,
           cast(min(n_chars) as bigint) AS min_chars,
           cast(max(n_chars) as bigint) AS max_chars,
           cast(count(CASE WHEN lang = 'en' THEN 1 END) as bigint) AS n_english
    FROM documents
    """,
)
def observe_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline OBSERVABILITY via ``df.observe`` (CollectMetrics
    operator, §2.11 ops surface): named aggregate metrics attached to
    the scan are collected as a side-channel of the SAME action — the
    pattern for row-count / null-rate / freshness audits that must not
    cost a second pass over 100 TB. The query materializes the observed
    metrics as a single-row DataFrame; integer-only aggregates keep the
    channel bit-deterministic. The ``.count()`` here is the pipeline's
    own terminal action, not an extra one."""
    from pyspark.sql import Observation

    docs = load(spark, sf_dir, "documents")
    obs = Observation("ingest_metrics")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.count(F.when(F.col("lang") == "en", 1)).cast("long").alias("n_english"),
    )
    observed.count()  # the pipeline action the metrics ride on
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_docs"],
                m["total_chars"],
                m["min_chars"],
                m["max_chars"],
                m["n_english"],
            )
        ],
        "n_docs bigint, total_chars bigint, min_chars bigint, max_chars bigint, n_english bigint",
    )


# --------------------------------------------------------------------------
# Arrow-native batch transform: mapInArrow — zero pandas conversion,
# columnar end-to-end
# --------------------------------------------------------------------------


@query(
    "arrow_byte_stats_by_lang",
    """
    SELECT lang,
           cast(count(*) as bigint) AS n_docs,
           cast(sum(strlen(text)) as bigint) AS total_bytes,
           cast(sum(length(text)) as bigint) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def arrow_byte_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` surface (§2.11 UDF family): per-batch columnar
    compute with NO pandas materialization — pyarrow.compute kernels
    run directly on the Arrow record batches Spark ships (binary_length
    = UTF-8 bytes, utf8_length = codepoints). The aggregation stays
    JVM-side after the Arrow stage. This is the fast lane for
    byte-level work (tokenizer budgeting, storage sizing) where even a
    pandas round-trip is measurable at 100 TB: per-batch overhead is a
    couple of pointer-swaps, not a Series build. Oracle pins that the
    Arrow kernels agree with SQL strlen/length in both engines."""
    import pyarrow as pa

    def batch_stats(batches):
        import pyarrow.compute as pc

        for batch in batches:
            t = pa.table(
                {
                    "lang": batch.column(batch.schema.get_field_index("lang")),
                    "n_bytes": pc.cast(
                        pc.binary_length(
                            batch.column(batch.schema.get_field_index("text"))
                        ),
                        pa.int64(),
                    ),
                    "n_chars": pc.cast(
                        pc.utf8_length(
                            batch.column(batch.schema.get_field_index("text"))
                        ),
                        pa.int64(),
                    ),
                }
            )
            yield from t.to_batches()

    docs = load(spark, sf_dir, "documents").select("lang", "text")
    per_doc = docs.mapInArrow(batch_stats, "lang string, n_bytes bigint, n_chars bigint")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# --------------------------------------------------------------------------
# Privacy: t-closeness (completes the k-anonymity / l-diversity / DP
# release family) — total-variation distance kept EXACT in integers
# --------------------------------------------------------------------------

TCLOSE_BUCKET_W = 2000  # sensitive attr = acctbal bucket of this width
TCLOSE_T = 0.35  # groups with TVD above this fail the audit


@query(
    "t_closeness_audit",
    f"""
    WITH c AS (
      SELECT c_nationkey, c_mktsegment,
             cast(floor(c_acctbal / {TCLOSE_BUCKET_W}) as bigint) AS sens
      FROM customer),
    tot AS (SELECT cast(count(*) as bigint) AS n FROM c),
    gsens AS (SELECT sens, cast(count(*) as bigint) AS cs FROM c GROUP BY sens),
    grp AS (SELECT c_nationkey, c_mktsegment, cast(count(*) as bigint) AS ng
            FROM c GROUP BY c_nationkey, c_mktsegment),
    cell AS (SELECT c_nationkey, c_mktsegment, sens,
                    cast(count(*) as bigint) AS cgs
             FROM c GROUP BY c_nationkey, c_mktsegment, sens),
    grid AS (
      SELECT g.c_nationkey, g.c_mktsegment, g.ng, s.sens, s.cs,
             coalesce(cell.cgs, 0) AS cgs
      FROM grp g CROSS JOIN gsens s
      LEFT JOIN cell ON cell.c_nationkey = g.c_nationkey
                    AND cell.c_mktsegment = g.c_mktsegment
                    AND cell.sens = s.sens)
    SELECT g.c_nationkey, g.c_mktsegment, max(g.ng) AS n_group,
           round(cast(sum(abs(g.cgs * t.n - g.cs * g.ng)) as double)
                 / (2.0 * max(g.ng) * t.n), 6) AS tvd,
           (cast(sum(abs(g.cgs * t.n - g.cs * g.ng)) as double)
                 / (2.0 * max(g.ng) * t.n)) > {TCLOSE_T} AS fails_t
    FROM grid g CROSS JOIN tot t
    GROUP BY g.c_nationkey, g.c_mktsegment, t.n
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-CLOSENESS audit (completes the privacy family: k-anonymity,
    l-diversity, DP-noised release): per quasi-identifier group
    (nation, market segment), the total-variation distance between the
    group's sensitive-attribute distribution (acctbal bucket) and the
    global one. The TVD numerator Σ|cgs·N − cs·ng| is EXACT bigint
    arithmetic (no per-bucket float accumulation — float sum order
    differs across engines); one double division at the end. Absent
    (group, bucket) cells enter via the grid left-join — a missing
    bucket still contributes |0 − cs·ng|. Scale: |groups|×|buckets|
    grid rows, all equi-joins, combinable aggregates."""
    c = load(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / TCLOSE_BUCKET_W).cast("long").alias("sens"),
    )
    tot = c.agg(F.count(F.lit(1)).cast("long").alias("n"))
    glob = c.groupBy("sens").agg(F.count(F.lit(1)).cast("long").alias("cs"))
    grp = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("ng")
    )
    cell = c.groupBy("c_nationkey", "c_mktsegment", "sens").agg(
        F.count(F.lit(1)).cast("long").alias("cgs")
    )
    grid = (
        grp.crossJoin(F.broadcast(glob))
        .join(cell, ["c_nationkey", "c_mktsegment", "sens"], "left")
        .withColumn("cgs", F.coalesce(F.col("cgs"), F.lit(0)))
    )
    tvd_raw = F.sum(F.abs(F.col("cgs") * F.col("n") - F.col("cs") * F.col("ng"))).cast(
        "double"
    ) / (F.lit(2.0) * F.max("ng") * F.max("n"))
    return (
        grid.crossJoin(F.broadcast(tot))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.max("ng").alias("n_group"),
            F.round(tvd_raw, 6).alias("tvd"),
            (tvd_raw > TCLOSE_T).alias("fails_t"),
        )
    )


# --------------------------------------------------------------------------
# Closed-form multi-feature OLS via centered normal equations — the
# one-shuffle regression every feature-audit pipeline can afford
# --------------------------------------------------------------------------


@query(
    "ols_price_qty_discount",
    """
    WITH s AS (
      SELECT cast(count(*) as bigint) AS n,
             cast(sum(cast(l_quantity as decimal(18,2))) as double) AS s1,
             cast(sum(cast(l_discount as decimal(18,2))) as double) AS s2,
             cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sy,
             cast(sum(cast(l_quantity * l_quantity as decimal(38,4))) as double) AS s11,
             cast(sum(cast(l_quantity * l_discount as decimal(38,4))) as double) AS s12,
             cast(sum(cast(l_discount * l_discount as decimal(38,4))) as double) AS s22,
             cast(sum(cast(l_quantity * l_extendedprice as decimal(38,4))) as double) AS s1y,
             cast(sum(cast(l_discount * l_extendedprice as decimal(38,4))) as double) AS s2y,
             cast(sum(cast(l_extendedprice * l_extendedprice as decimal(38,4))) as double) AS syy
      FROM lineitem),
    c AS (
      SELECT n,
             s11 - s1 * s1 / n AS cx1, s22 - s2 * s2 / n AS cx2,
             s12 - s1 * s2 / n AS cx12,
             s1y - s1 * sy / n AS cx1y, s2y - s2 * sy / n AS cx2y,
             syy - sy * sy / n AS cyy, s1, s2, sy
      FROM s),
    b AS (
      SELECT n, s1, s2, sy, cx1y, cx2y, cyy,
             (cx1y * cx2 - cx2y * cx12) / (cx1 * cx2 - cx12 * cx12) AS b1,
             (cx2y * cx1 - cx1y * cx12) / (cx1 * cx2 - cx12 * cx12) AS b2
      FROM c)
    SELECT n,
           round((sy - b1 * s1 - b2 * s2) / n, 6) AS beta0,
           round(b1, 6) AS beta_qty,
           round(b2, 6) AS beta_discount,
           round((b1 * cx1y + b2 * cx2y) / cyy, 6) AS r2
    FROM b
    """,
)
def ols_price_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS (extendedprice ~ quantity + discount) solved in
    CLOSED FORM from the centered normal equations — ten combinable
    sufficient statistics (one shuffle), a 2×2 solve, done. This is the
    shape that makes per-segment regression audits affordable at fleet
    scale: no iteration, no feature matrix materialized, and adding a
    GROUP BY segment turns it into thousands of regressions in the same
    single pass. All Σ are exact decimals; the solve is identical
    double arithmetic in both dialects."""
    li = load(spark, sf_dir, "lineitem")
    s = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("s1"),
        F.sum(F.col("l_discount").cast("decimal(18,2)")).cast("double").alias("s2"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sy"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(38,4)"))
        .cast("double")
        .alias("s11"),
        F.sum((F.col("l_quantity") * F.col("l_discount")).cast("decimal(38,4)"))
        .cast("double")
        .alias("s12"),
        F.sum((F.col("l_discount") * F.col("l_discount")).cast("decimal(38,4)"))
        .cast("double")
        .alias("s22"),
        F.sum((F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(38,4)"))
        .cast("double")
        .alias("s1y"),
        F.sum((F.col("l_discount") * F.col("l_extendedprice")).cast("decimal(38,4)"))
        .cast("double")
        .alias("s2y"),
        F.sum((F.col("l_extendedprice") * F.col("l_extendedprice")).cast("decimal(38,4)"))
        .cast("double")
        .alias("syy"),
    )
    c = s.select(
        "n",
        "s1",
        "s2",
        "sy",
        (F.col("s11") - F.col("s1") * F.col("s1") / F.col("n")).alias("cx1"),
        (F.col("s22") - F.col("s2") * F.col("s2") / F.col("n")).alias("cx2"),
        (F.col("s12") - F.col("s1") * F.col("s2") / F.col("n")).alias("cx12"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / F.col("n")).alias("cx1y"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / F.col("n")).alias("cx2y"),
        (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")).alias("cyy"),
    )
    det = F.col("cx1") * F.col("cx2") - F.col("cx12") * F.col("cx12")
    b1 = (F.col("cx1y") * F.col("cx2") - F.col("cx2y") * F.col("cx12")) / det
    b2 = (F.col("cx2y") * F.col("cx1") - F.col("cx1y") * F.col("cx12")) / det
    b = c.select("n", "s1", "s2", "sy", "cx1y", "cx2y", "cyy", b1.alias("b1"), b2.alias("b2"))
    return b.select(
        "n",
        F.round((F.col("sy") - F.col("b1") * F.col("s1") - F.col("b2") * F.col("s2")) / F.col("n"), 6).alias("beta0"),
        F.round("b1", 6).alias("beta_qty"),
        F.round("b2", 6).alias("beta_discount"),
        F.round((F.col("b1") * F.col("cx1y") + F.col("b2") * F.col("cx2y")) / F.col("cyy"), 6).alias("r2"),
    )


# --------------------------------------------------------------------------
# Quantile normalization across groups (the bioinformatics classic,
# here: make event-value distributions comparable across event types)
# --------------------------------------------------------------------------

QNORM_BUCKETS = 20


@query(
    "quantile_normalize_value_by_type",
    f"""
    WITH e AS (
      SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL),
    bucketed AS (
      SELECT event_type,
             ntile({QNORM_BUCKETS}) OVER (PARTITION BY event_type
               ORDER BY value, event_id) AS q,
             value
      FROM e),
    bstat AS (
      SELECT event_type, cast(q as bigint) AS q,
             cast(count(*) as bigint) AS n_bucket,
             cast(sum(cast(value as decimal(18,6))) as double) / count(*)
               AS bucket_avg
      FROM bucketed GROUP BY event_type, q),
    target AS (
      -- ordered prefix sum over event_type: identical doubles added in
      -- identical order in both engines
      SELECT q, cum / nt AS target_avg FROM (
        SELECT q,
               sum(bucket_avg) OVER (PARTITION BY q ORDER BY event_type
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               row_number() OVER (PARTITION BY q ORDER BY event_type DESC) AS rn,
               count(*) OVER (PARTITION BY q) AS nt
        FROM bstat) t WHERE rn = 1)
    SELECT b.event_type, b.q, b.n_bucket,
           round(b.bucket_avg, 6) AS bucket_avg,
           round(t.target_avg, 6) AS target_avg,
           round(b.bucket_avg - t.target_avg, 6) AS delta
    FROM bstat b JOIN target t ON b.q = t.q
    """,
)
def quantile_normalize_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE NORMALIZATION across event types: each type's value
    distribution is summarized into {QNORM_BUCKETS} equal-rank buckets
    (ntile over a DETERMINISTIC total order — ties broken by event_id),
    the cross-type target is the per-bucket mean of bucket means, and
    the per-(type, bucket) delta is the correction the normalization
    would apply — the classic make-distributions-comparable transform
    (microarray normalization; feature alignment across cohorts).
    Per-bucket means use exact decimal sums; the cross-type mean is an
    ordered prefix sum (float order portability). Scale: one window
    per type partition + a {QNORM_BUCKETS}×k rollup."""
    e = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
    )
    wq = Window.partitionBy("event_type").orderBy("value", "event_id")
    bucketed = e.select(
        "event_type", F.ntile(QNORM_BUCKETS).over(wq).alias("q"), "value"
    )
    bstat = bucketed.groupBy("event_type", F.col("q").cast("long").alias("q")).agg(
        F.count(F.lit(1)).cast("long").alias("n_bucket"),
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("bucket_avg"),
    )
    wcum = Window.partitionBy("q").orderBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    target = (
        bstat.select(
            "q",
            F.sum("bucket_avg").over(wcum).alias("cum"),
            F.row_number()
            .over(Window.partitionBy("q").orderBy(F.col("event_type").desc()))
            .alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("q")).alias("nt"),
        )
        .where(F.col("rn") == 1)
        .select("q", (F.col("cum") / F.col("nt")).alias("target_avg"))
    )
    return bstat.join(target, "q").select(
        "event_type",
        "q",
        "n_bucket",
        F.round("bucket_avg", 6).alias("bucket_avg"),
        F.round("target_avg", 6).alias("target_avg"),
        F.round(F.col("bucket_avg") - F.col("target_avg"), 6).alias("delta"),
    )


# --------------------------------------------------------------------------
# Spark-4 SQL surface, continued: SQL UDFs, collation, listagg,
# mode/median aggregates
# --------------------------------------------------------------------------


@query(
    "sql_udf_net_revenue",
    """
    SELECT l_returnflag,
           cast(count(*) as bigint) AS n_items,
           round(cast(sum(cast(l_extendedprice * (1.0 - l_discount)
                               as decimal(18,4))) as double), 4) AS net_revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sql_udf_net_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language UDF (Spark 4 ``CREATE FUNCTION ... RETURN expr``,
    §2.9 surface): the net-price formula is declared ONCE as a catalog
    function and reused — and because the body is SQL, Catalyst INLINES
    it into the plan (whole-stage codegen, pushdown-friendly), unlike
    any Python UDF. The oracle is the hand-inlined twin, pinning that
    the UDF path is semantically transparent."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("r8_lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION r8_net_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               cast(count(*) as bigint) AS n_items,
               round(cast(sum(cast(r8_net_price(l_extendedprice, l_discount)
                                   as decimal(18,4))) as double), 4) AS net_revenue
        FROM r8_lineitem GROUP BY l_returnflag
        """
    )


@query(
    "collated_source_rollup",
    """
    WITH d AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END
               AS source_mixed,
             n_chars
      FROM documents)
    SELECT lower(source_mixed) AS source_ci,
           cast(count(*) as bigint) AS n_docs,
           cast(sum(n_chars) as bigint) AS total_chars
    FROM d GROUP BY lower(source_mixed)
    """,
)
def collated_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING COLLATION (Spark 4 ``COLLATE UTF8_LCASE``, §2.9 surface):
    grouping on a case-insensitively collated column — the engine-level
    spelling of case-insensitive semantics that keeps comparisons,
    joins, and GROUP BY collation-aware WITHOUT wrapping every
    reference in lower() (at 100 TB, collation-aware grouping avoids
    materializing a second lowercased column through the shuffle). The
    query plants mixed-case variants (even doc_ids upper-cased), groups
    on the collated value, and emits lower() of the representative so
    the output is engine-independent; the oracle is the lower()-twin."""
    d = load(spark, sf_dir, "documents").selectExpr(
        "CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS source_mixed",
        "n_chars",
    )
    d.createOrReplaceTempView("r8_docs_mixed")
    return spark.sql(
        """
        SELECT lower(k) AS source_ci,
               cast(count(*) as bigint) AS n_docs,
               cast(sum(n_chars) as bigint) AS total_chars
        FROM (SELECT source_mixed COLLATE UTF8_LCASE AS k, n_chars
              FROM r8_docs_mixed)
        GROUP BY lower(k)
        """
    )


@query(
    "listagg_sources_by_lang",
    """
    SELECT lang,
           cast(count(*) as bigint) AS n_docs,
           string_agg(DISTINCT source, ',' ORDER BY source) AS sources_csv
    FROM documents GROUP BY lang
    """,
)
def listagg_sources_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED STRING AGGREGATION (Spark 4 ``listagg(...) WITHIN GROUP
    (ORDER BY ...)``; DuckDB spells it string_agg ... ORDER BY): the
    deterministic CSV rollup — an explicit WITHIN GROUP order is the
    only way a string aggregate can be stable on a distributed engine,
    where partition arrival order is nondeterministic by design. DISTINCT
    + ORDER BY makes the result a pure function of the group's set."""
    d = load(spark, sf_dir, "documents")
    d.createOrReplaceTempView("r8_docs_listagg")
    return spark.sql(
        """
        SELECT lang,
               cast(count(*) as bigint) AS n_docs,
               listagg(DISTINCT source, ',') WITHIN GROUP (ORDER BY source)
                 AS sources_csv
        FROM r8_docs_listagg GROUP BY lang
        """
    )


@query(
    "mode_median_lineitem_stats",
    """
    SELECT l_returnflag,
           mode(l_linestatus) AS status_mode,
           round(median(l_quantity), 4) AS qty_median,
           round(median(l_extendedprice), 4) AS price_median,
           cast(count(*) as bigint) AS n_items
    FROM lineitem GROUP BY l_returnflag
    """,
)
def mode_median_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct ``mode()`` / ``median()`` aggregates (Spark 3.4+/4, §2.6
    aggregate surface) — the ergonomic spellings of argmax-by-count and
    percentile_cont(0.5). mode() is well-defined here because the
    (returnflag, linestatus) contingency is never tied by construction
    of the TPC-H status semantics (R/A flags pair with F status, N with
    O) — a tie would be caught by the cross-engine gate, since the two
    engines break mode ties independently. median() interpolates the
    middle pair identically ((a+b)/2) in both engines."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.mode("l_linestatus").alias("status_mode"),
        F.round(F.median("l_quantity"), 4).alias("qty_median"),
        F.round(F.median("l_extendedprice"), 4).alias("price_median"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


#: Ridge penalty grid. The per-sample spelling lam*n keeps the
#: regularization strength scale-invariant across SFs.
RIDGE_LAMBDAS = (0.0, 0.1, 1.0, 10.0)


@query(
    "ridge_path_price_qty_discount",
    f"""
    WITH s AS (
      SELECT cast(count(*) as bigint) AS n,
             cast(sum(cast(l_quantity as decimal(18,2))) as double) AS s1,
             cast(sum(cast(l_discount as decimal(18,2))) as double) AS s2,
             cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sy,
             cast(sum(cast(l_quantity * l_quantity as decimal(38,4))) as double) AS s11,
             cast(sum(cast(l_quantity * l_discount as decimal(38,4))) as double) AS s12,
             cast(sum(cast(l_discount * l_discount as decimal(38,4))) as double) AS s22,
             cast(sum(cast(l_quantity * l_extendedprice as decimal(38,4))) as double) AS s1y,
             cast(sum(cast(l_discount * l_extendedprice as decimal(38,4))) as double) AS s2y,
             cast(sum(cast(l_extendedprice * l_extendedprice as decimal(38,4))) as double) AS syy
      FROM lineitem),
    c AS (
      SELECT n,
             s11 - s1 * s1 / n AS cx1, s22 - s2 * s2 / n AS cx2,
             s12 - s1 * s2 / n AS cx12,
             s1y - s1 * sy / n AS cx1y, s2y - s2 * sy / n AS cx2y,
             syy - sy * sy / n AS cyy, s1, s2, sy
      FROM s),
    l AS (
      SELECT cast(v.lam as double) AS lam
      FROM (VALUES {", ".join(f"({x})" for x in RIDGE_LAMBDAS)}) v(lam)),
    b AS (
      SELECT l.lam, c.n, c.s1, c.s2, c.sy, c.cx1y, c.cx2y, c.cyy,
             c.cx1, c.cx2, c.cx12,
             (c.cx1y * (c.cx2 + l.lam * c.n) - c.cx2y * c.cx12)
               / ((c.cx1 + l.lam * c.n) * (c.cx2 + l.lam * c.n)
                  - c.cx12 * c.cx12) AS b1,
             (c.cx2y * (c.cx1 + l.lam * c.n) - c.cx1y * c.cx12)
               / ((c.cx1 + l.lam * c.n) * (c.cx2 + l.lam * c.n)
                  - c.cx12 * c.cx12) AS b2
      FROM l CROSS JOIN c)
    SELECT lam, n,
           round((sy - b1 * s1 - b2 * s2) / n, 6) AS beta0,
           round(b1, 6) AS beta_qty,
           round(b2, 6) AS beta_discount,
           round(1.0 - (cyy - 2.0 * (b1 * cx1y + b2 * cx2y)
                        + b1 * b1 * cx1 + 2.0 * b1 * b2 * cx12
                        + b2 * b2 * cx2) / cyy, 6) AS r2
    FROM b ORDER BY lam
    """,
)
def ridge_path_price_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIDGE REGULARIZATION PATH for extendedprice ~ quantity +
    discount: the same ten combinable moment sums as
    `ols_price_qty_discount` (exact decimals → one double cast), then
    the closed-form 2x2 solve (Cxx + lam*n*I)b = Cxy evaluated at
    {len(RIDGE_LAMBDAS)} penalties in one pass — lam=0 reproduces OLS,
    the grid shows the coefficient-shrinkage/R2 trade every feature
    audit wants. Scale: the data is touched ONCE (one aggregate); the
    path is a {len(RIDGE_LAMBDAS)}-row lateral over the 1-row moment
    table, so extending the grid costs nothing. All per-lam arithmetic
    is identical float expressions in both dialects."""
    li = load(spark, sf_dir, "lineitem")

    def dsum(col, dec):
        return F.sum(F.expr(f"cast({col} as decimal({dec}))")).cast("double")

    s = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum("l_quantity", "18,2").alias("s1"),
        dsum("l_discount", "18,2").alias("s2"),
        dsum("l_extendedprice", "18,2").alias("sy"),
        dsum("l_quantity * l_quantity", "38,4").alias("s11"),
        dsum("l_quantity * l_discount", "38,4").alias("s12"),
        dsum("l_discount * l_discount", "38,4").alias("s22"),
        dsum("l_quantity * l_extendedprice", "38,4").alias("s1y"),
        dsum("l_discount * l_extendedprice", "38,4").alias("s2y"),
        dsum("l_extendedprice * l_extendedprice", "38,4").alias("syy"),
    )
    c = s.select(
        "n", "s1", "s2", "sy",
        (F.col("s11") - F.col("s1") * F.col("s1") / F.col("n")).alias("cx1"),
        (F.col("s22") - F.col("s2") * F.col("s2") / F.col("n")).alias("cx2"),
        (F.col("s12") - F.col("s1") * F.col("s2") / F.col("n")).alias("cx12"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / F.col("n")).alias("cx1y"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / F.col("n")).alias("cx2y"),
        (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")).alias("cyy"),
    )
    lams = spark.range(1).select(
        F.explode(F.array(*[F.lit(float(x)) for x in RIDGE_LAMBDAS])).alias("lam")
    )
    lam_n = F.col("lam") * F.col("n")
    det = (F.col("cx1") + lam_n) * (F.col("cx2") + lam_n) - F.col("cx12") * F.col("cx12")
    b1 = (F.col("cx1y") * (F.col("cx2") + lam_n) - F.col("cx2y") * F.col("cx12")) / det
    b2 = (F.col("cx2y") * (F.col("cx1") + lam_n) - F.col("cx1y") * F.col("cx12")) / det
    b = lams.crossJoin(F.broadcast(c)).select(
        "lam", "n", "s1", "s2", "sy", "cx1y", "cx2y", "cyy", "cx1", "cx2", "cx12",
        b1.alias("b1"), b2.alias("b2"),
    )
    sse = (
        F.col("cyy")
        - 2.0 * (F.col("b1") * F.col("cx1y") + F.col("b2") * F.col("cx2y"))
        + F.col("b1") * F.col("b1") * F.col("cx1")
        + 2.0 * F.col("b1") * F.col("b2") * F.col("cx12")
        + F.col("b2") * F.col("b2") * F.col("cx2")
    )
    return b.select(
        "lam", "n",
        F.round((F.col("sy") - F.col("b1") * F.col("s1") - F.col("b2") * F.col("s2")) / F.col("n"), 6).alias("beta0"),
        F.round("b1", 6).alias("beta_qty"),
        F.round("b2", 6).alias("beta_discount"),
        F.round(1.0 - sse / F.col("cyy"), 6).alias("r2"),
    ).orderBy("lam")


#: Isotonic calibration bin count (quantile bins of the score).
PAVA_BINS = 20


@query("isotonic_pava_calibration", None)  # rows-only: PAVA is iterative
def isotonic_pava_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISOTONIC REGRESSION (pool-adjacent-violators) calibration of the
    purchase rate against the event value score: events are cut into
    {PAVA_BINS} exact quantile bins by (value, event_id) — via the
    range-exchange `with_global_ntile` kernel, never a single-partition
    ntile — then PAVA pools adjacent bins until the calibrated rate is
    nondecreasing in the score, the standard monotone recalibration
    for ML scores (sklearn IsotonicRegression semantics, weights =
    bin counts). The PAVA pass itself runs in ONE `applyInPandas` call
    over the {PAVA_BINS}-row bin table — bounded driver-independent
    state, not a .collect() — because PAVA is inherently sequential;
    at 100 TB the billions of rows reduce to the same {PAVA_BINS} bins
    before the sequential step, so the non-distributed part is O(bins).
    Rows-only by design (no SQL oracle for the iterative pooling);
    tests/test_round8_batch3.py pins PAVA output against a brute-force
    numpy implementation plus the monotonicity + weighted-mean-
    preservation invariants."""
    import pandas as pd

    from ..operators.scale import with_global_ntile

    e = load(spark, sf_dir, "events").select(
        "event_id",
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    ).where(F.col("value").isNotNull())
    binned = with_global_ntile(e, PAVA_BINS, ["value", "event_id"], bucket_col="bin")
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_value"),
        F.sum("conv").cast("long").alias("n_pos"),
    )

    schema = (
        "bin int, n bigint, mean_value double, raw_rate double, iso_rate double"
    )

    def pava(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bin").reset_index(drop=True)
        rates = (pdf["n_pos"] / pdf["n"]).tolist()
        weights = pdf["n"].tolist()
        # Pool-adjacent-violators: maintain a stack of (rate, weight)
        # blocks; merge while the tail violates monotonicity.
        blocks: list[list[float]] = []  # [sum_w*r, w, span]
        for r, w in zip(rates, weights):
            blocks.append([r * w, float(w), 1])
            while len(blocks) > 1 and (
                blocks[-2][0] / blocks[-2][1] > blocks[-1][0] / blocks[-1][1]
            ):
                s, w2, c = blocks.pop()
                blocks[-1][0] += s
                blocks[-1][1] += w2
                blocks[-1][2] += c
        iso: list[float] = []
        for s, w2, c in blocks:
            iso.extend([s / w2] * c)
        return pd.DataFrame(
            {
                "bin": pdf["bin"],
                "n": pdf["n"],
                "mean_value": pdf["mean_value"],
                "raw_rate": [round(r, 6) for r in rates],
                "iso_rate": [round(r, 6) for r in iso],
            }
        )

    return (
        bins.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(pava, schema)
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# Batch 5: Markov-chain attribution (removal effect) + nonparametric
# time-series diagnostics (Mann-Kendall, McNemar, runs test)
# --------------------------------------------------------------------------


@query("markov_removal_effect", None)  # rows-only: absorbing-chain solve
def markov_removal_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARKOV-CHAIN ATTRIBUTION by removal effect: user journeys
    (events ordered by ts per user, START prepended, END appended)
    aggregate into a first-order transition-count matrix; conversion
    probability = P(absorb in PURCHASE before END) from the absorbing-
    chain solve; a channel's removal effect = 1 - P(conv | channel's
    rows/cols deleted)/P(conv), normalized into attribution shares —
    the data-driven alternative to last-touch/linear attribution
    (`events_attribution_*`). Scale: the raw events collapse to a
    |states|² count matrix (= 7x7 here) via one lag window per user
    partition (user_id is high-cardinality, so the window
    parallelizes) and one groupBy; the linear solves run on that tiny
    matrix in a single bounded `applyInPandas` (numpy), never on rows.
    Rows-only: the absorbing-chain inverse is not SQL-expressible;
    tests/test_round8_batch5.py re-derives conversion probabilities by
    power iteration and pins shares."""
    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = e.withColumn("next_type", F.lead("event_type").over(w)).withColumn(
        "prev_type", F.lag("event_type").over(w)
    )
    # interior transitions + START->first + last->END, one pass
    trans = (
        nxt.select(
            F.col("event_type").alias("src"),
            F.coalesce("next_type", F.lit("END")).alias("dst"),
        )
        .unionByName(
            nxt.where(F.col("prev_type").isNull()).select(
                F.lit("START").alias("src"), F.col("event_type").alias("dst")
            )
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )

    schema = "channel string, removal_effect double, attribution_share double, base_conversion double"

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        states = sorted(set(pdf["src"]) | set(pdf["dst"]))
        idx = {s: i for i, s in enumerate(states)}
        n = len(states)
        counts = np.zeros((n, n))
        for r in pdf.itertuples():
            counts[idx[r.src], idx[r.dst]] = r.c
        absorbing = {"purchase", "END"}

        def conv_prob(removed: str | None) -> float:
            if "purchase" not in idx:
                return 0.0
            # Removing a channel deletes its state; the probability mass
            # of transitions INTO it is redirected to END (the visitor
            # leaves), the standard removal-effect convention.
            keep = [s for s in states if s != removed]
            k = {s: i for i, s in enumerate(keep)}
            P = np.zeros((len(keep), len(keep)))
            for s in keep:
                if s in absorbing:
                    P[k[s], k[s]] = 1.0
                    continue
                row = counts[idx[s], :]
                tot = row.sum()
                if tot == 0:
                    P[k[s], k["END"]] = 1.0
                    continue
                for dst in keep:
                    P[k[s], k[dst]] = row[idx[dst]] / tot
                if removed is not None:
                    P[k[s], k["END"]] += row[idx[removed]] / tot
            trans_states = [s for s in keep if s not in absorbing]
            Q = np.array([[P[k[s], k[t]] for t in trans_states] for s in trans_states])
            R = np.array([[P[k[s], k[a]] for a in ("purchase", "END")] for s in trans_states])
            B = np.linalg.solve(np.eye(len(Q)) - Q, R)
            return float(B[trans_states.index("START"), 0])

        base = conv_prob(None)
        channels = [
            s for s in states if s not in absorbing | {"START", "END"}
        ]
        effects = {}
        for ch in channels:
            pc = conv_prob(ch)
            effects[ch] = 1.0 - (pc / base if base > 0 else 0.0)
        tot_eff = sum(max(v, 0.0) for v in effects.values())
        rows = [
            (
                ch,
                round(effects[ch], 8),
                round(max(effects[ch], 0.0) / tot_eff, 8) if tot_eff > 0 else 0.0,
                round(base, 8),
            )
            for ch in sorted(channels)
        ]
        return pd.DataFrame(
            rows,
            columns=["channel", "removal_effect", "attribution_share", "base_conversion"],
        )

    return (
        trans.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(solve, schema)
        .orderBy("channel")
    )
