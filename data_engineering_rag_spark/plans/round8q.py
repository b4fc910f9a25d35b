"""Round-8 capability extensions (SURVEY.md §2.13 ⊕⊕⊕): pipeline
observability (CollectMetrics / ``df.observe``), Arrow-native batch
UDFs (``mapInArrow``), the remaining privacy audit (t-closeness), the
classical rank/variance test battery (Mann-Whitney U, Kruskal-Wallis,
one-way ANOVA, Kendall τ-b), multiple-testing control (Benjamini-
Hochberg step-up), closed-form multi-feature OLS, item-item cosine
similarity (co-occurrence recommender shape), and quantile
normalization across groups.

Cross-engine determinism rules as in ``plans/__init__``; the recurring
trick here is RANK-STATISTIC EXACTNESS: midranks are kept as DOUBLED
integers (2·midrank is always integral), so every rank sum, tie term,
and U statistic is exact bigint arithmetic in both engines, and the
single float division happens once at the end, written identically in
both dialects.

No reference twin: the reference (alexeygrigorev/data-engineering-rag)
stops at RAG glue; these are engine-side operations a 100 TB corpus /
experimentation platform additionally needs (A/B test batteries run
per-segment at fleet scale; observability metrics ride the existing
action instead of a second scan).
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
# Rank statistics: Mann-Whitney U with midranks kept as exact doubled
# integers — the two-sample test every A/B platform runs per segment
# --------------------------------------------------------------------------


@query(
    "mann_whitney_purchase_vs_rest",
    """
    WITH e AS (
      SELECT value, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1
      FROM events WHERE value IS NOT NULL),
    vals AS (
      SELECT value, cast(count(*) as bigint) AS c,
             cast(sum(g1) as bigint) AS c1
      FROM e GROUP BY value),
    ranked AS (
      SELECT value, c, c1,
             cast(sum(c) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c as bigint)
               AS cum_less
      FROM vals),
    agg AS (
      SELECT cast(sum(c1) as bigint) AS n1,
             cast(sum(c - c1) as bigint) AS n2,
             cast(sum(c1 * (2 * cum_less + c + 1)) as bigint) AS r1_doubled,
             cast(sum(c * c * c - c) as bigint) AS tie_term
      FROM ranked)
    SELECT n1, n2,
           r1_doubled - n1 * (n1 + 1) AS u1_doubled,
           round((cast(r1_doubled - n1 * (n1 + 1) as double) - cast(n1 * n2 as double))
                 / (2.0 * sqrt(cast(n1 as double) * n2 / 12.0
                     * ((n1 + n2 + 1) - cast(tie_term as double)
                        / ((n1 + n2) * (n1 + n2 - 1.0))))), 6) AS z_stat
    FROM agg
    """,
)
def mann_whitney_purchase_vs_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-WHITNEY U (Wilcoxon rank-sum) comparing purchase-event
    values against all other events — the canonical nonparametric
    two-sample test for skewed metrics. Exactness trick: the midrank of
    value v is (cum_less + (c+1)/2), which is half-integral, so the
    DOUBLED rank sum Σ c1·(2·cum_less + c + 1) is exact bigint in both
    engines, as is the cubic tie term Σ(c³−c); the tie-corrected normal
    z is the single float expression, written identically in both
    dialects. Scale: one groupBy on value + one running sum over the
    |distinct values| rollup — never a per-row global sort."""
    e = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "value",
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g1"),
        )
    )
    vals = e.groupBy("value").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("g1").cast("long").alias("c1"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = vals.withColumn("cum_less", (F.sum("c").over(w) - F.col("c")).cast("long"))
    agg = ranked.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).cast("long").alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("cum_less") + F.col("c") + 1))
        .cast("long")
        .alias("r1_doubled"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tie_term"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    u1_doubled = F.col("r1_doubled") - n1 * (n1 + 1)
    sigma = F.sqrt(
        n1.cast("double") * n2 / 12.0
        * (
            (n1 + n2 + 1)
            - F.col("tie_term").cast("double") / ((n1 + n2) * (n1 + n2 - 1.0))
        )
    )
    return agg.select(
        "n1",
        "n2",
        u1_doubled.alias("u1_doubled"),
        F.round(
            (u1_doubled.cast("double") - (n1 * n2).cast("double")) / (2.0 * sigma), 6
        ).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# Kruskal-Wallis H: the k-sample rank test (same doubled-midrank trick)
# --------------------------------------------------------------------------


@query(
    "kruskal_wallis_value_by_type",
    """
    WITH e AS (
      SELECT event_type, value FROM events WHERE value IS NOT NULL),
    vals AS (
      SELECT value, cast(count(*) as bigint) AS c FROM e GROUP BY value),
    ranked AS (
      SELECT value, c,
             cast(sum(c) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c as bigint)
               AS cum_less
      FROM vals),
    gv AS (
      SELECT e.event_type, e.value, cast(count(*) as bigint) AS cg
      FROM e GROUP BY e.event_type, e.value),
    grp AS (
      SELECT gv.event_type,
             cast(sum(gv.cg) as bigint) AS ng,
             cast(sum(gv.cg * (2 * r.cum_less + r.c + 1)) as bigint) AS r2g
      FROM gv JOIN ranked r ON gv.value = r.value
      GROUP BY gv.event_type),
    tie AS (SELECT cast(sum(c * c * c - c) as bigint) AS t FROM vals),
    tot AS (SELECT cast(sum(ng) as bigint) AS n,
                   cast(count(*) as bigint) AS k FROM grp),
    term AS (
      SELECT event_type,
             (cast(r2g as double) * cast(r2g as double)) / (4.0 * ng) AS term
      FROM grp),
    s AS (
      -- float addition is order-dependent; an ORDERED prefix sum makes
      -- both engines add identical doubles in identical (key) order
      SELECT cum AS ssum FROM (
        SELECT sum(term) OVER (ORDER BY event_type
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               row_number() OVER (ORDER BY event_type DESC) AS rn
        FROM term) q WHERE rn = 1)
    SELECT tot.n, tot.k,
           round(12.0 * s.ssum / (tot.n * (tot.n + 1.0))
                 - 3.0 * (tot.n + 1), 6) AS h_stat,
           round((12.0 * s.ssum / (tot.n * (tot.n + 1.0))
                  - 3.0 * (tot.n + 1))
                 / (1.0 - cast(tie.t as double)
                    / (cast(tot.n as double) * tot.n * tot.n - tot.n)), 6)
             AS h_tie_corrected
    FROM tot CROSS JOIN s CROSS JOIN tie
    """,
)
def kruskal_wallis_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL-WALLIS H across all event types — the k-sample extension
    of Mann-Whitney (does any event type's value distribution differ?).
    Midranks stay doubled integers, so each group's rank sum R2g and
    the cubic tie term are exact bigints; the per-group R²/n terms are
    identical doubles summed via an ORDERED prefix sum (float addition
    is order-dependent; fixing the order by group key makes both
    engines add identical doubles identically — double→decimal casts
    are NOT portable at this magnitude: Spark shortens to the string
    repr, DuckDB expands the exact binary). Scale: two
    rollups (by value; by type,value) + an equi-join on value — the
    rank table is |distinct values|, never |rows|."""
    e = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    vals = e.groupBy("value").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = vals.withColumn("cum_less", (F.sum("c").over(w) - F.col("c")).cast("long"))
    gv = e.groupBy("event_type", "value").agg(F.count(F.lit(1)).cast("long").alias("cg"))
    from ..operators.scale import durable_checkpoint

    # grp is k rows but costs the full rank pipeline; materialize it so
    # the three scalar consumers below don't re-run the join+windows.
    grp = durable_checkpoint(
        gv.join(ranked, "value")
        .groupBy("event_type")
        .agg(
            F.sum("cg").cast("long").alias("ng"),
            F.sum(F.col("cg") * (2 * F.col("cum_less") + F.col("c") + 1))
            .cast("long")
            .alias("r2g"),
        )
    )
    tie = vals.agg(
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).cast("long").alias("t")
    )
    tot = grp.agg(
        F.sum("ng").cast("long").alias("n"), F.count(F.lit(1)).cast("long").alias("k")
    )
    term = grp.select(
        "event_type",
        (
            (F.col("r2g").cast("double") * F.col("r2g").cast("double"))
            / (4.0 * F.col("ng"))
        ).alias("term"),
    )
    wcum = Window.orderBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = (
        term.select(
            F.sum("term").over(wcum).alias("cum"),
            F.row_number().over(Window.orderBy(F.col("event_type").desc())).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select(F.col("cum").alias("ssum"))
    )
    h_raw = (
        12.0 * F.col("ssum") / (F.col("n") * (F.col("n") + 1.0))
        - 3.0 * (F.col("n") + 1)
    )
    corr = 1.0 - F.col("t").cast("double") / (
        F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
    )
    return (
        tot.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(tie))
        .select(
            "n",
            "k",
            F.round(h_raw, 6).alias("h_stat"),
            F.round(h_raw / corr, 6).alias("h_tie_corrected"),
        )
    )


# --------------------------------------------------------------------------
# One-way ANOVA F: variance decomposition from combinable group sums
# --------------------------------------------------------------------------


@query(
    "anova_f_price_by_status",
    """
    WITH grp AS (
      SELECT o_orderstatus,
             cast(count(*) as bigint) AS ng,
             sum(cast(o_totalprice as decimal(18,2))) AS sg
      FROM orders GROUP BY o_orderstatus),
    tot AS (
      SELECT cast(count(*) as bigint) AS n,
             cast(count(DISTINCT o_orderstatus) as bigint) AS k,
             cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS s,
             cast(sum(cast(o_totalprice * o_totalprice as decimal(38,4))) as double)
               AS sxx
      FROM orders),
    term AS (
      SELECT o_orderstatus,
             (cast(sg as double) * cast(sg as double)) / ng AS term
      FROM grp),
    a AS (
      -- ordered prefix sum: identical doubles added in identical order
      -- in both engines (double->decimal casts diverge at this
      -- magnitude: Spark shortens to string repr, DuckDB expands the
      -- exact binary)
      SELECT cum AS asum FROM (
        SELECT sum(term) OVER (ORDER BY o_orderstatus
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               row_number() OVER (ORDER BY o_orderstatus DESC) AS rn
        FROM term) q WHERE rn = 1)
    SELECT tot.k, tot.n,
           round(a.asum - tot.s * tot.s / tot.n, 4) AS ss_between,
           round(tot.sxx - a.asum, 4) AS ss_within,
           round(((a.asum - tot.s * tot.s / tot.n) / (tot.k - 1))
                 / ((tot.sxx - a.asum) / (tot.n - tot.k)), 6) AS f_stat
    FROM tot CROSS JOIN a
    """,
)
def anova_f_price_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F for order value across order statuses, computed
    entirely from COMBINABLE sufficient statistics (per-group count and
    exact decimal sum, global Σx and Σx²) — the map-side-combinable
    shape that makes classical variance decomposition a single shuffle
    at any scale. SSB = Σ Sg²/ng − S²/N and SSW = Σx² − Σ Sg²/ng; the
    per-group Sg²/ng doubles are summed via an ordered prefix sum so
    cross-group float-addition order cannot diverge between engines."""
    o = load(spark, sf_dir, "orders")
    grp = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sg"),
    )
    tot = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("o_orderstatus").cast("long").alias("k"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("s"),
        F.sum((F.col("o_totalprice") * F.col("o_totalprice")).cast("decimal(38,4)"))
        .cast("double")
        .alias("sxx"),
    )
    term = grp.select(
        "o_orderstatus",
        (
            (F.col("sg").cast("double") * F.col("sg").cast("double")) / F.col("ng")
        ).alias("term"),
    )
    wcum = Window.orderBy("o_orderstatus").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    a = (
        term.select(
            F.sum("term").over(wcum).alias("cum"),
            F.row_number()
            .over(Window.orderBy(F.col("o_orderstatus").desc()))
            .alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select(F.col("cum").alias("asum"))
    )
    ssb = F.col("asum") - F.col("s") * F.col("s") / F.col("n")
    ssw = F.col("sxx") - F.col("asum")
    return (
        tot.crossJoin(F.broadcast(a))
        .select(
            "k",
            "n",
            F.round(ssb, 4).alias("ss_between"),
            F.round(ssw, 4).alias("ss_within"),
            F.round((ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 6)
            .alias("f_stat"),
        )
    )


# --------------------------------------------------------------------------
# Multiple testing: per-nation z-tests + Benjamini-Hochberg step-up.
# Normal CDF via the Abramowitz-Stegun 7.1.26 polynomial — pure
# arithmetic, portable to any engine.
# --------------------------------------------------------------------------

BH_ALPHA = 0.05

_AS_PHI = (
    "(1.0 - exp(-{z} * {z} / 2.0) / sqrt(2.0 * pi()) * "
    "(0.319381530 * {t} - 0.356563782 * {t} * {t} "
    "+ 1.781477937 * {t} * {t} * {t} "
    "- 1.821255978 * {t} * {t} * {t} * {t} "
    "+ 1.330274429 * {t} * {t} * {t} * {t} * {t}))"
)


def _phi_sql(zcol: str) -> str:
    """Φ(|z|) via Abramowitz-Stegun 7.1.26 (|ε| < 7.5e-8), written as
    one expression usable verbatim in BOTH dialects."""
    t = f"(1.0 / (1.0 + 0.2316419 * {zcol}))"
    return _AS_PHI.format(z=zcol, t=t)


@query(
    "bh_fdr_nation_acctbal",
    f"""
    WITH tot AS (
      SELECT cast(count(*) as bigint) AS n,
             cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS s,
             cast(sum(cast(c_acctbal * c_acctbal as decimal(38,4))) as double) AS sxx
      FROM customer),
    grp AS (
      SELECT c_nationkey, cast(count(*) as bigint) AS ng,
             cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS sg
      FROM customer GROUP BY c_nationkey),
    z AS (
      SELECT g.c_nationkey, g.ng,
             abs((g.sg / g.ng - t.s / t.n)
                 / (sqrt(t.sxx / t.n - (t.s / t.n) * (t.s / t.n)) / sqrt(g.ng)))
               AS az
      FROM grp g CROSS JOIN tot t),
    p AS (
      SELECT c_nationkey, ng, az,
             2.0 * (1.0 - {_phi_sql("az")}) AS pval
      FROM z),
    ranked AS (
      SELECT c_nationkey, ng, az, pval,
             cast(row_number() OVER (ORDER BY pval, c_nationkey) as bigint) AS p_rank,
             cast(count(*) OVER () as bigint) AS m
      FROM p),
    kstar AS (
      SELECT max(CASE WHEN pval * m <= p_rank * {BH_ALPHA} THEN p_rank
                      ELSE 0 END) AS k
      FROM ranked)
    SELECT r.c_nationkey, r.ng AS n_cust, round(r.az, 6) AS abs_z,
           round(r.pval, 8) AS p_value, r.p_rank,
           r.p_rank <= k.k AS rejected
    FROM ranked r CROSS JOIN kstar k
    """,
)
def bh_fdr_nation_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIPLE-TESTING CONTROL: per-nation two-sided z-test of mean
    account balance against the global mean, then BENJAMINI-HOCHBERG
    step-up at α={BH_ALPHA} — the m-hypotheses-at-once shape every
    experimentation platform runs per segment. Φ comes from the
    Abramowitz-Stegun 7.1.26 polynomial (|ε|<7.5e-8) written as the
    SAME arithmetic expression in both dialects — no engine erf needed.
    The step-up is the multiply form p·m ≤ i·α (no division), k* is a
    single global max, and rejection is a rank comparison — two window
    passes over an m-row table, independent of |customer|."""
    c = load(spark, sf_dir, "customer")
    tot = c.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("s"),
        F.sum((F.col("c_acctbal") * F.col("c_acctbal")).cast("decimal(38,4)"))
        .cast("double")
        .alias("sxx"),
    )
    grp = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("sg"),
    )
    z = grp.crossJoin(F.broadcast(tot)).select(
        "c_nationkey",
        "ng",
        F.abs(
            (F.col("sg") / F.col("ng") - F.col("s") / F.col("n"))
            / (
                F.sqrt(
                    F.col("sxx") / F.col("n")
                    - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n"))
                )
                / F.sqrt(F.col("ng"))
            )
        ).alias("az"),
    )
    p = z.select(
        "c_nationkey", "ng", "az", F.expr(f"2.0 * (1.0 - {_phi_sql('az')})").alias("pval")
    )
    wrank = Window.orderBy("pval", "c_nationkey")
    ranked = p.select(
        "c_nationkey",
        "ng",
        "az",
        "pval",
        F.row_number().over(wrank).cast("long").alias("p_rank"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("m"),
    )
    kstar = ranked.agg(
        F.max(
            F.when(
                F.col("pval") * F.col("m") <= F.col("p_rank") * BH_ALPHA, F.col("p_rank")
            ).otherwise(F.lit(0))
        ).alias("k")
    )
    return ranked.crossJoin(F.broadcast(kstar)).select(
        "c_nationkey",
        F.col("ng").alias("n_cust"),
        F.round("az", 6).alias("abs_z"),
        F.round("pval", 8).alias("p_value"),
        "p_rank",
        (F.col("p_rank") <= F.col("k")).alias("rejected"),
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
# Item-item cosine similarity from order co-baskets — the co-occurrence
# recommender shape (pair space bounded by per-basket size, never |items|²)
# --------------------------------------------------------------------------

ITEM_COS_MIN_CO = 2  # candidate pairs must co-occur in >= this many baskets
ITEM_COS_TOPK = 5


@query(
    "item_cosine_similarity_topk",
    f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    deg AS (
      SELECT l_partkey, cast(count(*) as bigint) AS na
      FROM basket GROUP BY l_partkey),
    co AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             cast(count(*) as bigint) AS co
      FROM basket a JOIN basket b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY pa, pb
      HAVING count(*) >= {ITEM_COS_MIN_CO}),
    sym AS (
      SELECT pa, pb, co FROM co
      UNION ALL
      SELECT pb AS pa, pa AS pb, co FROM co),
    scored AS (
      SELECT s.pa, s.pb, s.co,
             s.co / sqrt(cast(da.na as double) * db.na) AS cos_sim
      FROM sym s
      JOIN deg da ON da.l_partkey = s.pa
      JOIN deg db ON db.l_partkey = s.pb),
    ranked AS (
      SELECT pa, pb, co, cos_sim,
             row_number() OVER (PARTITION BY pa
               ORDER BY cos_sim DESC, pb) AS rk
      FROM scored)
    SELECT pa AS part_a, pb AS part_b, co AS n_cobaskets,
           round(cos_sim, 6) AS cosine, cast(rk as bigint) AS rank
    FROM ranked WHERE rk <= {ITEM_COS_TOPK}
    """,
)
def item_cosine_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITEM-ITEM COSINE similarity over order co-baskets (binary
    incidence), top-{ITEM_COS_TOPK} neighbours per part — the
    co-occurrence recommender kernel. Complements
    ``basket_pair_lift_top20`` (support/lift) with the norm-adjusted
    metric real recommenders rank by. Scale shape: the pair space is
    Σ_orders basket² (bounded by basket size, never |parts|²), the
    min-co-occurrence HAVING prunes the long tail before the degree
    join, and per-part degrees are a broadcastable |parts| table — the
    DIMSUM observation that cosine needs only co-counts and two norms.
    Cosine = co/√(na·nb) is one identical double expression; ranking
    ties break on part key so both engines pick identical rows."""
    basket = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    deg = basket.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("na"))
    a = basket.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = basket.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    co = (
        a.join(b, "ok")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("co"))
        .where(F.col("co") >= ITEM_COS_MIN_CO)
    )
    sym = co.unionByName(
        co.select(F.col("pb").alias("pa"), F.col("pa").alias("pb"), "co")
    )
    da = deg.select(F.col("l_partkey").alias("pa"), F.col("na").alias("na"))
    db = deg.select(F.col("l_partkey").alias("pb"), F.col("na").alias("nb"))
    scored = (
        sym.join(F.broadcast(da), "pa")
        .join(F.broadcast(db), "pb")
        .select(
            "pa",
            "pb",
            "co",
            (F.col("co") / F.sqrt(F.col("na").cast("double") * F.col("nb"))).alias(
                "cos_sim"
            ),
        )
    )
    wk = Window.partitionBy("pa").orderBy(F.col("cos_sim").desc(), F.col("pb"))
    return (
        scored.withColumn("rk", F.row_number().over(wk))
        .where(F.col("rk") <= ITEM_COS_TOPK)
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("co").alias("n_cobaskets"),
            F.round("cos_sim", 6).alias("cosine"),
            F.col("rk").cast("long").alias("rank"),
        )
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
# Kendall τ-b on a deterministic sample — concordance with full tie
# correction, pair space loudly bounded
# --------------------------------------------------------------------------

KT_SAMPLE_MOD = 20  # keep custkeys with hash % MOD == 0 (~5%)
KT_SAMPLE_CAP = 20000  # loud cap: pair space is n², refuse beyond this


@query(
    "kendall_tau_acctbal_orders",
    f"""
    WITH samp AS (
      SELECT c_custkey, c_acctbal,
             cast(concat('0x', substr(md5(concat(cast(c_custkey as varchar), 'kt8')), 1, 15)) as bigint)
               % {KT_SAMPLE_MOD} AS h
      FROM customer),
    x AS (
      SELECT s.c_custkey, s.c_acctbal AS x,
             cast(coalesce(o.n, 0) as bigint) AS y
      FROM samp s
      LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) o
        ON o.o_custkey = s.c_custkey
      WHERE s.h = 0),
    pairs AS (
      SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS conc,
             CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS disc,
             CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
      FROM x a JOIN x b ON a.c_custkey < b.c_custkey),
    agg AS (
      SELECT cast((SELECT count(*) FROM x) as bigint) AS n,
             cast(sum(conc) as bigint) AS c,
             cast(sum(disc) as bigint) AS d,
             cast(sum(tx) as bigint) AS n1,
             cast(sum(ty) as bigint) AS n2,
             cast(count(*) as bigint) AS n0
      FROM pairs)
    SELECT n, c AS concordant, d AS discordant,
           round((c - d) / sqrt(cast(n0 - n1 as double) * (n0 - n2)), 6)
             AS tau_b
    FROM agg
    """,
)
def kendall_tau_acctbal_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL τ-b between customer account balance and order count on
    a DETERMINISTIC hash sample (salted md5 → ~{100 // KT_SAMPLE_MOD}%
    of customers; the portable-randomness pattern from
    ``dataset_split_assign``). Concordant/discordant/tied pair counts
    are exact integers from a bounded self-join — the pair space is
    sample², enforced by a LOUD {KT_SAMPLE_CAP}-row cap (assert_true,
    job fails rather than silently degrading) since τ's exact pairwise
    form is quadratic by definition; Spearman (rank-linear, full-data)
    lives in ``spearman_acctbal_orders`` — this is the
    tie-robust complement run on samples at scale."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit("kt8"))), 1, 15),
                16,
                10,
            ).cast("long")
            % KT_SAMPLE_MOD
        ).alias("h"),
    )
    o = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    x = (
        c.where(F.col("h") == 0)
        .join(o, c["c_custkey"] == o["o_custkey"], "left")
        .select(
            "c_custkey",
            F.col("c_acctbal").alias("x"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("y"),
        )
    )
    from ..operators.scale import durable_checkpoint

    x = durable_checkpoint(x)
    # loud pair-space cap: fail rather than run an unbounded n² join
    nx = x.agg(F.count(F.lit(1)).alias("n")).withColumn(
        "_cap",
        F.assert_true(
            F.col("n") <= F.lit(KT_SAMPLE_CAP),
            F.lit(f"kendall_tau: sample exceeds {KT_SAMPLE_CAP} rows; raise KT_SAMPLE_MOD"),
        ),
    ).drop("_cap")
    a_ = x.select(F.col("c_custkey").alias("ka"), F.col("x").alias("xa"), F.col("y").alias("ya"))
    b_ = x.select(F.col("c_custkey").alias("kb"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    pairs = a_.join(b_, F.col("ka") < F.col("kb")).select(
        F.when((F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb")) > 0, 1)
        .otherwise(0)
        .alias("conc"),
        F.when((F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb")) < 0, 1)
        .otherwise(0)
        .alias("disc"),
        F.when(F.col("xa") == F.col("xb"), 1).otherwise(0).alias("tx"),
        F.when(F.col("ya") == F.col("yb"), 1).otherwise(0).alias("ty"),
    )
    agg = pairs.agg(
        F.sum("conc").cast("long").alias("c"),
        F.sum("disc").cast("long").alias("d"),
        F.sum("tx").cast("long").alias("n1"),
        F.sum("ty").cast("long").alias("n2"),
        F.count(F.lit(1)).cast("long").alias("n0"),
    )
    return (
        agg.crossJoin(F.broadcast(nx))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("c").alias("concordant"),
            F.col("d").alias("discordant"),
            F.round(
                (F.col("c") - F.col("d"))
                / F.sqrt(
                    (F.col("n0") - F.col("n1")).cast("double")
                    * (F.col("n0") - F.col("n2"))
                ),
                6,
            ).alias("tau_b"),
        )
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


# --------------------------------------------------------------------------
# Association rules, completed: directed confidence + conviction
# --------------------------------------------------------------------------

RULE_MIN_SUPPORT = 3
RULE_TOPK = 20


@query(
    "association_rules_conviction_topk",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT cast(count(DISTINCT l_orderkey) as bigint) AS n_orders FROM items),
    per AS (SELECT l_partkey, cast(count(*) as bigint) AS cnt
            FROM items GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             cast(count(*) as bigint) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY pa, pb
      HAVING count(*) >= {RULE_MIN_SUPPORT}),
    rules AS (
      SELECT pa AS antecedent, pb AS consequent, support FROM pairs
      UNION ALL
      SELECT pb AS antecedent, pa AS consequent, support FROM pairs),
    scored AS (
      SELECT r.antecedent, r.consequent, r.support,
             cast(r.support as double) / ca.cnt AS confidence,
             (1.0 - cast(cb.cnt as double) / n.n_orders)
               / (1.0 - cast(r.support as double) / ca.cnt) AS conviction
      FROM rules r
      JOIN per ca ON ca.l_partkey = r.antecedent
      JOIN per cb ON cb.l_partkey = r.consequent
      CROSS JOIN n
      WHERE r.support < ca.cnt)
    SELECT antecedent, consequent, support,
           round(confidence, 6) AS confidence,
           round(conviction, 6) AS conviction
    FROM scored
    ORDER BY conviction DESC, antecedent, consequent
    LIMIT {RULE_TOPK}
    """,
)
def association_rules_conviction_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRECTED association rules ranked by CONVICTION
    (1−supp(B))/(1−conf(A→B)) — completing the apriori metric set
    (support in ``basket_part_pairs``, lift/confidence in
    ``basket_pair_lift``): conviction measures how much more often A
    appears WITHOUT B than expected if independent, and unlike lift it
    is directional. conf = 1 rules (division by zero) are excluded via
    support < cnt(A). Same bounded pair-space shape as the basket
    family; the final ranking is TakeOrdered({RULE_TOPK}) with a full
    deterministic tie-break."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    from ..operators.scale import durable_checkpoint

    items = durable_checkpoint(li)
    n = items.agg(F.countDistinct("l_orderkey").cast("long").alias("n_orders"))
    per = items.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .where(F.col("support") >= RULE_MIN_SUPPORT)
    )
    rules = pairs.select(
        F.col("pa").alias("antecedent"), F.col("pb").alias("consequent"), "support"
    ).unionByName(
        pairs.select(
            F.col("pb").alias("antecedent"), F.col("pa").alias("consequent"), "support"
        )
    )
    ca = per.select(F.col("l_partkey").alias("antecedent"), F.col("cnt").alias("ca"))
    cb = per.select(F.col("l_partkey").alias("consequent"), F.col("cnt").alias("cb"))
    scored = (
        rules.join(F.broadcast(ca), "antecedent")
        .join(F.broadcast(cb), "consequent")
        .crossJoin(F.broadcast(n))
        .where(F.col("support") < F.col("ca"))
        .select(
            "antecedent",
            "consequent",
            "support",
            (F.col("support").cast("double") / F.col("ca")).alias("confidence"),
            (
                (1.0 - F.col("cb").cast("double") / F.col("n_orders"))
                / (1.0 - F.col("support").cast("double") / F.col("ca"))
            ).alias("conviction"),
        )
    )
    return (
        scored.orderBy(F.col("conviction").desc(), "antecedent", "consequent")
        .limit(RULE_TOPK)
        .select(
            "antecedent",
            "consequent",
            "support",
            F.round("confidence", 6).alias("confidence"),
            F.round("conviction", 6).alias("conviction"),
        )
    )
