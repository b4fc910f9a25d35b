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
    sample², enforced by a LOUD {KT_SAMPLE_CAP}-row cap (raise_error
    threaded through the consumed `n` output column, so Catalyst can't
    prune it — job fails rather than silently degrading) since τ's
    exact pairwise
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
    # Loud pair-space cap threaded through the CONSUMED `n` output
    # column (ADVICE r8: an assert_true column that is dropped right
    # after creation gets pruned by Catalyst and never evaluates).
    # The final select reads `n`, so this guard cannot be optimized
    # away: an oversized sample fails the job via raise_error instead
    # of silently running an unbounded n² pair join.
    nx = x.agg(F.count(F.lit(1)).alias("n_raw")).select(
        F.when(F.col("n_raw") <= F.lit(KT_SAMPLE_CAP), F.col("n_raw"))
        .otherwise(
            F.raise_error(
                F.lit(
                    f"kendall_tau: sample exceeds {KT_SAMPLE_CAP} rows; "
                    "raise KT_SAMPLE_MOD"
                )
            )
        )
        .alias("n")
    )
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


# --------------------------------------------------------------------------
# Batch 3: record linkage (Fellegi-Sunter), Kneser-Ney bigram LM,
# two-proportion z-test, ridge regularization path, O'Brien-Fleming
# sequential monitoring, overdispersion audit, isotonic (PAVA)
# calibration
# --------------------------------------------------------------------------

#: Fellegi-Sunter assumed m-probabilities (P[field agrees | same
#: entity]) — fixed model constants; the u-probabilities (P[agrees |
#: different entities]) are ESTIMATED from the data's own value
#: frequencies, the classic FS estimation shortcut.
FS_M_BAND = 0.9
FS_M_SIGN = 0.98
FS_TOPK = 20


@query(
    "fellegi_sunter_linkage",
    f"""
    WITH m AS (SELECT cast(count(*) as bigint) AS n FROM customer),
    band AS (
      SELECT cast(floor(c_acctbal / 100.0) as bigint) AS b,
             cast(count(*) as bigint) AS c
      FROM customer GROUP BY 1),
    ub AS (SELECT cast(sum(c * (c - 1)) as bigint) AS agree_pairs FROM band),
    sgn AS (
      SELECT (c_acctbal >= 0) AS s, cast(count(*) as bigint) AS c
      FROM customer GROUP BY 1),
    us AS (SELECT cast(sum(c * (c - 1)) as bigint) AS agree_pairs FROM sgn),
    u AS (
      SELECT cast(ub.agree_pairs as double) / (m.n * (m.n - 1.0)) AS u_band,
             cast(us.agree_pairs as double) / (m.n * (m.n - 1.0)) AS u_sign
      FROM ub CROSS JOIN us CROSS JOIN m),
    pairs AS (
      SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
             (floor(a.c_acctbal / 100.0) = floor(b.c_acctbal / 100.0))
               AS band_agree,
             ((a.c_acctbal >= 0) = (b.c_acctbal >= 0)) AS sign_agree
      FROM customer a JOIN customer b
        ON a.c_nationkey = b.c_nationkey
       AND a.c_mktsegment = b.c_mktsegment
       AND a.c_custkey < b.c_custkey),
    scored AS (
      SELECT custkey_a, custkey_b, band_agree, sign_agree,
             round((CASE WHEN band_agree THEN ln({FS_M_BAND} / u_band)
                         ELSE ln({1.0 - FS_M_BAND} / (1.0 - u_band)) END)
                 + (CASE WHEN sign_agree THEN ln({FS_M_SIGN} / u_sign)
                         ELSE ln({round(1.0 - FS_M_SIGN, 2)} / (1.0 - u_sign)) END),
                   6) AS fs_score
      FROM pairs CROSS JOIN u)
    SELECT custkey_a, custkey_b, band_agree, sign_agree, fs_score
    FROM scored ORDER BY fs_score DESC, custkey_a, custkey_b
    LIMIT {FS_TOPK}
    """,
)
def fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FELLEGI-SUNTER probabilistic record linkage over the customer
    table: candidate pairs come from a BLOCKED equi-join on
    (nation, mktsegment) — never all-pairs — and each pair is scored
    with log-likelihood match weights ln(m/u) / ln((1-m)/(1-u)) summed
    over two comparison fields (account-balance $100 band, balance
    sign). m are fixed model constants; u are estimated exactly from
    the table's own value-frequency marginals (sum c*(c-1) over
    N*(N-1)), the standard FS estimation shortcut. Top-{FS_TOPK} pairs
    by weight, deterministic key tiebreak. Scale: the u tables are
    tiny single-row broadcasts; the pair generation is an equi-join
    whose fan-out is bounded by block sizes (AQE-splittable); weights
    are one identical float expression per pair in both engines —
    integer pair counts stay exact bigint. Extends the reference's
    exact-match dedup (minsearch `Index.filter`-style equality) to the
    probabilistic-linkage regime a 100 TB entity-resolution pass
    needs."""
    c = load(spark, sf_dir, "customer")
    m = c.agg(F.count(F.lit(1)).cast("long").alias("n"))
    band = c.groupBy(
        F.floor(F.col("c_acctbal") / 100.0).cast("long").alias("b")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    ub = band.agg(
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("agree_pairs")
    )
    sgn = c.groupBy((F.col("c_acctbal") >= 0).alias("s")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    us = sgn.agg(
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("agree_pairs")
    )
    u = (
        ub.crossJoin(us.withColumnRenamed("agree_pairs", "agree_pairs_s"))
        .crossJoin(m)
        .select(
            (F.col("agree_pairs").cast("double") / (F.col("n") * (F.col("n") - 1.0))).alias("u_band"),
            (F.col("agree_pairs_s").cast("double") / (F.col("n") * (F.col("n") - 1.0))).alias("u_sign"),
        )
    )
    a = c.select(
        F.col("c_custkey").alias("custkey_a"),
        "c_nationkey",
        "c_mktsegment",
        F.col("c_acctbal").alias("bal_a"),
    )
    b = c.select(
        F.col("c_custkey").alias("custkey_b"),
        "c_nationkey",
        "c_mktsegment",
        F.col("c_acctbal").alias("bal_b"),
    )
    pairs = a.join(b, ["c_nationkey", "c_mktsegment"]).where(
        F.col("custkey_a") < F.col("custkey_b")
    ).select(
        "custkey_a",
        "custkey_b",
        (F.floor(F.col("bal_a") / 100.0) == F.floor(F.col("bal_b") / 100.0)).alias("band_agree"),
        ((F.col("bal_a") >= 0) == (F.col("bal_b") >= 0)).alias("sign_agree"),
    )
    scored = pairs.crossJoin(F.broadcast(u)).select(
        "custkey_a",
        "custkey_b",
        "band_agree",
        "sign_agree",
        F.round(
            F.when(F.col("band_agree"), F.log(FS_M_BAND / F.col("u_band"))).otherwise(
                F.log((1.0 - FS_M_BAND) / (1.0 - F.col("u_band")))
            )
            + F.when(F.col("sign_agree"), F.log(FS_M_SIGN / F.col("u_sign"))).otherwise(
                F.log(round(1.0 - FS_M_SIGN, 2) / (1.0 - F.col("u_sign")))
            ),
            6,
        ).alias("fs_score"),
    )
    return scored.orderBy(
        F.col("fs_score").desc(), "custkey_a", "custkey_b"
    ).limit(FS_TOPK)


#: Kneser-Ney absolute discount (the canonical 0.75) and output size.
KN_DISCOUNT = 0.75
KN_TOPK = 15

from ..operators.tfidf import TOKEN_PATTERN  # noqa: E402  (module-level reuse)


@query(
    "kneser_ney_bigram_topk",
    f"""
    WITH toks AS (
      SELECT regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS a
      FROM documents),
    bg AS (
      SELECT unnest(list_transform(generate_series(1, len(a) - 1),
                                   i -> concat(a[i], ' ', a[i + 1]))) AS bgr
      FROM toks WHERE len(a) >= 2),
    bc AS (
      SELECT split_part(bgr, ' ', 1) AS w1, split_part(bgr, ' ', 2) AS w2,
             cast(count(*) as bigint) AS c
      FROM bg GROUP BY 1, 2),
    ctx AS (
      SELECT w1, cast(sum(c) as bigint) AS cw1,
             cast(count(*) as bigint) AS n1p_fwd
      FROM bc GROUP BY w1),
    cont AS (
      SELECT w2, cast(count(*) as bigint) AS n1p_rev FROM bc GROUP BY w2),
    tot AS (SELECT cast(count(*) as bigint) AS t FROM bc),
    top_ctx AS (
      SELECT w1, cw1, n1p_fwd FROM ctx ORDER BY cw1 DESC, w1 LIMIT 1),
    scored AS (
      SELECT bc.w1, bc.w2, bc.c,
             round((cast(bc.c as double) - {KN_DISCOUNT}) / tc.cw1
                   + ({KN_DISCOUNT} * tc.n1p_fwd / tc.cw1)
                     * (cast(cont.n1p_rev as double) / tot.t), 8) AS p_kn
      FROM bc
        JOIN top_ctx tc ON bc.w1 = tc.w1
        JOIN cont ON bc.w2 = cont.w2
        CROSS JOIN tot)
    SELECT w1, w2, c AS c_bigram, p_kn
    FROM scored ORDER BY p_kn DESC, w2 LIMIT {KN_TOPK}
    """,
)
def kneser_ney_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated KNESER-NEY bigram probabilities (absolute discount
    D={KN_DISCOUNT}) — the smoothing every n-gram LM quality scorer
    ends up needing (`bigram_lm_perplexity_buckets` uses add-k; KN's
    continuation probability fixes the "San Francisco" pathology where
    a word frequent only inside one collocation gets overweighted as a
    unigram fallback). P_KN(w2|w1) = (c(w1w2)-D)/c(w1·) +
    D·N1+(w1·)/c(w1·) · N1+(·w2)/|bigram types|, emitted for the
    highest-volume context w1 (deterministic tiebreak), top-{KN_TOPK}
    continuations. Scale: every term is a combinable groupBy count
    (bigram/context/continuation tables); the single-context filter is
    a broadcast of a 1-row limit; all counts exact bigint, one
    identical float expression at the end. Extends the reference's
    unigram minsearch weighting (minsearch `Index.fit` TF tables) to
    the LM-smoothing regime."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0)).alias("a")
    )
    bigrams = (
        toks.where(F.size("a") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("a") - 2),
                    lambda i: F.struct(
                        F.col("a")[i].alias("w1"), F.col("a")[i + 1].alias("w2")
                    ),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    bc = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c"))
    from ..operators.scale import durable_checkpoint

    bc = durable_checkpoint(bc)  # three downstream consumers
    ctx = bc.groupBy("w1").agg(
        F.sum("c").cast("long").alias("cw1"),
        F.count(F.lit(1)).cast("long").alias("n1p_fwd"),
    )
    cont = bc.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1p_rev"))
    tot = bc.agg(F.count(F.lit(1)).cast("long").alias("t"))
    top_ctx = ctx.orderBy(F.col("cw1").desc(), "w1").limit(1)
    scored = (
        bc.join(F.broadcast(top_ctx), "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c",
            F.round(
                (F.col("c").cast("double") - KN_DISCOUNT) / F.col("cw1")
                + (KN_DISCOUNT * F.col("n1p_fwd") / F.col("cw1"))
                * (F.col("n1p_rev").cast("double") / F.col("t")),
                8,
            ).alias("p_kn"),
        )
    )
    return (
        scored.orderBy(F.col("p_kn").desc(), "w2")
        .limit(KN_TOPK)
        .select("w1", "w2", F.col("c").alias("c_bigram"), "p_kn")
    )


@query(
    "two_proportion_ztest_weekend",
    f"""
    WITH g AS (
      SELECT (datediff('day', DATE '1970-01-01', cast(ts as date)) % 7)
               IN (2, 3) AS is_weekend,
             cast(count(*) as bigint) AS n,
             cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  as bigint) AS x
      FROM events GROUP BY 1),
    w AS (SELECT n AS n1, x AS x1 FROM g WHERE is_weekend),
    d AS (SELECT n AS n2, x AS x2 FROM g WHERE NOT is_weekend),
    z AS (
      SELECT n1, x1, n2, x2,
             (cast(x1 as double) / n1 - cast(x2 as double) / n2)
             / sqrt((cast(x1 + x2 as double) / (n1 + n2))
                    * (1.0 - cast(x1 + x2 as double) / (n1 + n2))
                    * (1.0 / n1 + 1.0 / n2)) AS zs
      FROM w CROSS JOIN d),
    az AS (SELECT n1, x1, n2, x2, zs, abs(zs) AS a FROM z)
    SELECT n1 AS n_weekend, x1 AS purchases_weekend,
           n2 AS n_weekday, x2 AS purchases_weekday,
           round(zs, 6) AS z_stat,
           round(2.0 * (1.0 - {{phi}}), 8) AS p_value
    FROM az
    """.replace("{phi}", _phi_sql("a")),
)
def two_proportion_ztest_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-PROPORTION pooled z-test: weekend vs weekday purchase
    conversion — the missing member of the round-8 classical battery
    (Mann-Whitney/Kruskal-Wallis/ANOVA cover means and ranks; this is
    the binomial-rate comparison every A/B readout starts with). The
    weekend flag is the engine-portable epoch-day mod 7 (1970-01-01
    was a Thursday → 2,3 = Sat,Sun), NOT dayofweek() whose origin
    differs per engine. Counts are exact bigints from one groupBy; the
    pooled z and the Abramowitz-Stegun Φ p-value are single identical
    float expressions. Scale: one map-side-combinable aggregate over
    events, two 1-row broadcasts."""
    e = load(spark, sf_dir, "events")
    g = e.groupBy(
        (
            F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("1970-01-01"))) % 7
        ).isin(2, 3).alias("is_weekend")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("x"),
    )
    w = g.where("is_weekend").select(F.col("n").alias("n1"), F.col("x").alias("x1"))
    d = g.where("NOT is_weekend").select(F.col("n").alias("n2"), F.col("x").alias("x2"))
    pooled = F.col("x1") + F.col("x2")
    ntot = F.col("n1") + F.col("n2")
    zs = (
        F.col("x1").cast("double") / F.col("n1")
        - F.col("x2").cast("double") / F.col("n2")
    ) / F.sqrt(
        (pooled.cast("double") / ntot)
        * (1.0 - pooled.cast("double") / ntot)
        * (1.0 / F.col("n1") + 1.0 / F.col("n2"))
    )
    az = w.crossJoin(d).select("n1", "x1", "n2", "x2", zs.alias("zs"), F.abs(zs).alias("a"))
    return az.select(
        F.col("n1").alias("n_weekend"),
        F.col("x1").alias("purchases_weekend"),
        F.col("n2").alias("n_weekday"),
        F.col("x2").alias("purchases_weekday"),
        F.round("zs", 6).alias("z_stat"),
        F.round(F.expr(f"2.0 * (1.0 - {_phi_sql('a')})"), 8).alias("p_value"),
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


#: O'Brien-Fleming-shaped sequential boundary, normalized so the final
#: look (information fraction 1) sits just above z_{0.025}=1.96 —
#: boundary(t) = OBF_FINAL_Z / sqrt(t).
OBF_FINAL_Z = 1.969


@query(
    "obrien_fleming_sequential_ab",
    f"""
    WITH base AS (
      SELECT cast(ts as date) AS day, (user_id % 2 = 0) AS grp_a,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
      FROM events),
    daily AS (
      SELECT day, grp_a, cast(count(*) as bigint) AS n,
             cast(sum(conv) as bigint) AS x
      FROM base GROUP BY day, grp_a),
    days AS (SELECT DISTINCT day FROM daily),
    grid AS (
      SELECT d.day, g.grp_a,
             coalesce(dl.n, 0) AS n, coalesce(dl.x, 0) AS x
      FROM days d
        CROSS JOIN (SELECT true AS grp_a UNION ALL SELECT false) g
        LEFT JOIN daily dl ON dl.day = d.day AND dl.grp_a = g.grp_a),
    cum AS (
      SELECT day, grp_a,
             cast(sum(n) OVER (PARTITION BY grp_a ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS cn,
             cast(sum(x) OVER (PARTITION BY grp_a ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS cx
      FROM grid),
    wide AS (
      SELECT a.day, a.cn AS cn_a, a.cx AS cx_a, b.cn AS cn_b, b.cx AS cx_b
      FROM cum a JOIN cum b ON a.day = b.day AND a.grp_a AND NOT b.grp_a),
    tot AS (
      SELECT max(cn_a) + max(cn_b) AS n_total FROM wide),
    z AS (
      SELECT w.day, w.cn_a, w.cx_a, w.cn_b, w.cx_b,
             cast(w.cn_a + w.cn_b as double) / t.n_total AS info_frac,
             (cast(w.cx_a as double) / w.cn_a - cast(w.cx_b as double) / w.cn_b)
             / sqrt((cast(w.cx_a + w.cx_b as double) / (w.cn_a + w.cn_b))
                    * (1.0 - cast(w.cx_a + w.cx_b as double) / (w.cn_a + w.cn_b))
                    * (1.0 / w.cn_a + 1.0 / w.cn_b)) AS zs
      FROM wide w CROSS JOIN tot t)
    SELECT day, cn_a, cx_a, cn_b, cx_b,
           round(info_frac, 8) AS info_frac,
           round(zs, 6) AS z_stat,
           round({OBF_FINAL_Z} / sqrt(info_frac), 6) AS z_bound,
           abs(zs) > {OBF_FINAL_Z} / sqrt(info_frac) AS crossed
    FROM z ORDER BY day
    """,
)
def obrien_fleming_sequential_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-SEQUENTIAL A/B MONITORING with an O'Brien-Fleming-shaped
    boundary: the deterministic even/odd user_id split is monitored
    daily on purchase conversion; each look recomputes the pooled
    two-proportion z on CUMULATIVE counts and compares |z| against
    boundary(t) = {OBF_FINAL_Z}/sqrt(t) (t = information fraction), the
    OBF shape that spends almost no alpha early and ~0.05 overall at
    the final look. This is the peeking-safe readout an
    experimentation platform runs every morning — naive daily
    fixed-horizon tests inflate false positives 3-5x. Exactness:
    cumulative counts are integer prefix sums over the day x group
    grid (missing cells coalesced to 0), so every z input is exact
    bigint; z/bound/crossed are identical float expressions. Scale:
    one groupBy(day, grp), windows over |days| rows, 1-row total
    broadcast."""
    e = load(spark, sf_dir, "events")
    base = e.select(
        F.col("ts").cast("date").alias("day"),
        (F.col("user_id") % 2 == 0).alias("grp_a"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    daily = base.groupBy("day", "grp_a").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("x"),
    )
    days = daily.select("day").distinct()
    groups = spark.range(1).select(
        F.explode(F.array(F.lit(True), F.lit(False))).alias("grp_a")
    )
    grid = (
        days.crossJoin(F.broadcast(groups))
        .join(daily, ["day", "grp_a"], "left")
        .select(
            "day",
            "grp_a",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.coalesce("x", F.lit(0)).cast("long").alias("x"),
        )
    )
    wcum = (
        Window.partitionBy("grp_a")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "day",
        "grp_a",
        F.sum("n").over(wcum).cast("long").alias("cn"),
        F.sum("x").over(wcum).cast("long").alias("cx"),
    )
    a = cum.where("grp_a").select(
        "day", F.col("cn").alias("cn_a"), F.col("cx").alias("cx_a")
    )
    bside = cum.where("NOT grp_a").select(
        "day", F.col("cn").alias("cn_b"), F.col("cx").alias("cx_b")
    )
    wide = a.join(bside, "day")
    tot = wide.agg((F.max("cn_a") + F.max("cn_b")).alias("n_total"))
    info = (F.col("cn_a") + F.col("cn_b")).cast("double") / F.col("n_total")
    pooled = (F.col("cx_a") + F.col("cx_b")).cast("double") / (F.col("cn_a") + F.col("cn_b"))
    zs = (
        F.col("cx_a").cast("double") / F.col("cn_a")
        - F.col("cx_b").cast("double") / F.col("cn_b")
    ) / F.sqrt(pooled * (1.0 - pooled) * (1.0 / F.col("cn_a") + 1.0 / F.col("cn_b")))
    z = wide.crossJoin(F.broadcast(tot)).select(
        "day", "cn_a", "cx_a", "cn_b", "cx_b",
        info.alias("info_frac"), zs.alias("zs"),
    )
    return z.select(
        "day", "cn_a", "cx_a", "cn_b", "cx_b",
        F.round("info_frac", 8).alias("info_frac"),
        F.round("zs", 6).alias("z_stat"),
        F.round(OBF_FINAL_Z / F.sqrt(F.col("info_frac")), 6).alias("z_bound"),
        (F.abs(F.col("zs")) > OBF_FINAL_Z / F.sqrt(F.col("info_frac"))).alias("crossed"),
    ).orderBy("day")


@query(
    "overdispersion_daily_counts",
    """
    WITH d AS (
      SELECT event_type, cast(ts as date) AS day,
             cast(count(*) as bigint) AS c
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, cast(count(*) as bigint) AS n_days,
             cast(sum(c) as bigint) AS sc,
             cast(sum(c * c) as bigint) AS scc
      FROM d GROUP BY 1)
    SELECT event_type, n_days, sc AS total_events,
           round(cast(sc as double) / n_days, 6) AS mean_daily,
           round((scc - cast(sc as double) * sc / n_days) / (n_days - 1.0), 6)
             AS var_daily,
           round(((scc - cast(sc as double) * sc / n_days) / (n_days - 1.0))
                 / (cast(sc as double) / n_days), 6) AS vmr,
           round((((scc - cast(sc as double) * sc / n_days) / (n_days - 1.0))
                  / (cast(sc as double) / n_days) - 1.0)
                 * sqrt((n_days - 1.0) / 2.0), 6) AS z_dispersion
    FROM s ORDER BY event_type
    """,
)
def overdispersion_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OVERDISPERSION AUDIT on daily event counts per type: the
    variance-to-mean ratio (VMR; Poisson => 1) plus the normal
    approximation z = (VMR-1)*sqrt((d-1)/2) of the dispersion test —
    the first question before fitting any count model (Poisson vs
    negative binomial) or alerting on volume anomalies. Exactness:
    daily counts and their squares are exact bigints (two combinable
    groupBys); the moment ratios are identical float expressions
    rounded once. Scale: groupBy(type, day) then groupBy(type) — both
    map-side combinable, output |types| rows."""
    e = load(spark, sf_dir, "events")
    d = e.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("scc"),
    )
    mean = F.col("sc").cast("double") / F.col("n_days")
    var = (F.col("scc") - F.col("sc").cast("double") * F.col("sc") / F.col("n_days")) / (
        F.col("n_days") - 1.0
    )
    vmr = var / mean
    return s.select(
        "event_type", "n_days", F.col("sc").alias("total_events"),
        F.round(mean, 6).alias("mean_daily"),
        F.round(var, 6).alias("var_daily"),
        F.round(vmr, 6).alias("vmr"),
        F.round((vmr - 1.0) * F.sqrt((F.col("n_days") - 1.0) / 2.0), 6).alias("z_dispersion"),
    ).orderBy("event_type")


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
# Batch 4: causal/experimentation (DiD), robust two-sample (Yuen),
# extreme-value tail audit (Gumbel MoM), time-series dependence (ACF),
# and a commutative data-integrity checksum manifest
# --------------------------------------------------------------------------


@query(
    "did_estimator_purchases",
    """
    WITH bounds AS (
      SELECT min(cast(ts as date)) AS d0 FROM events),
    base AS (
      SELECT (user_id % 2 = 0) AS treated,
             datediff('day', b.d0, cast(ts as date)) >= 15 AS post,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
      FROM events CROSS JOIN bounds b),
    cells AS (
      SELECT treated, post, cast(count(*) as bigint) AS n,
             cast(sum(conv) as bigint) AS x
      FROM base GROUP BY treated, post),
    wide AS (
      SELECT
        max(CASE WHEN treated AND post THEN n END) AS n_tp,
        max(CASE WHEN treated AND post THEN x END) AS x_tp,
        max(CASE WHEN treated AND NOT post THEN n END) AS n_t0,
        max(CASE WHEN treated AND NOT post THEN x END) AS x_t0,
        max(CASE WHEN NOT treated AND post THEN n END) AS n_cp,
        max(CASE WHEN NOT treated AND post THEN x END) AS x_cp,
        max(CASE WHEN NOT treated AND NOT post THEN n END) AS n_c0,
        max(CASE WHEN NOT treated AND NOT post THEN x END) AS x_c0
      FROM cells),
    est AS (
      SELECT n_tp, x_tp, n_t0, x_t0, n_cp, x_cp, n_c0, x_c0,
        (cast(x_tp as double) / n_tp - cast(x_t0 as double) / n_t0)
        - (cast(x_cp as double) / n_cp - cast(x_c0 as double) / n_c0) AS did,
        sqrt((cast(x_tp as double) / n_tp) * (1.0 - cast(x_tp as double) / n_tp) / n_tp
           + (cast(x_t0 as double) / n_t0) * (1.0 - cast(x_t0 as double) / n_t0) / n_t0
           + (cast(x_cp as double) / n_cp) * (1.0 - cast(x_cp as double) / n_cp) / n_cp
           + (cast(x_c0 as double) / n_c0) * (1.0 - cast(x_c0 as double) / n_c0) / n_c0)
          AS se
      FROM wide),
    z AS (SELECT *, abs(did / se) AS a FROM est)
    SELECT n_tp, x_tp, n_t0, x_t0, n_cp, x_cp, n_c0, x_c0,
           round(did, 8) AS did_estimate,
           round(se, 8) AS std_error,
           round(did / se, 6) AS z_stat,
           round(2.0 * (1.0 - {phi}), 8) AS p_value
    FROM z
    """.replace("{phi}", _phi_sql("a")),
)
def did_estimator_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES on purchase conversion: deterministic
    even/odd user_id treatment split x data-driven pre/post split (day
    15 from the observed start, so the query is SF-portable), the
    2x2-cell estimator every quasi-experimental readout starts from.
    DiD = (T_post - T_pre) - (C_post - C_pre); SE pools the four
    binomial cell variances; p-value via the shared Abramowitz-Stegun
    Φ. Exactness: the four cells are exact bigint counts from ONE
    groupBy (conditional-max pivot to a single row); all floats are
    identical expressions. Scale: one combinable aggregate over
    events + a 1-row broadcast of the min-date."""
    e = load(spark, sf_dir, "events")
    bounds = e.agg(F.min(F.col("ts").cast("date")).alias("d0"))
    base = e.crossJoin(F.broadcast(bounds)).select(
        (F.col("user_id") % 2 == 0).alias("treated"),
        (F.datediff(F.col("ts").cast("date"), F.col("d0")) >= 15).alias("post"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    cells = base.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("x"),
    )

    def cell(col, t, p):
        cond = (F.col("treated") == t) & (F.col("post") == p)
        return F.max(F.when(cond, F.col(col)))

    wide = cells.agg(
        cell("n", True, True).alias("n_tp"), cell("x", True, True).alias("x_tp"),
        cell("n", True, False).alias("n_t0"), cell("x", True, False).alias("x_t0"),
        cell("n", False, True).alias("n_cp"), cell("x", False, True).alias("x_cp"),
        cell("n", False, False).alias("n_c0"), cell("x", False, False).alias("x_c0"),
    )

    def rate(x, n):
        return F.col(x).cast("double") / F.col(n)

    did = (rate("x_tp", "n_tp") - rate("x_t0", "n_t0")) - (
        rate("x_cp", "n_cp") - rate("x_c0", "n_c0")
    )
    se = F.sqrt(
        rate("x_tp", "n_tp") * (1.0 - rate("x_tp", "n_tp")) / F.col("n_tp")
        + rate("x_t0", "n_t0") * (1.0 - rate("x_t0", "n_t0")) / F.col("n_t0")
        + rate("x_cp", "n_cp") * (1.0 - rate("x_cp", "n_cp")) / F.col("n_cp")
        + rate("x_c0", "n_c0") * (1.0 - rate("x_c0", "n_c0")) / F.col("n_c0")
    )
    z = wide.select(
        "n_tp", "x_tp", "n_t0", "x_t0", "n_cp", "x_cp", "n_c0", "x_c0",
        did.alias("did"), se.alias("se"), F.abs(did / se).alias("a"),
    )
    return z.select(
        "n_tp", "x_tp", "n_t0", "x_t0", "n_cp", "x_cp", "n_c0", "x_c0",
        F.round("did", 8).alias("did_estimate"),
        F.round("se", 8).alias("std_error"),
        F.round(F.col("did") / F.col("se"), 6).alias("z_stat"),
        F.round(F.expr(f"2.0 * (1.0 - {_phi_sql('a')})"), 8).alias("p_value"),
    )


#: Euler-Mascheroni constant and Gumbel return period, spelled once.
EULER_GAMMA = 0.5772156649015329
GUMBEL_RETURN_T = 100


@query(
    "gumbel_block_maxima_fit",
    f"""
    WITH mx AS (
      SELECT event_type, cast(ts as date) AS day, max(value) AS m
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    s AS (
      SELECT event_type, cast(count(*) as bigint) AS n_blocks,
             cast(sum(cast(m as decimal(18,2))) as double) AS sm,
             cast(sum(cast(m * m as decimal(38,4))) as double) AS smm
      FROM mx GROUP BY event_type),
    fit AS (
      SELECT event_type, n_blocks,
             sm / n_blocks AS mean_max,
             sqrt((smm - sm * sm / n_blocks) / (n_blocks - 1.0)) AS sd_max
      FROM s),
    p AS (
      SELECT event_type, n_blocks, mean_max, sd_max,
             sd_max * sqrt(6.0) / pi() AS beta
      FROM fit)
    SELECT event_type, n_blocks,
           round(mean_max, 6) AS mean_max,
           round(sd_max, 6) AS sd_max,
           round(beta, 6) AS gumbel_beta,
           round(mean_max - {EULER_GAMMA} * beta, 6) AS gumbel_mu,
           round((mean_max - {EULER_GAMMA} * beta)
                 - beta * ln(-ln(1.0 - 1.0 / {GUMBEL_RETURN_T})), 6)
             AS return_level_{GUMBEL_RETURN_T}
    FROM p ORDER BY event_type
    """,
)
def gumbel_block_maxima_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTREME-VALUE TAIL AUDIT: daily block maxima of the event value
    per type, fitted to a Gumbel distribution by method of moments
    (beta = s*sqrt(6)/pi, mu = mean - gamma*beta) with the
    {GUMBEL_RETURN_T}-day return level mu - beta*ln(-ln(1-1/T)) — the
    capacity-planning question ("what daily spike do we see once per
    {GUMBEL_RETURN_T} days?") that mean/variance monitoring cannot
    answer. Exactness: block maxima of doubles are order-independent
    (max is exact); their 2-decimal values sum exactly as decimals;
    pi() and the Euler-Mascheroni literal are the same doubles in both
    engines; every derived float is one identical expression. Scale:
    groupBy(type, day) then groupBy(type), both combinable."""
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    mx = e.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.max("value").alias("m")
    )
    s = mx.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.col("m").cast("decimal(18,2)")).cast("double").alias("sm"),
        F.sum((F.col("m") * F.col("m")).cast("decimal(38,4)")).cast("double").alias("smm"),
    )
    mean_max = F.col("sm") / F.col("n_blocks")
    sd_max = F.sqrt(
        (F.col("smm") - F.col("sm") * F.col("sm") / F.col("n_blocks"))
        / (F.col("n_blocks") - 1.0)
    )
    import math

    beta = sd_max * math.sqrt(6.0) / math.pi
    mu = mean_max - EULER_GAMMA * beta
    return s.select(
        "event_type", "n_blocks",
        F.round(mean_max, 6).alias("mean_max"),
        F.round(sd_max, 6).alias("sd_max"),
        F.round(beta, 6).alias("gumbel_beta"),
        F.round(mu, 6).alias("gumbel_mu"),
        F.round(
            mu - beta * math.log(-math.log(1.0 - 1.0 / GUMBEL_RETURN_T)), 6
        ).alias(f"return_level_{GUMBEL_RETURN_T}"),
    ).orderBy("event_type")


#: Yuen trimmed t-test: symmetric trim fraction per tail.
YUEN_TRIM = 0.2


@query(
    "yuen_trimmed_ttest",
    f"""
    WITH e AS (
      SELECT event_id, value,
             (event_type = 'purchase') AS grp
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT grp, value,
             row_number() OVER (PARTITION BY grp ORDER BY value, event_id)
               AS rk,
             count(*) OVER (PARTITION BY grp) AS n
      FROM e),
    lim AS (
      SELECT grp, n, cast(floor({YUEN_TRIM} * n) as bigint) AS g
      FROM (SELECT DISTINCT grp, n FROM r) q),
    cuts AS (
      SELECT r.grp,
             max(CASE WHEN r.rk = l.g + 1 THEN r.value END) AS lo,
             max(CASE WHEN r.rk = l.n - l.g THEN r.value END) AS hi
      FROM r JOIN lim l ON r.grp = l.grp
      GROUP BY r.grp),
    stats AS (
      SELECT r.grp, any_value(l.n) AS n, any_value(l.g) AS g,
             cast(sum(CASE WHEN r.rk > l.g AND r.rk <= l.n - l.g
                           THEN cast(r.value as decimal(18,2)) END) as double)
               AS trim_sum,
             cast(sum(cast(
                 (CASE WHEN r.rk <= l.g THEN c.lo
                       WHEN r.rk > l.n - l.g THEN c.hi
                       ELSE r.value END) as decimal(18,2))) as double) AS w_sum,
             cast(sum(cast(
                 (CASE WHEN r.rk <= l.g THEN c.lo
                       WHEN r.rk > l.n - l.g THEN c.hi
                       ELSE r.value END)
                 * (CASE WHEN r.rk <= l.g THEN c.lo
                         WHEN r.rk > l.n - l.g THEN c.hi
                         ELSE r.value END) as decimal(38,4))) as double)
               AS w_sumsq
      FROM r JOIN lim l ON r.grp = l.grp
             JOIN cuts c ON r.grp = c.grp
      GROUP BY r.grp),
    per AS (
      SELECT grp, n, g, n - 2 * g AS h,
             trim_sum / (n - 2 * g) AS mt,
             (w_sumsq - w_sum * w_sum / n) / (n - 1.0) AS swsq
      FROM stats),
    wide AS (
      SELECT
        max(CASE WHEN grp THEN n END) AS n1,
        max(CASE WHEN grp THEN h END) AS h1,
        max(CASE WHEN grp THEN mt END) AS mt1,
        max(CASE WHEN grp THEN swsq END) AS swsq1,
        max(CASE WHEN NOT grp THEN n END) AS n2,
        max(CASE WHEN NOT grp THEN h END) AS h2,
        max(CASE WHEN NOT grp THEN mt END) AS mt2,
        max(CASE WHEN NOT grp THEN swsq END) AS swsq2
      FROM per)
    SELECT n1, h1, n2, h2,
           round(mt1, 6) AS trimmed_mean_purchase,
           round(mt2, 6) AS trimmed_mean_rest,
           round((mt1 - mt2)
                 / sqrt((n1 - 1.0) * swsq1 / (h1 * (h1 - 1.0))
                        + (n2 - 1.0) * swsq2 / (h2 * (h2 - 1.0))), 6)
             AS yuen_t
    FROM wide
    """,
)
def yuen_trimmed_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YUEN'S TRIMMED-MEAN t-TEST (purchase vs rest on event value,
    {YUEN_TRIM:.0%} trim per tail): the robust two-sample location test
    that survives the heavy tails Mann-Whitney only ranks away —
    trimmed means stay in the original units. Winsorized variance
    feeds the denominator (Yuen 1974): d_i = (n_i-1)s²_wi/(h_i(h_i-1)).
    Exactness: per-group ranks are exact integers — Spark side computes
    them with the scale-safe grouped prefix-count kernel
    (`grouped_prefix_sum` range exchange, NEVER a 2-task
    partitionBy(grp) window); 2-decimal values and their winsorized
    clamps sum exactly as decimals; the t is one identical float
    expression. The lo/hi clamp values are exact data values joined
    from the g+1 / n-g rank rows."""
    from ..operators.scale import durable_checkpoint, grouped_prefix_sum

    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull()).select(
        "event_id", "value", (F.col("event_type") == "purchase").alias("grp")
    )
    # rank = exclusive running count + 1, per group, via range exchange
    r = grouped_prefix_sum(
        e.withColumn("one", F.lit(1).cast("long")),
        ["grp"],
        ["value", "event_id"],
        "one",
        out_col="rk0",
    ).select("grp", "value", (F.col("rk0") + 1).cast("long").alias("rk"))
    r = durable_checkpoint(r)  # three consumers below
    lim = r.groupBy("grp").agg(F.count(F.lit(1)).cast("long").alias("n")).select(
        "grp", "n", F.floor(YUEN_TRIM * F.col("n")).cast("long").alias("g")
    )
    rl = r.join(F.broadcast(lim), "grp")
    cuts = rl.groupBy("grp").agg(
        F.max(F.when(F.col("rk") == F.col("g") + 1, F.col("value"))).alias("lo"),
        F.max(F.when(F.col("rk") == F.col("n") - F.col("g"), F.col("value"))).alias("hi"),
    )
    rc = rl.join(F.broadcast(cuts), "grp")
    wv = (
        F.when(F.col("rk") <= F.col("g"), F.col("lo"))
        .when(F.col("rk") > F.col("n") - F.col("g"), F.col("hi"))
        .otherwise(F.col("value"))
    )
    stats = rc.groupBy("grp").agg(
        F.any_value(F.col("n")).alias("n"),
        F.any_value(F.col("g")).alias("g"),
        F.sum(
            F.when(
                (F.col("rk") > F.col("g")) & (F.col("rk") <= F.col("n") - F.col("g")),
                F.col("value").cast("decimal(18,2)"),
            )
        ).cast("double").alias("trim_sum"),
        F.sum(wv.cast("decimal(18,2)")).cast("double").alias("w_sum"),
        F.sum((wv * wv).cast("decimal(38,4)")).cast("double").alias("w_sumsq"),
    )
    per = stats.select(
        "grp", "n", "g",
        (F.col("n") - 2 * F.col("g")).alias("h"),
        (F.col("trim_sum") / (F.col("n") - 2 * F.col("g"))).alias("mt"),
        ((F.col("w_sumsq") - F.col("w_sum") * F.col("w_sum") / F.col("n")) / (F.col("n") - 1.0)).alias("swsq"),
    )

    def cell(col, t):
        return F.max(F.when(F.col("grp") == t, F.col(col)))

    wide = per.agg(
        cell("n", True).alias("n1"), cell("h", True).alias("h1"),
        cell("mt", True).alias("mt1"), cell("swsq", True).alias("swsq1"),
        cell("n", False).alias("n2"), cell("h", False).alias("h2"),
        cell("mt", False).alias("mt2"), cell("swsq", False).alias("swsq2"),
    )
    denom = F.sqrt(
        (F.col("n1") - 1.0) * F.col("swsq1") / (F.col("h1") * (F.col("h1") - 1.0))
        + (F.col("n2") - 1.0) * F.col("swsq2") / (F.col("h2") * (F.col("h2") - 1.0))
    )
    return wide.select(
        "n1", "h1", "n2", "h2",
        F.round("mt1", 6).alias("trimmed_mean_purchase"),
        F.round("mt2", 6).alias("trimmed_mean_rest"),
        F.round((F.col("mt1") - F.col("mt2")) / denom, 6).alias("yuen_t"),
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


#: Checksum manifest: fixed bucket count (the "partition" grain an
#: integrity sync would reconcile at).
CKSUM_BUCKETS = 32


@query(
    "partition_checksum_manifest",
    f"""
    WITH rows_h AS (
      SELECT o_orderkey % {CKSUM_BUCKETS} AS bucket,
             o_orderkey,
             cast(concat('0x', substr(md5(concat_ws(',',
                    cast(o_orderkey as varchar),
                    cast(o_custkey as varchar),
                    o_orderstatus,
                    o_orderpriority,
                    cast(cast(o_orderdate as date) as varchar))), 1, 10))
                  as bigint) AS h
      FROM orders)
    SELECT cast(bucket as bigint) AS bucket,
           cast(count(*) as bigint) AS n_rows,
           cast(min(o_orderkey) as bigint) AS min_key,
           cast(max(o_orderkey) as bigint) AS max_key,
           cast(sum(h) as bigint) AS checksum
    FROM rows_h GROUP BY bucket ORDER BY bucket
    """,
)
def partition_checksum_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-INTEGRITY CHECKSUM MANIFEST over orders: each key bucket
    (orderkey mod {CKSUM_BUCKETS}) rolls up a COMMUTATIVE checksum —
    the SUM of a 40-bit md5-prefix hash of each row's canonical string
    form — plus row count and key range. Sum (not concat-then-hash) is
    the 100 TB design: it is order- and partition-independent, so the
    manifest is reproducible under any shuffle layout and two sides of
    a replication/sync can diff manifests bucket-by-bucket without
    moving data (the rsync/Merkle pattern; 40-bit values keep the
    bigint sum overflow-safe to ~10^7 rows per bucket — widen the
    bucket count, not the hash, beyond that). Canonical form uses only
    integer/string/date fields rendered identically by both engines.
    One narrow map + one combinable groupBy."""
    o = load(spark, sf_dir, "orders")
    repr_ = F.concat_ws(
        ",",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
        F.col("o_orderdate").cast("date").cast("string"),
    )
    h = F.conv(F.substring(F.md5(repr_), 1, 10), 16, 10).cast("long")
    return (
        o.select((F.col("o_orderkey") % CKSUM_BUCKETS).alias("bucket"), F.col("o_orderkey"), h.alias("h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("o_orderkey").cast("long").alias("min_key"),
            F.max("o_orderkey").cast("long").alias("max_key"),
            F.sum("h").cast("long").alias("checksum"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_rows", "min_key", "max_key", "checksum",
        )
        .orderBy("bucket")
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


@query(
    "mann_kendall_trend",
    """
    WITH d AS (
      SELECT event_type,
             datediff('day', DATE '1970-01-01', cast(ts as date)) AS di,
             cast(count(*) as bigint) AS c
      FROM events GROUP BY 1, 2),
    pairs AS (
      SELECT a.event_type,
             cast(sum(CASE WHEN b.c > a.c THEN 1
                           WHEN b.c < a.c THEN -1 ELSE 0 END) as bigint) AS s
      FROM d a JOIN d b ON b.event_type = a.event_type AND b.di > a.di
      GROUP BY a.event_type),
    nn AS (
      SELECT event_type, cast(count(*) as bigint) AS n FROM d GROUP BY 1),
    ties AS (
      SELECT event_type,
             cast(sum(t * (t - 1) * (2 * t + 5)) as bigint) AS tie_term
      FROM (
        SELECT event_type, c, cast(count(*) as bigint) AS t
        FROM d GROUP BY event_type, c) q
      GROUP BY event_type),
    v AS (
      SELECT p.event_type, p.s, nn.n,
             (cast(nn.n as double) * (nn.n - 1) * (2 * nn.n + 5)
              - ties.tie_term) / 18.0 AS var_s
      FROM pairs p JOIN nn ON p.event_type = nn.event_type
                   JOIN ties ON p.event_type = ties.event_type)
    SELECT event_type, s AS mk_s, n AS n_days,
           round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                      WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                      ELSE 0.0 END, 6) AS z_stat
    FROM v ORDER BY event_type
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-KENDALL TREND TEST on daily event counts per type: S =
    Σ sign(x_j - x_i) over ordered day pairs, tie-corrected variance,
    continuity-corrected z — the standard nonparametric monotone-trend
    detector that pairs with `theil_sen_daily_trend`'s slope (MK gives
    the significance, Theil-Sen the magnitude). Exactness: S and the
    tie term are exact bigints; z is one identical float expression.
    Scale: the pair join runs on the |types|x|days| ROLLUP (calendar-
    bounded, like Theil-Sen's documented cap), never on raw events —
    events are touched once by the combinable daily groupBy."""
    e = load(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("1970-01-01"))).alias("di"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    from ..operators.scale import durable_checkpoint

    d = durable_checkpoint(d)
    a = d.select("event_type", "di", F.col("c").alias("ca"))
    b = d.select(
        F.col("event_type").alias("event_type_b"),
        F.col("di").alias("dib"),
        F.col("c").alias("cb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("event_type_b") == F.col("event_type"))
            & (F.col("dib") > F.col("di")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    nn = d.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        d.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("long")
            .alias("tie_term")
        )
    )
    v = (
        pairs.join(nn, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type", "s", "n",
            (
                (
                    F.col("n").cast("double") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                    - F.col("tie_term")
                )
                / 18.0
            ).alias("var_s"),
        )
    )
    return v.select(
        "event_type",
        F.col("s").alias("mk_s"),
        F.col("n").alias("n_days"),
        F.round(
            F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(F.col("var_s")))
            .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(F.col("var_s")))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("z_stat"),
    ).orderBy("event_type")


@query(
    "mcnemar_purchase_halves",
    """
    WITH bounds AS (SELECT min(cast(ts as date)) AS d0 FROM events),
    per_pair AS (
      SELECT user_id,
             datediff('day', b.d0, cast(ts as date)) % 15 AS slot,
             max(CASE WHEN event_type = 'purchase'
                       AND datediff('day', b.d0, cast(ts as date)) < 15
                      THEN 1 ELSE 0 END) AS p1,
             max(CASE WHEN event_type = 'purchase'
                       AND datediff('day', b.d0, cast(ts as date)) >= 15
                      THEN 1 ELSE 0 END) AS p2
      FROM events CROSS JOIN bounds b
      GROUP BY user_id, slot),
    cells AS (
      SELECT cast(sum(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END) as bigint) AS b,
             cast(sum(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END) as bigint) AS c,
             cast(sum(CASE WHEN p1 = 1 AND p2 = 1 THEN 1 ELSE 0 END) as bigint) AS both_halves,
             cast(count(*) as bigint) AS n_pairs
      FROM per_pair)
    SELECT n_pairs, both_halves, b AS only_first_half, c AS only_second_half,
           round((abs(cast(b - c as double)) - 1.0)
                 * (abs(cast(b - c as double)) - 1.0) / (b + c), 6)
             AS mcnemar_chi2
    FROM cells
    """,
)
def mcnemar_purchase_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNEMAR'S PAIRED TEST on purchase incidence: each (user, day
    slot d in 0..14) cell pairs day d of the first half-window with
    day d+15 of the second — same user, same relative timing, so only
    the DISCORDANT cells (purchased in exactly one half) carry signal;
    chi² = (|b-c|-1)²/(b+c) with continuity correction — the paired
    complement to the unpaired two-proportion z (pairing eliminates
    between-user and day-of-cycle variance). The user-level pairing is
    degenerate on this dense synthetic corpus (every user purchases in
    both halves), which is exactly why the paired design drops to the
    finer grain. Exactness: indicators are exact max aggregates; the
    cells are exact bigints; chi² is one identical float expression.
    Scale: one groupBy(user_id, slot) + a 1-row reduce, min-date
    broadcast."""
    e = load(spark, sf_dir, "events")
    bounds = e.agg(F.min(F.col("ts").cast("date")).alias("d0"))
    half = F.datediff(F.col("ts").cast("date"), F.col("d0"))
    per_user = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("user_id", (half % 15).alias("slot"))
        .agg(
            F.max(
                F.when((F.col("event_type") == "purchase") & (half < 15), 1).otherwise(0)
            ).alias("p1"),
            F.max(
                F.when((F.col("event_type") == "purchase") & (half >= 15), 1).otherwise(0)
            ).alias("p2"),
        )
    )
    cells = per_user.agg(
        F.sum(F.when((F.col("p1") == 1) & (F.col("p2") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("p1") == 0) & (F.col("p2") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when((F.col("p1") == 1) & (F.col("p2") == 1), 1).otherwise(0))
        .cast("long")
        .alias("both_halves"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    diff = F.abs((F.col("b") - F.col("c")).cast("double"))
    return cells.select(
        "n_pairs", "both_halves",
        F.col("b").alias("only_first_half"),
        F.col("c").alias("only_second_half"),
        F.round((diff - 1.0) * (diff - 1.0) / (F.col("b") + F.col("c")), 6).alias(
            "mcnemar_chi2"
        ),
    )


@query(
    "runs_test_daily_counts",
    """
    WITH d AS (
      SELECT datediff('day', DATE '1970-01-01', cast(ts as date)) AS di,
             cast(count(*) as bigint) AS c
      FROM events GROUP BY 1),
    m AS (
      SELECT cast(sum(c) as double) / count(*) AS mean_c FROM d),
    flags AS (
      SELECT d.di, (d.c > m.mean_c) AS above,
             lag((d.c > m.mean_c)) OVER (ORDER BY d.di) AS prev_above
      FROM d CROSS JOIN m),
    runs AS (
      SELECT cast(count(*) as bigint) AS n,
             cast(sum(CASE WHEN above THEN 1 ELSE 0 END) as bigint) AS n1,
             cast(sum(CASE WHEN prev_above IS NULL
                            OR above <> prev_above THEN 1 ELSE 0 END) as bigint)
               AS r
      FROM flags),
    stat AS (
      SELECT n, n1, n - n1 AS n2, r,
             2.0 * n1 * (n - n1) / n + 1.0 AS er,
             sqrt((2.0 * n1 * (n - n1))
                  * (2.0 * n1 * (n - n1) - n)
                  / (cast(n as double) * n * (n - 1.0))) AS sr
      FROM runs)
    SELECT n AS n_days, n1 AS n_above, n2 AS n_below, r AS n_runs,
           round(er, 6) AS expected_runs,
           round((r - er) / sr, 6) AS z_stat
    FROM stat
    """,
)
def runs_test_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD-WOLFOWITZ RUNS TEST on the daily event-volume series: code
    each day above/below the series mean, count runs of consecutive
    equal codes, and compare against the exact randomness expectation
    E[R] = 2·n1·n2/n + 1 — too FEW runs exposes clustering/trend, too
    MANY exposes oscillation; the sanity check behind "is this metric
    drifting or just noisy". Exactness: day counts, n1/n2 and the run
    count are exact integers (the run count is a lag-compare prefix
    structure over the |days| rollup); E[R]/Var[R]/z are identical
    float expressions. Scale: events → one combinable daily groupBy;
    the window runs over |days| rows."""
    e = load(spark, sf_dir, "events")
    d = e.groupBy(
        F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("1970-01-01"))).alias("di")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    m = d.agg((F.sum("c").cast("double") / F.count(F.lit(1))).alias("mean_c"))
    w = Window.orderBy("di")
    flags = d.crossJoin(F.broadcast(m)).select(
        "di",
        (F.col("c") > F.col("mean_c")).alias("above"),
    ).withColumn("prev_above", F.lag("above").over(w))
    runs = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("above"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(
            F.when(
                F.col("prev_above").isNull() | (F.col("above") != F.col("prev_above")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("r"),
    )
    n, n1, r = F.col("n"), F.col("n1"), F.col("r")
    er = 2.0 * n1 * (n - n1) / n + 1.0
    sr = F.sqrt(
        (2.0 * n1 * (n - n1))
        * (2.0 * n1 * (n - n1) - n)
        / (n.cast("double") * n * (n - 1.0))
    )
    return runs.select(
        n.alias("n_days"),
        n1.alias("n_above"),
        (n - n1).alias("n_below"),
        r.alias("n_runs"),
        F.round(er, 6).alias("expected_runs"),
        F.round((r - er) / sr, 6).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# Batch 6: engine maintenance ops — groupBy incremental view
# maintenance under signed deltas, and Misra-Gries heavy hitters with
# an exact-guarantee verification pass
# --------------------------------------------------------------------------

#: IVM scenario split: base = days < IVM_SPLIT_DAY, inserts arrive
#: after, deletes retract a deterministic subset of the base.
IVM_SPLIT_DAY = 25
IVM_DELETE_MOD = 97


@query(
    "ivm_agg_delta_merge",
    f"""
    WITH bounds AS (SELECT min(cast(ts as date)) AS d0 FROM events),
    tagged AS (
      SELECT event_type, value,
             datediff('day', b.d0, cast(ts as date)) < {IVM_SPLIT_DAY} AS is_base,
             event_id % {IVM_DELETE_MOD} = 0 AS is_del
      FROM events CROSS JOIN bounds b
      WHERE value IS NOT NULL),
    -- the ORACLE recomputes from scratch over base \\ deletes + inserts
    effective AS (
      SELECT event_type, value FROM tagged
      WHERE (is_base AND NOT is_del) OR NOT is_base)
    SELECT event_type,
           cast(count(*) as bigint) AS n_events,
           round(cast(sum(cast(value as decimal(18,6))) as double), 6)
             AS total_value
    FROM effective GROUP BY event_type ORDER BY event_type
    """,
)
def ivm_agg_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE for an aggregate view: the per-type
    (count, sum) rollup is maintained as mergeable partials — state
    from the base window, PLUS an insert-delta rollup, MINUS a signed
    delete-delta rollup (retractions of base rows) — and the merged
    state is returned WITHOUT ever rescanning base ∪ delta together.
    The DuckDB oracle recomputes the view from scratch over
    (base \\ deletes) ∪ inserts, so the hash equality IS the IVM
    invariant: merge(state, +Δ, -Δ) ≡ recompute — checked cross-engine.
    This is the groupBy companion of `ivm_join_delta_merge`
    (plans/cdcq.py): count/decimal-sum partials absorb inserts AND
    deletes because both are abelian-group ops; avg derives at read
    time. Scale: three combinable rollups over disjoint slices (each
    |types| rows), one tiny merge — the 100 TB pattern where the base
    scan happened LAST month and only deltas are touched today."""
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    bounds = e.agg(F.min(F.col("ts").cast("date")).alias("d0"))
    tagged = e.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "value",
        (F.datediff(F.col("ts").cast("date"), F.col("d0")) < IVM_SPLIT_DAY).alias("is_base"),
        (F.col("event_id") % IVM_DELETE_MOD == 0).alias("is_del"),
    )

    def rollup(df, sign: int):
        return df.groupBy("event_type").agg(
            (F.lit(sign) * F.count(F.lit(1))).cast("long").alias("pn"),
            (F.lit(sign) * F.sum(F.col("value").cast("decimal(18,6)"))).alias("ps"),
        )

    state = rollup(tagged.where("is_base"), 1)              # last month's state
    ins = rollup(tagged.where("NOT is_base"), 1)            # +Δ inserts
    dels = rollup(tagged.where("is_base AND is_del"), -1)   # -Δ retractions
    merged = (
        state.unionByName(ins)
        .unionByName(dels)
        .groupBy("event_type")
        .agg(F.sum("pn").cast("long").alias("n_events"), F.sum("ps").alias("ts_sum"))
        # Degenerate-input semantics (ADVICE r8): a type whose base
        # rows were ALL retracted and that has no inserts merges to
        # (n=0, sum=0) state, but a from-scratch recompute has no such
        # group at all — drop empty groups so merge ≡ recompute holds
        # on that input too (pinned in tests/test_round8.py).
        .where(F.col("n_events") > 0)
    )
    return merged.select(
        "event_type",
        "n_events",
        F.round(F.col("ts_sum").cast("double"), 6).alias("total_value"),
    ).orderBy("event_type")


#: Misra-Gries sketch size; the guarantee verified below is "every
#: token with frequency > n/MG_K appears in the sketch output".
MG_K = 56


def mg_fold(counters, batch_counts, k: int):
    """Fold one batch's exact value_counts into a k-counter MG summary:
    add, then apply the standard batch decrement — subtract the
    (k+1)-th largest counter from every counter and drop non-positive
    ones. This is the MERGE of Agarwal et al. 2012 (Mergeable
    Summaries) with the batch treated as a zero-error summary; total
    undercount after any fold sequence is < n/ (k+1), which implies the
    heavy-hitter guarantee: an item with true frequency > n/k survives
    with positive count. Module-level so tests can drive it with
    adversarial streams directly."""
    counters = counters.add(batch_counts, fill_value=0)
    if len(counters) > k:
        cut = counters.nlargest(k + 1).iloc[-1]
        counters = counters - cut
        counters = counters[counters > 0]
    return counters


@query(
    "misra_gries_heavy_tokens",
    f"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
      FROM documents),
    tot AS (SELECT cast(count(*) as bigint) AS n FROM toks),
    freq AS (
      SELECT term, cast(count(*) as bigint) AS exact_count
      FROM toks GROUP BY term)
    SELECT f.term, f.exact_count
    FROM freq f CROSS JOIN tot t
    WHERE f.exact_count * {{MG_K}} > t.n
    ORDER BY f.exact_count DESC, f.term
    """.replace("{MG_K}", str(MG_K)),
)
def misra_gries_heavy_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MISRA-GRIES HEAVY HITTERS over corpus tokens, with the guarantee
    made checkable: each partition folds its token stream into a
    k={MG_K}-counter MG summary (vectorized per Arrow batch: add the
    batch's value_counts, then apply the standard batch decrement —
    subtract the (k+1)-th largest counter from all and drop the
    non-positive — the mergeable-summaries merge of Agarwal et al.
    2012); partition summaries merge by counter addition; a second
    pass joins EXACT counts for the surviving candidates only. The
    emitted rows are candidates whose exact frequency exceeds n/k, and
    the MG guarantee (an item with true frequency > n/k cannot be
    decremented to zero in every summary) makes this equal the TRUE
    heavy-hitter set — exactly what the DuckDB oracle computes with a
    full GROUP BY ... HAVING. The sketch is the 100 TB mechanism (the
    full term dictionary may not fit a reducer; {MG_K} counters per
    partition always do); the oracle proves the guarantee held.
    Integer multiply (count*k > n) avoids float thresholds."""
    import pandas as pd

    toks = (
        load(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0))
            ).alias("term")
        )
    )

    def mg_sketch(batches):
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            counters = mg_fold(counters, pdf["term"].value_counts(), MG_K)
        yield pd.DataFrame({"term": counters.index, "cnt": counters.to_numpy("int64")})

    candidates = (
        toks.mapInPandas(mg_sketch, "term string, cnt bigint")
        .groupBy("term")
        .agg(F.sum("cnt").alias("_mg"))
        .select("term")
    )
    tot = toks.agg(F.count(F.lit(1)).cast("long").alias("n"))
    exact = (
        toks.join(F.broadcast(candidates), "term")  # exact pass, candidates only
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
    )
    return (
        exact.crossJoin(F.broadcast(tot))
        .where(F.col("exact_count") * MG_K > F.col("n"))
        .select("term", "exact_count")
        .orderBy(F.col("exact_count").desc(), "term")
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


LOF_K = 3
LOF_TOP = 20


@query(
    "lof_embedding_outliers",
    f"""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(sqrt(greatest(
               round(list_dot_product(a.ev, a.ev) - 2 * list_dot_product(a.ev, b.ev)
                     + list_dot_product(b.ev, b.ev), 8), 0.0)), 8) AS d
      FROM v a JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id),
    knn AS (
      SELECT src, dst, d FROM (
        SELECT src, dst, d,
               row_number() OVER (PARTITION BY src ORDER BY d, dst) AS rn
        FROM pairs) WHERE rn <= {LOF_K}),
    kdist AS (SELECT src, max(d) AS kd FROM knn GROUP BY src),
    reach AS (
      SELECT k.src, k.dst, greatest(o.kd, k.d) AS rd
      FROM knn k JOIN kdist o ON k.dst = o.src),
    lrd AS (
      SELECT src,
             round(count(*) / cast(sum(cast(rd as decimal(18,8))) as double), 8) AS lrd
      FROM reach GROUP BY src),
    lofs AS (
      SELECT k.src,
             round(cast(sum(cast(n.lrd as decimal(18,8))) as double)
                   / (count(*) * p.lrd), 6) AS lof
      FROM knn k
        JOIN lrd n ON k.dst = n.src
        JOIN lrd p ON k.src = p.src
      GROUP BY k.src, p.lrd)
    SELECT f.src AS vec_id, v.label, kd.kd AS k_dist, l.lrd AS lrd, f.lof AS lof
    FROM lofs f
      JOIN lrd l ON f.src = l.src
      JOIN kdist kd ON f.src = kd.src
      JOIN v ON f.src = v.vec_id
    ORDER BY f.lof DESC, f.src
    LIMIT {LOF_TOP}
    """,
)
def lof_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL OUTLIER FACTOR (Breunig et al. 2000, k={LOF_K}) over the
    embedding table — density-based outlier scoring, the capability the
    robust-zscore audits can't provide: a point is anomalous relative
    to the LOCAL density of its neighborhood, so a sparse-but-valid
    cluster doesn't drown a genuinely isolated vector. Emits the
    top-{LOF_TOP} scores (measured top-K, never a fixed threshold that
    could go vacuous at small SF). Pipeline: k-NN within label buckets
    (the IVF-bucket candidate shape of ``knn_graph_by_label`` — pair
    space is sum-of-bucket-squares, co-partitioned self-join at scale,
    never |N|^2) -> k-distance -> reachability distance
    max(kd(o), d(p,o)) -> local reachability density (1/mean reach)
    -> LOF = mean neighbor-lrd / own lrd. After the k-NN stage every
    join is a tiny equi-join on vec_id keyed tables (k rows per
    vector). Cross-engine float discipline: distances rounded 8 dp,
    the two k-sized float reductions (reach sum, neighbor-lrd sum) go
    through exact decimal(18,8) partials, each division written
    identically in both dialects, final LOF rounded 6 dp."""
    from .vectors import dot, l2_norm_sq

    e = load(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("ev"))
    a = v.select(F.col("vec_id").alias("src"), F.col("label").alias("la"), F.col("ev").alias("ea"))
    b = v.select(F.col("vec_id").alias("dst"), F.col("label").alias("lb"), F.col("ev").alias("eb"))
    d2 = F.round(
        l2_norm_sq(F.col("ea")) - 2 * dot(F.col("ea"), F.col("eb")) + l2_norm_sq(F.col("eb")), 8
    )
    d = F.round(F.sqrt(F.greatest(d2, F.lit(0.0))), 8)
    pairs = (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("src") != F.col("dst")))
        .select("src", "dst", d.alias("d"))
    )
    w = Window.partitionBy("src").orderBy(F.col("d"), F.col("dst"))
    knn = pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= LOF_K).drop("rn")
    kdist = knn.groupBy("src").agg(F.max("d").alias("kd"))
    reach = knn.join(
        kdist.select(F.col("src").alias("dst"), F.col("kd").alias("kd_o")), "dst"
    ).select("src", "dst", F.greatest(F.col("kd_o"), F.col("d")).alias("rd"))
    lrd = reach.groupBy("src").agg(
        F.round(
            F.count(F.lit(1)) / F.sum(F.col("rd").cast("decimal(18,8)")).cast("double"), 8
        ).alias("lrd")
    )
    lofs = (
        knn.join(lrd.select(F.col("src").alias("dst"), F.col("lrd").alias("lrd_n")), "dst")
        .join(lrd.select(F.col("src"), F.col("lrd").alias("lrd_p")), "src")
        .groupBy("src", "lrd_p")
        .agg(
            F.round(
                F.sum(F.col("lrd_n").cast("decimal(18,8)")).cast("double")
                / (F.count(F.lit(1)) * F.col("lrd_p")),
                6,
            ).alias("lof")
        )
    )
    return (
        lofs.join(lrd, "src")
        .join(kdist, "src")
        .join(v.select(F.col("vec_id").alias("src"), "label"), "src")
        .select(
            F.col("src").alias("vec_id"),
            "label",
            F.col("kd").alias("k_dist"),
            "lrd",
            "lof",
        )
        .orderBy(F.col("lof").desc(), F.col("vec_id"))
        .limit(LOF_TOP)
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


# --------------------------------------------------------------------------
# q-digest: deterministic mergeable quantile sketch (Shrivastava et al.
# 2004) — the quantile member of the mergeable-summaries family next to
# HLL (distinct), KMV (overlap), CMS/Misra-Gries (frequency)
# --------------------------------------------------------------------------

QD_BITS = 26          # universe = [0, 2^26) cents — covers prices to $671k
QD_K = 2000           # compression factor: rank error <= QD_BITS/QD_K * n
QD_QUANTILES = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
QD_MERGED_CAP = 500_000  # loud bound on the merged node table


def qdigest_compress(nodes, n: int, k: int, bits: int):
    """Bottom-up q-digest compression over a {(level, idx): count} node
    dict: a node whose (count + sibling + parent) fits under n/k folds
    into its parent. Works for fresh leaf dicts AND for merged digests
    (recompression against a new global n). Mutates and returns
    ``nodes``; node (level, idx) covers [idx*2^level, (idx+1)*2^level),
    level 0 = leaves."""
    thr = n / k
    for level in range(bits):
        for lv, idx in sorted(nodes):
            if lv != level:
                continue
            c = nodes.get((level, idx))
            if c is None:
                continue
            sib = nodes.get((level, idx ^ 1), 0)
            par = nodes.get((level + 1, idx >> 1), 0)
            if c + sib + par <= thr:
                nodes[(level + 1, idx >> 1)] = c + sib + par
                nodes.pop((level, idx), None)
                nodes.pop((level, idx ^ 1), None)
    return nodes


def qdigest_build(value_counts, n: int, k: int, bits: int):
    """Leaf counts {value: count} -> compressed q-digest node dict."""
    return qdigest_compress(
        {(0, int(v)): int(c) for v, c in value_counts.items()}, n, k, bits
    )


def qdigest_quantile(nodes, n: int, q: float, bits: int) -> int:
    """Rank query: scan nodes in increasing upper-bound order (smaller
    ranges first on ties) accumulating counts; the node that crosses
    ceil(q*n) answers with its upper bound. True rank of the answer is
    within (bits/k)*n of q*n — the q-digest guarantee."""
    target = max(1, -(-int(q * n * 1_000_000) // 1_000_000))  # ceil without floats
    acc = 0
    for ub, lv, cnt in sorted(
        ((idx + 1) * (1 << lv) - 1, lv, c) for (lv, idx), c in nodes.items()
    ):
        acc += cnt
        if acc >= target:
            return min(ub, (1 << bits) - 1)
    return (1 << bits) - 1


@query("qdigest_price_quantiles", None)
def qdigest_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-DIGEST QUANTILES of order totals — the deterministic MERGEABLE
    quantile sketch (Shrivastava et al. 2004): every partition folds
    its rows into <= O(k log U) dyadic-interval counters, counters add
    nodewise across partitions (a plain groupBy-sum — the abelian merge
    all sketch families here share), and one bounded recompress +
    rank-scan answers every quantile with rank error <= (log2 U / k)·n
    = {QD_BITS}/{QD_K}·n ≈ 1.3 %. This is the 100 TB quantile path when
    even the value DOMAIN is too wide for an exact
    distinct-value rollup and percentile_approx's internal sketch
    can't be persisted/merged across jobs: q-digest state is plain
    (level, idx, count) rows — storable, unionable, incrementally
    maintainable like the HLL/KMV/MG registers. Rows-only by design
    (sketch internals are engine-specific); the guarantee is verified
    against exact DuckDB ranks in tests/test_round8_batch7.py, the
    same error-bound contract as `agg_approx_distinct` and
    `misra_gries_heavy_tokens`."""
    import pandas as pd

    orders = load(spark, sf_dir, "orders")
    cents = orders.select(
        F.least(
            F.greatest(F.round(F.col("o_totalprice") * 100).cast("long"), F.lit(0)),
            F.lit((1 << QD_BITS) - 1),
        ).alias("v")
    )

    def sketch_partition(batches):
        counts: dict[int, int] = {}
        n = 0
        for pdf in batches:
            vc = pdf["v"].value_counts()
            n += int(vc.sum())
            for v, c in vc.items():
                counts[int(v)] = counts.get(int(v), 0) + int(c)
        if not counts:
            return
        nodes = qdigest_build(counts, n, QD_K, QD_BITS)
        yield pd.DataFrame(
            {
                "level": [lv for lv, _ in nodes],
                "idx": [ix for _, ix in nodes],
                "cnt": [int(c) for c in nodes.values()],
            }
        )

    merged = (
        cents.mapInPandas(sketch_partition, "level int, idx long, cnt long")
        .groupBy("level", "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > QD_MERGED_CAP:
            raise ValueError(
                f"qdigest_price_quantiles: merged node table {len(pdf)} rows "
                f"exceeds the {QD_MERGED_CAP} cap"
            )
        nodes = {
            (int(lv), int(ix)): int(c)
            for lv, ix, c in zip(pdf["level"], pdf["idx"], pdf["cnt"])
        }
        n = sum(nodes.values())
        # recompress against the GLOBAL n/k threshold (the per-partition
        # passes compressed against their local n)
        thr_nodes = qdigest_compress(nodes, n, QD_K, QD_BITS)
        rows = []
        for q in QD_QUANTILES:
            est = qdigest_quantile(thr_nodes, n, q, QD_BITS)
            rows.append(
                {
                    "q": q,
                    "est_cents": est,
                    "est_price": est / 100.0,
                    "n": n,
                    "n_nodes": len(thr_nodes),
                    "rank_bound": int(QD_BITS / QD_K * n) + 1,
                }
            )
        return pd.DataFrame(rows)

    return (
        merged.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            lambda _, pdf: finalize(pdf.drop(columns=["g"])),
            "q double, est_cents bigint, est_price double, n bigint, "
            "n_nodes bigint, rank_bound bigint",
        )
    )


# --------------------------------------------------------------------------
# Exact set-similarity join via prefix filtering (AllPairs/PPJoin family)
# --------------------------------------------------------------------------

# tau = 3/5, kept as EXACT INTEGERS end-to-end: the prefix length uses
# integer ceil ((3*sz + 4) div 5) and the threshold test is 5*i >= 3*u
# — a float ceil(0.6*sz) can overshoot by one ulp-rounding and silently
# DROP a boundary pair, which the brute-force oracle would catch.
PPJ_TAU_NUM = 3
PPJ_TAU_DEN = 5


@query(
    "jaccard_prefix_filter_pairs",
    f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{{TOKEN_PATTERN}}') AS a
      FROM documents),
    tris AS (
      SELECT DISTINCT doc_id,
             cast(concat('0x', substr(md5(concat(a[i], ' ', a[i+1], ' ', a[i+2])), 1, 15))
                  as bigint) AS h
      FROM toks, unnest(generate_series(1, len(a) - 2)) AS t(i)
      WHERE len(a) >= 3),
    sizes AS (SELECT doc_id, cast(count(*) as bigint) AS sz FROM tris GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, cast(count(*) as bigint) AS n_i
      FROM tris a JOIN tris b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, n_i AS n_inter, sa.sz + sb.sz - n_i AS n_union,
           round(n_i / cast(sa.sz + sb.sz - n_i as double), 6) AS jaccard
    FROM inter
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
    WHERE {PPJ_TAU_DEN} * n_i >= {PPJ_TAU_NUM} * (sa.sz + sb.sz - n_i)
    """.replace("{TOKEN_PATTERN}", TOKEN_PATTERN),
)
def jaccard_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity join via PREFIX FILTERING (AllPairs/PPJoin
    family — Bayardo et al. WWW'07, Xiao et al. WWW'08): all document
    pairs whose word-trigram sets have Jaccard >= {PPJ_TAU_NUM}/{PPJ_TAU_DEN},
    with zero false negatives — the exact counterpart to the MinHash-LSH
    APPROXIMATE candidate join. The filter: order every doc's shingles
    by ascending global document frequency (one total (df, h) order
    shared by all docs), keep only each doc's |S| - ceil(tau*|S|) + 1
    RAREST shingles as its prefix; any pair meeting tau must collide in
    those prefixes, so the candidate join touches the rare end of the
    df distribution and stopword-grade shingles never generate pairs.
    Verification then computes exact intersections for candidates only.

    The ORACLE runs the brute-force share-any-shingle join with no
    prefix — oracle equality is therefore a cross-engine PROOF that the
    prefix filter lost nothing on this data, not just a port check.

    Scale shape: df is a combinable count; the per-doc (df, h) ordering
    is a doc-partitioned window; the candidate join is an equi-join on
    prefix shingle hashes (Σ prefix-df² pair space — df-ascending
    ordering makes these the rarest keys); the verification joins are
    equi-keyed on doc ids with NO forced broadcast — the candidate set
    is data-dependent, so AQE picks broadcast only when it measures
    small at runtime. Everything shuffles 8-byte md5
    hashes, never shingle text. Integer tau arithmetic end-to-end (see
    PPJ_TAU_* comment); the single float division rounds once."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0)).alias("a"),
    ).where(F.size("a") >= 3)
    tri = F.expr("concat(element_at(a, i), ' ', element_at(a, i + 1), ' ', element_at(a, i + 2))")
    h = F.conv(F.substring(F.md5(tri), 1, 15), 16, 10).cast("long")
    tris = (
        toks.select(
            "doc_id", F.explode(F.sequence(F.lit(1), F.size("a") - 2)).alias("i"), "a"
        )
        .select("doc_id", h.alias("h"))
        .distinct()
    )
    df_tbl = tris.groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("df"))
    wdoc = Window.partitionBy("doc_id")
    ordered = (
        tris.join(df_tbl, "h")
        .withColumn("pos", F.row_number().over(wdoc.orderBy(F.col("df"), F.col("h"))))
        .withColumn("sz", F.count(F.lit(1)).over(wdoc))
    )
    prefix = ordered.where(
        F.col("pos")
        <= F.col("sz")
        - F.expr(f"({PPJ_TAU_NUM} * sz + {PPJ_TAU_DEN} - 1) div {PPJ_TAU_DEN}")
        + 1
    ).select("doc_id", "h")
    cand = (
        prefix.select(F.col("doc_id").alias("doc_a"), "h")
        .join(prefix.select(F.col("doc_id").alias("doc_b"), "h"), "h")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sizes = tris.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    # No broadcast hint on `cand` (VERDICT r8): the candidate-pair set
    # is τ-filtered but data-dependent and unbounded in principle
    # (200k+ pairs already at sf1) — a forced broadcast routes it
    # through the driver and OOMs long before a 100-TB corpus. The
    # verification join is equi-keyed on doc_a either way, so AQE picks
    # broadcast when cand measures small and shuffle-hash otherwise.
    inter = (
        tris.select(F.col("doc_id").alias("doc_a"), "h")
        .join(cand, "doc_a")
        .join(tris.select(F.col("doc_id").alias("doc_b"), "h"), ["h", "doc_b"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb")), "doc_b")
        .withColumn("n_union", F.col("sza") + F.col("szb") - F.col("n_inter"))
        .where(PPJ_TAU_DEN * F.col("n_inter") >= PPJ_TAU_NUM * F.col("n_union"))
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            "n_union",
            F.round(F.col("n_inter") / F.col("n_union").cast("double"), 6).alias("jaccard"),
        )
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
