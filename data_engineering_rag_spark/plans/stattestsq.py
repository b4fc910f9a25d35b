"""Classical statistical tests & causal inference over the TPC-H-ish
tables (split from round8q.py, VERDICT r9 item 7 — registry names and
oracle SQL byte-identical): rank/variance test battery (Mann-Whitney U,
Kruskal-Wallis, one-way ANOVA, Kendall tau-b, Yuen trimmed t, McNemar,
Wald-Wolfowitz runs, Mann-Kendall), multiple-testing control
(Benjamini-Hochberg), sequential testing (O'Brien-Fleming), two-
proportion z, overdispersion, difference-in-differences, and Gumbel
block-maxima EVT.

Cross-engine determinism rules as in ``plans/__init__``; the recurring
trick is RANK-STATISTIC EXACTNESS: midranks are kept as DOUBLED
integers (2*midrank is always integral), so every rank sum, tie term,
and U statistic is exact bigint arithmetic in both engines, and the
single float division happens once at the end, written identically in
both dialects.

No reference twin: the reference (alexeygrigorev/data-engineering-rag)
stops at RAG glue; these are the A/B-test batteries a 100 TB
experimentation platform runs per-segment at fleet scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from . import load, query


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


@query(
    "spearman_acctbal_orders",
    """
    WITH per_cust AS (
      SELECT c.c_custkey, c.c_acctbal AS x,
             cast(coalesce(o.n, 0) as double) AS y
      FROM customer c LEFT JOIN
        (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) o
        ON o.o_custkey = c.c_custkey),
    ranked AS (
      SELECT rank() OVER (ORDER BY x)
               + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
             rank() OVER (ORDER BY y)
               + (count(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry
      FROM per_cust),
    mom AS (
      SELECT cast(count(*) as bigint) AS n,
             cast(sum(cast(rx as decimal(18,1))) as double) AS sx,
             cast(sum(cast(ry as decimal(18,1))) as double) AS sy,
             cast(sum(cast(rx * ry as decimal(38,2))) as double) AS sxy,
             cast(sum(cast(rx * rx as decimal(38,2))) as double) AS sxx,
             cast(sum(cast(ry * ry as decimal(38,2))) as double) AS syy
      FROM ranked)
    SELECT n AS n_customers,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS spearman_rho
    FROM mom
    """,
)
def spearman_acctbal_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN rank correlation between account balance and order
    count — the monotone-association check that Pearson misses (and
    robust to the balance outliers), with TIES handled correctly via
    AVERAGE ranks (integer order counts tie heavily; the classic
    1 − 6Σd²/… shortcut is invalid under ties, so this is Pearson on
    midranks). Scale shape: ranks come from ``with_global_rank``'s
    range-exchange kernel (never an unpartitioned window over
    customers); midranks derive from per-VALUE min-rank + count (one
    value-keyed agg + join back); the correlation itself is one
    combinable moment aggregate over exact decimals. The oracle spells
    the same midranks with DuckDB's rank window."""
    from ..operators.scale import with_global_rank

    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_cust = c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        F.col("c_acctbal").alias("x"),
        F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("y"),
    )

    def midrank(df: DataFrame, val: str, out: str) -> DataFrame:
        rn = with_global_rank(df, [val, "c_custkey"], rank_col="_rn")
        per_val = rn.groupBy(val).agg(
            F.min("_rn").alias("_mn"), F.count(F.lit(1)).alias("_cnt")
        )
        return (
            rn.join(per_val, val)
            .withColumn(out, F.col("_mn") + (F.col("_cnt") - 1) / 2.0)
            .drop("_rn", "_mn", "_cnt")
        )

    ranked = midrank(midrank(per_cust, "x", "rx"), "y", "ry")
    mom = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("rx").cast("decimal(18,1)")).cast("double").alias("sx"),
        F.sum(F.col("ry").cast("decimal(18,1)")).cast("double").alias("sy"),
        F.sum((F.col("rx") * F.col("ry")).cast("decimal(38,2)")).cast("double").alias("sxy"),
        F.sum((F.col("rx") * F.col("rx")).cast("decimal(38,2)")).cast("double").alias("sxx"),
        F.sum((F.col("ry") * F.col("ry")).cast("decimal(38,2)")).cast("double").alias("syy"),
    )
    rho = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return mom.select(
        F.col("n").alias("n_customers"), F.round(rho, 6).alias("spearman_rho")
    )


# --------------------------------------------------------------------------
# Variance homogeneity: Levene's test (Brown–Forsythe median variant)
# --------------------------------------------------------------------------

LEVENE_F_CRIT = 2.372  # F(0.05; 4, inf) — fixed literal for the flag


@query(
    "levene_variance_test",
    f"""
    WITH med AS (
      SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
      FROM orders GROUP BY o_orderpriority),
    z AS (
      SELECT o.o_orderpriority, abs(o.o_totalprice - m.med) AS z
      FROM orders o JOIN med m USING (o_orderpriority)),
    zg AS (
      SELECT o_orderpriority, cast(count(*) as bigint) AS n_g,
             round(cast(sum(cast(z as decimal(18,6))) as double) / count(*), 9) AS zbar_g
      FROM z GROUP BY o_orderpriority),
    tot AS (
      SELECT cast(sum(n_g) as bigint) AS n,
             cast(count(*) as bigint) AS k,
             round(cast(sum(cast(zbar_g * n_g as decimal(28,9))) as double)
                   / sum(n_g), 9) AS zbar
      FROM zg),
    within AS (
      SELECT cast(sum(cast((zz.z - g.zbar_g) * (zz.z - g.zbar_g) as decimal(28,8)))
                  as double) AS ssw
      FROM z zz JOIN zg g USING (o_orderpriority)),
    between_ss AS (
      SELECT cast(sum(cast(n_g * (zbar_g - t.zbar) * (zbar_g - t.zbar) as decimal(28,8)))
                  as double) AS ssb
      FROM zg CROSS JOIN tot t)
    SELECT t.n, t.k,
           round(((t.n - t.k) * b.ssb) / ((t.k - 1) * w.ssw), 6) AS levene_w,
           ((t.n - t.k) * b.ssb) / ((t.k - 1) * w.ssw) > {LEVENE_F_CRIT}
             AS heteroscedastic
    FROM tot t CROSS JOIN within w CROSS JOIN between_ss b
    """,
)
def levene_variance_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEVENE variance-homogeneity test (Brown–Forsythe median variant
    — robust to non-normality) across order priorities: W is the
    one-way ANOVA F on z = |x − median_g|. The pipeline use: before
    pooling variances across strata (Neyman allocation, pooled CIs),
    check they're actually poolable. Per-group medians carry the usual
    low-cardinality percentile caveat (approx_percentile at 100 TB);
    everything else is combinable moments with exact-decimal sums and
    9 dp group means so both engines square identical residuals. The
    flag compares W to the fixed F(0.05; k−1, ∞) literal."""
    o = load(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    med = o.groupBy("o_orderpriority").agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)").alias("med")
    )
    z = o.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority", F.abs(F.col("o_totalprice") - F.col("med")).alias("z")
    )
    zg = z.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.round(
            F.sum(F.col("z").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), 9
        ).alias("zbar_g"),
    )
    tot = zg.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.round(
            F.sum((F.col("zbar_g") * F.col("n_g")).cast("decimal(28,9)")).cast("double")
            / F.sum("n_g"),
            9,
        ).alias("zbar"),
    )
    within = z.join(F.broadcast(zg), "o_orderpriority").agg(
        F.sum(
            ((F.col("z") - F.col("zbar_g")) * (F.col("z") - F.col("zbar_g"))).cast(
                "decimal(28,8)"
            )
        )
        .cast("double")
        .alias("ssw")
    )
    between = zg.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            (
                F.col("n_g")
                * (F.col("zbar_g") - F.col("zbar"))
                * (F.col("zbar_g") - F.col("zbar"))
            ).cast("decimal(28,8)")
        )
        .cast("double")
        .alias("ssb")
    )
    w_stat = ((F.col("n") - F.col("k")) * F.col("ssb")) / (
        (F.col("k") - 1) * F.col("ssw")
    )
    return (
        tot.crossJoin(F.broadcast(within))
        .crossJoin(F.broadcast(between))
        .select(
            "n",
            "k",
            F.round(w_stat, 6).alias("levene_w"),
            (w_stat > LEVENE_F_CRIT).alias("heteroscedastic"),
        )
    )
