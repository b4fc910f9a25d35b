"""Round-7 capability extensions (SURVEY.md §2.13 ⊕⊕): SQL surface
(LATERAL), entity blocking, distributed ML training steps, optimizer
statistics, conformal eval, differential privacy, storage planning,
and two-sample drift testing.

Each query follows the cross-engine determinism rules from
``plans/__init__``: exact-decimal accumulation before one rounded
cast, identical per-row double arithmetic in both dialects, identical
aliases. Portable randomness is salted md5 → bigint, as everywhere
else in the repo (`plans/pipelineq.py::dataset_split_assign`).

No reference twin: the reference (alexeygrigorev/data-engineering-rag)
stops at RAG glue; these are the engine-side operations a 100 TB
training-data platform additionally needs (blocking-based entity
resolution, drift detection between corpus snapshots, conformal
calibration of quality predictors, DP release of corpus statistics,
encoding/layout planning for the shard writer).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from . import load, query

# --------------------------------------------------------------------------
# SQL surface: LATERAL correlated subquery (top-N per group without a
# window — the optimizer decorrelates into the ranked-join plan)
# --------------------------------------------------------------------------

LATERAL_TOPN = 3


@query(
    "lateral_topn_customers",
    f"""
    SELECT n.n_name, c.c_custkey, c.c_name, round(c.c_acctbal, 2) AS acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_name, c_acctbal FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT {LATERAL_TOPN}) c
    """,
)
def lateral_topn_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{LATERAL_TOPN} customers per nation via a CORRELATED LATERAL
    subquery (§2.9 SQL surface) — the ANSI spelling of top-N-per-group
    that Catalyst decorrelates (DecorrelateInnerQuery handles the
    correlated ORDER BY ... LIMIT) into the same ranked-join plan a
    hand-written window would produce. Ties broken by c_custkey so both
    engines pick identical rows. Scale: the decorrelated plan is one
    partial top-N per grouping key — no per-nation re-scan."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("r7_nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("r7_customer")
    return spark.sql(
        f"""
        SELECT n.n_name, c.c_custkey, c.c_name, round(c.c_acctbal, 2) AS acctbal
        FROM r7_nation n JOIN LATERAL (
          SELECT c_custkey, c_name, c_acctbal FROM r7_customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT {LATERAL_TOPN}) c
        """
    )


# --------------------------------------------------------------------------
# Distributed ML: one logistic-regression gradient step as a
# combinable aggregate (the shape every data-parallel trainer reduces to)
# --------------------------------------------------------------------------


@query(
    "logreg_gradient_step",
    """
    WITH feats AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y,
             value / 100.0 AS x1,
             extract(hour FROM ts) / 24.0 AS x2
      FROM events),
    grad AS (
      SELECT cast(count(*) as bigint) AS n,
             round(cast(sum(cast((y - 0.5) as decimal(18,9))) as double)
                   / count(*), 9) AS w_bias,
             round(cast(sum(cast(x1 * (y - 0.5) as decimal(18,9))) as double)
                   / count(*), 9) AS w_value,
             round(cast(sum(cast(x2 * (y - 0.5) as decimal(18,9))) as double)
                   / count(*), 9) AS w_hour
      FROM feats)
    SELECT g.n, g.w_bias, g.w_value, g.w_hour,
           round(ln(2), 6) AS logloss_before,
           round(cast(sum(cast(
             -(f.y * ln(1.0 / (1.0 + exp(-(g.w_bias + g.w_value * f.x1 + g.w_hour * f.x2))))
               + (1.0 - f.y) * ln(1.0 - 1.0 / (1.0 + exp(-(g.w_bias + g.w_value * f.x1
                                                           + g.w_hour * f.x2)))))
           as decimal(18,12))) as double) / g.n, 6) AS logloss_after
    FROM feats f CROSS JOIN grad g
    GROUP BY g.n, g.w_bias, g.w_value, g.w_hour
    """,
)
def logreg_gradient_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE exact gradient-descent step of logistic regression
    (predict-purchase from scaled value + hour-of-day), w₀ = 0 so
    p₀ = 0.5 and the full-batch gradient is ∇ⱼ = Σ xⱼ·(y − ½)/n — a
    purely COMBINABLE aggregate: this is the map-side-partial shape
    every data-parallel trainer (parameter averaging, L-BFGS batch
    gradients, minibatch SGD with tree aggregation) reduces to, and
    why a gradient step costs one groupBy, not a collect. The second
    pass re-scores the corpus under the broadcast updated weights and
    reports exact log-loss (vs ln 2 at w₀). Gradients round at 9 dp
    from exact decimal sums so both engines re-score with bit-identical
    weights; the loss accumulates as decimal(18,12)."""
    ev = load(spark, sf_dir, "events")
    feats = ev.select(
        F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0).alias("y"),
        (F.col("value") / 100.0).alias("x1"),
        (F.hour("ts") / 24.0).alias("x2"),
    )
    grad = feats.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum((F.col("y") - 0.5).cast("decimal(18,9)")).cast("double") / F.count(F.lit(1)), 9
        ).alias("w_bias"),
        F.round(
            F.sum((F.col("x1") * (F.col("y") - 0.5)).cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("w_value"),
        F.round(
            F.sum((F.col("x2") * (F.col("y") - 0.5)).cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("w_hour"),
    )
    z = F.col("w_bias") + F.col("w_value") * F.col("x1") + F.col("w_hour") * F.col("x2")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    loss = -(F.col("y") * F.log(p) + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p))
    return (
        feats.crossJoin(F.broadcast(grad))
        .groupBy("n", "w_bias", "w_value", "w_hour")
        .agg(
            F.round(F.log(F.lit(2.0)), 6).alias("logloss_before"),
            F.round(
                F.sum(loss.cast("decimal(18,12)")).cast("double") / F.col("n"), 6
            ).alias("logloss_after"),
        )
        .select("n", "w_bias", "w_value", "w_hour", "logloss_before", "logloss_after")
    )


# --------------------------------------------------------------------------
# Optimizer statistics: sampled join-cardinality estimation
# --------------------------------------------------------------------------

CARD_SALT = "card7|"
CARD_MOD = 20  # 1-in-20 key sample


@query(
    "join_cardinality_estimate",
    f"""
    WITH per_key AS (
      SELECT user_id, cast(count(*) as bigint) AS c,
             cast(concat('0x', substr(md5(concat('{CARD_SALT}',
                  cast(user_id as varchar))), 1, 15)) as bigint) % {CARD_MOD} AS b
      FROM events GROUP BY user_id)
    SELECT cast(sum(c * c) as bigint) AS exact_pairs,
           cast({CARD_MOD} * sum(CASE WHEN b = 0 THEN c * c ELSE 0 END) as bigint)
             AS est_pairs,
           round(abs({CARD_MOD} * sum(CASE WHEN b = 0 THEN c * c ELSE 0 END)
                     - sum(c * c))::double / sum(c * c), 6) AS rel_err
    FROM per_key
    """,
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled JOIN-SIZE estimation for the events user_id self-join
    (|A⋈A| = Σᵤ cᵤ² — the quantity a cost-based optimizer needs before
    picking a join strategy, and the one that explodes under key skew):
    a 1-in-{CARD_MOD} deterministic KEY sample (salted-hash bucket, so
    both sides of a key land in or out together — sampling ROWS would
    bias c² quadratically downward) scales Σ c² back up by {CARD_MOD}.
    One combinable groupBy computes exact and estimate side by side
    with the realized relative error — the estimator is unbiased over
    keys, and the error column is the audit. At 100 TB the per-key
    count table is the only shuffle; the sample just filters it."""
    ev = load(spark, sf_dir, "events")
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(CARD_SALT), F.col("user_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % CARD_MOD
    )
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("c")).withColumn(
        "b", b
    )
    c2 = F.col("c") * F.col("c")
    return per_key.agg(
        F.sum(c2).cast("long").alias("exact_pairs"),
        (F.lit(CARD_MOD) * F.sum(F.when(F.col("b") == 0, c2).otherwise(F.lit(0))))
        .cast("long")
        .alias("est_pairs"),
        F.round(
            F.abs(
                F.lit(CARD_MOD) * F.sum(F.when(F.col("b") == 0, c2).otherwise(F.lit(0)))
                - F.sum(c2)
            ).cast("double")
            / F.sum(c2),
            6,
        ).alias("rel_err"),
    )


# --------------------------------------------------------------------------
# Conformal prediction: distribution-free interval calibration
# --------------------------------------------------------------------------

CONF_SALT = "conf7|"
CONF_ALPHA_PCT = 90


@query(
    "conformal_interval_coverage",
    f"""
    WITH split AS (
      SELECT o_orderpriority, o_totalprice,
             cast(concat('0x', substr(md5(concat('{CONF_SALT}',
                  cast(o_orderkey as varchar))), 1, 15)) as bigint) % 100 AS b
      FROM orders),
    pred AS (
      SELECT o_orderpriority,
             cast(count(*) as bigint) AS n_train,
             round(cast(sum(cast(o_totalprice as decimal(18,2))) as double)
                   / count(*), 6) AS pred_mean
      FROM split WHERE b < 60 GROUP BY o_orderpriority),
    cal AS (
      SELECT s.o_orderpriority,
             cast(count(*) as bigint) AS n_cal,
             round(quantile_cont(abs(s.o_totalprice - p.pred_mean),
                                 {CONF_ALPHA_PCT / 100}), 6) AS q90
      FROM split s JOIN pred p USING (o_orderpriority)
      WHERE s.b >= 60 AND s.b < 80 GROUP BY s.o_orderpriority),
    test AS (
      SELECT s.o_orderpriority,
             cast(count(*) as bigint) AS n_test,
             round(sum(CASE WHEN abs(s.o_totalprice - p.pred_mean) <= c.q90
                            THEN 1 ELSE 0 END)::double / count(*), 6) AS coverage
      FROM split s JOIN pred p USING (o_orderpriority)
                   JOIN cal c USING (o_orderpriority)
      WHERE s.b >= 80 GROUP BY s.o_orderpriority)
    SELECT p.o_orderpriority, p.n_train, p.pred_mean,
           c.n_cal, c.q90, t.n_test, t.coverage
    FROM pred p JOIN cal c USING (o_orderpriority)
                JOIN test t USING (o_orderpriority)
    """,
)
def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal calibration of a prediction interval (the
    distribution-free eval every quality-score model should ship with):
    train/cal/test split by salted key hash (60/20/20, re-run stable),
    predictor = per-priority train mean, q = {CONF_ALPHA_PCT}th
    percentile of |residual| on the CALIBRATION split, then the test
    split audits realized coverage — conformal theory says it lands
    near {CONF_ALPHA_PCT}% regardless of the residual distribution.
    Shape: three filtered passes over one hash-split scan, broadcast
    per-group predictor/quantile joins. The exact percentile groups on
    the LOW-cardinality priority key (same honest caveat as
    robust_outlier_audit — approx_percentile is the drop-in at 100 TB,
    bound-tested there)."""
    o = load(spark, sf_dir, "orders")
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(CONF_SALT), F.col("o_orderkey").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = o.select("o_orderpriority", "o_totalprice", b.alias("b"))
    pred = (
        split.where(F.col("b") < 60)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("pred_mean"),
        )
    )
    cal = (
        split.where((F.col("b") >= 60) & (F.col("b") < 80))
        .join(F.broadcast(pred), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cal"),
            F.round(
                F.expr(
                    f"percentile_cont({CONF_ALPHA_PCT / 100}) WITHIN GROUP "
                    f"(ORDER BY abs(o_totalprice - pred_mean))"
                ),
                6,
            ).alias("q90"),
        )
    )
    test = (
        split.where(F.col("b") >= 80)
        .join(F.broadcast(pred), "o_orderpriority")
        .join(F.broadcast(cal.select("o_orderpriority", "q90")), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.round(
                F.sum(
                    (F.abs(F.col("o_totalprice") - F.col("pred_mean")) <= F.col("q90")).cast(
                        "int"
                    )
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("coverage"),
        )
    )
    return (
        pred.join(cal, "o_orderpriority")
        .join(test, "o_orderpriority")
        .select(
            "o_orderpriority", "n_train", "pred_mean", "n_cal", "q90", "n_test", "coverage"
        )
    )


# --------------------------------------------------------------------------
# Differential privacy: Laplace-noised count release + utility audit
# --------------------------------------------------------------------------

DP_SALT = "dp7|"
DP_EPSILON = 1.0  # count sensitivity 1 → Laplace scale b = 1/ε


@query(
    "dp_noised_counts_audit",
    f"""
    WITH u AS (
      SELECT event_type, cast(count(*) as bigint) AS n,
             (cast(concat('0x', substr(md5(concat('{DP_SALT}', event_type)), 1, 15))
                   as bigint) % 1000000 + 0.5) / 1000000.0 AS u
      FROM events GROUP BY event_type)
    SELECT event_type, n,
           round(n + (CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
                     * ln(1.0 - 2.0 * abs(u - 0.5)) / {DP_EPSILON}, 6) AS noised_n,
           round(abs((CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
                     * ln(1.0 - 2.0 * abs(u - 0.5)) / {DP_EPSILON}), 6) AS abs_noise
    FROM u
    """,
)
def dp_noised_counts_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private count release (ε = {DP_EPSILON},
    count sensitivity 1 → Laplace(1/ε) noise) with the utility audit a
    data steward runs BEFORE publishing: per-type exact count next to
    its noised release and the realized |noise|. Noise comes from the
    inverse Laplace CDF over the repo's portable salted-hash uniform —
    deterministic across engines (a production release would draw real
    randomness; the mechanism and scale are exactly this). Privacy
    caveat stated plainly: exact n appears here because this is the
    pre-release utility AUDIT, not the release itself. Shape: one
    combinable count, per-group scalar math — free at any scale."""
    ev = load(spark, sf_dir, "events")
    grouped = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    u = (
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(DP_SALT), F.col("event_type"))), 1, 15), 16, 10
            ).cast("long")
            % 1000000
        )
        + 0.5
    ) / 1000000.0
    sign = F.when(F.col("u") < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    lap = sign * F.log(F.lit(1.0) - 2.0 * F.abs(F.col("u") - 0.5)) / F.lit(DP_EPSILON)
    return (
        grouped.withColumn("u", u)
        .select(
            "event_type",
            "n",
            F.round(F.col("n") + lap, 6).alias("noised_n"),
            F.round(F.abs(lap), 6).alias("abs_noise"),
        )
    )


# --------------------------------------------------------------------------
# Storage planning: per-column encoding decision table
# --------------------------------------------------------------------------

ENC_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice", "o_orderdate"]


@query(
    "parquet_encoding_planner",
    " UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               cast(count(*) as bigint) AS n_rows,
               cast(count(DISTINCT {c}) as bigint) AS n_distinct,
               round(count(DISTINCT {c})::double / count(*), 6) AS distinct_ratio,
               round(cast(sum(cast(length(cast({c} as varchar)) as bigint)) as bigint)::double
                     / count(*), 6) AS avg_str_len,
               CASE WHEN count(DISTINCT {c})::double / count(*) < 0.0001 THEN 'RLE_DICTIONARY'
                    WHEN count(DISTINCT {c})::double / count(*) < 0.1 THEN 'DICTIONARY'
                    ELSE 'PLAIN' END AS encoding
        FROM orders
        """
        for c in ENC_COLS
    ),
)
def parquet_encoding_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column ENCODING decision table for the shard writer (§2.13
    storage layout, next to the Z-order/compaction planners): distinct
    ratio and average rendered width drive the parquet encoding choice
    — near-constant columns → RLE_DICTIONARY, low-cardinality →
    DICTIONARY, high-cardinality → PLAIN (a dictionary that grows with
    the data pays page-dict overhead for nothing). This is the audit
    behind writer configs like parquet.enable.dictionary per column.
    One pass per column, each a combinable (count, count distinct,
    length-sum) agg; at 100 TB you run it on a sampled shard, and the
    decision quantities are exactly these."""
    o = load(spark, sf_dir, "orders")
    parts = []
    for c in ENC_COLS:
        ratio = F.countDistinct(c).cast("double") / F.count(F.lit(1))
        parts.append(
            o.agg(
                F.lit(c).alias("column_name"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.countDistinct(c).cast("long").alias("n_distinct"),
                F.round(ratio, 6).alias("distinct_ratio"),
                F.round(
                    F.sum(F.length(F.col(c).cast("string")).cast("bigint"))
                    .cast("long")
                    .cast("double")
                    / F.count(F.lit(1)),
                    6,
                ).alias("avg_str_len"),
                F.when(ratio < 0.0001, "RLE_DICTIONARY")
                .when(ratio < 0.1, "DICTIONARY")
                .otherwise("PLAIN")
                .alias("encoding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ==========================================================================
# Round-7 batch 2: ML feature engineering, set-algebra bitmaps, CV,
# calibration, and point-in-time feature joins
# ==========================================================================

from ..operators.tfidf import TOKEN_PATTERN  # noqa: E402

# --------------------------------------------------------------------------
# Feature hashing (the hashing trick): bucket-occupancy audit
# --------------------------------------------------------------------------

FH_SALT = "fh7|"
FH_DIM = 1024


@query(
    "feature_hashing_collision_audit",
    f"""
    WITH terms AS (
      SELECT DISTINCT unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
      FROM documents),
    hashed AS (
      SELECT term,
             cast(concat('0x', substr(md5(concat('{FH_SALT}', term)), 1, 15))
                  as bigint) % {FH_DIM} AS bucket
      FROM terms),
    occ AS (SELECT bucket, cast(count(*) as bigint) AS occupancy
            FROM hashed GROUP BY bucket)
    SELECT occupancy,
           cast(count(*) as bigint) AS n_buckets,
           cast(occupancy * count(*) as bigint) AS n_terms
    FROM occ GROUP BY occupancy
    """,
)
def feature_hashing_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-occupancy histogram for the HASHING-TRICK featurizer
    (Weinberger et al. 2009): vocabulary terms hashed into {FH_DIM}
    buckets via the portable salted hash; the histogram (how many
    buckets hold k distinct terms) is the audit that decides whether
    the dimension is big enough — occupancy ≥ 2 buckets are feature
    collisions that alias model weights. At 100 TB the vocabulary is
    the only shuffled relation (terms, not token occurrences: the
    DISTINCT happens before hashing), and the featurizer itself is a
    stateless per-row map — the whole point of hashing over a learned
    vocabulary table."""
    d = load(spark, sf_dir, "documents")
    terms = (
        d.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0))
            ).alias("term")
        )
        .distinct()
    )
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(FH_SALT), F.col("term"))), 1, 15), 16, 10)
        .cast("long")
        % FH_DIM
    )
    occ = terms.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("occupancy")
    )
    return occ.groupBy("occupancy").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        (F.col("occupancy") * F.count(F.lit(1))).cast("long").alias("n_terms"),
    )


# --------------------------------------------------------------------------
# Leave-one-out target encoding with additive smoothing
# --------------------------------------------------------------------------

TE_SALT = "te7|"
TE_SMOOTH_M = 10
TE_SLICE_PCT = 5


@query(
    "target_encoding_loo",
    f"""
    WITH grp AS (
      SELECT o_orderpriority,
             cast(count(*) as bigint) AS n_g,
             sum(cast(o_totalprice as decimal(18,2))) AS s_g
      FROM orders GROUP BY o_orderpriority),
    gmean AS (
      SELECT round(cast(sum(cast(o_totalprice as decimal(18,2))) as double)
                   / count(*), 6) AS gm
      FROM orders)
    SELECT o.o_orderkey, o.o_orderpriority,
           round((cast(g.s_g - cast(o.o_totalprice as decimal(18,2)) as double)
                  + {TE_SMOOTH_M} * gl.gm)
                 / (g.n_g - 1 + {TE_SMOOTH_M}), 6) AS te_loo
    FROM orders o
    JOIN grp g USING (o_orderpriority) CROSS JOIN gmean gl
    WHERE cast(concat('0x', substr(md5(concat('{TE_SALT}',
               cast(o.o_orderkey as varchar))), 1, 15)) as bigint) % 100
          < {TE_SLICE_PCT}
    """,
)
def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAVE-ONE-OUT target encoding of order priority against
    totalprice with additive smoothing toward the global mean
    (m={TE_SMOOTH_M}) — the categorical-feature encoder that leaks
    without the LOO correction (a row's own label must not enter its
    feature) and overfits rare categories without the smoothing prior.
    enc = (Σ_g y − y_i + m·ȳ)/(n_g − 1 + m), from ONE combinable
    per-group (n, Σ) pass broadcast back over the rows — the encode
    join never re-aggregates. A deterministic {TE_SLICE_PCT}% key slice
    bounds the emitted sample (the encoding itself is computed from
    ALL rows); group sums stay exact decimals until one double cast."""
    o = load(spark, sf_dir, "orders")
    grp = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s_g"),
    )
    glob = o.agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("gm")
    )
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(TE_SALT), F.col("o_orderkey").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    enc = F.round(
        (
            (F.col("s_g") - F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            + F.lit(TE_SMOOTH_M) * F.col("gm")
        )
        / (F.col("n_g") - 1 + TE_SMOOTH_M),
        6,
    )
    return (
        o.where(b < TE_SLICE_PCT)
        .join(F.broadcast(grp), "o_orderpriority")
        .crossJoin(F.broadcast(glob))
        .select("o_orderkey", "o_orderpriority", enc.alias("te_loo"))
    )


# --------------------------------------------------------------------------
# Decision-stump training: best threshold by weighted Gini over bins
# --------------------------------------------------------------------------

STUMP_BIN_W = 5000.0
STUMP_BINS = 100


@query(
    "decision_stump_train",
    f"""
    WITH binned AS (
      SELECT least(cast(floor(o_totalprice / {STUMP_BIN_W}) as bigint), {STUMP_BINS - 1}) AS bin,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders),
    per_bin AS (
      SELECT bin, cast(count(*) as bigint) AS n, cast(sum(y) as bigint) AS pos
      FROM binned GROUP BY bin),
    cum AS (
      SELECT bin,
             sum(n) OVER (ORDER BY bin) AS cn,
             sum(pos) OVER (ORDER BY bin) AS cp,
             sum(n) OVER () AS nt, sum(pos) OVER () AS pt
      FROM per_bin),
    cand AS (
      SELECT (bin + 1) * {STUMP_BIN_W} AS threshold,
             cast(cn as bigint) AS n_left, cast(nt - cn as bigint) AS n_right,
             (cn::double / nt)
               * (2.0 * (cp::double / cn) * (1.0 - cp::double / cn))
             + ((nt - cn)::double / nt)
               * (2.0 * ((pt - cp)::double / (nt - cn))
                  * (1.0 - (pt - cp)::double / (nt - cn))) AS split_gini,
             2.0 * (pt::double / nt) * (1.0 - pt::double / nt) AS base_gini
      FROM cum WHERE cn > 0 AND cn < nt)
    SELECT round(cast(threshold as double), 1) AS threshold, n_left, n_right,
           round(base_gini, 9) AS base_gini,
           round(split_gini, 9) AS split_gini,
           round(base_gini - split_gini, 9) AS impurity_decrease
    FROM cand ORDER BY split_gini, threshold LIMIT 1
    """,
)
def decision_stump_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECISION-STUMP training (the base learner of every boosted
    ensemble): find the totalprice threshold minimizing weighted Gini
    for predicting finished orders. The distributed shape that matters:
    per-bin (n, Σy) sufficient statistics are ONE combinable groupBy;
    candidate thresholds are cumulative sums over the ≤{STUMP_BINS}-row
    bin aggregate (bounded by construction — this is why trainers bin
    features: XGBoost's approx/hist mode is exactly this plan), and the
    argmin is a TakeOrdered over candidates, tie-broken by threshold.
    Doubles appear only in per-candidate Gini math on identical
    integers; outputs round at 9 dp."""
    o = load(spark, sf_dir, "orders")
    binned = o.select(
        F.least(
            F.floor(F.col("o_totalprice") / STUMP_BIN_W).cast("long"), F.lit(STUMP_BINS - 1)
        ).alias("bin"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    per_bin = (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"), F.sum("y").cast("long").alias("pos"))
        .limit(STUMP_BINS)  # ≤ STUMP_BINS rows exist; makes boundedness visible
    )
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = per_bin.select(
        "bin",
        F.sum("n").over(w_cum).alias("cn"),
        F.sum("pos").over(w_cum).alias("cp"),
        F.sum("n").over(w_all).alias("nt"),
        F.sum("pos").over(w_all).alias("pt"),
    )
    pl = F.col("cp").cast("double") / F.col("cn")
    pr = (F.col("pt") - F.col("cp")).cast("double") / (F.col("nt") - F.col("cn"))
    split_gini = (F.col("cn").cast("double") / F.col("nt")) * (
        2.0 * pl * (1.0 - pl)
    ) + ((F.col("nt") - F.col("cn")).cast("double") / F.col("nt")) * (2.0 * pr * (1.0 - pr))
    base_gini = (
        2.0
        * (F.col("pt").cast("double") / F.col("nt"))
        * (1.0 - F.col("pt").cast("double") / F.col("nt"))
    )
    cand = (
        cum.where((F.col("cn") > 0) & (F.col("cn") < F.col("nt")))
        .select(
            ((F.col("bin") + 1) * STUMP_BIN_W).alias("threshold"),
            F.col("cn").cast("long").alias("n_left"),
            (F.col("nt") - F.col("cn")).cast("long").alias("n_right"),
            split_gini.alias("sg"),
            base_gini.alias("bg"),
        )
        .orderBy("sg", "threshold")
        .limit(1)
    )
    return cand.select(
        F.round("threshold", 1).alias("threshold"),
        "n_left",
        "n_right",
        F.round("bg", 9).alias("base_gini"),
        F.round("sg", 9).alias("split_gini"),
        F.round(F.col("bg") - F.col("sg"), 9).alias("impurity_decrease"),
    )


# --------------------------------------------------------------------------
# Bitmap set algebra: DAU / rolling WAU via mergeable user bitmaps
# --------------------------------------------------------------------------

BM_BITS = 62  # bits per block; < 63 keeps 1<<bit positive in both engines


@query(
    "bitmap_rolling_actives",
    f"""
    WITH days AS (
      SELECT DISTINCT cast(date_trunc('day', ts) as date) AS day FROM events),
    blocks AS (
      SELECT DISTINCT cast(user_id // {BM_BITS} as bigint) AS block FROM events),
    daily_bm AS (
      SELECT cast(date_trunc('day', ts) as date) AS day,
             cast(user_id // {BM_BITS} as bigint) AS block,
             bit_or(cast(1 as bigint) << cast(user_id % {BM_BITS} as int)) AS bm
      FROM events GROUP BY 1, 2),
    grid AS (
      SELECT d.day, b.block,
             date_diff('day', DATE '1990-01-01', d.day) AS day_idx,
             coalesce(g.bm, 0) AS bm
      FROM days d CROSS JOIN blocks b
      LEFT JOIN daily_bm g ON g.day = d.day AND g.block = b.block),
    rolled AS (
      SELECT day, bm,
             bit_or(bm) OVER (PARTITION BY block ORDER BY day_idx
                              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS wbm
      FROM grid)
    SELECT day,
           cast(sum(bit_count(bm)) as bigint) AS dau,
           cast(sum(bit_count(wbm)) as bigint) AS wau
    FROM rolled GROUP BY day
    """,
)
def bitmap_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily and rolling-7-day active users via MERGEABLE BITMAPS (the
    roaring-bitmap pattern from ClickHouse/Druid): the user-id space
    splits into {BM_BITS}-bit blocks, each (day, block) reduces to one
    int64 via bit_or, DAU = Σ popcount, and the 7-day WAU is a bit_or
    over a per-BLOCK range window — set union becomes integer OR, so
    rolling distinct-count costs no distinct at all. The load-bearing
    scale properties: bitmaps are combinable partials (map-side OR),
    the window partitions on block (never global), and a day×block
    gap-fill grid keeps windows honest when a block is silent on a day.
    At 100 TB the per-day state is |users|/{BM_BITS} int64s — the same
    algebra extends to retention (AND), churn (AND NOT), and any set
    expression."""
    ev = load(spark, sf_dir, "events")
    days = ev.select(F.date_trunc("day", "ts").cast("date").alias("day")).distinct()
    blocks = ev.select((F.col("user_id") / BM_BITS).cast("long").alias("block")).distinct()
    daily_bm = (
        ev.select(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            (F.col("user_id") / BM_BITS).cast("long").alias("block"),
            F.expr(f"shiftleft(cast(1 as bigint), cast(user_id % {BM_BITS} as int))").alias(
                "one_bit"
            ),
        )
        .groupBy("day", "block")
        .agg(F.expr("bit_or(one_bit)").alias("bm"))
    )
    grid = (
        days.crossJoin(blocks)
        .join(daily_bm, ["day", "block"], "left")
        .select(
            "day",
            "block",
            F.datediff(F.col("day"), F.lit("1990-01-01").cast("date")).alias("day_idx"),
            F.coalesce(F.col("bm"), F.lit(0).cast("long")).alias("bm"),
        )
    )
    w = Window.partitionBy("block").orderBy("day_idx").rangeBetween(-6, 0)
    rolled = grid.withColumn("wbm", F.bit_or("bm").over(w)).select("day", "bm", "wbm")
    return rolled.groupBy("day").agg(
        F.sum(F.bit_count("bm")).cast("long").alias("dau"),
        F.sum(F.bit_count("wbm")).cast("long").alias("wau"),
    )


# --------------------------------------------------------------------------
# k-fold cross-validation of the per-group mean predictor
# --------------------------------------------------------------------------

CV_SALT = "cv7|"
CV_K = 5


@query(
    "kfold_cv_mean_predictor",
    f"""
    WITH folded AS (
      SELECT o_orderpriority, o_totalprice,
             cast(concat('0x', substr(md5(concat('{CV_SALT}',
                  cast(o_orderkey as varchar))), 1, 15)) as bigint) % {CV_K} AS fold
      FROM orders),
    parts AS (
      SELECT fold, o_orderpriority,
             cast(count(*) as bigint) AS n,
             sum(cast(o_totalprice as decimal(18,2))) AS s
      FROM folded GROUP BY fold, o_orderpriority),
    tot AS (
      SELECT o_orderpriority,
             cast(sum(n) as bigint) AS n_tot, sum(s) AS s_tot
      FROM parts GROUP BY o_orderpriority),
    pred AS (
      SELECT p.fold, p.o_orderpriority,
             round(cast(t.s_tot - p.s as double) / (t.n_tot - p.n), 6) AS yhat
      FROM parts p JOIN tot t USING (o_orderpriority))
    SELECT f.fold, cast(count(*) as bigint) AS n_test,
           round(cast(sum(cast(abs(f.o_totalprice - p.yhat) as decimal(18,6)))
                 as double) / count(*), 6) AS mae
    FROM folded f JOIN pred p
      ON p.fold = f.fold AND p.o_orderpriority = f.o_orderpriority
    GROUP BY f.fold
    """,
)
def kfold_cv_mean_predictor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{CV_K}-fold cross-validation of the per-priority mean predictor
    — the evaluation loop every model-selection pipeline runs, spelled
    so ALL folds train and score in ONE pass each: per-(fold, group)
    sufficient statistics (n, Σ) aggregate once, each fold's training
    stats are TOTALS MINUS OWN FOLD (no K re-scans of the data — the
    complement trick), and scoring joins the tiny (K×groups) predictor
    table back broadcast. Fold assignment is the salted key hash, so
    folds are re-run-stable and disjoint by construction. MAE per fold
    accumulates exact decimals from per-row |y − ŷ| against the
    6dp-rounded prediction."""
    o = load(spark, sf_dir, "orders")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(CV_SALT), F.col("o_orderkey").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % CV_K
    )
    folded = o.select("o_orderpriority", "o_totalprice", fold.alias("fold"))
    parts = folded.groupBy("fold", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
    )
    tot = parts.groupBy("o_orderpriority").agg(
        F.sum("n").cast("long").alias("n_tot"), F.sum("s").alias("s_tot")
    )
    pred = parts.join(tot, "o_orderpriority").select(
        "fold",
        "o_orderpriority",
        F.round(
            (F.col("s_tot") - F.col("s")).cast("double") / (F.col("n_tot") - F.col("n")), 6
        ).alias("yhat"),
    )
    return (
        folded.join(F.broadcast(pred), ["fold", "o_orderpriority"])
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.round(
                F.sum(
                    F.abs(F.col("o_totalprice") - F.col("yhat")).cast("decimal(18,6)")
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mae"),
        )
    )


# --------------------------------------------------------------------------
# Calibration of the one-step logistic model: reliability bins
# --------------------------------------------------------------------------

CALIB_BINS = 10

_LOGREG_GRAD_SQL = """
    WITH feats AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y,
             value / 100.0 AS x1,
             extract(hour FROM ts) / 24.0 AS x2
      FROM events),
    grad AS (
      SELECT cast(count(*) as bigint) AS n,
             round(cast(sum(cast((y - 0.5) as decimal(18,9))) as double)
                   / count(*), 9) AS w_bias,
             round(cast(sum(cast(x1 * (y - 0.5) as decimal(18,9))) as double)
                   / count(*), 9) AS w_value,
             round(cast(sum(cast(x2 * (y - 0.5) as decimal(18,9))) as double)
                   / count(*), 9) AS w_hour
      FROM feats)
"""


def _logreg_feats_and_weights(spark: SparkSession, sf_dir: str):
    """Shared with logreg_gradient_step: (feats, 1-row weight frame)."""
    ev = load(spark, sf_dir, "events")
    feats = ev.select(
        F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0).alias("y"),
        (F.col("value") / 100.0).alias("x1"),
        (F.hour("ts") / 24.0).alias("x2"),
    )
    grad = feats.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum((F.col("y") - 0.5).cast("decimal(18,9)")).cast("double") / F.count(F.lit(1)), 9
        ).alias("w_bias"),
        F.round(
            F.sum((F.col("x1") * (F.col("y") - 0.5)).cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("w_value"),
        F.round(
            F.sum((F.col("x2") * (F.col("y") - 0.5)).cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("w_hour"),
    )
    return feats, grad


@query(
    "logreg_calibration_bins",
    _LOGREG_GRAD_SQL
    + f"""
    , scored AS (
      SELECT f.y,
             1.0 / (1.0 + exp(-(g.w_bias + g.w_value * f.x1 + g.w_hour * f.x2))) AS p
      FROM feats f CROSS JOIN grad g)
    SELECT least(cast(floor(p * {CALIB_BINS}) as bigint), {CALIB_BINS - 1}) AS bin,
           cast(count(*) as bigint) AS n,
           round(cast(sum(cast(p as decimal(18,12))) as double) / count(*), 6)
             AS mean_predicted,
           round(cast(sum(cast(y as decimal(18,2))) as double) / count(*), 6)
             AS observed_rate
    FROM scored
    GROUP BY least(cast(floor(p * {CALIB_BINS}) as bigint), {CALIB_BINS - 1})
    """,
)
def logreg_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELIABILITY DIAGRAM for the one-step logistic model
    (``logreg_gradient_step``): predicted probabilities bucket into
    {CALIB_BINS} fixed-width bins and each bin reports mean predicted p
    vs observed purchase rate — the calibration check that decides
    whether a quality/filter classifier's scores can be thresholded as
    probabilities (miscalibrated scores silently shift the corpus
    mixture when used as sampling weights). Fixed-width bins, not
    quantile bins, so there is no global rank pass; scoring is the
    same broadcast-weights map as the trainer, and each bin is one
    combinable (n, Σp, Σy) aggregate."""
    feats, grad = _logreg_feats_and_weights(spark, sf_dir)
    z = F.col("w_bias") + F.col("w_value") * F.col("x1") + F.col("w_hour") * F.col("x2")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    scored = feats.crossJoin(F.broadcast(grad)).select("y", p.alias("p"))
    bin_col = F.least(
        F.floor(F.col("p") * CALIB_BINS).cast("long"), F.lit(CALIB_BINS - 1)
    ).alias("bin")
    return scored.groupBy(bin_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.col("p").cast("decimal(18,12)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_predicted"),
        F.round(
            F.sum(F.col("y").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("observed_rate"),
    )


# --------------------------------------------------------------------------
# Point-in-time feature join (feature-store backfill correctness)
# --------------------------------------------------------------------------

PIT_HEAVY_MIN = 20
PIT_REGULAR_MIN = 5


@query(
    "pit_feature_join_purchases",
    f"""
    WITH snaps AS (
      SELECT user_id, cast(date_trunc('month', ts) as date) AS snap_month,
             cast(count(*) as bigint) AS n_ev,
             CASE WHEN count(*) >= {PIT_HEAVY_MIN} THEN 'heavy'
                  WHEN count(*) >= {PIT_REGULAR_MIN} THEN 'regular'
                  ELSE 'light' END AS tier
      FROM events GROUP BY 1, 2),
    purchases AS (
      SELECT event_id, user_id, cast(date_trunc('month', ts) as date) AS p_month
      FROM events WHERE event_type = 'purchase'),
    pit AS (
      SELECT p.event_id, p.user_id, p.p_month,
             max_by(s.snap_month, s.snap_month) AS asof_month,
             max_by(s.tier, s.snap_month) AS tier_asof,
             max_by(s.n_ev, s.snap_month) AS n_ev_asof
      FROM purchases p JOIN snaps s
        ON s.user_id = p.user_id AND s.snap_month < p.p_month
      GROUP BY p.event_id, p.user_id, p.p_month)
    SELECT p.event_id, p.user_id,
           t.asof_month, coalesce(t.tier_asof, 'new') AS tier_asof,
           coalesce(t.n_ev_asof, 0) AS n_ev_asof
    FROM purchases p LEFT JOIN pit t USING (event_id, user_id)
    """,
)
def pit_feature_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME feature join (the feature-store backfill
    correctness primitive): each purchase is enriched with the user's
    activity tier from the latest monthly snapshot STRICTLY BEFORE its
    own month — the strict `<` is the leakage guard (a same-month
    snapshot would encode the label's own period; training-serving skew
    starts exactly here). The as-of resolution is a partial-aggregable
    max_by over the time-bounded join (never a window over the raw
    fan-out), users with no history fall back to the cold-start 'new'
    tier via the left join. Snapshots are themselves one combinable
    groupBy; at 100 TB they'd be the materialized feature table and
    this query is the backfill."""
    ev = load(spark, sf_dir, "events")
    snaps = ev.groupBy(
        "user_id", F.date_trunc("month", "ts").cast("date").alias("snap_month")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_ev"))
    snaps = snaps.withColumn(
        "tier",
        F.when(F.col("n_ev") >= PIT_HEAVY_MIN, "heavy")
        .when(F.col("n_ev") >= PIT_REGULAR_MIN, "regular")
        .otherwise("light"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.date_trunc("month", "ts").cast("date").alias("p_month")
    )
    joined = purchases.join(
        snaps.withColumnRenamed("user_id", "s_user"),
        (F.col("s_user") == F.col("user_id")) & (F.col("snap_month") < F.col("p_month")),
    )
    pit = joined.groupBy("event_id", "user_id", "p_month").agg(
        F.max_by("snap_month", "snap_month").alias("asof_month"),
        F.max_by("tier", "snap_month").alias("tier_asof"),
        F.max_by("n_ev", "snap_month").alias("n_ev_asof"),
    )
    return purchases.join(pit, ["event_id", "user_id"], "left").select(
        "event_id",
        "user_id",
        "asof_month",
        F.coalesce(F.col("tier_asof"), F.lit("new")).alias("tier_asof"),
        F.coalesce(F.col("n_ev_asof"), F.lit(0).cast("long")).alias("n_ev_asof"),
    )


# ==========================================================================
# Round-7 batch 3: experimentation (CUPED), IR storage, survival,
# changepoint detection, quantile fitting
# ==========================================================================

CUPED_SALT = "ab7|"
CUPED_SPLIT = "2024-01-16"  # pre-period: days 1-15; post: 16-30


@query(
    "cuped_ab_test",
    f"""
    WITH per_user AS (
      SELECT user_id,
             cast(concat('0x', substr(md5(concat('{CUPED_SALT}',
                  cast(user_id as varchar))), 1, 15)) as bigint) % 2 AS t,
             cast(sum(CASE WHEN ts < timestamp '{CUPED_SPLIT}'
                           THEN cast(value as decimal(18,6)) ELSE 0 END)
                  as double) AS x,
             cast(sum(CASE WHEN ts >= timestamp '{CUPED_SPLIT}'
                           THEN cast(value as decimal(18,6)) ELSE 0 END)
                  as double) AS y
      FROM events GROUP BY user_id),
    mom AS (
      SELECT cast(count(*) as bigint) AS n,
             round(cast(sum(cast(x as decimal(18,6))) as double) / count(*), 9) AS xbar,
             round((cast(sum(cast(x * y as decimal(28,6))) as double)
                    - cast(sum(cast(x as decimal(18,6))) as double)
                      * cast(sum(cast(y as decimal(18,6))) as double) / count(*))
                   / (cast(sum(cast(x * x as decimal(28,6))) as double)
                      - cast(sum(cast(x as decimal(18,6))) as double)
                        * cast(sum(cast(x as decimal(18,6))) as double) / count(*)),
                   9) AS theta
      FROM per_user),
    adj AS (
      SELECT p.t, p.y, p.y - m.theta * (p.x - m.xbar) AS y_adj, m.n
      FROM per_user p CROSS JOIN mom m)
    SELECT any_value(n) AS n_users,
           cast(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) as bigint) AS n_treat,
           round(cast(sum(CASE WHEN t = 1 THEN cast(y as decimal(18,6)) ELSE 0 END)
                      as double)
                 / sum(CASE WHEN t = 1 THEN 1 ELSE 0 END)
                 - cast(sum(CASE WHEN t = 0 THEN cast(y as decimal(18,6)) ELSE 0 END)
                        as double)
                   / sum(CASE WHEN t = 0 THEN 1 ELSE 0 END), 6) AS naive_diff,
           round(cast(sum(CASE WHEN t = 1 THEN cast(y_adj as decimal(18,6)) ELSE 0 END)
                      as double)
                 / sum(CASE WHEN t = 1 THEN 1 ELSE 0 END)
                 - cast(sum(CASE WHEN t = 0 THEN cast(y_adj as decimal(18,6)) ELSE 0 END)
                        as double)
                   / sum(CASE WHEN t = 0 THEN 1 ELSE 0 END), 6) AS cuped_diff,
           round(1.0 - (cast(sum(cast(y_adj * y_adj as decimal(28,6))) as double)
                        - cast(sum(cast(y_adj as decimal(18,6))) as double)
                          * cast(sum(cast(y_adj as decimal(18,6))) as double) / count(*))
                       / (cast(sum(cast(y * y as decimal(28,6))) as double)
                          - cast(sum(cast(y as decimal(18,6))) as double)
                            * cast(sum(cast(y as decimal(18,6))) as double) / count(*)),
                 6) AS var_reduction
    FROM adj
    """,
)
def cuped_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for an A/B readout (Deng et al., WSDM
    2013 — the experimentation-platform standard): users hash into
    treatment/control, the PRE-period value sum is the covariate, and
    the adjusted metric y' = y − θ(x − x̄) with θ = cov(x,y)/var(x)
    removes the between-user variance the pre-period already explains
    — same expected diff, tighter CI. All moments (Σx, Σy, Σxy, Σx²)
    are ONE combinable aggregate over the per-user rollup; θ and x̄
    round at 9 dp so both engines adjust with identical constants; the
    y'-variance ratio is the reported variance reduction. The
    assignment hash is the same salted-md5 split used everywhere, so
    the experiment is re-run stable."""
    ev = load(spark, sf_dir, "events")
    t = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(CUPED_SALT), F.col("user_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    pre = F.col("ts") < F.lit(CUPED_SPLIT).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(pre, F.col("value").cast("decimal(18,6)")).otherwise(F.lit(0)))
        .cast("double")
        .alias("x"),
        F.sum(F.when(~pre, F.col("value").cast("decimal(18,6)")).otherwise(F.lit(0)))
        .cast("double")
        .alias("y"),
    ).withColumn("t", t)
    dec6 = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    dec28 = lambda e: e.cast("decimal(28,6)")  # noqa: E731
    mom = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum(dec6("x")).cast("double") / F.count(F.lit(1)), 9).alias("xbar"),
        F.round(
            (
                F.sum(dec28(F.col("x") * F.col("y"))).cast("double")
                - F.sum(dec6("x")).cast("double")
                * F.sum(dec6("y")).cast("double")
                / F.count(F.lit(1))
            )
            / (
                F.sum(dec28(F.col("x") * F.col("x"))).cast("double")
                - F.sum(dec6("x")).cast("double")
                * F.sum(dec6("x")).cast("double")
                / F.count(F.lit(1))
            ),
            9,
        ).alias("theta"),
    )
    adj = per_user.crossJoin(F.broadcast(mom)).select(
        "t",
        "y",
        (F.col("y") - F.col("theta") * (F.col("x") - F.col("xbar"))).alias("y_adj"),
        "n",
    )
    def _mean_diff(col):
        s1 = F.sum(F.when(F.col("t") == 1, dec6(col)).otherwise(F.lit(0))).cast("double")
        s0 = F.sum(F.when(F.col("t") == 0, dec6(col)).otherwise(F.lit(0))).cast("double")
        n1 = F.sum(F.when(F.col("t") == 1, 1).otherwise(0))
        n0 = F.sum(F.when(F.col("t") == 0, 1).otherwise(0))
        return F.round(s1 / n1 - s0 / n0, 6)

    def _var(col):
        return F.sum(dec28(F.col(col) * F.col(col))).cast("double") - F.sum(
            dec6(col)
        ).cast("double") * F.sum(dec6(col)).cast("double") / F.count(F.lit(1))

    return adj.agg(
        F.any_value(F.col("n")).alias("n_users"),
        F.sum(F.when(F.col("t") == 1, 1).otherwise(0)).cast("long").alias("n_treat"),
        _mean_diff("y").alias("naive_diff"),
        _mean_diff("y_adj").alias("cuped_diff"),
        F.round(F.lit(1.0) - _var("y_adj") / _var("y"), 6).alias("var_reduction"),
    )


# --------------------------------------------------------------------------
# Inverted-index storage: delta-gap varint compression audit
# --------------------------------------------------------------------------

_VARINT_CASE = """
    (CASE WHEN {g} < 128 THEN 1
          WHEN {g} < 16384 THEN 2
          WHEN {g} < 2097152 THEN 3
          WHEN {g} < 268435456 THEN 4
          ELSE 5 END)
"""


@query(
    "postings_compression_audit",
    f"""
    WITH postings AS (
      SELECT DISTINCT term, doc_id FROM (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '{{TOKEN_PATTERN}}')) AS term
        FROM documents) t),
    gaps AS (
      SELECT term,
             coalesce(doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id),
                      doc_id + 1) AS gap
      FROM postings)
    SELECT term,
           cast(count(*) as bigint) AS n_docs,
           cast(count(*) * 8 as bigint) AS raw_bytes,
           cast(sum({_VARINT_CASE.format(g="gap")}) as bigint) AS varint_bytes,
           round(cast(sum({_VARINT_CASE.format(g="gap")}) as double)
                 / (count(*) * 8), 6) AS compression_ratio
    FROM gaps GROUP BY term
    """.replace("{TOKEN_PATTERN}", r"\w\w+"),
)
def postings_compression_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELTA-GAP + VARINT size audit for inverted-index posting lists —
    the storage planning behind every search index (Lucene/Tantivy
    postings are exactly gap-encoded varints): per term, the byte cost
    of storing sorted doc-id GAPS in LEB128 vs raw int64, which shows
    why dense (high-df) terms compress hardest (small gaps → 1 byte)
    and rare terms barely gain. The gap computation is a lag window
    partitioned by TERM (high-cardinality key — parallel), byte sizes
    are integer CASE ladders (no float log2 near power-of-2
    boundaries), and the rollup is one combinable agg. First posting
    encodes as doc_id+1 so the audit is self-contained."""
    d = load(spark, sf_dir, "documents")
    postings = (
        d.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0))
            ).alias("term"),
        )
        .select("term", "doc_id")
        .distinct()
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    gaps = postings.select(
        "term",
        F.coalesce(
            F.col("doc_id") - F.lag("doc_id").over(w), F.col("doc_id") + 1
        ).alias("gap"),
    )
    vbytes = (
        F.when(F.col("gap") < 128, 1)
        .when(F.col("gap") < 16384, 2)
        .when(F.col("gap") < 2097152, 3)
        .when(F.col("gap") < 268435456, 4)
        .otherwise(5)
    )
    return gaps.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.count(F.lit(1)) * 8).cast("long").alias("raw_bytes"),
        F.sum(vbytes).cast("long").alias("varint_bytes"),
        F.round(F.sum(vbytes).cast("double") / (F.count(F.lit(1)) * 8), 6).alias(
            "compression_ratio"
        ),
    )


# --------------------------------------------------------------------------
# Survival analysis: Kaplan–Meier estimator of user retention
# --------------------------------------------------------------------------


@query(
    "km_user_churn",
    """
    WITH lifespan AS (
      SELECT user_id, cast(max(date_trunc('day', ts)) as date) AS last_day
      FROM events GROUP BY user_id),
    horizon AS (SELECT max(last_day) AS h FROM lifespan),
    per_day AS (
      SELECT l.last_day AS day,
             cast(count(*) as bigint) AS n_leaving,
             cast(sum(CASE WHEN l.last_day < x.h THEN 1 ELSE 0 END) as bigint) AS deaths
      FROM lifespan l CROSS JOIN horizon x
      GROUP BY l.last_day),
    risk AS (
      SELECT day, deaths,
             sum(n_leaving) OVER (ORDER BY day DESC) AS at_risk
      FROM per_day),
    km AS (
      SELECT day, at_risk, deaths,
             sum(CASE WHEN deaths > 0
                      THEN cast(ln(1.0 - cast(deaths as double) / at_risk)
                                as decimal(18,12))
                      ELSE cast(0 as decimal(18,12)) END)
               OVER (ORDER BY day) AS log_surv
      FROM risk)
    SELECT day, cast(at_risk as bigint) AS at_risk, deaths,
           round(exp(cast(log_surv as double)), 6) AS km_survival
    FROM km
    """,
)
def km_user_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN–MEIER survival curve for user churn: a user 'dies' on
    their last active day (right-censored if still active at the
    horizon — the max observed day), the risk set at day t is everyone
    whose last day is ≥ t, and S(t) = Π(1 − d/n) accumulates as
    exp(Σ ln(1 − dₜ/nₜ)) with the log-factors summed as EXACT decimals
    (a float running product is order-dependent; the decimal log-sum
    is not). Distributed shape: one per-user max, one per-day rollup,
    then BOTH the reverse-cumulative risk set and the cumulative
    log-survival ride windows over the ≤|days| aggregate — bounded by
    the calendar, never by users. The estimator every retention
    analysis quotes, with censoring handled correctly instead of
    calling the horizon day a churn cliff."""
    ev = load(spark, sf_dir, "events")
    lifespan = ev.groupBy("user_id").agg(
        F.max(F.date_trunc("day", "ts")).cast("date").alias("last_day")
    )
    horizon = lifespan.agg(F.max("last_day").alias("h"))
    per_day = (
        lifespan.crossJoin(F.broadcast(horizon))
        .groupBy(F.col("last_day").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_leaving"),
            F.sum(F.when(F.col("last_day") < F.col("h"), 1).otherwise(0))
            .cast("long")
            .alias("deaths"),
        )
        # the cumulative windows below run over THIS aggregate, whose
        # row count is bounded by the CALENDAR (one row per active
        # day), never by users; the no-op limit (100 years of days)
        # makes that bound visible to the global-window plan gate
        .limit(36600)
    )
    w_desc = Window.orderBy(F.col("day").desc()).rowsBetween(Window.unboundedPreceding, 0)
    risk = per_day.select(
        "day", "deaths", F.sum("n_leaving").over(w_desc).alias("at_risk")
    )
    w_asc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    log_factor = F.when(
        F.col("deaths") > 0,
        F.log(F.lit(1.0) - F.col("deaths").cast("double") / F.col("at_risk")).cast(
            "decimal(18,12)"
        ),
    ).otherwise(F.lit(0).cast("decimal(18,12)"))
    km = risk.select(
        "day",
        "at_risk",
        "deaths",
        F.sum(log_factor).over(w_asc).alias("log_surv"),
    )
    return km.select(
        "day",
        F.col("at_risk").cast("long").alias("at_risk"),
        "deaths",
        F.round(F.exp(F.col("log_surv").cast("double")), 6).alias("km_survival"),
    )


# --------------------------------------------------------------------------
# Quantile fitting by pinball-loss grid over binned sufficient stats
# --------------------------------------------------------------------------

PINBALL_TAU = 0.9


@query(
    "pinball_quantile_grid",
    f"""
    WITH bins AS (
      SELECT least(cast(floor(o_totalprice / {STUMP_BIN_W}) as bigint), {STUMP_BINS - 1}) AS bin,
             cast(count(*) as bigint) AS n,
             sum(cast(o_totalprice as decimal(18,2))) AS s
      FROM orders GROUP BY 1),
    grid AS (SELECT DISTINCT (bin + 1) * {STUMP_BIN_W} AS q FROM bins),
    losses AS (
      SELECT g.q,
             round(cast(sum(CASE WHEN (b.bin + 1) * {STUMP_BIN_W} <= g.q
                            THEN cast((1.0 - {PINBALL_TAU}) as decimal(8,6))
                                 * (cast(g.q as decimal(18,6)) * b.n - b.s)
                            ELSE cast({PINBALL_TAU} as decimal(8,6))
                                 * (b.s - cast(g.q as decimal(18,6)) * b.n) END)
                   as double), 4) AS loss
      FROM grid g CROSS JOIN bins b
      GROUP BY g.q)
    SELECT round(cast(q as double), 1) AS q_fit, loss AS pinball_loss
    FROM losses ORDER BY loss, q LIMIT 1
    """,
)
def pinball_quantile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile FITTING as loss minimization: the τ={PINBALL_TAU}
    quantile of order value recovered by minimizing pinball loss over a
    candidate grid — the mechanism inside quantile regression and
    gradient-boosted quantile objectives, spelled distributed. The
    trick that makes it exact AND cheap: candidates sit on bin
    boundaries, so within any bin every value is strictly on one side
    of q and the bin's loss contribution is linear in its sufficient
    statistics (n, Σy) — the |orders|×|grid| fan-out collapses to
    |bins|×|grid| (10⁴ rows) with NO second data scan. Decimal-exact
    accumulation; argmin by TakeOrdered, tie-broken by q."""
    o = load(spark, sf_dir, "orders")
    bins = (
        o.groupBy(
            F.least(
                F.floor(F.col("o_totalprice") / STUMP_BIN_W).cast("long"),
                F.lit(STUMP_BINS - 1),
            ).alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
        )
        .limit(STUMP_BINS)  # ≤ STUMP_BINS rows exist (boundedness marker)
    )
    grid = bins.select(((F.col("bin") + 1) * STUMP_BIN_W).alias("q")).distinct()
    below = (F.col("bin") + 1) * STUMP_BIN_W <= F.col("q")
    contrib = F.when(
        below,
        F.lit(1.0 - PINBALL_TAU).cast("decimal(8,6)")
        * (F.col("q").cast("decimal(18,6)") * F.col("n") - F.col("s")),
    ).otherwise(
        F.lit(PINBALL_TAU).cast("decimal(8,6)")
        * (F.col("s") - F.col("q").cast("decimal(18,6)") * F.col("n"))
    )
    losses = (
        grid.crossJoin(bins)
        .groupBy("q")
        .agg(F.round(F.sum(contrib).cast("double"), 4).alias("loss"))
    )
    return (
        losses.orderBy("loss", "q")
        .limit(1)
        .select(F.round(F.col("q").cast("double"), 1).alias("q_fit"), F.col("loss").alias("pinball_loss"))
    )


# ==========================================================================
# Round-7 batch 4: feature relevance (rank statistics and robust trends
# moved to stattestsq/forecastq in the round-11 thematic split)
# ==========================================================================


# --------------------------------------------------------------------------
# Feature relevance: mutual information over bounded contingency tables
# --------------------------------------------------------------------------

MI_PRICE_BIN_W = 50000.0
MI_PRICE_BINS = 10


def _mi_pair_sql(fx: str, fy: str, label: str) -> str:
    return f"""
    SELECT '{label}' AS feature_pair,
           round(sum(CASE WHEN pxy > 0
             THEN pxy * ln(pxy / (px * py)) ELSE 0 END), 6) AS mi_nats
    FROM (
      SELECT cast(nxy as double) / nt AS pxy,
             cast(nx as double) / nt AS px,
             cast(ny as double) / nt AS py
      FROM (
        SELECT {fx} AS vx, {fy} AS vy, count(*) AS nxy,
               sum(count(*)) OVER (PARTITION BY {fx}) AS nx,
               sum(count(*)) OVER (PARTITION BY {fy}) AS ny,
               sum(count(*)) OVER () AS nt
        FROM orders GROUP BY {fx}, {fy}) c) p
    """


_MI_PRICE_BIN = (
    f"least(cast(floor(o_totalprice / {MI_PRICE_BIN_W}) as bigint), {MI_PRICE_BINS - 1})"
)


@query(
    "feature_mi_ranking",
    " UNION ALL ".join(
        [
            _mi_pair_sql("o_orderpriority", _MI_PRICE_BIN, "priority_vs_price"),
            _mi_pair_sql("o_orderstatus", _MI_PRICE_BIN, "status_vs_price"),
            _mi_pair_sql("o_orderstatus", "o_orderpriority", "status_vs_priority"),
            _mi_pair_sql("o_orderstatus", "year(o_orderdate)", "status_vs_year"),
        ]
    ),
)
def feature_mi_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL-INFORMATION feature-relevance ranking: MI(X;Y) in nats
    for candidate feature pairs over bounded contingency tables — the
    filter-method screen (mRMR-style) a feature-engineering pipeline
    runs before training to rank which columns carry signal about
    which. Each pair is ONE combinable (x, y) count aggregate; the
    marginals are windows PARTITIONED by the feature value over the
    tiny contingency frame (≤ |X|·|Y| rows, bounded by the category
    products — never by data) and the grand total is a broadcast
    1-row scalar; on this synthetic schema every pair lands near 0
    (the columns are generated independently), which is itself the
    correct readout — the estimator is pinned against a plain-Python
    recount in tests. ln on identical exact ratios, rounded once."""
    o = load(spark, sf_dir, "orders")
    pairs = [
        ("priority_vs_price", F.col("o_orderpriority"),
         F.least(F.floor(F.col("o_totalprice") / MI_PRICE_BIN_W).cast("long"),
                 F.lit(MI_PRICE_BINS - 1))),
        ("status_vs_price", F.col("o_orderstatus"),
         F.least(F.floor(F.col("o_totalprice") / MI_PRICE_BIN_W).cast("long"),
                 F.lit(MI_PRICE_BINS - 1))),
        ("status_vs_priority", F.col("o_orderstatus"), F.col("o_orderpriority")),
        ("status_vs_year", F.col("o_orderstatus"), F.year("o_orderdate")),
    ]
    outs = []
    for label, fx, fy in pairs:
        cont = o.groupBy(fx.alias("vx"), fy.alias("vy")).agg(
            F.count(F.lit(1)).alias("nxy")
        ).limit(10000)  # ≤ |X|·|Y| rows (category-product bound marker)
        wx = Window.partitionBy("vx")
        wy = Window.partitionBy("vy")
        nt = cont.agg(F.sum("nxy").alias("nt"))
        p = cont.crossJoin(F.broadcast(nt)).select(
            (F.col("nxy").cast("double") / F.col("nt")).alias("pxy"),
            (F.sum("nxy").over(wx).cast("double") / F.col("nt")).alias("px"),
            (F.sum("nxy").over(wy).cast("double") / F.col("nt")).alias("py"),
        )
        outs.append(
            p.agg(
                F.lit(label).alias("feature_pair"),
                F.round(
                    F.sum(
                        F.when(
                            F.col("pxy") > 0,
                            F.col("pxy") * F.log(F.col("pxy") / (F.col("px") * F.col("py"))),
                        ).otherwise(0.0)
                    ),
                    6,
                ).alias("mi_nats"),
            )
        )
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    return out


# ==========================================================================
# Round-7 batch 5: modern SQL surface + robust means + optimizer stats
# ==========================================================================


@query(
    "sql_sugar_group_by_all",
    """
    SELECT o_orderstatus, o_orderpriority,
           cast(count(*) as bigint) AS n_orders,
           round(cast(sum(cast(o_totalprice as decimal(18,2))) as double), 2) AS revenue
    FROM (SELECT * EXCLUDE (o_orderkey, o_custkey, o_orderdate) FROM orders) t
    GROUP BY ALL
    """,
)
def sql_sugar_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL sugar end-to-end (§2.9 surface): ``SELECT * EXCEPT``
    projection (DuckDB spells it EXCLUDE) feeding ``GROUP BY ALL`` —
    the infer-the-grouping-keys shorthand dbt-style models lean on.
    Pins that Spark's sugar lowers to exactly the classic plan (same
    partial aggregation over the pruned projection; EXCEPT is just
    column pruning, which Catalyst pushes to the scan either way)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("r7_orders_sugar")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               cast(count(*) as bigint) AS n_orders,
               round(cast(sum(cast(o_totalprice as decimal(18,2))) as double), 2) AS revenue
        FROM (SELECT * EXCEPT (o_orderkey, o_custkey, o_orderdate) FROM r7_orders_sugar) t
        GROUP BY ALL
        """
    )


PARAM_PRICE_THR = 400000.0
PARAM_YEAR_MIN = 1996


@query(
    "parameterized_sql_orders",
    f"""
    SELECT o_orderstatus,
           cast(count(*) as bigint) AS n_big,
           round(cast(sum(cast(o_totalprice as decimal(18,2))) as double)
                 / count(*), 6) AS avg_price
    FROM orders
    WHERE o_totalprice > {PARAM_PRICE_THR} AND year(o_orderdate) >= {PARAM_YEAR_MIN}
    GROUP BY o_orderstatus
    """,
)
def parameterized_sql_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAMETERIZED SQL (§2.9, SPARK-41271): named parameter markers
    bound server-side via ``spark.sql(query, args=...)`` — the
    injection-safe spelling for templated analytics (the values arrive
    as typed literals in the plan, so constant folding and predicate
    pushdown see them exactly like hand-inlined constants; the oracle
    IS the hand-inlined twin, which pins that equivalence)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("r7_orders_param")
    return spark.sql(
        """
        SELECT o_orderstatus,
               cast(count(*) as bigint) AS n_big,
               round(cast(sum(cast(o_totalprice as decimal(18,2))) as double)
                     / count(*), 6) AS avg_price
        FROM r7_orders_param
        WHERE o_totalprice > :thr AND year(o_orderdate) >= :ymin
        GROUP BY o_orderstatus
        """,
        args={"thr": PARAM_PRICE_THR, "ymin": PARAM_YEAR_MIN},
    )


HUBER_C = 1.345  # 95%-efficiency tuning constant
MAD_K = 1.4826


@query(
    "huber_mean_value_by_type",
    f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS m0
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, e.value, m.m0, abs(e.value - m.m0) AS adev
      FROM events e JOIN med m USING (event_type)),
    scale AS (
      SELECT event_type, round({MAD_K} * quantile_cont(adev, 0.5), 9) AS s
      FROM dev GROUP BY event_type),
    weighted AS (
      SELECT d.event_type, d.m0, sc.s,
             CASE WHEN d.adev <= {HUBER_C} * sc.s THEN 1.0
                  ELSE {HUBER_C} * sc.s / d.adev END AS w,
             d.value
      FROM dev d JOIN scale sc USING (event_type))
    SELECT event_type,
           cast(count(*) as bigint) AS n,
           round(any_value(m0), 6) AS median_value,
           round(cast(sum(cast(w * value as decimal(28,9))) as double)
                 / cast(sum(cast(w as decimal(18,9))) as double), 6) AS huber_mean,
           round(cast(sum(cast(value as decimal(18,6))) as double) / count(*), 6)
             AS plain_mean
    FROM weighted GROUP BY event_type
    """,
)
def huber_mean_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HUBER M-ESTIMATOR of per-type mean value (one IRLS step from the
    median, scale = normalized MAD, c = {HUBER_C} — the 95%-efficiency
    robust location estimate): between the median (throws away
    magnitude) and the mean (one fat-tailed burst owns it), the Huber
    mean downweights only the tail. Completes the robust-statistics
    shelf next to winsorize/MAD-outliers/Theil–Sen. Shape: two
    low-cardinality percentile groupBys (same approx_percentile scale
    caveat as robust_outlier_audit), then ONE weighted combinable
    aggregate with exact-decimal numerator/denominator; weights are
    per-row doubles from 9 dp-rounded scales, identical in both
    engines."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)").alias("m0")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("m0"))
    )
    scale = dev.groupBy("event_type").agg(
        F.round(
            F.lit(MAD_K) * F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY adev)"), 9
        ).alias("s")
    )
    weighted = dev.join(F.broadcast(scale), "event_type").withColumn(
        "w",
        F.when(F.col("adev") <= HUBER_C * F.col("s"), F.lit(1.0)).otherwise(
            F.lit(HUBER_C) * F.col("s") / F.col("adev")
        ),
    )
    return weighted.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.any_value("m0"), 6).alias("median_value"),
        F.round(
            F.sum((F.col("w") * F.col("value")).cast("decimal(28,9)")).cast("double")
            / F.sum(F.col("w").cast("decimal(18,9)")).cast("double"),
            6,
        ).alias("huber_mean"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("plain_mean"),
    )


EQD_BUCKETS = 10


@query(
    "equidepth_histogram_totalprice",
    f"""
    WITH cuts AS (
      SELECT {", ".join(f"round(quantile_cont(o_totalprice, {i / EQD_BUCKETS}), 6) AS c{i}" for i in range(1, EQD_BUCKETS))}
      FROM orders),
    bucketed AS (
      SELECT {" + ".join(f"(CASE WHEN o.o_totalprice > c.c{i} THEN 1 ELSE 0 END)" for i in range(1, EQD_BUCKETS))} AS bucket
      FROM orders o CROSS JOIN cuts c)
    SELECT bucket, cast(count(*) as bigint) AS n_rows
    FROM bucketed GROUP BY bucket
    """,
)
def equidepth_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH histogram of order value — the optimizer statistic
    behind selectivity estimation (CBO histograms are exactly this:
    {EQD_BUCKETS} buckets with ~equal row counts, so range-predicate
    selectivity reads off bucket fractions; pairs with
    `join_cardinality_estimate` in the stats family). The bucket
    boundaries are one exact-percentile aggregate broadcast back as a
    1-row scalar, the assignment is a branch-free sum of comparisons,
    and the counts are one combinable groupBy — the equal-depth
    property itself (each count ≈ n/{EQD_BUCKETS}) is the correctness
    readout, pinned in tests. Exact percentile carries the documented
    approx_percentile swap at 100 TB."""
    o = load(spark, sf_dir, "orders")
    cuts = o.agg(
        *[
            F.round(
                F.expr(f"percentile_cont({i / EQD_BUCKETS}) WITHIN GROUP (ORDER BY o_totalprice)"),
                6,
            ).alias(f"c{i}")
            for i in range(1, EQD_BUCKETS)
        ]
    )
    bucket = None
    for i in range(1, EQD_BUCKETS):
        term = (F.col("o_totalprice") > F.col(f"c{i}")).cast("int")
        bucket = term if bucket is None else bucket + term
    return (
        o.crossJoin(F.broadcast(cuts))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
