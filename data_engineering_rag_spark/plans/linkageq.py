"""Similarity joins, record linkage and co-occurrence recommenders
(split from round8q.py, VERDICT r9 item 7 — registry names and oracle
SQL byte-identical): the lossless Jaccard prefix filter, Fellegi-
Sunter probabilistic linkage, item-item cosine similarity, association
rules by conviction, Kneser-Ney bigram smoothing, and the exact-kNN
LOF outlier baseline (bounded to the deterministic LOF_SAMPLE
calibration universe).

Scale contract shared with plans/textops.py: candidate generation is
always a bounded equi-join (prefix tokens, band hashes, label
buckets) — never corpus-wide all-pairs.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from . import load, query
from ..operators.tfidf import TOKEN_PATTERN


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
    # r17 OPTIMIZATION (guide §2.4/§3.1): pre-partition on the basket
    # key BEFORE the distinct. HashPartitioning(l_orderkey) satisfies
    # the distinct's clustering requirement (subset rule: duplicates of
    # a pair share the order key), so the dedup needs no second
    # exchange, and BOTH sides of the co-count self-join on ok then
    # reuse this one exchange (ReusedExchange) instead of re-shuffling
    # — at bench scale the small side broadcasts either way (measured
    # neutral, plans/r17/ab_item_cosine.json), but at 100 TB the basket
    # table exceeds any broadcast threshold and this is the difference
    # between one exchange and three.
    basket = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .repartition(F.col("l_orderkey"))
        .distinct()
    )
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
    # r17 OPTIMIZATION (guide §2.4): mirror each pair with a narrow
    # 2-way explode instead of union(co, swap(co)) — the union
    # re-executed the whole distinct → self-join → groupBy co-count
    # pipeline (the r17 before-plan carries it twice under Union (36)).
    # Identical rows (each a<b pair emitted in both directions), one
    # evaluation. Interleaved A/B at sf0.1: 1.73 s -> 1.49 s
    # (plans/r17/ab_item_cosine.json).
    sym = co.select(
        F.explode(
            F.array(
                F.struct(F.col("pa"), F.col("pb"), F.col("co")),
                F.struct(F.col("pb").alias("pa"), F.col("pa").alias("pb"), F.col("co")),
            )
        ).alias("s")
    ).select("s.pa", "s.pb", "s.co")
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
    by weight, deterministic key tiebreak. Extends the reference's
    exact-match dedup (minsearch `Index.filter`-style equality) to the
    probabilistic-linkage regime a 100 TB entity-resolution pass
    needs.

    Scale shape (r12 rewrite): the coarse (nation, mktsegment) block
    key has FIXED cardinality (125 blocks), so block sizes grow
    linearly with the table and the blocked join's pair count grows
    QUADRATICALLY — ~9e9 pairs / 361 s at the sf10 probe, the same
    defect class as the r11 kNN/LOF fixes. But fs_score depends only
    on (band_agree, sign_agree), a $100 band never spans zero (so
    band_agree implies sign_agree), and agreements dominate the
    weights — so the global top-{FS_TOPK} is exactly the {FS_TOPK}
    smallest-key pairs from the FINE equi-join on
    (nation, mktsegment, band), whose per-block fan-out stays small as
    the table grows (~27k fine blocks vs 125). The scoring expression
    and the u estimation are unchanged. When the fine join yields
    fewer than {FS_TOPK} pairs (only possible at tiny N — pigeonhole:
    any table past ~200k rows fills some fine block), a bounded ≤
    {FS_TOPK}-row count triggers the original coarse join as the
    fallback, which is trivially cheap exactly when it runs. The
    dominance assumption itself is EXECUTABLE (r13, ADVICE): a 1-row
    collect of the u estimates checks ln(m/u) − ln((1−m)/(1−u)) > 2e-6
    for both fields before the fine path is taken — on
    balance-concentrated inputs (u_band ≥ m_band) the agreement weight
    no longer dominates and the coarse brute-force join runs instead.
    Consequently this plan function is NOT lazy: it runs two bounded
    build-time jobs (1-row u collect, limit-{FS_TOPK} deficit count). The
    ORACLE still runs the coarse brute-force blocked join — oracle
    equality is a cross-engine PROOF the fine-block shortcut lost
    nothing, not just a port check (the jaccard_prefix_filter_pairs
    pattern)."""
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
            # try_divide: a 1-row table has n·(n−1) = 0 — under ANSI
            # mode plain / raises; NULL here routes the dominance
            # guard to the (empty) coarse path instead (r14, ADVICE).
            F.try_divide(
                F.col("agree_pairs").cast("double"), F.col("n") * (F.col("n") - 1.0)
            ).alias("u_band"),
            F.try_divide(
                F.col("agree_pairs_s").cast("double"), F.col("n") * (F.col("n") - 1.0)
            ).alias("u_sign"),
        )
    )
    def _pairs(join_on_band: bool):
        side_a = c.select(
            F.col("c_custkey").alias("custkey_a"),
            "c_nationkey",
            "c_mktsegment",
            F.col("c_acctbal").alias("bal_a"),
            F.floor(F.col("c_acctbal") / 100.0).alias("_fs_band_a"),
        )
        side_b = c.select(
            F.col("c_custkey").alias("custkey_b"),
            "c_nationkey",
            "c_mktsegment",
            F.col("c_acctbal").alias("bal_b"),
            F.floor(F.col("c_acctbal") / 100.0).alias("_fs_band_b"),
        )
        cond = (
            (side_a.c_nationkey == side_b.c_nationkey)
            & (side_a.c_mktsegment == side_b.c_mktsegment)
        )
        if join_on_band:
            cond = cond & (F.col("_fs_band_a") == F.col("_fs_band_b"))
        return (
            side_a.join(side_b, cond)
            .where(F.col("custkey_a") < F.col("custkey_b"))
            .select(
                "custkey_a",
                "custkey_b",
                (F.col("_fs_band_a") == F.col("_fs_band_b")).alias("band_agree"),
                ((F.col("bal_a") >= 0) == (F.col("bal_b") >= 0)).alias("sign_agree"),
            )
        )

    def _score(pairs):
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

    # Fine-block fast path: band_agree ⇒ sign_agree (a $100 band never
    # spans zero), so band-agreeing pairs carry the strictly maximal
    # fs_score and the global top-k is theirs whenever they number
    # ≥ FS_TOPK. The deficit check is a bounded ≤ FS_TOPK-row count
    # (the BPE argmax pattern), and the coarse fallback it can trigger
    # only ever runs on tables tiny enough that fewer than FS_TOPK
    # same-band pairs exist in any fixed block.
    #
    # NOT LAZY BY DESIGN: this plan function runs two bounded jobs at
    # build time — the 1-row u collect below (dominance guard) and the
    # limit-FS_TOPK deficit count — so the returned plan's shape is
    # data-dependent. Every other registry plan is lazy.
    #
    # Dominance guard (r13, ADVICE): the containment proof assumes the
    # agreement weights strictly dominate AFTER the 6-decimal rounding,
    # i.e. ln(m/u) − ln((1−m)/(1−u)) > 0 for BOTH fields with enough
    # margin that round(·, 6) cannot tie. m > u ⟺ that gap is
    # positive; a gap > 2e-6 guarantees distinct rounded scores. u is
    # estimated from the data, so on balance-concentrated inputs
    # (u_band ≥ m_band) the fine path would silently return a wrong
    # top-k — fall back to the coarse brute-force join there, which is
    # exactly the regime where the oracle runs it too.
    u_row = u.first()
    _ROUND_GAP = 2e-6  # > 2 ulps at 6-decimal rounding → no tie possible

    def _usable(x) -> bool:
        # On an empty customer table the u aggregates come back NULL
        # (r14, ADVICE): a None/NaN estimate means dominance cannot be
        # established — take the coarse path, which degrades to an
        # empty join gracefully.
        return x is not None and not math.isnan(x) and 0.0 < x < 1.0

    band_gap = math.log(FS_M_BAND / u_row["u_band"]) - math.log(
        (1.0 - FS_M_BAND) / (1.0 - u_row["u_band"])
    ) if _usable(u_row["u_band"]) else float("-inf")
    sign_gap = math.log(FS_M_SIGN / u_row["u_sign"]) - math.log(
        round(1.0 - FS_M_SIGN, 2) / (1.0 - u_row["u_sign"])
    ) if _usable(u_row["u_sign"]) else float("-inf")
    fine_dominates = band_gap > _ROUND_GAP and sign_gap > _ROUND_GAP
    if fine_dominates:
        fine = _pairs(join_on_band=True)
        if fine.limit(FS_TOPK).count() >= FS_TOPK:
            return _score(fine)
    return _score(_pairs(join_on_band=False))


#: Kneser-Ney absolute discount (the canonical 0.75) and output size.
KN_DISCOUNT = 0.75
KN_TOPK = 15


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


LOF_K = 3
LOF_TOP = 20
#: Deterministic universe bound for the exact-kNN ground truth
#: (VERDICT r9 item 3 — the `LSH_RECALL_SAMPLE` pattern from
#: round9q.py). The exact LOF is the labeled CALIBRATION baseline for
#: the IVF production path, so it only needs a bounded sample: pair
#: space is ≤ Σ bucket² over 500 vectors (~25k pairs) at ANY scale
#: factor, killing the O(n²/buckets) stage whose sf1 walls varied 10×
#: (21.6–230.7 s) on identical code. 500 = the full table at
#: sf ≤ 0.01 (driver correctness scale — results there are unchanged).
LOF_SAMPLE = 500


@query(
    "lof_embedding_outliers",
    f"""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings
               WHERE vec_id < {LOF_SAMPLE}),
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
    could go vacuous at small SF). Universe: the deterministic
    ``vec_id < {LOF_SAMPLE}`` sample — this exact-kNN LOF is the
    labeled GROUND-TRUTH baseline for the IVF production path
    (``ivf_ann_topk`` / ``embedding_near_dup_via_ivf``), and a
    calibration baseline needs a bounded sample, not the corpus (the
    ``LSH_RECALL_SAMPLE`` pattern): the within-label pair stage is
    constant-cost at any SF instead of O(n²/buckets), which is what
    made its sf1 walls vary 10× under GC pressure. Pipeline: k-NN
    within label buckets (the IVF-bucket candidate shape of
    ``knn_graph_by_label``) -> k-distance -> reachability distance
    max(kd(o), d(p,o)) -> local reachability density (1/mean reach)
    -> LOF = mean neighbor-lrd / own lrd. After the k-NN stage every
    join is a tiny equi-join on vec_id keyed tables (k rows per
    vector). Cross-engine float discipline: distances rounded 8 dp,
    the two k-sized float reductions (reach sum, neighbor-lrd sum) go
    through exact decimal(18,8) partials, each division written
    identically in both dialects, final LOF rounded 6 dp."""
    from .vectors import dot, l2_norm_sq

    e = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < LOF_SAMPLE)
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
    # r16 OPTIMIZATION: single-file corpora yield a 1-partition scan,
    # serializing the tokenize+md5 pipeline below to one core (the r15
    # probe's hazard; sf0.1's documents.parquet is one file / one row
    # group). Guard BEFORE the fan-out so the checkpointed trigram
    # build runs at full width; multi-file inputs pass through
    # unchanged (identity when partitions >= cores/2).
    from ..operators.scale import ensure_scan_parallelism

    d = ensure_scan_parallelism(
        load(spark, sf_dir, "documents"), label="jaccard_prefix_filter_pairs documents scan"
    )
    toks = d.select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0)).alias("a"),
    ).where(F.size("a") >= 3)
    # r17 OPTIMIZATION (guide §2.4): the distinct trigram-hash set is
    # computed PER ROW with array_distinct instead of exploding every
    # occurrence and running a global .distinct() — a doc's trigrams
    # all come from its own token array, and doc_id is unique per row,
    # so distinct-on-(doc_id, h) ≡ per-row array_distinct: identical
    # rows into the checkpoint, but the full-trigram-stream exchange
    # the Aggregate(distinct) needed (hashpartitioning(doc_id, h) over
    # every occurrence) disappears; the checkpoint input is now
    # scan → narrow map, no shuffle.
    hs = F.array_distinct(
        F.expr(
            "transform(sequence(1, size(a) - 2), i -> cast(conv(substring("
            "md5(concat(element_at(a, i), ' ', element_at(a, i + 1), ' ', "
            "element_at(a, i + 2))), 1, 15), 16, 10) as bigint))"
        )
    )
    # r16 OPTIMIZATION: materialize the distinct (doc_id, h) trigram
    # table ONCE. It is consumed by FIVE downstream subtrees (df_tbl,
    # the ordered window join, both sides of the verification join,
    # sizes); un-materialized, each re-ran the whole tokenize → explode
    # → md5 → distinct pipeline — the before-plan shows 8 `Scan
    # parquet` nodes over `documents` (plans/r16/..._before.txt), i.e.
    # 8 full corpus passes where 1 suffices (guide §2.4). The
    # checkpointed table is answer-shaped (16-byte rows, |doc|×|tris|),
    # never the text. Same durable_checkpoint idiom as
    # minhash_lsh_candidate_pairs.
    from ..operators.scale import durable_checkpoint

    tris = durable_checkpoint(toks.select("doc_id", F.explode(hs).alias("h")))
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
    ).select("doc_id", "h", "sz", "pos")
    # r17: a pair-from-sorted-list candidate generator (groupBy(h) +
    # collect_list + HOF pair explode, one prefix evaluation) was
    # MEASURED AND REVERTED (guide §1.2): 2x2 interleaved A/B at sf0.1
    # (plans/r17/ab_jaccard.json) put it ~0.5 s SLOWER than this
    # self-join — at bench scale both join sides broadcast for free
    # while collect_list adds a real exchange. The prefix subtree does
    # execute twice here (one side under a BroadcastExchange, so
    # ReuseExchange can't dedupe); checkpointing prefix was already
    # measured worse in r16 (8.9 s vs 7.1), a lazy persist worse again
    # (ab_jaccard_mat.json), and a shuffle-hash candidate join (whose
    # identical h-exchanges ReusedExchange CAN dedupe) flat
    # (ab_jaccard_r17b.json: 4.62 vs 4.65 head). Known cost, kept
    # deliberately.
    #
    # r17 (second session): the PPJoin LENGTH filter (Xiao et al.
    # WWW'08 §3) — J(A,B) >= tau implies tau*max(|A|,|B|) <= min(|A|,|B|)
    # (since inter <= min and union >= max), so a candidate pair whose
    # set sizes are incompatible can be dropped BEFORE the distinct and
    # the verification joins. sz rides the prefix rows for free (it is
    # already computed by the window), the predicate is implied by the
    # final tau filter (zero false negatives — oracle-verified), and
    # the interleaved A/B (plans/r17/ab_jaccard_r17b.json, 6 rounds)
    # measured 3.71 s vs 4.65 s head medians, winning 5/6 rounds.
    #
    # Plus the PPJoin POSITIONAL filter on each collision row: overlap
    # o <= 1 + min(sza - pa, szb - pb) holds at the FIRST common prefix
    # token (every common token sorts after it in BOTH docs' shared
    # (df, h) order), and J >= tau requires (DEN+NUM)*o >= NUM*(sza+szb);
    # rows whose bound can't reach the requirement are dropped before
    # the distinct. LOSSLESS with the distinct because (a) the length
    # filter guarantees szb >= tau*sza, which puts the first common
    # token inside BOTH prefixes for any true pair, and (b) that first
    # collision row always passes its (valid) bound — later collision
    # rows carry tighter-than-true bounds and may drop, but one
    # surviving row per true pair is all the distinct needs. Verified
    # two ways: DuckDB census at sf0.1 (256 true pairs, 0 missed;
    # candidates 202.7k -> 72.7k, 2.8x fewer verification rows) and the
    # brute-force oracle at sf0.001/sf0.01. Interleaved A/B
    # (plans/r17/ab_jaccard_posf.json, 6 rounds): 2.44 s vs 3.41 s
    # length-filter-only medians, winning 6/6 rounds.
    cand = (
        prefix.select(
            F.col("doc_id").alias("doc_a"),
            "h",
            F.col("sz").alias("sza"),
            F.col("pos").alias("pa"),
        )
        .join(
            prefix.select(
                F.col("doc_id").alias("doc_b"),
                "h",
                F.col("sz").alias("szb"),
                F.col("pos").alias("pb"),
            ),
            "h",
        )
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (
                PPJ_TAU_DEN * F.least("sza", "szb")
                >= PPJ_TAU_NUM * F.greatest("sza", "szb")
            )
            & (
                (PPJ_TAU_DEN + PPJ_TAU_NUM)
                * (F.lit(1) + F.least(F.col("sza") - F.col("pa"), F.col("szb") - F.col("pb")))
                >= PPJ_TAU_NUM * (F.col("sza") + F.col("szb"))
            )
        )
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


# --------------------------------------------------------------------------
# Entity resolution: rarest-trigram blocking + trigram-Jaccard verify
# --------------------------------------------------------------------------

FUZZY_JACCARD_MIN = 0.4
BLOCK_DF_CAP = 10  # trigrams appearing in ≤ this many names are block keys


def _name_trigrams_sql(src: str) -> str:
    """DuckDB: distinct (name, tri) over character trigrams."""
    return f"""
      SELECT DISTINCT name, substr(name, i, 3) AS tri
      FROM (
        SELECT p_name AS name,
               unnest(range(1, length(p_name) - 1)) AS i
        FROM (SELECT DISTINCT p_name FROM {src} WHERE length(p_name) >= 3)
      )
    """


@query(
    "trigram_blocked_fuzzy_join",
    f"""
    WITH tri AS ({_name_trigrams_sql("part")}),
    df AS (SELECT tri, count(DISTINCT name) AS df FROM tri GROUP BY tri),
    sized AS (SELECT name, count(*) AS sz FROM tri GROUP BY name),
    rare AS (
      SELECT t.name, t.tri FROM tri t JOIN df d USING (tri)
      WHERE d.df <= {BLOCK_DF_CAP}),
    cand AS (
      SELECT DISTINCT a.name AS name_a, b.name AS name_b
      FROM rare a JOIN rare b
        ON a.tri = b.tri AND a.name < b.name),
    inter AS (
      SELECT c.name_a, c.name_b, count(*) AS shared
      FROM cand c
      JOIN tri ta ON ta.name = c.name_a
      JOIN tri tb ON tb.name = c.name_b AND tb.tri = ta.tri
      GROUP BY c.name_a, c.name_b)
    SELECT i.name_a, i.name_b,
           round(cast(i.shared as double)
                 / (sa.sz + sb.sz - i.shared), 6) AS jaccard
    FROM inter i
    JOIN sized sa ON sa.name = i.name_a
    JOIN sized sb ON sb.name = i.name_b
    WHERE cast(i.shared as double) / (sa.sz + sb.sz - i.shared)
          >= {FUZZY_JACCARD_MIN}
    """,
)
def trigram_blocked_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-based fuzzy self-join of the part-name DICTIONARY via
    FREQUENCY-FILTERED TOKEN BLOCKING: trigrams appearing in ≤
    {BLOCK_DF_CAP} names are block keys, candidates are pairs sharing
    ANY rare trigram, then trigram-set Jaccard ≥ {FUZZY_JACCARD_MIN}
    verifies. The load-bearing scale moves: (1) fuzzy matching runs on
    DISTINCT names — the domain dictionary, which grows with
    vocabulary, not fact rows; (2) the df cap bounds candidates by
    cap·Σdf instead of |dict|² — the frequency-filtered blocking
    standard from record-linkage systems (a single rarest-key scheme
    was measured at 55% recall on this dictionary and rejected: pairs
    similar only through a SHARED second token never co-blocked; see
    tests/test_round7.py's recall audit, which pins ≥0.9 against the
    brute-force gold pairs). Misses are exactly the pairs whose every
    shared trigram is ubiquitous (df > cap) — quantified, not silent.
    The verify join is an equi-join on (candidate, shared trigram),
    never an all-pairs scan."""
    # length >= 3 guard BEFORE the explode: F.sequence(1, length-2)
    # generates a DESCENDING [1, 0] for 2-char names (Spark sequences
    # auto-negate the step), which would emit bogus substring(name, 0, 3)
    # "trigrams" the oracle never produces.
    names = (
        load(spark, sf_dir, "part")
        .select("p_name")
        .where(F.length("p_name") >= 3)
        .distinct()
    )
    tri = (
        names.select(
            F.col("p_name").alias("name"),
            F.explode(F.sequence(F.lit(1), F.length("p_name") - 2)).alias("i"),
        )
        .select("name", F.expr("substring(name, i, 3)").alias("tri"))
        .distinct()
    )
    dfreq = tri.groupBy("tri").agg(F.countDistinct("name").alias("df"))
    sized = tri.groupBy("name").agg(F.count(F.lit(1)).alias("sz"))
    rare = tri.join(dfreq.where(F.col("df") <= BLOCK_DF_CAP), "tri")
    a = rare.select(F.col("name").alias("name_a"), "tri")
    b = rare.select(F.col("name").alias("name_b"), "tri")
    cand = a.join(b, "tri").where(F.col("name_a") < F.col("name_b")).select(
        "name_a", "name_b"
    ).distinct()
    ta = tri.select(F.col("name").alias("name_a"), "tri")
    tb = tri.select(F.col("name").alias("name_b"), "tri")
    inter = (
        cand.join(ta, "name_a")
        .join(tb, ["name_b", "tri"])
        .groupBy("name_a", "name_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    j = (
        inter.join(sized.withColumnRenamed("name", "name_a").withColumnRenamed("sz", "sa"), "name_a")
        .join(sized.withColumnRenamed("name", "name_b").withColumnRenamed("sz", "sb"), "name_b")
        .withColumn(
            "jac_raw",
            F.col("shared").cast("double") / (F.col("sa") + F.col("sb") - F.col("shared")),
        )
        .where(F.col("jac_raw") >= FUZZY_JACCARD_MIN)
    )
    return j.select("name_a", "name_b", F.round("jac_raw", 6).alias("jaccard"))
