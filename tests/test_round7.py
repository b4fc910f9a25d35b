"""Semantic pins for the round-7 additions — properties the DuckDB
parity check can't express (both engines could share the same bug):
brute-force cross-checks, statistical guarantees, and set identities."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_engineering_rag_spark.plans import REGISTRY, load


def test_kfold_folds_partition_the_data(spark, sf_dir):
    """Fold assignment must be a PARTITION: every order in exactly one
    fold, all K folds non-empty, and the per-fold test counts sum to
    |orders|."""
    from data_engineering_rag_spark.plans.round7q import CV_K

    rows = REGISTRY["kfold_cv_mean_predictor"].spark(spark, sf_dir).collect()
    assert len(rows) == CV_K
    assert all(r.n_test > 0 for r in rows)
    assert sum(r.n_test for r in rows) == load(spark, sf_dir, "orders").count()


def test_bitmap_dau_equals_exact_distinct(spark, sf_dir):
    """The bitmap algebra must be EXACT, not approximate: per-day DAU
    from popcounts equals countDistinct(user_id), and WAU equals the
    exact rolling 7-day distinct computed by brute force."""
    got = {r.day: (r.dau, r.wau) for r in REGISTRY["bitmap_rolling_actives"].spark(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    )
    exact_dau = {r.day: r.n for r in ev.groupBy("day").agg(F.countDistinct("user_id").alias("n")).collect()}
    assert {d: v[0] for d, v in got.items()} == exact_dau
    # brute-force WAU: distinct users with any event in [day-6, day]
    days = ev.select("day").distinct()
    wau = (
        days.withColumnRenamed("day", "d")
        .join(ev, (F.col("day") <= F.col("d")) & (F.col("day") >= F.date_sub(F.col("d"), 6)))
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("n"))
    )
    exact_wau = {r.d: r.n for r in wau.collect()}
    assert {d: v[1] for d, v in got.items()} == exact_wau


def test_decision_stump_matches_bruteforce(spark, sf_dir):
    """The cumulative-sum stump must find the SAME best split as an
    exhaustive per-threshold evaluation done in plain Python over the
    bin statistics."""
    from data_engineering_rag_spark.plans.round7q import STUMP_BINS, STUMP_BIN_W

    best = REGISTRY["decision_stump_train"].spark(spark, sf_dir).collect()[0]
    o = load(spark, sf_dir, "orders").select(
        F.least(F.floor(F.col("o_totalprice") / STUMP_BIN_W).cast("long"), F.lit(STUMP_BINS - 1)).alias("bin"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    stats = {r.bin: (r.n, r.pos) for r in o.groupBy("bin").agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")).collect()}
    nt = sum(n for n, _ in stats.values())
    pt = sum(p for _, p in stats.values())
    cands = []
    cn = cp = 0
    for b in sorted(stats):
        n, p = stats[b]
        cn, cp = cn + n, cp + p
        if 0 < cn < nt:
            pl, pr = cp / cn, (pt - cp) / (nt - cn)
            g = (cn / nt) * 2 * pl * (1 - pl) + ((nt - cn) / nt) * 2 * pr * (1 - pr)
            cands.append((g, (b + 1) * STUMP_BIN_W, cn))
    g_best, thr_best, n_left = min(cands)
    assert abs(best.split_gini - g_best) < 1e-9
    assert best.threshold == thr_best
    assert best.n_left == n_left


def test_trigram_blocking_recall_on_dictionary(spark, sf_dir):
    """Blocking completeness audit: every pair the FULL O(n²) trigram
    Jaccard (brute force over the bounded name dictionary) accepts at
    the threshold must either share its rarest-trigram block (found) or
    be a quantified miss — and on this dictionary the blocking recall
    must be ≥ 0.9. (Blocking trades a bounded recall loss for the
    quadratic prune; the audit makes the loss measurable, not silent.)"""
    from data_engineering_rag_spark.plans.linkageq import FUZZY_JACCARD_MIN

    names = [r.p_name for r in load(spark, sf_dir, "part").select("p_name").distinct().collect()]
    tri = {n: {n[i : i + 3] for i in range(len(n) - 2)} for n in names}
    gold = set()
    for i, a in enumerate(sorted(names)):
        for b in sorted(names)[i + 1 :]:
            j = len(tri[a] & tri[b]) / len(tri[a] | tri[b])
            if j >= FUZZY_JACCARD_MIN:
                gold.add((a, b))
    got = {
        (r.name_a, r.name_b)
        for r in REGISTRY["trigram_blocked_fuzzy_join"].spark(spark, sf_dir).collect()
    }
    assert got <= gold  # blocking never invents pairs
    if gold:
        recall = len(got) / len(gold)
        assert recall >= 0.9, f"blocking recall {recall}: missed {gold - got}"


def test_conformal_coverage_near_nominal(spark, sf_dir):
    """Split-conformal guarantee: realized test coverage of the 90%
    interval lands near 0.9 for every priority group (finite-sample
    slack widens with small groups; assert a generous ±0.12 band)."""
    rows = REGISTRY["conformal_interval_coverage"].spark(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.78 <= r.coverage <= 1.0, (r.o_orderpriority, r.coverage)


def test_feature_hashing_histogram_accounts_for_vocab(spark, sf_dir):
    """The occupancy histogram must account for every distinct term
    exactly once: Σ occupancy·n_buckets == |vocabulary|."""
    from data_engineering_rag_spark.operators.tfidf import TOKEN_PATTERN

    rows = REGISTRY["feature_hashing_collision_audit"].spark(spark, sf_dir).collect()
    vocab = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0))).alias("t"))
        .distinct()
        .count()
    )
    assert sum(r.n_terms for r in rows) == vocab
    assert all(r.n_terms == r.occupancy * r.n_buckets for r in rows)


def test_pit_join_never_leaks_same_month(spark, sf_dir):
    """Leakage guard: every resolved as-of snapshot strictly precedes
    the purchase month, and purchases without history get the 'new'
    tier with a NULL as-of month."""
    rows = REGISTRY["pit_feature_join_purchases"].spark(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    p_month = {
        r.event_id: r.m
        for r in ev.where(F.col("event_type") == "purchase")
        .select("event_id", F.date_trunc("month", "ts").cast("date").alias("m"))
        .collect()
    }
    assert len(rows) == len(p_month)
    for r in rows:
        if r.tier_asof == "new":
            assert r.asof_month is None and r.n_ev_asof == 0
        else:
            assert r.asof_month < p_month[r.event_id], (r.event_id, r.asof_month)


def test_target_encoding_excludes_own_label(spark, sf_dir):
    """LOO correctness on one concrete row: recompute the encoding for
    a sampled order in plain Python from the group stats minus that
    order's own totalprice."""
    from data_engineering_rag_spark.plans.round7q import TE_SMOOTH_M

    rows = REGISTRY["target_encoding_loo"].spark(spark, sf_dir).collect()
    assert rows
    o = load(spark, sf_dir, "orders")
    r0 = rows[0]
    row = o.where(F.col("o_orderkey") == r0.o_orderkey).collect()[0]
    g = o.where(F.col("o_orderpriority") == r0.o_orderpriority).agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s")
    ).collect()[0]
    gm = o.agg((F.sum("o_totalprice") / F.count(F.lit(1))).alias("m")).collect()[0].m
    expect = (g.s - row.o_totalprice + TE_SMOOTH_M * round(gm, 6)) / (g.n - 1 + TE_SMOOTH_M)
    assert abs(r0.te_loo - expect) < 1e-4


def test_km_survival_matches_bruteforce(spark, sf_dir):
    """KM curve pinned against a plain-Python recompute from per-user
    last days, including the censoring rule (horizon survivors never
    count as deaths), and monotone non-increasing."""
    import math

    rows = sorted(
        REGISTRY["km_user_churn"].spark(spark, sf_dir).collect(), key=lambda r: r.day
    )
    last = {
        r.user_id: r.d
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max(F.date_trunc("day", "ts")).cast("date").alias("d"))
        .collect()
    }
    horizon = max(last.values())
    surv, prev = 1.0, None
    for r in rows:
        at_risk = sum(1 for d in last.values() if d >= r.day)
        deaths = sum(1 for d in last.values() if d == r.day and d < horizon)
        assert (r.at_risk, r.deaths) == (at_risk, deaths), r
        if deaths:
            surv *= 1.0 - deaths / at_risk
        assert abs(r.km_survival - surv) < 1e-4, (r.day, r.km_survival, surv)
        assert prev is None or r.km_survival <= prev + 1e-9
        prev = r.km_survival
    assert math.isclose(rows[-1].km_survival, surv, abs_tol=1e-4)


def test_pinball_fit_brackets_true_quantile(spark, sf_dir):
    """The grid argmin must land within one bin width of the exact
    τ=0.9 quantile (pinball loss is convex in q; on a boundary grid
    the minimizer is the boundary bracketing the true quantile)."""
    from data_engineering_rag_spark.plans.round7q import PINBALL_TAU, STUMP_BIN_W

    got = REGISTRY["pinball_quantile_grid"].spark(spark, sf_dir).collect()[0]
    true_q = (
        load(spark, sf_dir, "orders")
        .agg(F.expr(f"percentile_cont({PINBALL_TAU}) WITHIN GROUP (ORDER BY o_totalprice)"))
        .collect()[0][0]
    )
    assert abs(got.q_fit - true_q) <= STUMP_BIN_W, (got.q_fit, true_q)


def test_changepoint_matches_bruteforce(spark, sf_dir):
    """Exhaustive split scan in plain Python over the daily counts must
    agree with the window-based SSE argmin."""
    got = REGISTRY["changepoint_daily_events"].spark(spark, sf_dir).collect()[0]
    daily = sorted(
        (r.day, r.c)
        for r in load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    cs = [c for _, c in daily]
    best = None
    for k in range(1, len(cs)):
        left, right = cs[:k], cs[k:]
        sse = (
            sum(x * x for x in left) - sum(left) ** 2 / len(left)
            + sum(x * x for x in right) - sum(right) ** 2 / len(right)
        )
        cand = (round(sse, 6), daily[k - 1][0])
        best = cand if best is None or cand < best else best
    assert got.split_day == best[1]
    assert abs(got.sse_split - best[0]) < 1e-2


def test_cuped_reduces_variance_keeps_estimate(spark, sf_dir):
    """CUPED must be variance-REDUCING (θ from pooled covariance ⇒
    var(y') ≤ var(y), so the reported reduction is non-negative) and
    leave the treatment estimate statistically intact (here: same sign
    region / same order of magnitude as naive — both are near-zero
    under the null hash split, so bound their absolute gap by the
    naive scale)."""
    r = REGISTRY["cuped_ab_test"].spark(spark, sf_dir).collect()[0]
    assert r.n_users == r.n_treat + (r.n_users - r.n_treat)
    assert 0.0 <= r.var_reduction <= 1.0, r
    scale = max(abs(r.naive_diff), 1.0)
    assert abs(r.cuped_diff - r.naive_diff) <= 5 * scale, r


def test_postings_varint_bytes_exact(spark, sf_dir):
    """Varint byte accounting recomputed in plain Python from the
    posting lists for every term."""
    got = {r.term: (r.n_docs, r.varint_bytes) for r in REGISTRY["postings_compression_audit"].spark(spark, sf_dir).collect()}
    from collections import defaultdict

    from data_engineering_rag_spark.operators.tfidf import TOKEN_PATTERN

    postings = defaultdict(set)
    for r in (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0))).alias("t"))
        .distinct()
        .collect()
    ):
        postings[r.t].add(r.doc_id)

    def vbytes(g):
        return 1 if g < 128 else 2 if g < 16384 else 3 if g < 2097152 else 4 if g < 268435456 else 5

    for term, docs in postings.items():
        ds = sorted(docs)
        gaps = [ds[0] + 1] + [b - a for a, b in zip(ds, ds[1:])]
        assert got[term] == (len(ds), sum(vbytes(g) for g in gaps)), term


def test_spearman_matches_bruteforce_midranks(spark, sf_dir):
    """Spearman with ties recomputed in plain Python (midranks +
    Pearson) from the per-customer (acctbal, order count) pairs."""
    import math

    got = REGISTRY["spearman_acctbal_orders"].spark(spark, sf_dir).collect()[0]
    c = {r.c_custkey: r.c_acctbal for r in load(spark, sf_dir, "customer").collect()}
    oc = {
        r.o_custkey: r.n
        for r in load(spark, sf_dir, "orders").groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    xs = [c[k] for k in sorted(c)]
    ys = [float(oc.get(k, 0)) for k in sorted(c)]

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            mid = (i + j) / 2.0 + 1.0
            for k in range(i, j + 1):
                ranks[order[k]] = mid
            i = j + 1
        return ranks

    rx, ry = midranks(xs), midranks(ys)
    n = len(rx)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    rho = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert got.n_customers == n
    assert abs(got.spearman_rho - rho) < 1e-6, (got.spearman_rho, rho)


def test_mi_matches_bruteforce(spark, sf_dir):
    """MI non-negative for every pair and equal to a plain-Python
    recount of the contingency table (the priority_vs_price pair)."""
    import math
    from collections import Counter

    rows = {r.feature_pair: r.mi_nats for r in REGISTRY["feature_mi_ranking"].spark(spark, sf_dir).collect()}
    assert set(rows) == {
        "priority_vs_price", "status_vs_price", "status_vs_priority", "status_vs_year"
    }
    assert all(v >= 0.0 for v in rows.values()), rows
    from data_engineering_rag_spark.plans.round7q import MI_PRICE_BINS, MI_PRICE_BIN_W

    data = [
        (r.o_orderpriority, min(int(r.o_totalprice // MI_PRICE_BIN_W), MI_PRICE_BINS - 1))
        for r in load(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice").collect()
    ]
    nt = len(data)
    nxy, nx, ny = Counter(data), Counter(x for x, _ in data), Counter(y for _, y in data)
    mi = sum(
        (c / nt) * math.log((c / nt) / ((nx[x] / nt) * (ny[y] / nt)))
        for (x, y), c in nxy.items()
    )
    assert abs(rows["priority_vs_price"] - mi) < 1e-6, (rows["priority_vs_price"], mi)


def test_theil_sen_matches_bruteforce(spark, sf_dir):
    """Median-of-pairwise-slopes recomputed in plain Python."""
    got = REGISTRY["theil_sen_daily_trend"].spark(spark, sf_dir).collect()[0]
    daily = sorted(
        (r.x, r.y)
        for r in load(spark, sf_dir, "events")
        .groupBy(
            F.datediff(F.date_trunc("day", "ts").cast("date"), F.lit("1990-01-01").cast("date")).alias("x")
        )
        .agg(F.count(F.lit(1)).alias("y"))
        .collect()
    )
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(daily)
        for (x2, y2) in daily[i + 1 :]
    )
    m = len(slopes)
    med = slopes[m // 2] if m % 2 else (slopes[m // 2 - 1] + slopes[m // 2]) / 2.0
    assert got.n_days == len(daily)
    assert abs(got.ts_slope - med) < 1e-6, (got.ts_slope, med)


def test_levene_matches_bruteforce(spark, sf_dir):
    """Brown–Forsythe W recomputed in plain Python (medians via the
    same linear-interpolation rule as percentile_cont)."""
    got = REGISTRY["levene_variance_test"].spark(spark, sf_dir).collect()[0]
    rows = load(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice").collect()
    groups = {}
    for r in rows:
        groups.setdefault(r.o_orderpriority, []).append(r.o_totalprice)

    def pct_cont(vals, q):
        vs = sorted(vals)
        pos = (len(vs) - 1) * q
        lo = int(pos)
        frac = pos - lo
        return vs[lo] if frac == 0 else vs[lo] * (1 - frac) + vs[lo + 1] * frac

    z = {g: [abs(x - pct_cont(v, 0.5)) for x in v] for g, v in groups.items()}
    zbar_g = {g: round(sum(v) / len(v), 9) for g, v in z.items()}
    n = sum(len(v) for v in z.values())
    k = len(z)
    zbar = round(sum(zbar_g[g] * len(z[g]) for g in z) / n, 9)
    ssb = sum(len(z[g]) * (zbar_g[g] - zbar) ** 2 for g in z)
    ssw = sum((x - zbar_g[g]) ** 2 for g, v in z.items() for x in v)
    w = ((n - k) * ssb) / ((k - 1) * ssw)
    assert (got.n, got.k) == (n, k)
    assert abs(got.levene_w - w) < 1e-4, (got.levene_w, w)


def test_equidepth_buckets_are_balanced(spark, sf_dir):
    """Equal-depth property: every bucket within 2% of n/B (exact
    percentile boundaries on a near-continuous column)."""
    from data_engineering_rag_spark.plans.round7q import EQD_BUCKETS

    rows = REGISTRY["equidepth_histogram_totalprice"].spark(spark, sf_dir).collect()
    n = sum(r.n_rows for r in rows)
    assert len(rows) == EQD_BUCKETS
    assert sorted(r.bucket for r in rows) == list(range(EQD_BUCKETS))
    for r in rows:
        assert abs(r.n_rows - n / EQD_BUCKETS) <= max(2, 0.02 * n / EQD_BUCKETS), r


def test_huber_mean_between_median_and_mean_and_bruteforce(spark, sf_dir):
    """Huber one-step recomputed in plain Python; the estimate must
    also land between min and max of (median, plain mean) extended by
    a small tolerance (robust location can't leave the data's core)."""
    rows = REGISTRY["huber_mean_value_by_type"].spark(spark, sf_dir).collect()
    assert rows
    from data_engineering_rag_spark.plans.round7q import HUBER_C, MAD_K

    data = {}
    for r in load(spark, sf_dir, "events").select("event_type", "value").collect():
        data.setdefault(r.event_type, []).append(r.value)

    def pct(vals, q):
        vs = sorted(vals)
        pos = (len(vs) - 1) * q
        lo = int(pos)
        frac = pos - lo
        return vs[lo] if frac == 0 else vs[lo] * (1 - frac) + vs[lo + 1] * frac

    for r in rows:
        vals = data[r.event_type]
        m0 = pct(vals, 0.5)
        s = round(MAD_K * pct([abs(v - m0) for v in vals], 0.5), 9)
        ws = [1.0 if abs(v - m0) <= HUBER_C * s else HUBER_C * s / abs(v - m0) for v in vals]
        hub = sum(w * v for w, v in zip(ws, vals)) / sum(ws)
        assert abs(r.huber_mean - hub) < 1e-4, (r.event_type, r.huber_mean, hub)
        lo, hi = min(m0, r.plain_mean), max(m0, r.plain_mean)
        assert lo - 1.0 <= r.huber_mean <= hi + 1.0, r
