"""Semantic pins for the round-8 additions — properties the DuckDB
parity check can't express (both engines could share the same bug):
plain-Python brute-force recomputes of the test statistics, metric
identities, and guard behavior."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from data_engineering_rag_spark.plans import REGISTRY, load


def _collect_xy(spark, sf_dir):
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "value")
        .collect()
    )
    return [(r.event_type, float(r.value)) for r in ev]


def _midranks(values):
    """value -> midrank over the full list (ties averaged)."""
    s = sorted(values)
    first = {}
    for i, v in enumerate(s):
        first.setdefault(v, i)
    from collections import Counter

    cnt = Counter(s)
    return {v: first[v] + (cnt[v] + 1) / 2 for v in cnt}


def test_mann_whitney_matches_bruteforce(spark, sf_dir):
    rows = REGISTRY["mann_whitney_purchase_vs_rest"].spark(spark, sf_dir).collect()
    assert len(rows) == 1
    got = rows[0]
    data = _collect_xy(spark, sf_dir)
    g1 = [v for t, v in data if t == "purchase"]
    g2 = [v for t, v in data if t != "purchase"]
    ranks = _midranks([v for _, v in data])
    r1 = sum(ranks[v] for v in g1)
    n1, n2 = len(g1), len(g2)
    u1 = r1 - n1 * (n1 + 1) / 2
    from collections import Counter

    cnt = Counter(v for _, v in data)
    tie = sum(c**3 - c for c in cnt.values())
    n = n1 + n2
    sigma = math.sqrt(n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1))))
    z = (u1 - n1 * n2 / 2) / sigma
    assert got.n1 == n1 and got.n2 == n2
    assert got.u1_doubled == round(2 * u1)
    assert abs(got.z_stat - z) < 1e-4


def test_kruskal_wallis_matches_bruteforce(spark, sf_dir):
    rows = REGISTRY["kruskal_wallis_value_by_type"].spark(spark, sf_dir).collect()
    got = rows[0]
    data = _collect_xy(spark, sf_dir)
    ranks = _midranks([v for _, v in data])
    from collections import Counter, defaultdict

    groups = defaultdict(list)
    for t, v in data:
        groups[t].append(v)
    n = len(data)
    h = 12 / (n * (n + 1)) * sum(
        sum(ranks[v] for v in vs) ** 2 / len(vs) for vs in groups.values()
    ) - 3 * (n + 1)
    cnt = Counter(v for _, v in data)
    tie = sum(c**3 - c for c in cnt.values())
    h_corr = h / (1 - tie / (n**3 - n))
    assert got.n == n and got.k == len(groups)
    assert abs(got.h_stat - h) < 1e-3
    assert abs(got.h_tie_corrected - h_corr) < 1e-3


def test_anova_f_matches_bruteforce(spark, sf_dir):
    got = REGISTRY["anova_f_price_by_status"].spark(spark, sf_dir).collect()[0]
    rows = load(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice").collect()
    from collections import defaultdict

    groups = defaultdict(list)
    for r in rows:
        groups[r.o_orderstatus].append(float(r.o_totalprice))
    allv = [v for vs in groups.values() for v in vs]
    n, k = len(allv), len(groups)
    mean = sum(allv) / n
    ssb = sum(len(vs) * (sum(vs) / len(vs) - mean) ** 2 for vs in groups.values())
    ssw = sum((v - sum(vs) / len(vs)) ** 2 for vs in groups.values() for v in vs)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert got.k == k and got.n == n
    assert abs(got.f_stat - f) / max(f, 1e-9) < 1e-4
    assert abs(got.ss_between - ssb) / ssb < 1e-6
    assert abs(got.ss_within - ssw) / ssw < 1e-6


def test_bh_fdr_stepup_invariants(spark, sf_dir):
    """BH step-up structure: rejections are a prefix of the p-value
    ranking, every rejected p satisfies its own threshold at k*, and
    the A-S normal CDF approximation is within 1e-6 of math.erf."""
    rows = REGISTRY["bh_fdr_nation_acctbal"].spark(spark, sf_dir).collect()
    m = len(rows)
    by_rank = sorted(rows, key=lambda r: r.p_rank)
    rejected = [r for r in by_rank if r.rejected]
    if rejected:
        kstar = max(r.p_rank for r in rejected)
        assert [r.p_rank for r in rejected] == list(range(1, kstar + 1))
        thresh_row = by_rank[kstar - 1]
        assert thresh_row.p_value * m <= kstar * 0.05 + 1e-9
    # every non-rejected rank above k* fails its own threshold test is
    # NOT required by BH (step-up allows interior failures), but any
    # rank > k* satisfying p*m <= rank*alpha would contradict k* = max
    for r in by_rank:
        if not r.rejected:
            assert r.p_value * m > r.p_rank * 0.05 - 1e-9 or r.p_rank > len(rejected)
    # A-S polynomial vs erf on the observed z values
    for r in rows:
        z = r.abs_z
        exact = 2 * (1 - 0.5 * (1 + math.erf(z / math.sqrt(2))))
        assert abs(r.p_value - exact) < 2e-6, (z, r.p_value, exact)


def test_ols_two_feature_matches_numpy(spark, sf_dir):
    import numpy as np

    got = REGISTRY["ols_price_qty_discount"].spark(spark, sf_dir).collect()[0]
    rows = load(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice"
    ).collect()
    X = np.array([[1.0, float(r.l_quantity), float(r.l_discount)] for r in rows])
    y = np.array([float(r.l_extendedprice) for r in rows])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ beta
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    r2 = 1 - ss_res / ss_tot
    assert abs(got.beta0 - beta[0]) < 1e-2 * max(1, abs(beta[0]))
    assert abs(got.beta_qty - beta[1]) < 1e-3 * max(1, abs(beta[1]))
    assert abs(got.beta_discount - beta[2]) < 1e-3 * max(1, abs(beta[2]))
    assert abs(got.r2 - r2) < 1e-5


def test_t_closeness_tvd_bruteforce(spark, sf_dir):
    from collections import Counter, defaultdict

    from data_engineering_rag_spark.plans.round8q import TCLOSE_BUCKET_W

    got = {
        (r.c_nationkey, r.c_mktsegment): (r.n_group, r.tvd, r.fails_t)
        for r in REGISTRY["t_closeness_audit"].spark(spark, sf_dir).collect()
    }
    rows = load(spark, sf_dir, "customer").collect()
    buckets = [
        (r.c_nationkey, r.c_mktsegment, math.floor(float(r.c_acctbal) / TCLOSE_BUCKET_W))
        for r in rows
    ]
    n = len(buckets)
    global_c = Counter(b for _, _, b in buckets)
    by_grp = defaultdict(Counter)
    for nk, seg, b in buckets:
        by_grp[(nk, seg)][b] += 1
    assert set(got) == set(by_grp)
    for key, cnt in by_grp.items():
        ng = sum(cnt.values())
        tvd = 0.5 * sum(
            abs(cnt.get(b, 0) / ng - global_c[b] / n) for b in global_c
        )
        g_n, g_tvd, _ = got[key]
        assert g_n == ng
        assert abs(g_tvd - tvd) < 1e-6


def test_item_cosine_topk_bruteforce(spark, sf_dir):
    from collections import Counter, defaultdict

    from data_engineering_rag_spark.plans.linkageq import ITEM_COS_MIN_CO, ITEM_COS_TOPK

    got = defaultdict(list)
    for r in REGISTRY["item_cosine_similarity_topk"].spark(spark, sf_dir).collect():
        got[r.part_a].append((r.rank, r.part_b, r.n_cobaskets, r.cosine))
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct().collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    deg = Counter(p for ps in baskets.values() for p in ps)
    co = Counter()
    for ps in baskets.values():
        ps = sorted(ps)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                co[(a, b)] += 1
    nbrs = defaultdict(list)
    for (a, b), c in co.items():
        if c >= ITEM_COS_MIN_CO:
            cos = c / math.sqrt(deg[a] * deg[b])
            nbrs[a].append((-cos, b, c))
            nbrs[b].append((-cos, a, c))
    for p, lst in nbrs.items():
        lst.sort()
        want = [(i + 1, b, c, round(-negcos, 6)) for i, (negcos, b, c) in enumerate(lst[:ITEM_COS_TOPK])]
        have = sorted(got[p])
        assert [w[:3] for w in have] == [w[:3] for w in want], p
        for h, w in zip(have, want):
            assert abs(h[3] - w[3]) < 2e-6
    assert set(got) == set(nbrs)


def test_quantile_normalize_target_is_cross_type_mean(spark, sf_dir):
    rows = REGISTRY["quantile_normalize_value_by_type"].spark(spark, sf_dir).collect()
    from collections import defaultdict

    by_q = defaultdict(list)
    for r in rows:
        by_q[r.q].append(r)
        assert abs(r.delta - round(r.bucket_avg - r.target_avg, 6)) < 2e-6
    for q, rs in by_q.items():
        target = rs[0].target_avg
        assert all(abs(r.target_avg - target) < 1e-9 for r in rs)
        mean_of_avgs = sum(r.bucket_avg for r in rs) / len(rs)
        assert abs(target - mean_of_avgs) < 1e-4, q


def test_kendall_tau_matches_bruteforce(spark, sf_dir):
    got = REGISTRY["kendall_tau_acctbal_orders"].spark(spark, sf_dir).collect()[0]
    import hashlib

    from data_engineering_rag_spark.plans.stattestsq import KT_SAMPLE_MOD

    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal").collect()
    orders = load(spark, sf_dir, "orders").groupBy("o_custkey").count().collect()
    ocnt = {r.o_custkey: r["count"] for r in orders}
    xy = []
    for r in cust:
        h = int(hashlib.md5(f"{r.c_custkey}kt8".encode()).hexdigest()[:15], 16)
        if h % KT_SAMPLE_MOD == 0:
            xy.append((float(r.c_acctbal), ocnt.get(r.c_custkey, 0)))
    n = len(xy)
    assert got.n == n and n >= 3
    c = d = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = xy[i][0] - xy[j][0]
            dy = xy[i][1] - xy[j][1]
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
    n0 = n * (n - 1) // 2
    tau = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
    assert got.concordant == c and got.discordant == d
    assert abs(got.tau_b - tau) < 1e-6


def test_observe_metrics_single_action(spark, sf_dir):
    """The observed metrics must equal a direct aggregation, and the
    query returns exactly one row with integer types."""
    got = REGISTRY["observe_pipeline_metrics"].spark(spark, sf_dir).collect()
    assert len(got) == 1
    d = load(spark, sf_dir, "documents")
    direct = d.agg(
        F.count(F.lit(1)), F.sum("n_chars"), F.min("n_chars"), F.max("n_chars")
    ).first()
    assert (got[0].n_docs, got[0].total_chars, got[0].min_chars, got[0].max_chars) == tuple(direct)


def test_arrow_byte_stats_ascii_and_multibyte(spark, tmp_path):
    """bytes == chars for pure ASCII; bytes > chars when multibyte
    characters are present — pins that mapInArrow measures UTF-8 bytes,
    not codepoints."""
    import pandas as pd

    df = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["plain ascii", "naïve café — ünïcodé"],
            "lang": ["en", "fr"],
            "source": ["t", "t"],
            "n_chars": [11, 20],
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    df.to_parquet(d / "documents.parquet", index=False)
    rows = {
        r.lang: r
        for r in REGISTRY["arrow_byte_stats_by_lang"].spark(spark, str(tmp_path / "docs")).collect()
    }
    assert rows["en"].total_bytes == rows["en"].total_chars == len("plain ascii")
    assert rows["fr"].total_chars == len("naïve café — ünïcodé")
    assert rows["fr"].total_bytes == len("naïve café — ünïcodé".encode("utf-8"))
    assert rows["fr"].total_bytes > rows["fr"].total_chars


def test_sql_udf_inlines_no_python(spark, sf_dir):
    """The SQL UDF must inline into the JVM plan: no Python evaluation
    node, and the result equals the hand-inlined aggregation."""
    df = REGISTRY["sql_udf_net_revenue"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    got = {r.l_returnflag: (r.n_items, r.net_revenue) for r in df.collect()}
    direct = {
        r.l_returnflag: (r.n, r.rev)
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ).cast("double"),
                4,
            ).alias("rev"),
        )
        .collect()
    }
    assert got == direct


def test_collation_merges_case_variants(spark, sf_dir):
    rows = REGISTRY["collated_source_rollup"].spark(spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    lowers = {r.s for r in docs.select(F.lower("source").alias("s")).distinct().collect()}
    assert {r.source_ci for r in rows} == lowers
    assert sum(r.n_docs for r in rows) == n_docs
    # every group key is already lowercase (representative normalized)
    assert all(r.source_ci == r.source_ci.lower() for r in rows)


def test_listagg_sorted_and_distinct(spark, sf_dir):
    for r in REGISTRY["listagg_sources_by_lang"].spark(spark, sf_dir).collect():
        parts = r.sources_csv.split(",")
        assert parts == sorted(parts)
        assert len(parts) == len(set(parts))


def test_mode_median_bruteforce(spark, sf_dir):
    import statistics
    from collections import Counter

    got = {
        r.l_returnflag: r
        for r in REGISTRY["mode_median_lineitem_stats"].spark(spark, sf_dir).collect()
    }
    rows = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
    ).collect()
    from collections import defaultdict

    by_flag = defaultdict(list)
    for r in rows:
        by_flag[r.l_returnflag].append(r)
    assert set(got) == set(by_flag)
    for flag, rs in by_flag.items():
        cnt = Counter(r.l_linestatus for r in rs)
        (top_status, top_n), *rest = cnt.most_common()
        if rest:  # mode must be untied for the query to be well-defined
            assert top_n > rest[0][1], f"tied mode for {flag}"
        assert got[flag].status_mode == top_status
        assert abs(got[flag].qty_median - statistics.median(float(r.l_quantity) for r in rs)) < 1e-4
        assert got[flag].n_items == len(rs)


def test_page_hinkley_bruteforce(spark, sf_dir):
    from data_engineering_rag_spark.plans.forecastq import PH_DELTA

    rows = sorted(
        REGISTRY["page_hinkley_daily_drift"].spark(spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    xs = [r.n_events for r in rows]
    cum = mt = 0
    mn = float("inf")
    for i, r in enumerate(rows):
        cum += xs[i]
        mu = cum / (i + 1)
        mt += xs[i] - mu - PH_DELTA
        mn = min(mn, mt)
        ph = mt - mn
        assert abs(r.prefix_mean - mu) < 1e-4
        assert abs(r.ph_stat - ph) < 1e-4
        assert ph >= 0


def test_conviction_bruteforce(spark, sf_dir):
    from collections import Counter, defaultdict

    from data_engineering_rag_spark.plans.linkageq import RULE_MIN_SUPPORT, RULE_TOPK

    got = REGISTRY["association_rules_conviction_topk"].spark(spark, sf_dir).collect()
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct().collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    n_orders = len(baskets)
    deg = Counter(p for ps in baskets.values() for p in ps)
    co = Counter()
    for ps in baskets.values():
        ps = sorted(ps)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                co[(a, b)] += 1
    rules = []
    for (a, b), s in co.items():
        if s < RULE_MIN_SUPPORT:
            continue
        for ant, con in ((a, b), (b, a)):
            if s < deg[ant]:  # conf < 1
                conf = s / deg[ant]
                conv = (1 - deg[con] / n_orders) / (1 - conf)
                rules.append((-conv, ant, con, s, conf))
    rules.sort()
    want = rules[:RULE_TOPK]
    assert len(got) == min(RULE_TOPK, len(rules))
    for g, w in zip(got, want):
        assert (g.antecedent, g.consequent, g.support) == (w[1], w[2], w[3])
        assert abs(g.conviction - (-w[0])) < 2e-6
        assert abs(g.confidence - w[4]) < 2e-6
