"""Round-8 batch-7 pins: independent recomputes for the Holt recursion,
the STL-lite decomposition, and LOF (the cross-engine
oracle equality runs in test_oracle_parity.py — these pins are the
second, engine-independent derivation of each statistic)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from data_engineering_rag_spark.plans import REGISTRY
from data_engineering_rag_spark.plans.forecastq import HOLT_ALPHA, HOLT_BETA
from data_engineering_rag_spark.plans.linkageq import LOF_K, LOF_TOP

SF = "/root/testdata/sf0.001"


def _daily(table: str, col: str):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT cast(date_trunc('day', {col}) as date) AS d,
                   count(*) AS y
            FROM '{SF}/{table}.parquet' GROUP BY 1 ORDER BY d"""
    ).fetchall()
    con.close()
    return rows


def test_holt_matches_plain_python_recursion(spark):
    """The query's level/trend/forecasts equal a from-scratch Python
    recursion over a DuckDB daily rollup — no Spark, no pandas, no
    shared code path with the implementation."""
    rows = _daily("orders", "o_orderdate")
    y = [float(c) for _, c in rows]
    lvl, tr = y[0], y[1] - y[0]
    for t in range(1, len(y)):
        lvl_new = HOLT_ALPHA * y[t] + (1 - HOLT_ALPHA) * (lvl + tr)
        tr = HOLT_BETA * (lvl_new - lvl) + (1 - HOLT_BETA) * tr
        lvl = lvl_new
    got = REGISTRY["holt_linear_daily_forecast"].spark(spark, SF).collect()[0]
    assert got["n_days"] == len(y)
    assert got["level"] == pytest.approx(lvl, abs=1e-6)
    assert got["trend"] == pytest.approx(tr, abs=1e-6)
    for h, col in [(1, "fc_1"), (7, "fc_7"), (28, "fc_28")]:
        assert got[col] == pytest.approx(lvl + h * tr, abs=2e-6)


def test_holt_forecast_is_linear_in_horizon(spark):
    """fc_h must lie on the line level + h*trend: the 28-7 and 7-1 gaps
    are exact multiples of the trend (up to the two independent 6-dp
    rounds)."""
    got = REGISTRY["holt_linear_daily_forecast"].spark(spark, SF).collect()[0]
    assert got["fc_28"] - got["fc_7"] == pytest.approx(21 * got["trend"], abs=5e-5)
    assert got["fc_7"] - got["fc_1"] == pytest.approx(6 * got["trend"], abs=5e-5)


def test_stl_matches_numpy_rolling_decomposition(spark):
    """Trend/seasonal/remainder equal a numpy re-derivation (centered
    7-window mean on full windows, per-ISO-dow detrended mean), and the
    additive identity y = trend + seasonal + remainder holds row-wise."""
    rows = _daily("events", "ts")
    days = [d for d, _ in rows]
    y = np.array([c for _, c in rows], dtype="float64")
    got = {
        r["day"]: r
        for r in REGISTRY["stl_weekly_decompose_events"].spark(spark, SF).collect()
    }
    # full windows only: positions 3 .. n-4
    assert len(got) == len(y) - 6
    trend = {}
    for i in range(3, len(y) - 3):
        trend[days[i]] = round(float(y[i - 3 : i + 4].sum()) / 7.0, 6)
    by_dow: dict[int, list[float]] = {}
    for i in range(3, len(y) - 3):
        dow = days[i].isoweekday()
        by_dow.setdefault(dow, []).append(round(float(y[i]) - trend[days[i]], 6))
    seasonal = {dw: round(sum(v) / len(v), 6) for dw, v in by_dow.items()}
    for i in range(3, len(y) - 3):
        r = got[days[i]]
        assert r["trend"] == pytest.approx(trend[days[i]], abs=1e-9)
        assert r["dow"] == days[i].isoweekday()
        assert r["seasonal"] == pytest.approx(seasonal[r["dow"]], abs=2e-6)
        assert r["remainder"] == pytest.approx(
            float(y[i]) - r["trend"] - r["seasonal"], abs=2e-6
        )


def test_lof_matches_numpy_bruteforce(spark):
    """Top-LOF scores equal a dense numpy LOF (k-NN within label,
    k-distance, reachability, lrd, ratio) computed with none of the
    query's machinery."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, label, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = [r[0] for r in rows]
    labels = {r[0]: r[1] for r in rows}
    vecs = {r[0]: np.asarray(r[2], dtype="float64") for r in rows}
    knn: dict[object, list[tuple[object, float]]] = {}
    for p in ids:
        cands = []
        for o in ids:
            if o == p or labels[o] != labels[p]:
                continue
            # mirror the query's rounding ladder so ranks agree exactly
            d2 = round(
                float(vecs[p] @ vecs[p]) - 2 * float(vecs[p] @ vecs[o]) + float(vecs[o] @ vecs[o]),
                8,
            )
            d = round(math.sqrt(max(d2, 0.0)), 8)
            cands.append((o, d))
        cands.sort(key=lambda t: (t[1], t[0]))
        knn[p] = cands[:LOF_K]
    kd = {p: max(d for _, d in nb) for p, nb in knn.items() if nb}
    lrd = {}
    for p, nb in knn.items():
        reach = [max(kd[o], d) for o, d in nb]
        lrd[p] = round(len(reach) / sum(reach), 8)
    lof = {
        p: round(sum(lrd[o] for o, _ in nb) / (len(nb) * lrd[p]), 6)
        for p, nb in knn.items()
    }
    expect = sorted(lof.items(), key=lambda t: (-t[1], t[0]))[:LOF_TOP]
    got = REGISTRY["lof_embedding_outliers"].spark(spark, SF).collect()
    assert len(got) == LOF_TOP
    for row, (p, score) in zip(got, expect):
        assert row["vec_id"] == p
        assert row["lof"] == pytest.approx(score, abs=1e-9)
        assert row["k_dist"] == pytest.approx(kd[p], abs=1e-9)
        assert row["lrd"] == pytest.approx(lrd[p], abs=1e-9)
    # LOF ~ 1 means inlier; the reported set must be the anomalous tail
    assert got[0]["lof"] >= got[-1]["lof"] >= 1.0


# --------------------------------------------------------------------------
# q-digest guarantee pins
# --------------------------------------------------------------------------

from data_engineering_rag_spark.plans.sketchq import (  # noqa: E402
    QD_BITS,
    QD_K,
    QD_QUANTILES,
    qdigest_build,
    qdigest_compress,
    qdigest_quantile,
)


def test_qdigest_guarantee_vs_exact_ranks(spark):
    """Each estimated quantile's TRUE rank (exact count over the data)
    must sit within the advertised (log2 U / k)*n bound of the target
    rank — the q-digest guarantee, verified end-to-end through the
    mapInPandas -> groupBy-merge -> recompress pipeline."""
    got = REGISTRY["qdigest_price_quantiles"].spark(spark, SF).collect()
    assert len(got) == len(QD_QUANTILES)
    con = duckdb.connect()
    cents = [
        v
        for (v,) in con.execute(
            f"""SELECT least(greatest(cast(round(o_totalprice * 100) as bigint), 0),
                             {(1 << QD_BITS) - 1})
                FROM '{SF}/orders.parquet'"""
        ).fetchall()
    ]
    con.close()
    cents.sort()
    n = len(cents)
    import bisect

    for r in got:
        assert r["n"] == n
        target = math.ceil(r["q"] * n)
        # with duplicated values the reported value covers the rank
        # INTERVAL [bisect_left, bisect_right]; the guarantee is that
        # this interval comes within rank_bound of the target
        lo = bisect.bisect_left(cents, r["est_cents"])
        hi = bisect.bisect_right(cents, r["est_cents"])
        assert lo - r["rank_bound"] <= target <= hi + r["rank_bound"], (
            r["q"], lo, hi, target, r["rank_bound"]
        )
        assert r["est_price"] == pytest.approx(r["est_cents"] / 100.0)
    # sanity: estimates are monotone in q
    ests = [r["est_cents"] for r in sorted(got, key=lambda r: r["q"])]
    assert ests == sorted(ests)


@pytest.mark.parametrize("dist", ["uniform", "skewed", "two_point", "constant"])
def test_qdigest_fold_guarantee_adversarial(dist):
    """Build per-'partition' digests over crafted streams, merge
    nodewise, recompress with the global n, and assert every decile's
    true-rank error stays under (bits/k)*n — including distributions
    that stress the dyadic structure (point masses, heavy skew)."""
    import bisect

    bits, k = 16, 64
    if dist == "uniform":
        vals = [(i * 2654435761) % (1 << bits) for i in range(5000)]
    elif dist == "skewed":
        vals = [min(int(1.0007 ** i), (1 << bits) - 1) for i in range(20000)]
    elif dist == "two_point":
        vals = [7] * 9000 + [(1 << bits) - 2] * 1000
    else:
        vals = [12345] * 4096
    # three unequal "partitions", each built with its LOCAL n
    cuts = [0, len(vals) // 5, len(vals) // 2, len(vals)]
    merged: dict = {}
    for a, b in zip(cuts, cuts[1:]):
        part = vals[a:b]
        counts: dict = {}
        for v in part:
            counts[v] = counts.get(v, 0) + 1
        for node, c in qdigest_build(counts, len(part), k, bits).items():
            merged[node] = merged.get(node, 0) + c
    n = len(vals)
    digest = qdigest_compress(merged, n, k, bits)
    assert sum(digest.values()) == n
    svals = sorted(vals)
    bound = bits / k * n
    for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = qdigest_quantile(digest, n, q, bits)
        target = math.ceil(q * n)
        lo = bisect.bisect_left(svals, est)
        hi = bisect.bisect_right(svals, est)
        assert lo - bound <= target <= hi + bound, (dist, q, lo, hi, target)


def test_qdigest_merge_is_order_independent():
    """Nodewise merge is abelian: any partition order yields the same
    digest (the property that makes the groupBy-sum merge correct)."""
    bits, k = 12, 32
    parts = [
        [i % 97 for i in range(1000)],
        [4000 - i for i in range(1500)],
        [42] * 800,
    ]
    def build(part):
        counts: dict = {}
        for v in part:
            counts[v] = counts.get(v, 0) + 1
        return qdigest_build(counts, len(part), k, bits)

    def merge(order):
        merged: dict = {}
        for i in order:
            for node, c in build(parts[i]).items():
                merged[node] = merged.get(node, 0) + c
        return qdigest_compress(merged, sum(len(parts[i]) for i in order), k, bits)

    assert merge([0, 1, 2]) == merge([2, 0, 1]) == merge([1, 2, 0])


# --------------------------------------------------------------------------
# q-digest property test: guarantee holds for ARBITRARY streams and
# partition splits (hypothesis drives values, duplication, and split
# points)
# --------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    data=st.lists(
        st.integers(min_value=0, max_value=(1 << 12) - 1), min_size=1, max_size=2000
    ),
    split=st.integers(min_value=0, max_value=2000),
    q=st.sampled_from([0.05, 0.25, 0.5, 0.75, 0.95]),
)
def test_qdigest_property_guarantee(data, split, q):
    """For any value stream, any two-way partition split, and any
    quantile: count is conserved exactly and the answered value's rank
    interval reaches within (bits/k)*n of the target rank."""
    import bisect

    bits, k = 12, 16
    split = min(split, len(data))
    merged: dict = {}
    for part in (data[:split], data[split:]):
        if not part:
            continue
        counts: dict = {}
        for v in part:
            counts[v] = counts.get(v, 0) + 1
        for node, c in qdigest_build(counts, len(part), k, bits).items():
            merged[node] = merged.get(node, 0) + c
    n = len(data)
    digest = qdigest_compress(merged, n, k, bits)
    assert sum(digest.values()) == n  # exact count conservation
    svals = sorted(data)
    est = qdigest_quantile(digest, n, q, bits)
    target = math.ceil(q * n)
    lo = bisect.bisect_left(svals, est)
    hi = bisect.bisect_right(svals, est)
    bound = bits / k * n
    assert lo - bound <= target <= hi + bound


def test_holt_by_type_matches_per_series_python(spark):
    """Every event type's level/trend equals an independent plain-Python
    recursion over that type's own DuckDB daily rollup — the grouped
    query is exactly |types| independent single-series fits."""
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_type, cast(date_trunc('day', ts) as date) AS d, count(*) AS y
            FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY event_type, d"""
    ).fetchall()
    con.close()
    series: dict[str, list[float]] = {}
    for et, _, c in rows:
        series.setdefault(et, []).append(float(c))
    got = {
        r["event_type"]: r
        for r in REGISTRY["holt_forecast_by_event_type"].spark(spark, SF).collect()
    }
    assert set(got) == {et for et, y in series.items() if len(y) >= 2}
    for et, y in series.items():
        if len(y) < 2:
            continue
        lvl, tr = y[0], y[1] - y[0]
        for t in range(1, len(y)):
            lvl_new = HOLT_ALPHA * y[t] + (1 - HOLT_ALPHA) * (lvl + tr)
            tr = HOLT_BETA * (lvl_new - lvl) + (1 - HOLT_BETA) * tr
            lvl = lvl_new
        r = got[et]
        assert r["n_days"] == len(y)
        assert r["level"] == pytest.approx(lvl, abs=1e-6)
        assert r["trend"] == pytest.approx(tr, abs=1e-6)
        assert r["fc_7"] == pytest.approx(lvl + 7 * tr, abs=2e-6)
