"""Round-8 batch-7 pins: independent recomputes for the Holt recursion,
the STL-lite decomposition, LOF, and the Benford audit (the cross-engine
oracle equality runs in test_oracle_parity.py — these pins are the
second, engine-independent derivation of each statistic)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from data_engineering_rag_spark.plans import REGISTRY
from data_engineering_rag_spark.plans.round8q import (
    BENFORD_P,
    HOLT_ALPHA,
    HOLT_BETA,
    LOF_K,
    LOF_TOP,
)

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
            diff = vecs[p] - vecs[o]
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


def test_benford_matches_counter_and_shares_sum_to_one(spark):
    """Observed digit counts equal a pure-Python Counter over the
    DuckDB scan; expected shares are the exact log10(1+1/d) table and
    sum to 1."""
    from collections import Counter

    assert sum(BENFORD_P.values()) == pytest.approx(1.0, abs=1e-12)
    con = duckdb.connect()
    vals = [
        v
        for (v,) in con.execute(
            f"SELECT o_totalprice FROM '{SF}/orders.parquet' WHERE o_totalprice >= 1"
        ).fetchall()
    ]
    con.close()
    counts = Counter(str(int(math.floor(v)))[0] for v in vals)
    got = REGISTRY["benford_totalprice_audit"].spark(spark, SF).collect()
    assert {r["digit"] for r in got} == set(counts)
    n = sum(counts.values())
    for r in got:
        d = r["digit"]
        assert r["n_obs"] == counts[d]
        p = BENFORD_P[int(d)]
        assert r["exp_share"] == pytest.approx(p, abs=1e-8)
        assert r["obs_share"] == pytest.approx(counts[d] / n, abs=1e-6)
        assert r["chi2_term"] == pytest.approx(
            (counts[d] - n * p) ** 2 / (n * p), abs=1e-4
        )
