"""Round-8 batch-4 semantic pins: each query re-derived independently
(numpy/pandas/hashlib) at sf0.001 — a second implementation path on
top of the DuckDB oracle parity in test_oracle_parity.py."""

from __future__ import annotations

import hashlib
import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from data_engineering_rag_spark.plans import REGISTRY
from data_engineering_rag_spark.plans.forecastq import ACF_MAX_LAG
from data_engineering_rag_spark.plans.sketchq import CKSUM_BUCKETS
from data_engineering_rag_spark.plans.stattestsq import EULER_GAMMA, GUMBEL_RETURN_T, YUEN_TRIM

SF = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    con = duckdb.connect()
    df = con.execute(f"SELECT * FROM '{SF}/events.parquet'").df()
    con.close()
    return df


def test_did_recompute(spark):
    ev = _events()
    ev["day"] = pd.to_datetime(ev["ts"]).dt.normalize()
    d0 = ev["day"].min()
    ev["post"] = (ev["day"] - d0).dt.days >= 15
    ev["treated"] = ev["user_id"] % 2 == 0
    ev["conv"] = (ev["event_type"] == "purchase").astype(int)

    def rate(t, p):
        cell = ev[(ev.treated == t) & (ev.post == p)]
        return cell.conv.mean(), len(cell)

    (ptp, ntp), (pt0, _), (pcp, _), (pc0, _) = (
        rate(True, True), rate(True, False), rate(False, True), rate(False, False)
    )
    did = (ptp - pt0) - (pcp - pc0)
    row = REGISTRY["did_estimator_purchases"].spark(spark, SF).collect()[0]
    assert row.n_tp == ntp
    assert row.did_estimate == pytest.approx(did, abs=1e-6)
    assert row.p_value == pytest.approx(
        2 * (1 - 0.5 * (1 + math.erf(abs(row.z_stat) / math.sqrt(2)))), abs=1e-4
    )


def test_gumbel_recompute(spark):
    ev = _events().dropna(subset=["value"])
    ev["day"] = pd.to_datetime(ev["ts"]).dt.normalize()
    rows = REGISTRY["gumbel_block_maxima_fit"].spark(spark, SF).collect()
    for r in rows:
        mx = ev[ev.event_type == r.event_type].groupby("day")["value"].max()
        beta = mx.std(ddof=1) * math.sqrt(6.0) / math.pi
        mu = mx.mean() - EULER_GAMMA * beta
        assert r.n_blocks == len(mx)
        assert r.gumbel_beta == pytest.approx(beta, rel=1e-5)
        assert r.gumbel_mu == pytest.approx(mu, rel=1e-5)
        rl = mu - beta * math.log(-math.log(1.0 - 1.0 / GUMBEL_RETURN_T))
        assert getattr(r, f"return_level_{GUMBEL_RETURN_T}") == pytest.approx(
            rl, rel=1e-5
        )
        # The 100-day return level must exceed the observed mean max.
        assert getattr(r, f"return_level_{GUMBEL_RETURN_T}") > r.mean_max


def test_yuen_recompute(spark):
    ev = _events().dropna(subset=["value"])
    out = {}
    for is_p, grp in ev.groupby(ev.event_type == "purchase"):
        v = grp.sort_values(["value", "event_id"])["value"].to_numpy()
        n = len(v)
        g = int(math.floor(YUEN_TRIM * n))
        h = n - 2 * g
        trimmed = v[g : n - g]
        wins = np.concatenate([[v[g]] * g, trimmed, [[v[n - g - 1]] * g][0]])
        mt = trimmed.mean()
        swsq = wins.var(ddof=1)
        out[bool(is_p)] = (n, h, mt, (n - 1) * swsq / (h * (h - 1)))
    row = REGISTRY["yuen_trimmed_ttest"].spark(spark, SF).collect()[0]
    n1, h1, mt1, d1 = out[True]
    n2, h2, mt2, d2 = out[False]
    assert (row.n1, row.h1, row.n2, row.h2) == (n1, h1, n2, h2)
    assert row.trimmed_mean_purchase == pytest.approx(mt1, abs=1e-5)
    assert row.trimmed_mean_rest == pytest.approx(mt2, abs=1e-5)
    assert row.yuen_t == pytest.approx((mt1 - mt2) / math.sqrt(d1 + d2), abs=1e-4)


def test_acf_recompute(spark):
    ev = _events()
    ev["day"] = pd.to_datetime(ev["ts"]).dt.normalize()
    rows = REGISTRY["daily_count_acf"].spark(spark, SF).collect()
    assert {r.lag for r in rows} == set(range(1, ACF_MAX_LAG + 1))
    for etype in ev.event_type.unique():
        daily = ev[ev.event_type == etype].groupby("day").size()
        daily = daily.reindex(
            pd.date_range(daily.index.min(), daily.index.max()), fill_value=0
        )
        x = daily.to_numpy(dtype=float)
        m, n = x.mean(), len(x)
        denom = ((x - m) ** 2).sum()
        for r in [r for r in rows if r.event_type == etype]:
            k = r.lag
            # The query joins on observed days only; with the synthetic
            # data every day is present, so the dense recompute matches.
            expected = ((x[:-k] - m) * (x[k:] - m)).sum() / denom
            assert r.npairs == n - k
            assert r.acf == pytest.approx(expected, abs=1e-6)


def test_checksum_manifest_pure_python(spark):
    con = duckdb.connect()
    orders = con.execute(f"SELECT * FROM '{SF}/orders.parquet'").df()
    con.close()
    expect: dict[int, list[int]] = {}
    for t in orders.itertuples():
        day = pd.Timestamp(t.o_orderdate).strftime("%Y-%m-%d")
        r = f"{t.o_orderkey},{t.o_custkey},{t.o_orderstatus},{t.o_orderpriority},{day}"
        hv = int(hashlib.md5(r.encode()).hexdigest()[:10], 16)
        expect.setdefault(int(t.o_orderkey) % CKSUM_BUCKETS, []).append(hv)
    rows = REGISTRY["partition_checksum_manifest"].spark(spark, SF).collect()
    assert len(rows) == CKSUM_BUCKETS
    for r in rows:
        assert r.n_rows == len(expect[r.bucket])
        assert r.checksum == sum(expect[r.bucket])
    # Commutativity: the checksum is a sum, so any permutation of rows
    # (any shuffle layout) yields the identical manifest.
    for r in rows:
        assert sum(sorted(expect[r.bucket])) == r.checksum
