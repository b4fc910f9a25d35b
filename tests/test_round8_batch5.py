"""Round-8 batch-5 pins: Markov removal-effect attribution re-derived
by power iteration (independent of the linear solve in the query),
plus recomputes for Mann-Kendall, McNemar and the runs test."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from data_engineering_rag_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    con = duckdb.connect()
    df = con.execute(f"SELECT * FROM '{SF}/events.parquet'").df()
    con.close()
    return df


def _transition_counts(ev: pd.DataFrame) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for _, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        seq = ["START", *g["event_type"].tolist(), "END"]
        for s, d in zip(seq, seq[1:]):
            counts[(s, d)] = counts.get((s, d), 0) + 1
    return counts


def _conv_prob_power(counts, removed=None, iters=4000):
    """Absorption probability into 'purchase' from START via plain
    power iteration — no matrix inverse, independent derivation."""
    states = sorted({s for p in counts for s in p})
    if removed is not None:
        states = [s for s in states if s != removed]
    probs = {s: 0.0 for s in states}
    probs["purchase"] = 1.0
    for _ in range(iters):
        new = dict(probs)
        for s in states:
            if s in ("purchase", "END"):
                continue
            row = {d: c for (src, d), c in counts.items() if src == s}
            tot = sum(row.values())
            if tot == 0:
                new[s] = 0.0
                continue
            acc = 0.0
            for d, c in row.items():
                if removed is not None and d == removed:
                    continue  # redirected to END (absorbs at 0)
                acc += (c / tot) * probs[d]
            new[s] = acc
        if max(abs(new[s] - probs[s]) for s in states) < 1e-13:
            probs = new
            break
        probs = new
    return probs["START"]


def test_markov_removal_effect_vs_power_iteration(spark):
    ev = _events()
    counts = _transition_counts(ev)
    base = _conv_prob_power(counts)
    rows = REGISTRY["markov_removal_effect"].spark(spark, SF).collect()
    assert len(rows) > 0
    effects = {}
    for r in rows:
        assert r.base_conversion == pytest.approx(base, abs=1e-6)
        expected = 1.0 - _conv_prob_power(counts, removed=r.channel) / base
        assert r.removal_effect == pytest.approx(expected, abs=1e-6)
        effects[r.channel] = max(expected, 0.0)
    tot = sum(effects.values())
    for r in rows:
        assert r.attribution_share == pytest.approx(effects[r.channel] / tot, abs=1e-6)
    assert sum(r.attribution_share for r in rows) == pytest.approx(1.0, abs=1e-6)


def test_mann_kendall_recompute(spark):
    ev = _events()
    ev["day"] = pd.to_datetime(ev["ts"]).dt.normalize()
    rows = REGISTRY["mann_kendall_trend"].spark(spark, SF).collect()
    for r in rows:
        x = (
            ev[ev.event_type == r.event_type]
            .groupby("day")
            .size()
            .sort_index()
            .to_numpy()
        )
        n = len(x)
        s = sum(
            np.sign(x[j] - x[i]) for i in range(n) for j in range(i + 1, n)
        )
        _, t = np.unique(x, return_counts=True)
        var_s = (n * (n - 1) * (2 * n + 5) - sum(tt * (tt - 1) * (2 * tt + 5) for tt in t)) / 18.0
        z = (s - 1) / math.sqrt(var_s) if s > 0 else ((s + 1) / math.sqrt(var_s) if s < 0 else 0.0)
        assert r.mk_s == s and r.n_days == n
        assert r.z_stat == pytest.approx(z, abs=1e-5)


def test_mcnemar_cells_consistent(spark):
    row = REGISTRY["mcnemar_purchase_halves"].spark(spark, SF).collect()[0]
    b, c = row.only_first_half, row.only_second_half
    assert b + c > 0  # non-degenerate pairing grain
    assert row.mcnemar_chi2 == pytest.approx(
        (abs(b - c) - 1.0) ** 2 / (b + c), abs=1e-5
    )
    assert row.n_pairs >= row.both_halves + b + c


def test_runs_test_recompute(spark):
    ev = _events()
    ev["day"] = pd.to_datetime(ev["ts"]).dt.normalize()
    x = ev.groupby("day").size().sort_index().to_numpy(dtype=float)
    m = x.mean()
    above = x > m
    n, n1 = len(x), int(above.sum())
    n2 = n - n1
    runs = 1 + int((above[1:] != above[:-1]).sum())
    er = 2.0 * n1 * n2 / n + 1.0
    sr = math.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n**2 * (n - 1.0)))
    row = REGISTRY["runs_test_daily_counts"].spark(spark, SF).collect()[0]
    assert (row.n_days, row.n_above, row.n_below, row.n_runs) == (n, n1, n2, runs)
    assert row.expected_runs == pytest.approx(er, abs=1e-5)
    assert row.z_stat == pytest.approx((runs - er) / sr, abs=1e-5)
