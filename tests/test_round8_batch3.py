"""Round-8 batch-3 semantic pins: PAVA isotonic calibration against a
brute-force reference, Kneser-Ney mass conservation, Fellegi-Sunter
weight ordering, ridge-path shrinkage, and the O'Brien-Fleming
boundary shape. Oracle parity for the six SQL-checkable queries runs
in test_oracle_parity.py; these tests pin the semantics the oracle
can't (rows-only PAVA) or that deserve an independent derivation."""

from __future__ import annotations

import duckdb
import pytest

from data_engineering_rag_spark.plans import REGISTRY
from data_engineering_rag_spark.plans.linkageq import FS_M_BAND, FS_M_SIGN, KN_DISCOUNT
from data_engineering_rag_spark.plans.round8q import PAVA_BINS, RIDGE_LAMBDAS
from data_engineering_rag_spark.plans.stattestsq import OBF_FINAL_Z

SF = "/root/testdata/sf0.001"


def _brute_pava(rates: list[float], weights: list[float]) -> list[float]:
    """O(n^2) textbook PAVA: repeatedly merge the first adjacent
    violator until monotone. Independent of the stack implementation
    in the query."""
    vals = [[r * w, w, 1] for r, w in zip(rates, weights)]
    changed = True
    while changed:
        changed = False
        for i in range(len(vals) - 1):
            if vals[i][0] / vals[i][1] > vals[i + 1][0] / vals[i + 1][1] + 1e-15:
                s, w, c = vals.pop(i + 1)
                vals[i][0] += s
                vals[i][1] += w
                vals[i][2] += c
                changed = True
                break
    out: list[float] = []
    for s, w, c in vals:
        out.extend([s / w] * c)
    return out


def test_pava_matches_bruteforce_and_invariants(spark):
    rows = (
        REGISTRY["isotonic_pava_calibration"]
        .spark(spark, SF)
        .orderBy("bin")
        .collect()
    )
    assert len(rows) == PAVA_BINS
    # Monotone nondecreasing calibrated rates.
    iso = [r.iso_rate for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(iso, iso[1:]))
    # Weighted mean preserved (PAVA is a projection: same weighted sum).
    n = [r.n for r in rows]
    raw = [r.raw_rate for r in rows]
    assert sum(w * a for w, a in zip(n, raw)) == pytest.approx(
        sum(w * b for w, b in zip(n, iso)), rel=1e-4
    )
    # Exact agreement with the brute-force reference on the same bins.
    expected = _brute_pava(raw, [float(x) for x in n])
    assert iso == pytest.approx([round(v, 6) for v in expected], abs=2e-6)


def test_pava_bins_are_quantile_bins(spark):
    rows = REGISTRY["isotonic_pava_calibration"].spark(spark, SF).collect()
    total = sum(r.n for r in rows)
    hi = -(-total // PAVA_BINS)
    assert all(hi - 1 <= r.n <= hi for r in rows)
    by_bin = sorted(rows, key=lambda r: r.bin)
    means = [r.mean_value for r in by_bin]
    assert means == sorted(means)


def test_kneser_ney_mass_conservation(spark):
    """Interpolated KN must sum to exactly 1 over ALL observed
    continuation types for the chosen context: sum (c-D)/cw1 over
    followers + D*N1p_fwd/cw1 * sum Pcont over the WHOLE vocab = 1.
    Derived here independently in DuckDB from raw bigram counts."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    row = con.execute(
        f"""
        WITH toks AS (
          SELECT regexp_extract_all(lower(text), '\\w\\w+') AS a FROM documents),
        bg AS (
          SELECT unnest(list_transform(generate_series(1, len(a) - 1),
                                       i -> concat(a[i], ' ', a[i + 1]))) AS bgr
          FROM toks WHERE len(a) >= 2),
        bc AS (
          SELECT split_part(bgr, ' ', 1) AS w1, split_part(bgr, ' ', 2) AS w2,
                 count(*) AS c
          FROM bg GROUP BY 1, 2),
        ctx AS (
          SELECT w1, sum(c) AS cw1, count(*) AS n1p FROM bc GROUP BY w1),
        top_ctx AS (SELECT * FROM ctx ORDER BY cw1 DESC, w1 LIMIT 1),
        cont AS (SELECT w2, count(*) AS n1p_rev FROM bc GROUP BY w2),
        tot AS (SELECT count(*) AS t FROM bc)
        SELECT
          (SELECT sum((c - {KN_DISCOUNT}) / tc.cw1)
             FROM bc, top_ctx tc WHERE bc.w1 = tc.w1)
          + (SELECT {KN_DISCOUNT} * tc.n1p / tc.cw1 FROM top_ctx tc)
            * (SELECT sum(cast(n1p_rev as double))
                 FROM cont) / (SELECT t FROM tot) AS mass
        """
    ).fetchone()
    con.close()
    assert row[0] == pytest.approx(1.0, abs=1e-9)


def test_fellegi_sunter_weight_ordering(spark):
    """Both-fields-agree pairs must outscore single-field and
    no-field pairs (u << m here, so agreement weights are positive and
    disagreement weights negative)."""
    rows = REGISTRY["fellegi_sunter_linkage"].spark(spark, SF).collect()
    assert 0 < len(rows) <= 20
    def key(r):
        return (bool(r.band_agree), bool(r.sign_agree))
    by_combo: dict[tuple[bool, bool], float] = {}
    for r in rows:
        by_combo.setdefault(key(r), r.fs_score)
        assert by_combo[key(r)] == r.fs_score  # score is combo-determined
    if (True, True) in by_combo and (False, True) in by_combo:
        assert by_combo[(True, True)] > by_combo[(False, True)]
    assert 0 < FS_M_BAND < 1 and 0 < FS_M_SIGN < 1


def test_ridge_path_shrinks_and_matches_ols(spark):
    rows = (
        REGISTRY["ridge_path_price_qty_discount"]
        .spark(spark, SF)
        .orderBy("lam")
        .collect()
    )
    assert [r.lam for r in rows] == [pytest.approx(x) for x in RIDGE_LAMBDAS]
    ols = REGISTRY["ols_price_qty_discount"].spark(spark, SF).collect()[0]
    assert rows[0].beta_qty == pytest.approx(ols.beta_qty, abs=1e-6)
    assert rows[0].beta_discount == pytest.approx(ols.beta_discount, abs=1e-6)
    norms = [r.beta_qty**2 + r.beta_discount**2 for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(norms, norms[1:]))
    r2 = [r.r2 for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(r2, r2[1:]))


def test_obf_boundary_shape(spark):
    rows = (
        REGISTRY["obrien_fleming_sequential_ab"]
        .spark(spark, SF)
        .orderBy("day")
        .collect()
    )
    assert len(rows) >= 5
    info = [r.info_frac for r in rows]
    assert all(a < b for a, b in zip(info, info[1:]))
    assert info[-1] == pytest.approx(1.0, abs=1e-9)
    bounds = [r.z_bound for r in rows]
    assert all(a >= b for a, b in zip(bounds, bounds[1:]))
    assert bounds[-1] == pytest.approx(OBF_FINAL_Z, abs=1e-6)
    for r in rows:
        assert r.crossed == (abs(r.z_stat) > r.z_bound) or abs(
            abs(r.z_stat) - r.z_bound
        ) < 1e-5


def test_overdispersion_recompute(spark):
    import statistics

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    daily = con.execute(
        "SELECT event_type, cast(ts as date), count(*) FROM events GROUP BY 1, 2"
    ).fetchall()
    con.close()
    per_type: dict[str, list[int]] = {}
    for t, _, c in daily:
        per_type.setdefault(t, []).append(c)
    rows = REGISTRY["overdispersion_daily_counts"].spark(spark, SF).collect()
    assert {r.event_type for r in rows} == set(per_type)
    for r in rows:
        cs = per_type[r.event_type]
        assert r.n_days == len(cs)
        assert r.mean_daily == pytest.approx(statistics.mean(cs), abs=1e-5)
        assert r.var_daily == pytest.approx(statistics.variance(cs), abs=1e-4)
        assert r.vmr == pytest.approx(
            statistics.variance(cs) / statistics.mean(cs), abs=1e-5
        )
