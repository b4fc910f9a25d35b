"""Semantic invariants for the round-6h operators: MERGE emulation,
l-diversity, LSH banding design curve (oracle parity proves engine
agreement; these pin the decision rules themselves)."""

from __future__ import annotations


def test_merge_actions_follow_the_clause_rules(spark, sf_dir):
    from data_engineering_rag_spark.plans.cdcq import merge_upsert_orders

    rows = merge_upsert_orders(spark, sf_dir).collect()
    assert rows
    keys = {r.o_orderkey: r for r in rows}
    for r in rows:
        k = r.o_orderkey
        # tombstones never survive into the merged table
        assert r.o_orderstatus != "X"
        if k % 3 != 0:
            # never in the change feed -> untouched target row
            assert r.action == "keep"
        else:
            assert r.action in ("update", "insert")
            assert k % 41 != 0  # matched+tombstone rows were deleted
    # WHEN MATCHED AND tombstone THEN DELETE: in-feed, in-target,
    # tombstoned keys are gone
    assert not any(
        k % 3 == 0 and k % 41 == 0 and k % 97 != 0 for k in keys
    )
    # inserts are exactly the feed keys absent from snapshot A (%97)
    inserts = {k for k, r in keys.items() if r.action == "insert"}
    assert inserts == {
        k for k in keys if k % 97 == 0 and k % 3 == 0
    }


def test_l_diversity_summary_invariants(spark, sf_dir):
    from data_engineering_rag_spark.plans.auditq import l_diversity_audit

    row = l_diversity_audit(spark, sf_dir).collect()[0]
    assert row.n_groups > 0
    assert 1 <= row.min_l <= 5  # 5 market segments exist
    assert row.n_groups_homogeneous <= row.n_groups_below_l3 <= row.n_groups
    assert 0.0 <= row.frac_rows_at_risk <= 1.0
    assert (row.n_rows_below_l3 == 0) == (row.n_groups_below_l3 == 0)


def test_banding_curve_monotone_in_band_count(spark, sf_dir):
    """Nested bands: halving r while doubling b can only ADD candidate
    pairs, and the S-curve mean is monotone the same way — pinned
    exactly, not statistically."""
    from data_engineering_rag_spark.plans.corpusq import lsh_banding_design_curve

    rows = {r.bands: r for r in lsh_banding_design_curve(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 4, 8}
    n_pairs = {r.n_pairs for r in rows.values()}
    assert len(n_pairs) == 1  # same pair population per config
    for lo, hi in [(1, 2), (2, 4), (4, 8)]:
        assert rows[hi].n_candidates >= rows[lo].n_candidates
        assert rows[hi].mean_theory_prob >= rows[lo].mean_theory_prob
        assert rows[hi].candidate_rate >= rows[lo].candidate_rate
