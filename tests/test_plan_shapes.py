"""Physical-plan shape gates: queries that claim a scale-safe join
strategy must actually plan it. Guards against regressions where an
equi-join silently degenerates into a nested loop / cartesian product
(the O(N²) shapes that melt at 100 TB)."""

from __future__ import annotations

from data_engineering_rag_spark.plans import REGISTRY


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_near_dup_via_ivf_is_equi_join(spark, sf_dir):
    """The production near-dup path must be a hash/sort-merge equi-join
    on the bucket key — never a BroadcastNestedLoopJoin or cartesian
    product over the full table."""
    df = REGISTRY["embedding_near_dup_via_ivf"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_lsh_candidate_pairs_is_equi_join(spark, sf_dir):
    """LSH banding's self-join is an equi-join on (band, band_hash)."""
    df = REGISTRY["minhash_lsh_candidate_pairs"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_knn_graph_is_equi_join(spark, sf_dir):
    df = REGISTRY["knn_graph_by_label"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_simhash_near_dup_pairs_is_equi_join(spark, sf_dir):
    """SimHash banding: candidate generation and the signature re-join
    for hamming verification are all equi-joins on (band, band_value) /
    doc_id — no all-pairs shape anywhere in the plan."""
    df = REGISTRY["simhash_near_dup_pairs"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_minhash_dedup_verify_stage_is_equi_join(spark, sf_dir):
    """The end-to-end dedup pipeline's pre-CC stages (LSH banding +
    Jaccard verification joins on doc_id) must stay equi-joins; the CC
    driver loop executes eagerly inside the query function, so the
    returned plan covers the final component/size join."""
    df = REGISTRY["minhash_dedup_canonical"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
