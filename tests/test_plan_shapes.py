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
