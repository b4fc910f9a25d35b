"""Sign-LSH ANN behavior: planted exact-duplicate vectors MUST share a
bucket (identical projections → identical sign bits) and rank first
with cosine 1.0; oracle parity on the sf corpora covers the arithmetic,
this pins recall semantics the empty-result case can't."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from data_engineering_rag_spark.plans import REGISTRY
from data_engineering_rag_spark.plans.vectors import ANN_K, N_QUERIES


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory):
    rng = np.random.RandomState(7)
    base = rng.randn(40, 64).astype(np.float32)
    # vec_ids 0..4 are the queries; plant an exact duplicate of each at
    # vec_id 100+q, plus unrelated filler
    rows = [(q, base[q].tolist(), 0) for q in range(N_QUERIES)]
    rows += [(100 + q, base[q].tolist(), 1) for q in range(N_QUERIES)]
    rows += [(200 + i, base[N_QUERIES + i].tolist(), 2) for i in range(30)]
    df = pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [r[1] for r in rows],
            "label": [r[2] for r in rows],
        }
    )
    d = tmp_path_factory.mktemp("lshann")
    df.to_parquet(d / "embeddings.parquet", index=False)
    return str(d)


def test_planted_duplicates_rank_first(spark, emb_dir):
    out = REGISTRY["lsh_ann_topk"].spark(spark, emb_dir).collect()
    got = {r.q_id: r for r in out if r.rn == 1}
    for q in range(N_QUERIES):
        assert q in got, f"query {q} returned nothing"
        assert got[q].vec_id == 100 + q, (q, got[q])
        assert got[q].cosine == 1.0
    # every returned row's rank bound holds
    assert all(r.rn <= ANN_K for r in out)


def test_lsh_ann_is_equi_join(spark, sf_dir):
    df = REGISTRY["lsh_ann_topk"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
