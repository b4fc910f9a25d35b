"""Round-9 batch-2 pins: winnowing fingerprints and nDCG@5.

Oracle parity (tests/test_oracle_parity.py) proves end-result equality
with DuckDB; these pin the algorithmic properties parity can't see —
the winnowing guarantee on planted partial overlap, and the nDCG gain
table's provenance.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_engineering_rag_spark.plans import REGISTRY
from data_engineering_rag_spark.plans.rag import EVAL_TOPK, NDCG_GAINS
from data_engineering_rag_spark.plans.round9q import (
    WIN_K,
    WIN_MIN_SHARED,
    WIN_W,
    winnow_fingerprints,
)


def _fp_sets(spark, docs):
    rows = winnow_fingerprints(
        spark.createDataFrame(docs, ["doc_id", "text"])
    ).collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.doc_id, set()).add(r.mh)
    return out


def test_winnowing_guarantee_on_planted_overlap(spark):
    """Schleimer et al. 2003, theorem 2: two docs sharing a token run
    of length >= w + k - 1 MUST share at least one fingerprint, no
    matter what surrounds the run. Plant a (w+k-1)-token run inside
    two otherwise-disjoint documents."""
    run = " ".join(f"shared{i:02d}" for i in range(WIN_W + WIN_K - 1))
    doc_a = "alpha bravo charlie delta " + run + " echo foxtrot golf hotel"
    doc_b = "nine eight seven six five " + run + " four three two one"
    fps = _fp_sets(spark, [(1, doc_a), (2, doc_b)])
    assert fps[1] & fps[2], "guaranteed shared fingerprint missing"


def test_winnowing_disjoint_docs_share_nothing(spark):
    """Fully token-disjoint docs can share no gram, hence no
    fingerprint — the false-positive side of the guarantee."""
    doc_a = " ".join(f"aa{i:02d}" for i in range(20))
    doc_b = " ".join(f"bb{i:02d}" for i in range(20))
    fps = _fp_sets(spark, [(1, doc_a), (2, doc_b)])
    assert not (fps[1] & fps[2])


def test_winnowing_density(spark):
    """Winnowing selects ~1/w of gram hashes (between m/w and m
    distinct fingerprints for m full windows) — the compression that
    makes the index sub-linear in text size."""
    text = " ".join(f"tok{i:03d}" for i in range(100))
    fps = _fp_sets(spark, [(1, text)])
    n_grams = 100 - WIN_K + 1
    n_windows = n_grams - WIN_W + 1
    assert math.ceil(n_windows / WIN_W) <= len(fps[1]) <= n_windows


def test_winnowing_pair_join_plan_is_equi(spark, sf_dir):
    """The cross-doc candidate join must be an equi-join on the
    fingerprint hash — never a nested loop."""
    df = REGISTRY["winnowing_fingerprint_pairs"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_winnowing_pairs_meet_threshold(spark, sf_dir):
    rows = REGISTRY["winnowing_fingerprint_pairs"].spark(spark, sf_dir).collect()
    assert rows, "vacuous: expected at least one pair at test SF"
    for r in rows:
        assert r.n_shared >= WIN_MIN_SHARED
        assert 0.0 < r.containment <= 1.0


def test_ndcg_gain_table_provenance():
    """NDCG_GAINS must be exactly round(1/log2(rank+1), 8) for ranks
    1..EVAL_TOPK — the pre-rounding is a portability device, not a
    place for typos."""
    assert sorted(NDCG_GAINS) == list(range(1, EVAL_TOPK + 1))
    for r, g in NDCG_GAINS.items():
        assert float(g) == round(1.0 / math.log2(r + 1), 8), (r, g)


def test_ndcg_bounds_and_consistency(spark, sf_dir):
    """nDCG@5 is a mean of per-question gains in [0, 1]; with binary
    single-truth relevance it is bounded above by hit_rate@5 and below
    by hit_rate@5 * gain(k) — and n_questions/n_hits must agree with
    the parent hit-rate query on the same corpus."""
    ndcg = REGISTRY["ndcg_retrieval_eval"].spark(spark, sf_dir).collect()[0]
    parent = REGISTRY["retrieval_eval_metrics"].spark(spark, sf_dir).collect()[0]
    assert ndcg.n_questions == parent.n_questions
    assert ndcg.n_hits_at5 == parent.n_hits_at5
    hit_rate = ndcg.n_hits_at5 / ndcg.n_questions
    lo = hit_rate * float(NDCG_GAINS[EVAL_TOPK]) - 1e-9
    assert lo <= ndcg.ndcg_at5 <= hit_rate + 1e-9


def test_lsh_recall_audit_invariants(spark, sf_dir):
    """Bucketed recall audit invariants: candidate counts bounded by
    pair counts, rates in [0,1], and the closed-form expected-recall
    column monotone in the similarity bucket (2s^4 - s^8 is monotone
    in s on [0,1], so per-bucket averages over increasing disjoint
    intervals must be too)."""
    rows = REGISTRY["lsh_candidate_recall_audit"].spark(spark, sf_dir).collect()
    assert rows, "vacuous: no buckets"
    prev = -1.0
    for r in sorted(rows, key=lambda x: x.bucket):
        assert 0 <= r.bucket <= 10
        assert 0 <= r.n_candidates <= r.n_pairs
        assert 0.0 <= r.recall <= 1.0
        assert 0.0 <= r.expected_recall <= 1.0
        assert r.expected_recall >= prev, "expected curve must be monotone"
        prev = r.expected_recall


def test_lsh_recall_audit_plan_shape(spark, sf_dir):
    """The banding candidate join must be an equi-join; the ONLY
    nested-loop join allowed is the sample-bounded sizes×sizes
    triangle (doc_a < doc_b over <= LSH_RECALL_SAMPLE rows per side —
    constant cost at any SF, and it must enumerate zero-intersection
    pairs, which no equi-key exists for)."""
    df = REGISTRY["lsh_candidate_recall_audit"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan


# --- property bridge: pure-Python winnowing mirror -----------------------
# Hypothesis explores the guarantee cheaply in Python; ONE Spark
# equivalence test pins the mirror to the real implementation, so the
# property transfers.

import hashlib
import re as _re

from hypothesis import given, settings
from hypothesis import strategies as st


def _py_winnow(text: str) -> set[int]:
    toks = _re.findall(r"\w\w+", text.lower(), _re.ASCII)
    if len(toks) < WIN_K:
        return set()
    grams = [" ".join(toks[i : i + WIN_K]) for i in range(len(toks) - WIN_K + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    if len(hs) < WIN_W:
        return set()
    return {min(hs[i : i + WIN_W]) for i in range(len(hs) - WIN_W + 1)}


_word = st.integers(0, 400).map(lambda i: f"w{i:03d}")


@settings(max_examples=100, deadline=None)
@given(
    pre_a=st.lists(_word, max_size=12),
    post_a=st.lists(_word, max_size=12),
    pre_b=st.lists(_word, max_size=12),
    post_b=st.lists(_word, max_size=12),
    run_len=st.integers(WIN_W + WIN_K - 1, 20),
    run_seed=st.integers(0, 10**6),
)
def test_winnowing_guarantee_property(pre_a, post_a, pre_b, post_b, run_len, run_seed):
    """For ANY surroundings and ANY shared run of >= w+k-1 tokens, the
    two docs share a fingerprint (Schleimer theorem 2), explored by
    hypothesis on the Python mirror."""
    run = [f"run{run_seed}x{i}" for i in range(run_len)]
    doc_a = " ".join(pre_a + run + post_a)
    doc_b = " ".join(pre_b + run + post_b)
    assert _py_winnow(doc_a) & _py_winnow(doc_b)


def test_py_winnow_mirror_matches_spark(spark):
    """The bridge: the Python mirror used by the hypothesis property
    must produce EXACTLY the Spark operator's fingerprint sets."""
    docs = [
        (1, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
        (2, "one two three four five six seven eight"),
        (3, "alpha bravo charlie delta NINE NINE echo foxtrot golf hotel"),
        (4, "short doc here now"),
        (5, "x1 " * 30),
    ]
    got = _fp_sets(spark, docs)
    for doc_id, text in docs:
        assert got.get(doc_id, set()) == _py_winnow(text), doc_id
