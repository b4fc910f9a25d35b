"""Pins for the prefix-filter exact set-similarity join: a planted
tau-boundary pair (J = 3/5 EXACTLY — the case a float ceil(0.6*sz)
prefix length silently drops), a planted sub-threshold pair that must
NOT appear, and a losslessness + pruning check against a brute-force
Python recompute on the real corpus."""

from __future__ import annotations

import duckdb
import pytest

from data_engineering_rag_spark.plans import REGISTRY
from data_engineering_rag_spark.plans.linkageq import PPJ_TAU_DEN, PPJ_TAU_NUM

SF = "/root/testdata/sf0.001"


def _trigrams(text: str) -> set:
    import re

    toks = re.findall(r"\w\w+", text.lower())
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def test_boundary_pair_at_exact_tau_is_kept(spark, tmp_path):
    """Docs A and B share 3 of 5 union trigrams (J = 3/5 = tau, the
    inclusive boundary); C is sub-threshold. Exactly the (A, B) pair
    must be emitted, with exact integer intersection/union."""
    rows = [
        # 6 tokens -> 4 trigrams; A and B differ only in the last token
        # -> 3 shared trigrams, sz 4 and 4, union 5, J = 3/5 exactly
        (1, "alpha bravo charlie delta echo foxtrot"),
        (2, "alpha bravo charlie delta echo golfer"),
        # C shares only 1 trigram with A -> J = 1/7 < tau
        (3, "charlie delta echo xray yankee zulu11"),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in REGISTRY["jaccard_prefix_filter_pairs"].spark(spark, str(tmp_path)).collect()
    }
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    assert (r["n_inter"], r["n_union"]) == (3, 5)
    assert r["jaccard"] == pytest.approx(0.6, abs=1e-9)
    # the planted sets really are the boundary case
    a, b = _trigrams(rows[0][1]), _trigrams(rows[1][1])
    assert (len(a & b), len(a | b)) == (3, 5)


def test_length_filter_boundary_pair_is_kept(spark, tmp_path):
    """r17: the PPJoin LENGTH filter prunes candidate pairs with
    tau-incompatible set sizes (DEN*min(sz) >= NUM*max(sz)) before
    verification, and the POSITIONAL filter prunes collision rows whose
    overlap bound 1 + min(sza-pa, szb-pb) cannot reach the required
    (DEN+NUM)*o >= NUM*(sza+szb). The sharpest case is a SUBSET pair
    sitting exactly on ALL THREE boundaries at once: |A| = 3 trigrams,
    |B| = 5, A ⊂ B gives J = 3/5 = tau, min/max = 3/5 = tau, AND the
    pair's single prefix collision (B's two unique trigrams are df=1 so
    they fill B's prefix first; the smallest common trigram lands at
    pa=1, pb=3) has bound 8*(1+min(2,2)) = 24 = 3*(3+5) exactly — a
    strict inequality or an off-by-one in ANY of the three filters
    silently drops it."""
    rows = [
        # 5 tokens -> 3 trigrams; B extends A by 2 tokens -> 5 trigrams
        # containing all of A's -> inter 3, union 5, J = 3/5 exactly,
        # and sizes (3, 5) sit exactly on the length-filter boundary.
        (1, "alpha bravo charlie delta echo"),
        (2, "alpha bravo charlie delta echo foxtrot golfer"),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in REGISTRY["jaccard_prefix_filter_pairs"].spark(spark, str(tmp_path)).collect()
    }
    assert set(got) == {(1, 2)}
    assert (got[(1, 2)]["n_inter"], got[(1, 2)]["n_union"]) == (3, 5)
    a, b = _trigrams(rows[0][1]), _trigrams(rows[1][1])
    assert (len(a), len(b), len(a & b)) == (3, 5, 3)


def test_lossless_vs_bruteforce_and_prefix_prunes(spark):
    """On the real corpus the emitted pair set equals a brute-force
    all-shared-shingle Python recompute (zero false negatives AND zero
    false positives), and the prefix candidate space is strictly
    smaller than the share-any-shingle pair space it replaces."""
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    con.close()
    tri = {i: _trigrams(t) for i, t in docs}
    tri = {i: s for i, s in tri.items() if s}
    ids = sorted(tri)
    expect = {}
    n_share = 0
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(tri[a] & tri[b])
            if inter == 0:
                continue
            n_share += 1
            union = len(tri[a]) + len(tri[b]) - inter
            if PPJ_TAU_DEN * inter >= PPJ_TAU_NUM * union:
                expect[(a, b)] = (inter, union)
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_inter"], r["n_union"])
        for r in REGISTRY["jaccard_prefix_filter_pairs"].spark(spark, SF).collect()
    }
    assert got == expect
    assert len(expect) > 0  # non-vacuous on the shipped corpus
    # pruning is real: far fewer verified candidates than sharing pairs
    assert len(expect) < n_share
