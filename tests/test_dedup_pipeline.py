"""Behavioral pins for the end-to-end near-dup pipeline
(minhash_dedup_canonical) and SimHash banded pairs on a corpus with
PLANTED duplicate clusters — the sf corpora exercise oracle parity,
this fixture proves the pipeline actually clusters what it should:
planted dup groups come out as components with min-id canonicals, and
disjoint filler docs never appear."""

from __future__ import annotations

import pandas as pd
import pytest

from data_engineering_rag_spark.plans import REGISTRY


@pytest.fixture(scope="module")
def dup_corpus_dir(tmp_path_factory):
    base = [
        "the quick brown fox jumps over the lazy dog again and again in the field",
        "pack my box with five dozen liquor jugs before the long winter arrives",
        "sphinx of black quartz judge my vow said the strange old man yesterday",
    ]
    rows = []
    did = 0
    for t in base:
        # triple: two exact-prefix near-dups + one with a tiny edit →
        # one 3-doc cluster per base text after Jaccard verification
        for suffix in ("", " x", " y z"):
            rows.append((did, t * 3 + suffix))
            did += 1
    for i in range(10):  # disjoint filler
        rows.append((did, " ".join(f"tok{i}x{j}q{(i * 31 + j) * 7919}" for j in range(25))))
        did += 1
    df = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "fixture",
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    d = tmp_path_factory.mktemp("dedupcorpus")
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_minhash_dedup_canonical_clusters_planted_dups(spark, dup_corpus_dir):
    out = REGISTRY["minhash_dedup_canonical"].spark(spark, dup_corpus_dir)
    rows = {r.doc_id: (r.canonical_id, r.cluster_size) for r in out.collect()}
    # each planted triple clusters under its min doc_id
    for group in ((0, 1, 2), (3, 4, 5), (6, 7, 8)):
        for d in group:
            assert rows[d] == (group[0], 3), (d, rows.get(d))
    # filler docs form no clusters
    assert set(rows) == {0, 1, 2, 3, 4, 5, 6, 7, 8}


def test_simhash_near_dup_pairs_planted(spark, dup_corpus_dir):
    out = REGISTRY["simhash_near_dup_pairs"].spark(spark, dup_corpus_dir)
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in out.collect()}
    # near-identical token multisets → tiny hamming distance; all three
    # planted pairs-within-triples must surface
    for a, b in ((0, 1), (1, 2), (0, 2), (3, 4), (6, 7)):
        assert (a, b) in pairs, (a, b, sorted(pairs))
        assert pairs[(a, b)] <= 8
    # no filler doc in any pair
    flagged = {d for p in pairs for d in p}
    assert flagged <= set(range(9))
