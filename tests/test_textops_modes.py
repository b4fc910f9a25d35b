"""hash_mode parity for the MinHash/LSH family: the md5 (oracle) and
xxhash64 (production) base hashes must yield the SAME candidate-pair
set on a corpus with planted near-duplicates. The permutation family
and banding are identical; only the base shingle hash differs, and any
uniform hash preserves the minhash collision statistics — on a corpus
of exact-prefix near-dups with high shingle overlap, both modes must
flag the same pairs."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_engineering_rag_spark.plans.textops import (
    _lsh_candidate_pairs,
    _minhash_wide,
    _simhash_near_dup_pairs,
    _simhash_signatures,
)


@pytest.fixture(scope="module")
def dup_corpus_dir(tmp_path_factory):
    """documents.parquet with 3 planted near-dup groups + distinct docs."""
    base = [
        "the quick brown fox jumps over the lazy dog again and again in the field",
        "pack my box with five dozen liquor jugs before the long winter arrives",
        "sphinx of black quartz judge my vow said the strange old man yesterday",
    ]
    rows = []
    did = 0
    for t in base:
        # near-dup group: identical long prefix, tiny suffix change →
        # most shingles shared → minhash signatures collide per band
        for suffix in ("", " x"):
            rows.append((did, t * 3 + suffix))
            did += 1
    for i in range(10):  # filler docs with fully disjoint shingle sets
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
    d = tmp_path_factory.mktemp("dupcorpus")
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _pairs(spark, sf_dir, mode):
    # compare PAIR sets: n_shared_bands may legitimately differ by one
    # borderline band between base hashes (minhash is probabilistic per
    # band; the candidate set is what dedup consumes)
    return {
        (r.doc_a, r.doc_b) for r in _lsh_candidate_pairs(spark, sf_dir, hash_mode=mode).collect()
    }


def test_lsh_candidate_pairs_mode_parity(spark, dup_corpus_dir):
    md5_pairs = _pairs(spark, dup_corpus_dir, "md5")
    xxh_pairs = _pairs(spark, dup_corpus_dir, "xxhash64")
    # the planted dups must actually be caught — non-vacuous parity
    assert md5_pairs >= {(0, 1), (2, 3), (4, 5)}
    assert md5_pairs == xxh_pairs
    # and no filler doc appears in any candidate pair
    flagged = {d for p in md5_pairs for d in p}
    assert flagged <= {0, 1, 2, 3, 4, 5}


def test_minhash_wide_modes_same_shape(spark, dup_corpus_dir):
    md5_sig = _minhash_wide(spark, dup_corpus_dir, hash_mode="md5")
    xxh_sig = _minhash_wide(spark, dup_corpus_dir, hash_mode="xxhash64")
    assert md5_sig.columns == xxh_sig.columns
    assert md5_sig.count() == xxh_sig.count() == 16


def test_bad_hash_mode_raises(spark, dup_corpus_dir):
    with pytest.raises(ValueError, match="hash_mode"):
        _minhash_wide(spark, dup_corpus_dir, hash_mode="sha1").collect()


def test_simhash_pairs_mode_parity(spark, dup_corpus_dir):
    """The xxhash64 SimHash twin must flag the SAME near-dup pairs as
    the md5 (oracle) mode on planted duplicates: the vote pipeline is
    hash-agnostic for any uniform 60-bit hash, so high-overlap pairs
    land within the hamming radius under both."""
    def pairs(mode):
        return {
            (r.doc_a, r.doc_b)
            for r in _simhash_near_dup_pairs(spark, dup_corpus_dir, hash_mode=mode).collect()
        }

    md5_pairs = pairs("md5")
    xxh_pairs = pairs("xxhash64")
    # non-vacuous: the planted near-dup groups must be caught
    assert md5_pairs >= {(0, 1), (2, 3), (4, 5)}
    assert md5_pairs == xxh_pairs
    flagged = {d for p in md5_pairs for d in p}
    assert flagged <= {0, 1, 2, 3, 4, 5}


def test_simhash_signature_modes_same_shape(spark, dup_corpus_dir):
    md5_sig = _simhash_signatures(spark, dup_corpus_dir, hash_mode="md5")
    xxh_sig = _simhash_signatures(spark, dup_corpus_dir, hash_mode="xxhash64")
    assert md5_sig.columns == xxh_sig.columns == ["doc_id", "simhash"]
    assert md5_sig.count() == xxh_sig.count() == 16
    # every signature must fit the declared 60-bit budget (non-negative
    # long) in BOTH modes — pins the xxhash64 sign-mask
    for df in (md5_sig, xxh_sig):
        lo, hi = df.agg(F.min("simhash"), F.max("simhash")).first()
        assert lo >= 0 and hi < (1 << 60)


def test_bad_simhash_mode_raises(spark, dup_corpus_dir):
    with pytest.raises(ValueError, match="hash_mode"):
        _simhash_signatures(spark, dup_corpus_dir, hash_mode="sha1")


def test_token_sort_fingerprint_catches_reordered_docs(spark):
    """Reordered copies share a fingerprint (exact-hash dedup misses
    them); different multisets don't."""
    import pyspark.sql.functions as F
    from data_engineering_rag_spark.operators.tfidf import TOKEN_PATTERN

    docs = spark.createDataFrame(
        [
            (1, "spark joins shuffle data"),
            (2, "data shuffle spark joins"),   # same multiset, reordered
            (3, "spark joins shuffle data data"),  # extra token → different
        ],
        ["doc_id", "text"],
    )
    fp = F.md5(
        F.array_join(
            F.array_sort(F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0))),
            " ",
        )
    )
    fps = {r.doc_id: r.f for r in docs.select("doc_id", fp.alias("f")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
    exact = {r.doc_id: r.h for r in docs.select("doc_id", F.md5("text").alias("h")).collect()}
    assert exact[1] != exact[2]


def test_minhash_decontaminate_flags_planted_contamination(spark, tmp_path):
    """Positive-path pin for `minhash_decontaminate` (its driver oracle
    agrees on an EMPTY result over the all-distinct synthetic corpus):
    a train doc that near-dups an eval doc must be flagged, clean
    train docs must not."""
    from data_engineering_rag_spark.plans.pipelineq import (
        DECON_EVAL_DOCS,
        minhash_decontaminate,
    )

    leak = "the quick brown fox jumps over the lazy dog again and again in the field" * 3
    rows = [(0, leak)]  # eval doc (doc_id < DECON_EVAL_DOCS)
    rows += [
        (i, " ".join(f"ev{i}x{j}q{(i * 37 + j) * 7919}" for j in range(25)))
        for i in range(1, DECON_EVAL_DOCS)
    ]
    rows.append((DECON_EVAL_DOCS + 2, leak + " x"))  # contaminated train doc
    rows += [
        (DECON_EVAL_DOCS + 10 + i, " ".join(f"tr{i}x{j}q{(i * 31 + j) * 104729}" for j in range(25)))
        for i in range(8)
    ]
    df = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "fixture",
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)

    got = {r.doc_id: r.n_eval_matches for r in minhash_decontaminate(spark, str(tmp_path)).collect()}
    assert DECON_EVAL_DOCS + 2 in got and got[DECON_EVAL_DOCS + 2] >= 1
    assert set(got) == {DECON_EVAL_DOCS + 2}

    # production-hash twin flags the same train docs (mode parity)
    from data_engineering_rag_spark.plans.pipelineq import minhash_decontaminate_xxh

    got_xxh = {r.doc_id for r in minhash_decontaminate_xxh(spark, str(tmp_path)).collect()}
    assert got_xxh == set(got)


def test_simhash_topk_bounded_and_consistent_with_pairs(spark, dup_corpus_dir):
    """r16: the bounded twin must (a) emit <= SIMHASH_TOPK rows per
    doc_a BY CONSTRUCTION, (b) rank by (hamming, doc_b) with rn dense
    from 1, and (c) agree with the full pair query: every top-k edge
    appears in the pair set (as an unordered pair) and each doc's rank-1
    neighbor attains the doc's minimum pair-set hamming."""
    from collections import defaultdict

    from data_engineering_rag_spark.plans.textops import (
        SIMHASH_TOPK,
        _simhash_near_dup_pairs,
        _simhash_near_dup_topk,
    )

    topk = _simhash_near_dup_topk(spark, dup_corpus_dir, hash_mode="md5").collect()
    pairs = _simhash_near_dup_pairs(spark, dup_corpus_dir, hash_mode="md5").collect()
    assert topk and pairs  # planted dup groups must produce rows

    by_doc = defaultdict(list)
    for r in topk:
        by_doc[r.doc_a].append(r)
    pair_ham = {}
    for p in pairs:
        pair_ham[(p.doc_a, p.doc_b)] = p.hamming
        pair_ham[(p.doc_b, p.doc_a)] = p.hamming

    for doc, rows in by_doc.items():
        assert len(rows) <= SIMHASH_TOPK
        rows.sort(key=lambda r: r.rn)
        assert [r.rn for r in rows] == list(range(1, len(rows) + 1))
        ranked = [(r.hamming, r.doc_b) for r in rows]
        assert ranked == sorted(ranked)  # (hamming, doc_b) tie-break order
        for r in rows:
            assert pair_ham[(doc, r.doc_b)] == r.hamming
        doc_best = min(h for (a, _), h in pair_ham.items() if a == doc)
        assert rows[0].hamming == doc_best

    # symmetric coverage: every doc that appears in ANY pair has a
    # top-k list (the twin serves both endpoints, unlike doc_a < doc_b)
    docs_in_pairs = {p.doc_a for p in pairs} | {p.doc_b for p in pairs}
    assert docs_in_pairs == set(by_doc)


def test_simhash_topk_mode_parity(spark, dup_corpus_dir):
    from data_engineering_rag_spark.plans.textops import _simhash_near_dup_topk

    md5 = {
        (r.doc_a, r.doc_b, r.rn)
        for r in _simhash_near_dup_topk(spark, dup_corpus_dir, hash_mode="md5").collect()
    }
    xxh = {
        (r.doc_a, r.doc_b, r.rn)
        for r in _simhash_near_dup_topk(spark, dup_corpus_dir, hash_mode="xxhash64").collect()
    }
    # hamming VALUES differ across base hashes; on planted exact-prefix
    # dups the neighbor sets must agree (same property the pair-mode
    # parity test pins)
    assert {(a, b) for a, b, _ in md5} == {(a, b) for a, b, _ in xxh}
