"""Planted-fixture pins for the round-6g curation operators (SemDedup /
DSIR / bigram-LM perplexity): the oracle parity check proves the two
engines agree; these prove the operators do the RIGHT thing on corpora
built to trigger their decision rules."""

from __future__ import annotations

import pandas as pd

from data_engineering_rag_spark.plans.curationq import (
    DSIR_TARGET_SOURCE,
    SEMDEDUP_COS,
    bigram_lm_perplexity_buckets,
    dsir_importance_scores,
    semantic_cluster_dedup,
)


def _write_embeddings(tmp_path, vecs, labels):
    pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [[float(x) for x in v] for v in vecs],
            "label": pd.array(labels, dtype="int32"),
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)
    return str(tmp_path)


def _write_docs(tmp_path, rows):
    """rows: (doc_id, text, source)."""
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": [r[2] for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_semdedup_drops_planted_duplicate_keeps_first(spark, tmp_path):
    # label 0: v0 and its near-copy v1 (cos ~0.99995 >= threshold);
    # label 1: v2 and v3 near-orthogonal (cos ~0.01 < threshold).
    sf = _write_embeddings(
        tmp_path,
        [
            [1.0, 0.0, 0.0, 0.0],
            [1.0, 0.01, 0.0, 0.0],
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 0.01, 1.0],
        ],
        [0, 0, 1, 1],
    )
    rows = {r.vec_id: r for r in semantic_cluster_dedup(spark, sf).collect()}
    assert len(rows) == 4
    assert rows[0].is_kept and rows[0].n_dup_lower == 0
    # the higher id of the duplicate pair is dropped (first-survivor)
    assert not rows[1].is_kept and rows[1].n_dup_lower == 1
    assert rows[1].max_cos_lower >= SEMDEDUP_COS
    # near-orthogonal cluster-mates both survive
    assert rows[2].is_kept and rows[3].is_kept
    assert rows[2].cluster_id == rows[3].cluster_id == 1


def test_semdedup_keep_flag_consistent_and_min_id_survives(spark, sf_dir):
    rows = semantic_cluster_dedup(spark, sf_dir).collect()
    assert rows, "sample produced no vectors"
    by_cluster: dict[int, list] = {}
    for r in rows:
        assert r.is_kept == (r.n_dup_lower == 0)
        assert (r.max_cos_lower is None) == (r.n_dup_lower == 0)
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for members in by_cluster.values():
        # the lowest id in a cluster has no lower-id mate -> always kept
        assert min(members, key=lambda r: r.vec_id).is_kept


def test_dsir_scores_target_lookalike_above_background(spark, tmp_path):
    # target vocabulary {alpha..} vs background {delta..}; the scored
    # docs repeat one vocabulary each -> the target-lookalike must
    # score strictly higher than the background-lookalike.
    target_text = "alpha beta gamma alpha beta gamma"
    background_text = "delta epsilon zeta delta epsilon zeta"
    rows = [(i, target_text, DSIR_TARGET_SOURCE) for i in range(5)]
    rows += [(5 + i, background_text, "srcX") for i in range(5)]
    rows += [(10, target_text, "srcX"), (11, background_text, "srcX")]
    sf = _write_docs(tmp_path, rows)
    got = {r.doc_id: r for r in dsir_importance_scores(spark, sf).collect()}
    assert got[10].dsir_score > got[11].dsir_score
    # lookalike scores the same as real target docs (same token stream)
    assert got[10].dsir_score == got[0].dsir_score
    assert got[10].n_tokens == 6


def test_bigram_lm_gibberish_lands_in_tail(spark, tmp_path):
    # 40 fluent docs share one bigram distribution (about half land in
    # the hash-train slice - enough mass either way); one OOV doc maps
    # entirely to <unk> whose bigrams are unseen -> maximal nll.
    fluent = "the cat sat on the mat and the cat sat"
    rows = [(i, fluent, "srcA") for i in range(40)]
    rows.append((40, "qqq www vvv xxx yyy", "srcA"))
    sf = _write_docs(tmp_path, rows)
    got = {r.doc_id: r for r in bigram_lm_perplexity_buckets(spark, sf).collect()}
    assert len(got) == 41
    worst = max(got.values(), key=lambda r: r.log_ppl)
    assert worst.doc_id == 40
    assert got[40].ppl_bucket == "tail"
    assert got[0].ppl_bucket == "head"
    assert got[40].log_ppl > got[0].log_ppl


def test_nb_classifier_separates_disjoint_vocabularies(spark, tmp_path):
    from data_engineering_rag_spark.plans.curationq import nb_source_confusion

    # two sources with disjoint vocabularies: whatever docs the hash
    # split holds out must classify back to their own source.
    rows = [(i, "alpha beta alpha gamma beta", "srcA") for i in range(30)]
    rows += [(30 + i, "delta epsilon delta zeta epsilon", "srcB") for i in range(30)]
    sf = _write_docs(tmp_path, rows)
    got = nb_source_confusion(spark, sf).collect()
    assert got, "hash split left no held-out docs"
    for r in got:
        assert r.true_source == r.pred_source, got
    assert {r.true_source for r in got} == {"srcA", "srcB"}


def test_funnel_planted_docs_drop_at_their_stage(spark, tmp_path):
    from data_engineering_rag_spark.plans.curationq import pipeline_retention_funnel

    # >100 chars, no digits, non-repeating (distinct 5-gram shingles)
    long_pad = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliett "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
    )
    rows = [
        (0, long_pad + "unique zero", "srcA"),        # survives everything
        (1, "short", "srcA"),                          # fails min_chars
        (2, "1234567890" * 30, "srcA"),                # digits: fails digit_frac
        (3, "abcde" * 60, "srcA"),                     # fails repetition cap
        (4, long_pad + "unique four", "srcA"),         # survives everything
        (5, long_pad + "unique zero", "srcA"),         # exact dup of doc 0 -> dropped at dedup
    ]
    sf = _write_docs(tmp_path, rows)
    got = {r.stage: r for r in pipeline_retention_funnel(spark, sf).collect()}
    assert got["raw"].n_docs == 6 and got["raw"].retention == 1.0
    assert got["min_chars"].n_docs == 5
    assert got["digit_frac"].n_docs == 4
    assert got["repetition"].n_docs == 3
    assert got["exact_dedup"].n_docs == 2
    # monotone non-increasing by construction
    ordered = sorted(got.values(), key=lambda r: r.stage_order)
    for a, b in zip(ordered, ordered[1:]):
        assert a.n_docs >= b.n_docs and a.n_chars >= b.n_chars


def test_curriculum_rank_is_permutation_in_signal_order(spark, sf_dir):
    from data_engineering_rag_spark.plans.curationq import curriculum_order_assign

    rows = curriculum_order_assign(spark, sf_dir).collect()
    ranks = sorted(r.curriculum_rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    by_rank = sorted(rows, key=lambda r: r.curriculum_rank)
    for a, b in zip(by_rank, by_rank[1:]):
        assert (a.n_tokens, a.mean_tok_len, a.doc_id) < (b.n_tokens, b.mean_tok_len, b.doc_id)


def test_dup_span_merges_overlapping_shingles(spark, tmp_path):
    from data_engineering_rag_spark.plans.curationq import dup_span_stats

    shared = "the quick brown fox jumps over the lazy dog while rain falling"  # 62 chars
    assert len(shared) == 62
    uniq_a = "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk llll "
    uniq_b = "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq pppp oooo "
    rows = [
        (0, uniq_a + shared, "srcA"),
        (1, shared + uniq_b, "srcA"),
        (2, "m" * 200, "srcA"),  # self-repetitive: every 50-gram identical
        # long but shares no 50-gram with any doc (incl. itself)
        (3, "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo", "srcA"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = {r.doc_id: r for r in dup_span_stats(spark, sf).collect()}
    # the 62-char shared block merges its 13 overlapping 50-grams into
    # ONE maximal span of exactly 62 chars in each doc
    assert got[0].n_dup_spans == 1 and got[0].dup_chars == 62
    assert got[1].n_dup_spans == 1 and got[1].dup_chars == 62
    # the self-repeating doc is one wall-to-wall duplicate span
    assert got[2].n_dup_spans == 1 and got[2].dup_chars == 200
    assert got[2].dup_frac == 1.0
    # no duplicated 50-gram -> absent from the result
    assert 3 not in got


def test_bigram_lm_buckets_are_ordered(spark, sf_dir):
    rows = bigram_lm_perplexity_buckets(spark, sf_dir).collect()
    by_bucket: dict[str, list[float]] = {"head": [], "middle": [], "tail": []}
    for r in rows:
        assert r.n_bigrams >= 1
        by_bucket[r.ppl_bucket].append(r.log_ppl)
    assert by_bucket["head"] and by_bucket["tail"]
    if by_bucket["middle"]:
        assert max(by_bucket["head"]) <= min(by_bucket["middle"])
        assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    else:
        assert max(by_bucket["head"]) <= min(by_bucket["tail"])


def _dup_spans_reference(texts, k=50):
    """Brute-force duplicate-span reference: positions of k-grams
    occurring >=2 times corpus-wide, merged into maximal intervals."""
    from collections import Counter

    counts = Counter()
    for t in texts.values():
        for i in range(len(t) - k + 1):
            counts[t[i : i + k]] += 1
    out = {}
    for doc_id, t in texts.items():
        hits = [i for i in range(len(t) - k + 1) if counts[t[i : i + k]] >= 2]
        if not hits:
            continue
        spans = []
        for i in hits:
            if spans and i <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], i + k)
            else:
                spans.append([i, i + k])
        out[doc_id] = (len(spans), sum(e - s for s, e in spans))
    return out


def test_dup_span_matches_bruteforce_on_random_corpora(spark, tmp_path):
    """Deterministic pseudo-random 'ab'-alphabet corpora are dense in
    repeated 50-grams — the Spark pipeline must agree with the
    brute-force reference on span count and duplicated char mass."""
    import random

    from data_engineering_rag_spark.plans.curationq import DUP_SPAN_K, dup_span_stats

    rng = random.Random(20260814)
    for trial in range(3):
        texts = {
            i: "".join(rng.choice("ab") for _ in range(rng.randint(55, 130)))
            for i in range(12)
        }
        d = tmp_path / f"trial{trial}"
        d.mkdir()
        sf = _write_docs(d, [(i, t, "srcA") for i, t in texts.items()])
        got = {
            r.doc_id: (r.n_dup_spans, r.dup_chars)
            for r in dup_span_stats(spark, sf).collect()
        }
        want = _dup_spans_reference(texts, DUP_SPAN_K)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_neyman_allocation_oversamples_high_variance_stratum(spark, tmp_path):
    """Planted two-stratum fixture: equal sizes, one stratum with 10×
    the length spread — Neyman must shift budget to it while
    proportional stays 50/50; totals stay within rounding of the
    budget."""
    import pandas as pd

    from data_engineering_rag_spark.plans.curationq import (
        NEYMAN_BUDGET,
        neyman_budget_allocation,
    )

    rows = []
    # 'wide': lengths alternate 100/10000 (huge sd); 'tight': 5000±1
    for i in range(40):
        rows.append((i, "x", "wide", "w", 100 if i % 2 else 10_000))
    for i in range(40, 80):
        rows.append((i, "x", "tight", "w", 5_000 + (i % 2)))
    pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"]).to_parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {r.lang: r for r in neyman_budget_allocation(spark, str(tmp_path)).collect()}
    assert got["wide"].proportional_n == got["tight"].proportional_n == NEYMAN_BUDGET // 2
    assert got["wide"].neyman_n > 0.99 * NEYMAN_BUDGET  # ~all budget to the wide stratum
    assert abs(got["wide"].neyman_n + got["tight"].neyman_n - NEYMAN_BUDGET) <= 1
