"""Planted-fixture semantics pins for the round-6 corpus analytics
(plans/corpusq.py). The oracle parity suite proves cross-engine
agreement on the synthetic corpus; these prove the operators fire on
corpora BUILT to trigger them (the synthetic docs carry no Cyrillic,
markup, or contamination by construction)."""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import functions as F  # noqa: F401  (parity with sibling fixture tests)


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] if len(r) > 2 else "en" for r in rows],
            "source": [r[3] if len(r) > 3 else "fixture" for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def _write_embeddings(tmp_path, vecs):
    df = pd.DataFrame(
        {
            "vec_id": list(range(len(vecs))),
            "embedding": [[float(x) for x in v] for v in vecs],
            "label": [0] * len(vecs),
        }
    )
    df.to_parquet(tmp_path / "embeddings.parquet", index=False)
    return str(tmp_path)


def test_script_mix_flags_confusable_docs(spark, tmp_path):
    from data_engineering_rag_spark.plans.corpusq import script_mix_audit

    sf = _write_docs(
        tmp_path,
        [
            (1, "plain latin words only in this document"),
            (2, "latin text with планted кириллица inside"),  # mixed Latin+Cyrillic
            (3, "καθαρό greek μαζί with latin"),  # mixed Latin+Greek
        ],
    )
    row = script_mix_audit(spark, sf).collect()[0]
    assert row.n_docs == 3
    assert row.n_docs_cyrillic == 1 and row.n_docs_greek == 1
    assert row.n_mixed_script == 2
    assert 0.0 < row.avg_latin_ratio < 1.0


def test_markup_residue_counts_tags_and_entities(spark, tmp_path):
    from data_engineering_rag_spark.plans.corpusq import markup_residue_audit

    sf = _write_docs(
        tmp_path,
        [
            (1, "<p>hello</p> &amp; <b>world</b>"),  # 2 opening tags, 1 entity
            (2, "no markup at all here"),
        ],
    )
    row = markup_residue_audit(spark, sf).collect()[0]
    assert row.n_docs == 2 and row.n_docs_with_markup == 1
    assert row.total_tags == 2 and row.total_entities == 1
    assert row.avg_markup_ratio > 0.0


def test_context_length_buckets_exact_on_known_counts(spark, tmp_path):
    from data_engineering_rag_spark.plans.corpusq import context_length_buckets

    sf = _write_docs(
        tmp_path,
        [
            (1, "aa bb cc"),  # 3 tokens -> bucket p=1 (lo 2)
            (2, "aa bb cc dd ee"),  # 5 tokens -> p=2 (lo 4)
            (3, "aa bb cc dd ee ff gg hh"),  # 8 tokens -> p=3 (lo 8)
        ],
    )
    rows = {r.bucket_pow2: r for r in context_length_buckets(spark, sf).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].bucket_lo == 2 and rows[2].bucket_lo == 4 and rows[3].bucket_lo == 8
    assert rows[1].total_tokens == 3 and rows[2].total_tokens == 5 and rows[3].total_tokens == 8
    assert rows[1].cum_token_share == round(3 / 16, 8)
    assert rows[2].cum_token_share == round(8 / 16, 8)
    assert rows[3].cum_token_share == 1.0


def test_truncation_loss_counts_overflow_tokens(spark, tmp_path):
    from data_engineering_rag_spark.plans.corpusq import (
        MAX_SEQ_TOKENS,
        truncation_loss_audit,
    )

    long_doc = " ".join(["tok"] * (MAX_SEQ_TOKENS + 88))
    sf = _write_docs(tmp_path, [(1, long_doc), (2, "short doc here")])
    row = truncation_loss_audit(spark, sf).collect()[0]
    assert row.n_docs == 2 and row.n_truncated == 1
    assert row.tokens_lost == 88
    assert row.total_tokens == MAX_SEQ_TOKENS + 88 + 3


def test_vocab_coverage_curve_monotone_on_real_corpus(spark, sf_dir):
    from data_engineering_rag_spark.plans.corpusq import (
        VOCAB_CURVE_SIZES,
        vocab_coverage_curve,
    )

    rows = sorted(vocab_coverage_curve(spark, sf_dir).collect(), key=lambda r: r.vocab_size)
    assert [r.vocab_size for r in rows] == sorted(VOCAB_CURVE_SIZES)
    cov = [r.coverage for r in rows]
    assert cov == sorted(cov) and 0.0 < cov[0] and cov[-1] <= 1.0
    # a bigger budget never covers fewer tokens
    covered = [r.covered_tokens for r in rows]
    assert covered == sorted(covered)


def test_phrase_search_finds_top_bigram_positions(spark, tmp_path):
    from data_engineering_rag_spark.plans.corpusq import phrase_search_positions

    sf = _write_docs(
        tmp_path,
        [
            (1, "spark sql rocks"),
            (2, "spark sql rules"),
            (3, "other words entirely"),
        ],
    )
    rows = phrase_search_positions(spark, sf).collect()
    assert {(r.doc_id, r.pos) for r in rows} == {(1, 1), (2, 1)}
    assert all(r.gram == "spark sql" for r in rows)


def test_term_cooccur_pmi_ranks_exclusive_pair_first(spark, tmp_path):
    from data_engineering_rag_spark.plans.corpusq import term_cooccur_pmi_topk

    sf = _write_docs(
        tmp_path,
        [
            (1, "alpha beta gamma"),
            (2, "beta alpha gamma"),
            (3, "gamma delta"),
            (4, "gamma epsilon"),
        ],
    )
    rows = term_cooccur_pmi_topk(spark, sf).collect()
    top = rows[0]
    # alpha+beta co-occur in 2 docs, df 2 each, N=4: pmi = ln(2*4/(2*2)) = ln 2
    assert (top.term_a, top.term_b) == ("alpha", "beta")
    assert abs(top.pmi - round(math.log(2), 8)) < 1e-9
    assert top.n_ab == 2 and top.df_a == 2 and top.df_b == 2


def test_code_detect_flags_code_not_prose(spark, tmp_path):
    from data_engineering_rag_spark.plans.corpusq import code_detect_heuristic

    code = "def f(x):\n    y = (x);\n    z = [y];\n    return {z};\n"
    prose = "plain readable sentences with ordinary words and no symbols at all"
    sf = _write_docs(tmp_path, [(1, code, "en", "codey"), (2, prose, "en", "prosey")])
    rows = {r.source: r for r in code_detect_heuristic(spark, sf).collect()}
    assert rows["codey"].n_code_docs == 1
    assert rows["prosey"].n_code_docs == 0
    assert rows["codey"].avg_code_score > rows["prosey"].avg_code_score


def test_embedding_decontaminate_flags_planted_copy(spark, tmp_path):
    from data_engineering_rag_spark.plans.corpusq import (
        DECON_EVAL_VECS,
        embedding_decontaminate,
    )

    # 20 eval vecs + 5 train vecs; train DECON_EVAL_VECS+3 is an exact
    # copy of eval vec 7 -> cosine 1.0, contaminated.
    vecs = []
    for i in range(DECON_EVAL_VECS):
        # filler evals live in dims 1-2; every train vector lives in
        # dims 3-6, so fillers score exactly cosine 0 against all of
        # them (tie -> lowest train vec_id) and can't cross 0.62
        vecs.append([1.0, 0.05 * (i + 1), 0.0, 0.0, 0.0, 0.0])
    vecs[7] = [0.0, 0.0, 0.6, 0.8, 0.0, 0.0]
    vecs += [
        [0.0, 0.0, 0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 0.9, 0.1],
        [0.0, 0.0, 0.0, 0.0, 0.1, 1.0],
        [0.0, 0.0, 0.6, 0.8, 0.0, 0.0],  # planted copy (vec_id DECON_EVAL_VECS+3)
        [0.0, 0.0, 0.0, 0.0, 0.5, 0.5],
    ]
    sf = _write_embeddings(tmp_path, vecs)
    rows = {r.eval_vec_id: r for r in embedding_decontaminate(spark, sf).collect()}
    assert len(rows) == DECON_EVAL_VECS
    hit = rows[7]
    assert hit.train_vec_id == DECON_EVAL_VECS + 3
    assert hit.cosine == 1.0 and hit.contaminated
    # the orthogonal eval vectors must not be flagged; cosine-0 ties
    # resolve to the lowest train vec_id deterministically
    assert not rows[0].contaminated and not rows[19].contaminated
    assert rows[0].cosine == 0.0 and rows[0].train_vec_id == DECON_EVAL_VECS
