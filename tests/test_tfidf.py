"""X1/X2: TF-IDF arithmetic vs hand-computed sklearn-convention values
(FIXTURES.md B8) and search behavior parity with minsearch semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_engineering_rag_spark.operators.tfidf import (
    build_tfidf,
    search_topk,
    tokenize_query,
)

# 3 tiny docs, ~6-term vocabulary.
DOCS = [
    (0, "spark join join"),
    (1, "spark window"),
    (2, "hash join table"),
]


def expected_weights():
    # sklearn conventions: tf raw count, idf = ln((1+n)/(1+df)) + 1, L2 norm.
    n = len(DOCS)
    tokens = {d: t.split() for d, t in DOCS}
    df: dict[str, int] = {}
    for toks in tokens.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    idf = {t: math.log((1 + n) / (1 + c)) + 1 for t, c in df.items()}
    out = {}
    for d, toks in tokens.items():
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        raw = {t: c * idf[t] for t, c in tf.items()}
        norm = math.sqrt(sum(w * w for w in raw.values()))
        for t, w in raw.items():
            out[(d, t)] = w / norm
    return out, idf


def test_weights_match_closed_form(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    model = build_tfidf(df, key_cols=["doc_id"], text_fields=["text"])
    got = {(r.doc_id, r.term): r.w for r in model.weights.collect()}
    exp, idf = expected_weights()
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-12, k
    got_idf = {r.term: r.idf for r in model.idf.collect()}
    for t in idf:
        assert abs(got_idf[t] - idf[t]) < 1e-12, t


def test_search_scores_are_cosines(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    model = build_tfidf(df, key_cols=["doc_id"], text_fields=["text"])
    hits = {r.doc_id: r.score for r in search_topk(spark, model, "spark join", k=3).collect()}
    exp_w, idf = expected_weights()
    q_raw = {t: idf[t] for t in ["spark", "join"]}
    qn = math.sqrt(sum(w * w for w in q_raw.values()))
    qv = {t: w / qn for t, w in q_raw.items()}
    for d in (0, 1, 2):
        exp_score = sum(exp_w.get((d, t), 0.0) * qw for t, qw in qv.items())
        assert abs(hits[d] - exp_score) < 1e-12, d


def test_oov_query_terms_drop(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    model = build_tfidf(df, key_cols=["doc_id"], text_fields=["text"])
    # 'zzz' is out-of-vocabulary: sklearn transform ignores it.
    with_oov = {r.doc_id: r.score for r in search_topk(spark, model, "spark zzz", k=3).collect()}
    without = {r.doc_id: r.score for r in search_topk(spark, model, "spark", k=3).collect()}
    assert with_oov == without


def test_empty_query_returns_empty(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    model = build_tfidf(df, key_cols=["doc_id"], text_fields=["text"])
    assert search_topk(spark, model, "...", k=3).count() == 0


def test_tokenizer_matches_sklearn_pattern():
    # sklearn token_pattern (?u)\b\w\w+\b: 2+ word chars, maximal runs.
    assert tokenize_query("Spark JOIN a b2c x") == {"spark": 1, "join": 1, "b2c": 1}
    assert tokenize_query("a-b c_d") == {"c_d": 1}
    assert tokenize_query("") == {}


def test_two_field_boosted_search(spark):
    # minsearch sums per-field cosine × boost (Index(text_fields=[...])).
    rows = [(0, "spark join", "intro.md"), (1, "hash table", "spark.md")]
    df = spark.createDataFrame(rows, ["doc_id", "content", "filename"])
    model = build_tfidf(df, key_cols=["doc_id"], text_fields=["content", "filename"])
    plain = {r.doc_id: r.score for r in search_topk(spark, model, "spark", k=2).collect()}
    boosted = {
        r.doc_id: r.score
        for r in search_topk(spark, model, "spark", k=2, boosts={"filename": 3.0}).collect()
    }
    # doc 1 matches 'spark' only via filename → 3× the plain field score.
    assert abs(boosted[1] - 3.0 * plain[1]) < 1e-12
    assert abs(boosted[0] - plain[0]) < 1e-12  # content-only match unchanged


def test_add_documents_frozen_idf(spark):
    """Incremental add: new docs are scored with the fitted idf (sklearn
    transform semantics) — searchable immediately, OOV terms dropped,
    old weights untouched."""
    import math

    from data_engineering_rag_spark.operators.tfidf import (
        add_documents,
        build_tfidf,
        search_topk,
    )

    base = spark.createDataFrame(
        [(0, "spark shuffle join"), (1, "pandas arrow batches")], ["doc_id", "text"]
    )
    model = build_tfidf(base, key_cols=["doc_id"], text_fields=["text"])
    before = {(r.doc_id, r.term): r.w for r in model.weights.collect()}

    new = spark.createDataFrame([(7, "spark window unseenterm")], ["doc_id", "text"])
    model2 = add_documents(model, new)
    after = {(r.doc_id, r.term): r.w for r in model2.weights.collect()}

    # old weights byte-identical, new doc present, OOV term absent
    assert {k: v for k, v in after.items() if k[0] != 7} == before
    new_terms = {t for (d, t) in after if d == 7}
    assert new_terms == {"spark"}  # 'window'/'unseenterm' are OOV vs the fitted vocab
    # frozen-idf arithmetic: w = tf*idf / ||vec||; single surviving term -> w = 1.0
    assert after[(7, "spark")] == pytest.approx(1.0, abs=1e-12)

    # and the new doc is immediately searchable
    got = search_topk(spark, model2, "spark", k=3).collect()
    assert 7 in {r.doc_id for r in got}


def test_add_documents_multi_term_norm(spark):
    import math

    from data_engineering_rag_spark.operators.tfidf import add_documents, build_tfidf

    base = spark.createDataFrame(
        [(0, "alpha beta beta"), (1, "alpha gamma")], ["doc_id", "text"]
    )
    model = build_tfidf(base, key_cols=["doc_id"], text_fields=["text"])
    idf = {r.term: r.idf for r in model.idf.collect()}
    new = spark.createDataFrame([(9, "alpha beta")], ["doc_id", "text"])
    after = {(r.doc_id, r.term): r.w for r in add_documents(model, new).weights.collect()}
    wa, wb = idf["alpha"], idf["beta"]
    nrm = math.sqrt(wa * wa + wb * wb)
    assert after[(9, "alpha")] == pytest.approx(wa / nrm, abs=1e-12)
    assert after[(9, "beta")] == pytest.approx(wb / nrm, abs=1e-12)


def test_search_topk_df_self_retrieval(spark):
    """A query that IS a doc's text must retrieve that doc at rank 1
    (cosine(v, v) = 1 beats every other doc); rank column is 1..k
    per query; batch path agrees with the single-query path."""
    from data_engineering_rag_spark.operators.tfidf import search_topk_df

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    model = build_tfidf(docs, key_cols=["doc_id"], text_fields=["text"])
    queries = spark.createDataFrame(
        [(qid, text) for qid, text in DOCS], ["query_id", "qtext"]
    )
    hits = search_topk_df(model, queries, ["query_id"], "qtext", k=2).collect()

    by_query = {}
    for r in hits:
        by_query.setdefault(r.query_id, []).append(r)
    assert set(by_query) == {0, 1, 2}
    for qid, rows in by_query.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert rows[0].doc_id == qid, f"query {qid} should self-retrieve first"
        assert rows[0].score == pytest.approx(1.0, abs=1e-9)

    # Agreement with the driver-list single-query path on ordering.
    single = search_topk(spark, model, DOCS[0][1], k=2).collect()
    batch0 = [r.doc_id for r in by_query[0]]
    assert [r.doc_id for r in single] == batch0


def test_save_load_roundtrip(spark, tmp_path):
    """A reloaded index must serve bit-identical search results and
    preserve the fitted configuration (incl. token_mode)."""
    from data_engineering_rag_spark.operators.tfidf import load_tfidf, save_tfidf

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    model = build_tfidf(docs, key_cols=["doc_id"], text_fields=["text"], token_mode="unicode")
    path = str(tmp_path / "idx")
    save_tfidf(model, path)
    reloaded = load_tfidf(spark, path)
    assert reloaded.key_cols == ["doc_id"]
    assert reloaded.text_fields == ["text"]
    assert reloaded.token_mode == "unicode"

    q = "spark join"
    orig = [(r.doc_id, round(r.score, 12)) for r in search_topk(spark, model, q, k=3).collect()]
    back = [(r.doc_id, round(r.score, 12)) for r in search_topk(spark, reloaded, q, k=3).collect()]
    assert orig == back


def test_rerank_stub_deterministic_and_pool_only(spark):
    """The stub scorer is a pure function (same pool → same scores)
    and scoring touches exactly the candidate pool rows."""
    from data_engineering_rag_spark.operators.rerank import rerank_stub, stub_xenc_score

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    a = rerank_stub(docs, "q1", key_col="doc_id", text_col="text").collect()
    b = rerank_stub(docs, "q1", key_col="doc_id", text_col="text").collect()
    assert sorted((r.doc_id, r.xenc_score) for r in a) == sorted(
        (r.doc_id, r.xenc_score) for r in b
    )
    assert len(a) == len(DOCS)
    r0 = next(r for r in a if r.doc_id == 0)
    assert r0.xenc_score == stub_xenc_score("q1", "0", DOCS[0][1])
    # Different query → different scores (the query reaches the scorer).
    c = {r.doc_id: r.xenc_score for r in rerank_stub(docs, "q2", "doc_id", "text").collect()}
    assert any(c[r.doc_id] != r.xenc_score for r in a)


def test_min_max_df_pruning(spark):
    from data_engineering_rag_spark.operators.tfidf import build_tfidf

    # 4 docs: 'common' in all 4, 'pair' in 2, 'hapax*' in 1 each.
    df = spark.createDataFrame(
        [
            (1, "common pair hapax1"),
            (2, "common pair hapax2"),
            (3, "common hapax3"),
            (4, "common hapax4"),
        ],
        ["doc_id", "text"],
    )
    model = build_tfidf(df, ["doc_id"], ["text"], min_df=2, max_df=0.75)
    vocab = {r.term for r in model.idf.select("term").distinct().collect()}
    assert vocab == {"pair"}  # hapax dropped by min_df, 'common' (4/4 > .75) by max_df

    # pruned vectors renormalize: 'pair' alone → weight 1.0
    w = {(r.doc_id): r.w for r in model.weights.collect()}
    assert set(w) == {1, 2}
    assert all(abs(v - 1.0) < 1e-12 for v in w.values())


def test_bad_prune_params_raise(spark):
    import pytest as _pytest

    from data_engineering_rag_spark.operators.tfidf import build_tfidf

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        build_tfidf(df, ["doc_id"], ["text"], min_df=0)
    with _pytest.raises(ValueError):
        build_tfidf(df, ["doc_id"], ["text"], max_df=0.0)


def test_term_frequencies_match_groupby_reference(spark):
    """The narrow run-length tf (no token-stream shuffle) must emit
    exactly the rows the classic explode->groupBy(doc, term) produces —
    including unicode mode, repeated terms, and empty/token-free docs
    (which emit nothing either way)."""
    from pyspark.sql import functions as F

    from data_engineering_rag_spark.operators.tfidf import (
        _term_frequencies,
        _tokens,
        token_pattern_for,
    )

    docs = spark.createDataFrame(
        [
            (1, "the the the quick brown the fox fox"),
            (2, "alpha beta beta GAMMA gamma alpha alpha"),
            (3, ""),
            (4, "x y z"),  # all single-char: zero \w\w+ tokens
            (5, "naïve café naïve café naïve"),
        ],
        ["doc_id", "text"],
    )
    for mode in ("ascii", "unicode"):
        pat = token_pattern_for(mode)
        ref = (
            _tokens(docs, ["doc_id"], "text", pat)
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        got = _term_frequencies(docs, ["doc_id"], "text", pat)
        diff = (
            ref.alias("a")
            .join(got.alias("b"), ["doc_id", "term"], "full")
            .where("a.tf IS DISTINCT FROM b.tf")
            .count()
        )
        assert diff == 0, mode


def test_merged_fragments_equal_direct_build(spark):
    """Shard-then-merge must be indistinguishable from one build:
    identical vocab/idf, weights equal to float precision."""
    from data_engineering_rag_spark.operators.tfidf import (
        build_tfidf,
        merge_tf_fragments,
        shard_tf_fragment,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles data across the cluster"),
            (2, "the cluster runs spark jobs"),
            (3, "duckdb runs on one node"),
            (4, "one node is enough for small data"),
        ],
        "doc_id long, content string",
    )
    direct = build_tfidf(docs, ["doc_id"], ["content"])
    frags = [
        shard_tf_fragment(docs.where(F.col("doc_id") % 2 == i), ["doc_id"], "content")
        for i in (0, 1)
    ]
    merged = merge_tf_fragments(frags, ["doc_id"], "content")

    d_idf = {(r.term): r.idf for r in direct.idf.collect()}
    m_idf = {(r.term): r.idf for r in merged.idf.collect()}
    assert d_idf == m_idf  # integer df/N inputs -> bit-identical idf

    d_w = {(r.doc_id, r.term): r.w for r in direct.weights.collect()}
    m_w = {(r.doc_id, r.term): r.w for r in merged.weights.collect()}
    assert d_w.keys() == m_w.keys()
    assert all(abs(d_w[k] - m_w[k]) < 1e-12 for k in d_w)


def test_merge_prunes_on_global_df_not_shard_df(spark):
    """A term hapax in EVERY shard but present across shards has
    global df=2 — min_df=2 must keep it after the merge (per-shard
    pruning would have dropped it; that's why fragments carry tf, not
    pruned models)."""
    from data_engineering_rag_spark.operators.tfidf import (
        merge_tf_fragments,
        shard_tf_fragment,
    )

    docs = spark.createDataFrame(
        [(1, "zebra alpha alpha"), (2, "zebra beta beta")],
        "doc_id long, content string",
    )
    frags = [
        shard_tf_fragment(docs.where(F.col("doc_id") == i), ["doc_id"], "content")
        for i in (1, 2)
    ]
    merged = merge_tf_fragments(frags, ["doc_id"], "content", min_df=2)
    vocab = {r.term for r in merged.idf.collect()}
    assert vocab == {"zebra"}  # alpha/beta are global hapax; zebra survives


def test_tfidf_reuse_mode_memoizes_and_matches(spark, monkeypatch):
    """r13 (VERDICT r12 item 4): with SPARK_GRAFT_TFIDF_REUSE=1 the
    eight docs-model consumers share ONE persisted index per
    (session, sf_dir) — and the reused results are byte-identical to
    the self-contained default. Default (env unset) must not memoize:
    every registered query stays oracle-self-contained."""
    from data_engineering_rag_spark.plans import REGISTRY, rag

    sf = "/root/testdata/sf0.001"
    base_weights = REGISTRY["tfidf_doc_weights"].spark(spark, sf).collect()
    base_rocchio = REGISTRY["tfidf_search_rocchio"].spark(spark, sf).collect()
    assert rag._TFIDF_MEMO == {}, "default mode must not populate the memo"

    monkeypatch.setenv("SPARK_GRAFT_TFIDF_REUSE", "1")
    try:
        w1 = REGISTRY["tfidf_doc_weights"].spark(spark, sf).collect()
        assert (spark, sf, "docs") in rag._TFIDF_MEMO
        model = rag._TFIDF_MEMO[(spark, sf, "docs")]
        r1 = REGISTRY["tfidf_search_rocchio"].spark(spark, sf).collect()
        # second consumer reused the SAME model object (no rebuild)
        assert rag._TFIDF_MEMO[(spark, sf, "docs")] is model
        assert sorted(map(tuple, w1)) == sorted(map(tuple, base_weights))
        assert sorted(map(tuple, r1)) == sorted(map(tuple, base_rocchio))
    finally:
        for m in rag._TFIDF_MEMO.values():
            m.unpersist()
        rag._TFIDF_MEMO.clear()


def test_tfidf_memo_evicts_other_scopes_and_clears(spark, monkeypatch):
    """r14 ADVICE: the reuse memo must not grow without bound across
    sf_dirs — inserting a model for a new (session, sf_dir) evicts and
    unpersists every other scope's entries, and clear_tfidf_memo()
    empties the memo entirely (the between-bench-legs hook)."""
    from data_engineering_rag_spark.plans import REGISTRY, rag

    monkeypatch.setenv("SPARK_GRAFT_TFIDF_REUSE", "1")
    try:
        REGISTRY["tfidf_doc_weights"].spark(spark, "/root/testdata/sf0.001").collect()
        assert (spark, "/root/testdata/sf0.001", "docs") in rag._TFIDF_MEMO
        old_model = rag._TFIDF_MEMO[(spark, "/root/testdata/sf0.001", "docs")]
        REGISTRY["tfidf_doc_weights"].spark(spark, "/root/testdata/sf0.01").collect()
        # the old scope's entry is gone and its tables unpersisted
        assert (spark, "/root/testdata/sf0.001", "docs") not in rag._TFIDF_MEMO
        assert not old_model.weights.is_cached
        assert (spark, "/root/testdata/sf0.01", "docs") in rag._TFIDF_MEMO
        new_model = rag._TFIDF_MEMO[(spark, "/root/testdata/sf0.01", "docs")]
        rag.clear_tfidf_memo()
        assert rag._TFIDF_MEMO == {}
        assert not new_model.weights.is_cached
    finally:
        rag.clear_tfidf_memo()
