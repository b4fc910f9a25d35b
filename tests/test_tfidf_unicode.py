"""Unicode tokenization option (sklearn ``(?u)\\w`` parity gap): the
``token_mode="unicode"`` build must (a) keep accented/Cyrillic terms the
ASCII mode mangles, and (b) produce weights that hash-match a DuckDB
oracle using the SAME ``\\p{L}\\p{N}_`` pattern — Java regex and RE2
agree on the class, which is why the pattern is spelled with \\p escapes
instead of Java's (?U) flag (RE2 reads (?U) as 'ungreedy')."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from data_engineering_rag_spark.operators.tfidf import (
    UNICODE_TOKEN_PATTERN,
    build_tfidf,
    search_topk,
    tokenize_query,
)

DOCS = [
    (0, "café au lait et café noir"),
    (1, "naïve résumé naïve approach"),
    (2, "привет мир привет spark"),
    (3, "plain ascii words only here"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_unicode_weights_match_duckdb_oracle(spark, docs_df):
    model = build_tfidf(docs_df, key_cols=["doc_id"], text_fields=["text"], token_mode="unicode")
    got = sorted(
        (r.doc_id, r.term, round(r.w, 8))
        for r in model.weights.select("doc_id", "term", "w").collect()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = sorted(
        (int(d), t, round(w, 8))
        for d, t, w in con.execute(
            f"""
            WITH tok AS (
              SELECT doc_id, unnest(regexp_extract_all(lower(text), '{UNICODE_TOKEN_PATTERN}')) AS term
              FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
            ndocs AS (SELECT count(*) AS n_docs FROM documents),
            dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            idf AS (SELECT term, ln((1 + n_docs) / (1 + df)) + 1 AS idf FROM dfreq, ndocs),
            w AS (SELECT doc_id, tf.term, tf * idf AS w_raw FROM tf JOIN idf ON tf.term = idf.term),
            nrm AS (SELECT doc_id, sqrt(sum(w_raw * w_raw)) AS nrm FROM w GROUP BY doc_id)
            SELECT w.doc_id, w.term, w_raw / nrm AS w FROM w JOIN nrm ON w.doc_id = nrm.doc_id
            """
        ).fetchall()
    )
    assert got == want
    # non-vacuous: the unicode terms actually survived tokenization
    terms = {t for _, t, _ in got}
    assert {"café", "naïve", "résumé", "привет", "мир"} <= terms


def test_ascii_vs_unicode_term_split(spark, docs_df):
    ascii_model = build_tfidf(docs_df, key_cols=["doc_id"], text_fields=["text"])
    ascii_terms = {r.term for r in ascii_model.weights.select("term").distinct().collect()}
    # ASCII \w splits café → caf + (é dropped); unicode keeps it whole
    assert "caf" in ascii_terms and "café" not in ascii_terms
    assert "привет" not in ascii_terms


def test_unicode_search_roundtrip(spark, docs_df):
    model = build_tfidf(docs_df, key_cols=["doc_id"], text_fields=["text"], token_mode="unicode")
    top = search_topk(spark, model, "café", k=1).collect()
    assert [r.doc_id for r in top] == [0]
    # query tokenization follows the model's mode
    assert "café" in tokenize_query("café", "unicode")
    assert "café" not in tokenize_query("café", "ascii")


def test_bad_token_mode_raises(spark, docs_df):
    with pytest.raises(ValueError, match="token_mode"):
        build_tfidf(docs_df, key_cols=["doc_id"], text_fields=["text"], token_mode="latin1")
