"""Spark ML fast path for TF-IDF (SURVEY.md §4.3.2).

The SQL formulation in ``operators.tfidf`` is the verifiable path (the
DuckDB oracle can check it); this module is the same math through Spark
ML's pipelined, Vector-based implementation — ``RegexTokenizer`` →
``CountVectorizer`` → ``IDF`` — for workloads that want the ML API
(model persistence, pipeline composition). ``tests/test_tfidf_ml.py``
pins the two paths equal to 1e-9.

``CountVectorizer`` (not ``HashingTF``) so terms keep their identity:
exact parity with the SQL path, no hash collisions. At very large
vocabularies HashingTF trades that exactness for O(1) memory — the
swap is one line here."""

from __future__ import annotations

from pyspark.ml.feature import IDF, CountVectorizer, RegexTokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tfidf import TOKEN_PATTERN


def ml_tfidf_weights(df: DataFrame, key_cols: list[str], text_field: str) -> DataFrame:
    """Fit the ML pipeline and explode the vectors back to the engine's
    canonical ``(keys..., term, w)`` long format (L2-normalized), so
    both paths are directly comparable."""
    tok = RegexTokenizer(
        inputCol=text_field,
        outputCol="_tokens",
        pattern=TOKEN_PATTERN,
        gaps=False,
        toLowercase=True,
        minTokenLength=2,
    )
    tokens = tok.transform(df)
    cv = CountVectorizer(inputCol="_tokens", outputCol="_tf", minDF=1.0)
    cv_model = cv.fit(tokens)
    tf = cv_model.transform(tokens)
    idf = IDF(inputCol="_tf", outputCol="_tfidf")  # smooth idf: ln((1+n)/(1+df))+1
    idf_model = idf.fit(tf)
    vecs = idf_model.transform(tf)

    vocab = cv_model.vocabulary
    vocab_df = vecs.sparkSession.createDataFrame(
        [(i, t) for i, t in enumerate(vocab)], ["term_idx", "term"]
    )

    # Vector → (idx, value) rows via the vector_to_array bridge. Two
    # convention gaps vs sklearn, both fixed here: Spark's IDF is
    # ln((1+n)/(1+df)) WITHOUT sklearn's trailing +1 — and since
    # tf·(idf+1) = tfidf + tf, adding the raw tf vector element-wise
    # restores it; and IDF does not L2-normalize (sklearn does).
    from pyspark.ml.functions import vector_to_array

    arr = vecs.select(
        *key_cols,
        F.zip_with(
            vector_to_array(F.col("_tfidf")),
            vector_to_array(F.col("_tf")),
            lambda x, y: x + y,
        ).alias("_a"),
    )
    exploded = arr.select(*key_cols, F.posexplode("_a").alias("term_idx", "w_raw")).where(
        F.col("w_raw") != 0.0
    )
    from pyspark.sql.window import Window

    doc_w = Window.partitionBy(*key_cols)
    normed = exploded.select(
        *key_cols,
        "term_idx",
        (F.col("w_raw") / F.sqrt(F.sum(F.col("w_raw") * F.col("w_raw")).over(doc_w))).alias("w"),
    )
    return normed.join(F.broadcast(vocab_df), "term_idx").select(*key_cols, "term", "w")
