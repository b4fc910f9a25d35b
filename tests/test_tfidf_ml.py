"""SQL-path vs Spark-ML-path TF-IDF parity (SURVEY.md §4.3.2): same
corpus, same conventions, weights equal to 1e-9."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_rag_spark.operators.tfidf import build_tfidf
from data_engineering_rag_spark.operators.tfidf_ml import ml_tfidf_weights
from data_engineering_rag_spark.plans import load


def test_ml_path_matches_sql_path(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    sql_model = build_tfidf(docs, key_cols=["doc_id"], text_fields=["text"])
    sql_w = {(r.doc_id, r.term): r.w for r in sql_model.weights.collect()}
    ml_w = {(r.doc_id, r.term): r.w for r in ml_tfidf_weights(docs, ["doc_id"], "text").collect()}
    assert set(sql_w) == set(ml_w)
    worst = max(abs(sql_w[k] - ml_w[k]) for k in sql_w)
    assert worst < 1e-9, worst
