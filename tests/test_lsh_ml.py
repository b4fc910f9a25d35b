"""Spark ML MinHashLSH recall contract: the approx join must surface
every truly-similar pair (near-dups must not be missed; extra
candidates are fine — that's what verification passes are for)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_rag_spark.operators.lsh_ml import ml_minhash_candidates
from data_engineering_rag_spark.operators.tfidf import TOKEN_PATTERN
from data_engineering_rag_spark.plans import load


def exact_jaccard_pairs(spark, docs, threshold, strict=False):
    """All-pairs token-set Jaccard truth. ``strict`` matches
    ``approxSimilarityJoin``'s boundary (distance < 1-τ ⇔ similarity
    STRICTLY > τ); the default >= is the conservative recall truth."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0))
            )
        ).alias("term"),
    )
    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n", "na"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n", "nb"), "id_b")
        .withColumn("jac", F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")))
    )
    cond = F.col("jac") > threshold if strict else F.col("jac") >= threshold
    return {(r.id_a, r.id_b) for r in j.where(cond).collect()}


def test_ml_lsh_recall(spark, sf_dir):
    """LSH is probabilistic: with 8 OR-amplified tables a pair at
    jaccard j is missed with probability (1-j)^8 — ~0.4% at j=0.5,
    ~6e-5 at j=0.7. The contract: ≥95% recall at the 0.5 threshold and
    TOTAL recall for strongly-similar (≥0.7) pairs."""
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    truth_05 = exact_jaccard_pairs(spark, docs, 0.5)
    truth_07 = exact_jaccard_pairs(spark, docs, 0.7)
    cand = {
        (r.id_a, r.id_b)
        for r in ml_minhash_candidates(
            docs, jaccard_threshold=0.5, num_hash_tables=8
        ).collect()
    }
    missed = truth_05 - cand
    recall = 1 - len(missed) / max(len(truth_05), 1)
    assert recall >= 0.95, f"recall {recall:.3f}: missed {len(missed)}/{len(truth_05)}"
    strong_missed = truth_07 - cand
    assert not strong_missed, f"missed strongly-similar pairs: {sorted(strong_missed)[:5]}"
