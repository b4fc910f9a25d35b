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


def test_ml_lsh_memo_reuses_fits_and_pins_equal_results(spark, sf_dir, monkeypatch):
    """r15 (VERDICT item 5): with SPARK_GRAFT_TFIDF_REUSE=1 and a
    memo_key, repeat calls reuse the fitted CV+LSH pair (zero new fits)
    and return EXACTLY the flag-off results; without memo_key the memo
    is bypassed even with the flag on."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    from data_engineering_rag_spark.operators import lsh_ml

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    probes = [0, 3]

    def run(**kw):
        return sorted(
            (r.probe_id, r.doc_id, r.jaccard_dist)
            for r in ml_minhash_candidates(
                docs, jaccard_threshold=0.5, num_hash_tables=8,
                probe_ids=probes, **kw
            ).collect()
        )

    monkeypatch.delenv("SPARK_GRAFT_TFIDF_REUSE", raising=False)
    baseline = run()

    fits = {"cv": 0, "lsh": 0}
    real_cv_fit, real_lsh_fit = CountVectorizer.fit, MinHashLSH.fit
    monkeypatch.setattr(
        CountVectorizer, "fit",
        lambda self, ds: (fits.__setitem__("cv", fits["cv"] + 1), real_cv_fit(self, ds))[1],
    )
    monkeypatch.setattr(
        MinHashLSH, "fit",
        lambda self, ds: (fits.__setitem__("lsh", fits["lsh"] + 1), real_lsh_fit(self, ds))[1],
    )
    monkeypatch.setenv("SPARK_GRAFT_TFIDF_REUSE", "1")
    lsh_ml.clear_ml_lsh_memo()
    try:
        first = run(memo_key=("documents", "test-slice"))
        assert fits == {"cv": 1, "lsh": 1}
        second = run(memo_key=("documents", "test-slice"))
        assert fits == {"cv": 1, "lsh": 1}, "memo hit must not re-fit"
        assert first == second == baseline
        # no memo_key -> bypass even with the flag on (corpus identity
        # is the caller's guarantee; never guessed)
        run()
        assert fits == {"cv": 2, "lsh": 2}
    finally:
        lsh_ml.clear_ml_lsh_memo()
    assert not lsh_ml._ML_LSH_MEMO
