"""RagEngine facade: the reference workflow end-to-end through the
public API (read → prepare → index(chunk=True) → search top-5)."""

from __future__ import annotations

import zipfile

from pyspark.sql import functions as F

from data_engineering_rag_spark.api import RagEngine
from data_engineering_rag_spark.plans.ingestq import REPO_FILES


def _zip(tmp_path) -> str:
    zpath = str(tmp_path / "repo.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for p, c in REPO_FILES:
            if not p.endswith("/"):
                zf.writestr(p, c)
    return zpath


def test_reference_workflow_end_to_end(spark, tmp_path):
    eng = RagEngine(spark)
    files = eng.read_repo(_zip(tmp_path))
    corpus = eng.prepare(files)
    assert corpus.count() == 7  # parsed, filtered corpus

    idx = eng.index(corpus, chunk=True, chunking_params={"size": 50, "step": 25})
    try:
        hits = idx.search("summary checksum", k=5)
        rows = hits.collect()
        assert 0 < len(rows) <= 5
        assert {"filename", "start", "score"} <= set(hits.columns)
        # scores sorted descending
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)

        batch = idx.search_batch([(0, "summary"), (1, "welcome")], k=3)
        assert batch.where(F.col("query_id") == 0).count() <= 3
    finally:
        idx.unpersist()


def test_eval_question_api(spark, sf_dir):
    from data_engineering_rag_spark.plans import load

    eng = RagEngine(spark)
    docs = load(spark, sf_dir, "documents")
    qs = eng.generate_eval_questions(docs, sample_size=10)
    assert qs.count() == 30  # 3 per doc, reference convention
    assert qs.select("doc_id").distinct().count() == 10


def test_bm25_engine_option(spark):
    from data_engineering_rag_spark.api import Bm25Index

    eng = RagEngine(spark)
    corpus = spark.createDataFrame(
        [
            ("a.md", "spark joins shuffle data across executors"),
            ("b.md", "pandas runs on a single machine"),
            ("c.md", "broadcast joins avoid the shuffle for small tables"),
        ],
        ["filename", "content"],
    )
    idx = eng.index(corpus, engine="bm25", persist=False)
    assert isinstance(idx, Bm25Index)
    out = idx.search("shuffle joins", k=2).collect()
    assert [r.filename for r in out] == ["a.md", "c.md"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="engine"):
        eng.index(corpus, engine="lucene")
