"""Property + degenerate-input tests for the round-2 pipeline ops:
packing invariants under random size distributions (hypothesis),
clustering on collapsed inputs, empty-overlap decontamination —
the behaviors a 100 TB run hits that fixed testdata doesn't."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType
from pyspark.sql.window import Window

from data_engineering_rag_spark.plans.pipelineq import PACK_BUDGET_CHARS

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def _pack(spark, rows):
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    cb = F.coalesce(F.sum("n_chars").over(w), F.lit(0))
    return df.select(
        "doc_id",
        "lang",
        "n_chars",
        F.floor(cb.cast("double") / PACK_BUDGET_CHARS).cast("long").alias("pack_id"),
    ).collect()


@settings(max_examples=15, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=2 * PACK_BUDGET_CHARS), min_size=1, max_size=60)
)
def test_sequence_pack_invariants(spark, sizes):
    rows = [(i, "xx", s) for i, s in enumerate(sizes)]
    packed = _pack(spark, rows)
    # every doc assigned exactly once
    assert len(packed) == len(sizes)
    by_pack: dict[int, list] = {}
    for r in sorted(packed, key=lambda r: r.doc_id):
        by_pack.setdefault(r.pack_id, []).append(r)
    pack_ids = sorted(by_pack)
    # packs are contiguous in doc order: doc ranges don't interleave
    last_max = -1
    for pid in pack_ids:
        ids = [r.doc_id for r in by_pack[pid]]
        assert min(ids) > last_max
        last_max = max(ids)
    # greedy bound: a pack's size minus its LAST doc is under budget
    # (only the tail doc may overflow), and pack_id matches the formula
    for pid in pack_ids:
        docs = by_pack[pid]
        total = sum(r.n_chars for r in docs)
        assert total - docs[-1].n_chars < PACK_BUDGET_CHARS


def test_pack_single_giant_doc_gets_own_pack(spark):
    rows = [(0, "xx", 10), (1, "xx", 10 * PACK_BUDGET_CHARS), (2, "xx", 10)]
    packed = {r.doc_id: r.pack_id for r in _pack(spark, rows)}
    # the giant doc starts in pack 0 (greedy), but the doc AFTER it
    # lands far past it — no doc shares the giant's overflow range
    assert packed[0] == packed[1] == 0 or packed[1] > packed[0]
    assert packed[2] > packed[1] or packed[2] >= 10


def test_kmeans_collapsed_vectors_no_crash(spark):
    """All-identical vectors: every point is distance 0 from the single
    surviving centroid position — must converge, not divide by zero."""
    from data_engineering_rag_spark.plans import REGISTRY

    rows = [(i, [0.5, 0.5, 0.5, 0.5], i % 3) for i in range(12)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/embeddings.parquet")
        out = REGISTRY["kmeans_lloyd_2iter"].spark(spark, d).collect()
    assert sum(r.n_members for r in out) == 12
    assert all(abs(r.wcss) < 1e-6 for r in out)


def test_decontaminate_no_overlap_is_empty(spark, tmp_path):
    from data_engineering_rag_spark.plans import REGISTRY

    rows = [(i, " ".join(f"ev{i}w{j}" for j in range(10)), "en", "s", 60) for i in range(10)]
    rows += [(i, " ".join(f"tr{i}w{j}" for j in range(10)), "en", "s", 60) for i in range(10, 30)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path / "noovl")
    import os

    os.makedirs(d, exist_ok=True)
    df.write.parquet(f"{d}/documents.parquet")
    assert REGISTRY["decontaminate_overlap"].spark(spark, d).count() == 0


def test_repetition_short_docs_excluded(spark, tmp_path):
    from data_engineering_rag_spark.plans import REGISTRY
    from data_engineering_rag_spark.plans.pipelineq import SHINGLE_REP_K

    rows = [(0, "abc", "en", "s", 3), (1, "a" * 50, "en", "s", 50)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path / "rep")
    df.write.parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in REGISTRY["repetition_stats"].spark(spark, d).collect()}
    assert set(got) == {1}  # len-3 doc has no 5-gram → excluded
    # 'aaaa...' is one distinct shingle repeated: dup fraction → (n-1)/n
    n = 50 - SHINGLE_REP_K + 1
    assert abs(got[1].dup_shingle_frac - (1 - 1 / n)) < 1e-8


def test_weighted_sample_favors_heavy_docs(spark, sf_dir):
    """The w-proportional sample must overrepresent long documents:
    mean n_chars in the sample > corpus mean (deterministically, since
    the sample is a pure hash function)."""
    import pyspark.sql.functions as F
    from data_engineering_rag_spark.plans import REGISTRY, load

    samp = REGISTRY["weighted_sample_docs"].spark(spark, sf_dir)
    m_s = samp.agg(F.avg("n_chars")).collect()[0][0]
    m_c = load(spark, sf_dir, "documents").agg(F.avg("n_chars")).collect()[0][0]
    assert m_s > m_c
