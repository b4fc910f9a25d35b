"""Non-vacuous goldens for the pipeline ops: the synthetic documents
contain no PII-shaped text (oracle parity alone would pass on identity
output), so redaction is pinned here on planted emails/URLs/ids; the
split/rebalance determinism contract is pinned on re-run stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_rag_spark.plans import REGISTRY
from data_engineering_rag_spark.plans.pipelineq import _bucket_col


def test_pii_redact_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact bob.smith+hr@example.co.uk or call 5551234567 today"),
            (2, "see https://spark.apache.org/docs/latest?x=1234567 for info"),
            (3, "id 12345 stays (short), 1234567 goes"),
            (4, "no pii here"),
        ],
        ["doc_id", "text"],
    )
    # pii_redact loads from sf_dir; drive the same column expressions
    # over the planted fixture directly
    from data_engineering_rag_spark.plans.pipelineq import _EMAIL_RE, _NUM_RE, _URL_RE

    out = docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"), _URL_RE, "<URL>"
            ),
            _NUM_RE,
            "<NUM>",
        ).alias("redacted"),
    )
    got = {r.doc_id: r.redacted for r in out.collect()}
    assert got[1] == "contact <EMAIL> or call <NUM> today"
    assert got[2] == "see <URL> for info"
    assert got[3] == "id 12345 stays (short), <NUM> goes"
    assert got[4] == "no pii here"


def test_split_assignment_is_stable_and_complete(spark, sf_dir):
    a = REGISTRY["dataset_split_assign"].spark(spark, sf_dir)
    b = REGISTRY["dataset_split_assign"].spark(spark, sf_dir)
    rows_a = {(r.doc_id, r.split) for r in a.collect()}
    rows_b = {(r.doc_id, r.split) for r in b.collect()}
    assert rows_a == rows_b  # no RNG anywhere: identical across runs
    splits = {s for _, s in rows_a}
    assert splits <= {"train", "val", "test"}
    n = len(rows_a)
    n_train = sum(1 for _, s in rows_a if s == "train")
    assert 0.6 * n < n_train < 0.95 * n  # ~80% modulo hash variance


def test_split_is_subset_stable(spark, sf_dir):
    """The 100 TB property: a row's split depends only on its key, so
    any subset of the corpus gets the same assignments."""
    from data_engineering_rag_spark.plans import load

    full = REGISTRY["dataset_split_assign"].spark(spark, sf_dir)
    full_map = {r.doc_id: r.split for r in full.collect()}
    subset = load(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0)
    sub = subset.select("doc_id", _bucket_col(F.col("doc_id")).alias("bucket"))
    for r in sub.collect():
        split = "train" if r.bucket < 80 else ("val" if r.bucket < 90 else "test")
        assert full_map[r.doc_id] == split


def test_stratified_rebalance_shrinks_en_only(spark, sf_dir):
    from data_engineering_rag_spark.plans import load

    before = {
        r.lang: r.n
        for r in load(spark, sf_dir, "documents").groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    after = {
        r.lang: r.n
        for r in REGISTRY["stratified_rebalance"]
        .spark(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert after["en"] < before["en"] * 0.5  # en downsampled to ~25%
    for lang in before:
        if lang != "en":
            assert after.get(lang) == before[lang]  # tail kept whole


def test_bpe_fold_matches_python_reference(spark):
    """The fold-based merge must implement greedy left-to-right
    non-overlapping replacement — pinned against a character-level
    Python reference on inputs with overlap chains (aaa, abab)."""
    from pyspark.sql import functions as F

    from data_engineering_rag_spark.plans.pipelineq import _bpe_fold_merge_expr

    def py_merge(tokens, a, b):
        out, i = [], 0
        while i < len(tokens):
            if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(tokens[i])
                i += 1
        return out

    cases = [
        (list("aaa"), "a", "a"),      # odd run: [aa, a]
        (list("aaaa"), "a", "a"),     # even run: [aa, aa]
        (list("abab"), "a", "b"),     # back-to-back pairs both merge
        (list("xabby"), "a", "b"),    # single interior match
        (list("ab"), "b", "a"),       # no match
        (["ab", "b"], "a", "b"),      # pre-existing merged token must NOT re-match
    ]
    df = spark.createDataFrame(
        [(i, toks, a, b) for i, (toks, a, b) in enumerate(cases)],
        "i int, ch array<string>, a string, b string",
    )
    for i, (toks, a, b) in enumerate(cases):
        got = (
            df.where(F.col("i") == i)
            .select(F.expr(_bpe_fold_merge_expr(a, b)).alias("m"))
            .collect()[0]
            .m
        )
        assert got == py_merge(toks, a, b), (toks, a, b, got)


def test_bpe_train_monotone_counts(spark, sf_dir):
    """Merge counts are non-increasing across rounds (each round takes
    the global argmax of a shrinking pair mass)."""
    from data_engineering_rag_spark.plans import REGISTRY

    rows = sorted(REGISTRY["bpe_train_merges"].spark(spark, sf_dir).collect())
    counts = [r.pair_count for r in rows]
    assert len(rows) == 3
    assert counts == sorted(counts, reverse=True)
