"""Planted-fixture semantics pins for round-5 pipeline operators (the
oracle parity checks agree cross-engine on real data; these document
the intended behavior on corpora BUILT to trigger it)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "fixture",
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_line_dedup_drops_exactly_repeated_long_lines(spark, tmp_path):
    from data_engineering_rag_spark.plans.pipelineq import line_dedup_clean

    boiler = "This is the repeated license header line of the corpus"
    short = "short ln"  # < 10 chars trimmed -> never deduped
    sf = _write_docs(
        tmp_path,
        [
            (1, f"{boiler}\nunique first body line\n{short}"),
            (2, f"{boiler}\nanother unique body line\n{short}"),
            (3, f"{boiler}\n{boiler}\nthird unique body line"),
        ],
    )
    got = {r.doc_id: r for r in line_dedup_clean(spark, sf).collect()}

    # doc 1 owns the first occurrence: nothing dropped
    assert got[1].n_dup_lines_removed == 0 and got[1].n_lines == 3
    # doc 2's boilerplate copy is dropped; its short line survives
    assert got[2].n_dup_lines_removed == 1
    # doc 3 repeats the boilerplate twice -> both copies dropped
    assert got[3].n_dup_lines_removed == 2
    # cleaned_chars accounting: doc2 keeps everything except the header
    assert got[2].cleaned_chars == len("another unique body line") + len(short)


def test_line_dedup_first_occurrence_survives_million_line_docs(spark, tmp_path):
    """Regression pin for the retired integer position encoding
    (doc_id * 1_000_000 + line_no): a doc with >1M lines made its tail
    positions collide with the NEXT doc_id's head, so the "first"
    occurrence could be mis-picked. With min(struct(doc_id, line_no))
    the planted duplicate at doc1:line 1_050_000 (old pos 2_050_000)
    beats doc2:line 1 (old pos 2_000_001 — the old encoding's pick)."""
    from data_engineering_rag_spark.plans.pipelineq import line_dedup_clean

    planted = "PLANTED-DUPLICATE-BOILERPLATE-LINE"
    n_lines = 1_050_000
    body = ["ab"] * n_lines  # short lines: never eligible, cheap to explode
    body[n_lines - 1] = planted  # doc1's copy sits at line_no 1_050_000
    sf = _write_docs(
        tmp_path,
        [
            (1, "\n".join(body)),
            (2, f"{planted}\nunique doc2 body line"),
        ],
    )
    got = {r.doc_id: r for r in line_dedup_clean(spark, sf).collect()}
    # (1, 1_050_000) < (2, 1) in struct order: doc1 keeps, doc2 drops.
    assert got[1].n_dup_lines_removed == 0 and got[1].n_lines == n_lines
    assert got[2].n_dup_lines_removed == 1
    assert got[2].cleaned_chars == len("unique doc2 body line")


def test_line_dedup_all_dropped_doc_yields_null_md5(spark, tmp_path):
    """A doc whose EVERY line is a dropped duplicate reconstructs to an
    empty set: cleaned_md5 must be NULL (the SQL string_agg-over-empty
    semantics), not md5('') — pinned on both engines."""
    import duckdb

    from data_engineering_rag_spark.plans import REGISTRY
    from data_engineering_rag_spark.plans.pipelineq import line_dedup_clean

    boiler = "This boilerplate line is the whole of doc 3"
    sf = _write_docs(
        tmp_path,
        [
            (1, f"{boiler}\nunique doc1 line"),
            (3, boiler),  # single line, duplicate of doc1's first -> all dropped
        ],
    )
    got = {r.doc_id: r for r in line_dedup_clean(spark, sf).collect()}
    assert got[3].n_dup_lines_removed == 1 and got[3].cleaned_md5 is None
    assert got[3].cleaned_chars == 0
    assert got[1].cleaned_md5 is not None

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    oracle = {
        r[0]: r for r in con.execute(REGISTRY["line_dedup_clean"].oracle).fetchall()
    }
    assert oracle[3][3] is None  # cleaned_md5 column
    assert oracle[1][3] == got[1].cleaned_md5


def test_grouped_top_k_when_k_exceeds_group_size(spark):
    from data_engineering_rag_spark.operators.scale import grouped_top_k
    from pyspark.sql.window import Window

    df = spark.range(0, 23).select(
        "id", (F.col("id") % 5).cast("string").alias("g"), (F.col("id") * 7 % 23).alias("v")
    )
    ref = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("v", "id"))
    )  # k=100 > every group size: all rows survive with their full rank
    got = grouped_top_k(df, ["g"], ["v", "id"], 100, "rn").withColumnRenamed("rn", "rn2")
    j = ref.join(got, ["g", "id", "v"], "full")
    assert j.where("rn IS DISTINCT FROM rn2").count() == 0
    assert got.count() == 23


def test_bpe_batched_training_matches_sequential(spark, sf_dir):
    """The batched trainer (top-M disjoint-prefix merges per driver
    round-trip — the 30k-merge scale path) must reproduce sequential
    Sennrich training exactly on the fixture corpus: same merge list
    (same order, counts included) and the same final segmentation.
    Exercises 3 batch rounds and the created-pair case (sequential pick
    #8 merges a symbol created by pick #7)."""
    from data_engineering_rag_spark.plans.pipelineq import (
        _bpe_train,
        _bpe_train_batched,
    )

    m_seq, seq_seq = _bpe_train(spark, sf_dir, n_merges=12)
    m_bat, seq_bat = _bpe_train_batched(spark, sf_dir, n_merges=12, batch_size=4)
    assert m_bat == m_seq
    a = seq_seq.selectExpr("word", "array_join(ch, '|') AS s")
    b = seq_bat.selectExpr("word", "array_join(ch, '|') AS s")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
