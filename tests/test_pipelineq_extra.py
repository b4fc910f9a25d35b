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
