"""Source/sink format contracts beyond the round-trips covered in
test_edge_cases: ORC round-trip (values AND pushdown), hive-partitioned
parquet layout with partition pruning visible in the plan — the layout
properties the 100 TB story depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_rag_spark.plans import load
from data_engineering_rag_spark.sources.io import (
    read_orc,
    read_parquet,
    write_orc,
    write_parquet,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, src.collect())) == sorted(map(tuple, back.collect()))
    filtered = back.where(F.col("n_nationkey") < 5).select("n_name")
    plan = _plan(filtered)
    assert "PushedFilters" in plan and "n_nationkey" in plan.split("PushedFilters")[1][:200]


def test_partitioned_parquet_prunes_partitions(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_parquet(docs, path, partition_by=["lang"])
    back = read_parquet(spark, path)
    # same rows (lang becomes a partition column, order of cols may differ)
    assert back.count() == docs.count()
    one_lang = back.where(F.col("lang") == "en")
    plan = _plan(one_lang)
    # partition pruning: the lang predicate must be a PartitionFilter on
    # the scan, not a post-scan Filter over all partitions
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "lang" in pf
    assert one_lang.count() == docs.where(F.col("lang") == "en").count()


def test_partitioned_orc_roundtrip(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = str(tmp_path / "docs_orc_by_lang")
    write_orc(docs, path, partition_by=["lang"])
    back = read_orc(spark, path)
    got = {(r.doc_id, r.lang, r.n_chars) for r in back.collect()}
    want = {(r.doc_id, r.lang, r.n_chars) for r in docs.collect()}
    assert got == want


def test_read_json_audited_quarantines_corrupt_lines(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from data_engineering_rag_spark.sources.io import read_json_audited

    p = tmp_path / "landing"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        '{"id": 1, "text": "ok"}\n'
        "{broken json!!\n"
        '{"id": 2, "text": "also ok"}\n'
        '{"id": "not-a-number", "text": "type clash"}\n'
    )
    schema = StructType(
        [StructField("id", LongType(), True), StructField("text", StringType(), True)]
    )
    good, bad = read_json_audited(spark, str(p), schema)
    assert {(r.id, r.text) for r in good.collect()} == {(1, "ok"), (2, "also ok")}
    bad_lines = [r.raw_line for r in bad.collect()]
    assert len(bad_lines) == 2
    assert any("broken json" in line for line in bad_lines)
    assert any("not-a-number" in line for line in bad_lines)


def test_manifest_fingerprint_is_order_insensitive_and_sensitive_to_content(spark, tmp_path):
    import json

    from data_engineering_rag_spark.sources.io import write_parquet_with_manifest

    df = spark.createDataFrame([(i, f"t{i}") for i in range(100)], ["id", "t"])
    m1 = write_parquet_with_manifest(df, str(tmp_path / "a"))
    # same rows, different physical order/partitioning -> same fingerprint
    m2 = write_parquet_with_manifest(
        df.orderBy(df.id.desc()).repartition(7), str(tmp_path / "b")
    )
    assert m1["row_count"] == m2["row_count"] == 100
    assert m1["fingerprint_xxh64_xor"] == m2["fingerprint_xxh64_xor"]
    # one changed row -> different fingerprint
    changed = df.withColumn("t", __import__("pyspark").sql.functions.when(df.id == 50, "X").otherwise(df.t))
    m3 = write_parquet_with_manifest(changed, str(tmp_path / "c"))
    assert m3["fingerprint_xxh64_xor"] != m1["fingerprint_xxh64_xor"]
    # manifest file is readable next to the data
    on_disk = json.loads((tmp_path / "a" / "_MANIFEST.json").read_text())
    assert on_disk == m1


def test_compact_parquet_reduces_files(spark, tmp_path):
    import pyspark.sql.functions as F
    from data_engineering_rag_spark.sources.io import compact_parquet

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    # Fragment: 64 partitions of a small dataset → 64 tiny files.
    spark.range(10_000).select("id", F.md5(F.col("id").cast("string")).alias("h")) \
        .repartition(64).write.parquet(src)
    n_src = len([p for p in (tmp_path / "frag").glob("*.parquet")])
    assert n_src >= 32
    n_out = compact_parquet(spark, src, dst, target_file_bytes=8 * 1024 * 1024)
    assert n_out == 1  # well under one target file of data
    a = spark.read.parquet(src).orderBy("id").collect()
    b = spark.read.parquet(dst).orderBy("id").collect()
    assert a == b


def test_write_parquet_sorted_clusters_key(spark, tmp_path):
    from data_engineering_rag_spark.sources.io import write_parquet_sorted

    df = spark.range(0, 1000).selectExpr("id", "cast(id % 7 as double) as v")
    path = str(tmp_path / "sorted")
    write_parquet_sorted(df, path, sort_cols=["id"], n_files=4)
    files = sorted((tmp_path / "sorted").glob("*.parquet"))
    assert len(files) == 4
    # Each file holds a contiguous, internally sorted id range; ranges
    # are disjoint across files (the pruning property).
    ranges = []
    for f in files:
        ids = [r.id for r in spark.read.parquet(str(f)).collect()]
        assert ids == sorted(ids)
        ranges.append((min(ids), max(ids)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    assert {r.id for f in files for r in spark.read.parquet(str(f)).collect()} == set(range(1000))


def test_read_parquet_merged_schema_evolution(spark, tmp_path):
    """Writers added a column over time: merged read surfaces the
    union schema, with NULLs for files written before the column."""
    from data_engineering_rag_spark.sources.io import read_parquet_merged

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(path)
    spark.createDataFrame([(2, "b", 9.5)], "id long, s string, score double") \
        .write.mode("append").parquet(path)
    df = read_parquet_merged(spark, path)
    assert set(df.columns) == {"id", "s", "score"}
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score is None and rows[2].score == 9.5


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    """Spark-4 built-in XML format: values survive the round trip
    (types re-infer as the XML-representable equivalents)."""
    from data_engineering_rag_spark.sources.catalog import read_parquet_table
    from data_engineering_rag_spark.sources.io import read_xml, write_xml

    src = read_parquet_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = str(tmp_path / "nation_xml")
    write_xml(src, path, row_tag="nation", root_tag="nations")
    back = read_xml(spark, path, row_tag="nation")
    want = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in src.collect()}
    got = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in back.collect()}
    assert got == want
