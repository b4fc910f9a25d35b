"""JSON/CSV/Parquet sinks & sources (SURVEY.md §2.1 S3-S6, S8-S9).

The reference persists corpora as one big JSON array
(``prepare_data.py:228-239``) and eval tables as CSV
(``generate_questions.py:75-76``). Spark-first equivalents write
partitioned directories (the only layout that scales); Parquet is the
canonical store (columnar, statistics, pushdown), JSON/CSV offered for
interchange parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_json(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    reader = spark.read.option("header", "true")
    reader = reader.schema(schema) if schema is not None else reader.option("inferSchema", "true")
    return reader.csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink (EXT beyond the reference's JSON/CSV): Spark-native
    columnar alternative to Parquet — same pushdown/pruning contract,
    preferred in Hive-heavy estates."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_json_audited(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE JSON read with a corrupt-record audit — the
    production ingest contract for landing-zone JSONL: malformed lines
    must neither kill the job (FAILFAST) nor vanish silently
    (DROPMALFORMED). Returns ``(good, bad)`` DataFrames; ``bad``
    carries the raw offending line for quarantine.

    The caller's schema is extended with the ``_corrupt_record`` column
    (Spark requires it declared AND the audited frame cached before the
    corrupt column is referenced — undocumented sharp edge: filtering
    on ``_corrupt_record`` without a cache raises AnalysisException on
    Spark 3+)."""
    from pyspark.sql import functions as F

    audit_schema = StructType(
        schema.fields + [StructField("_corrupt_record", StringType(), True)]
    )
    raw = (
        spark.read.schema(audit_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    ).cache()
    good = raw.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = raw.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, bad


def write_parquet_with_manifest(
    df: DataFrame, path: str, mode: str = "overwrite"
) -> dict:
    """Snapshot write with a reproducibility manifest: parquet data plus
    ``_MANIFEST.json`` recording row count, schema, and an
    ORDER-INSENSITIVE content fingerprint (bit_xor of per-row
    xxhash64 over all columns — commutative, so partitioning/shuffle
    order can't change it). Two writes of the same logical table
    produce the same fingerprint; any changed/added/dropped row flips
    it. This is the cheap data-versioning contract a corpus snapshot
    needs: downstream consumers pin the fingerprint, re-runs verify it.

    Returns the manifest dict (also written next to the data)."""
    import json

    from pyspark.sql import functions as F

    df.write.mode(mode).parquet(path)
    spark = df.sparkSession
    written = spark.read.parquet(path)
    agg = written.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*[F.col(c) for c in written.columns])).alias("fp"),
    ).collect()[0]
    manifest = {
        "row_count": agg.n,
        "fingerprint_xxh64_xor": agg.fp,
        "columns": [{"name": f.name, "type": f.dataType.simpleString()} for f in written.schema.fields],
    }
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path + "/_MANIFEST.json")
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jvm_path, True)
    out.write(bytearray(json.dumps(manifest, indent=2).encode()))
    out.close()
    return manifest


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into files of
    roughly ``target_file_bytes`` (the classic maintenance job — a
    streaming sink or over-parallel write leaves thousands of KB-sized
    files, and at 100 TB the NameNode/listing and per-file open costs
    dominate reads). File count is sized from the dataset's actual
    on-disk bytes, so the result tracks data volume, not the input's
    partitioning. Returns the number of output files written.

    Round-robin ``repartition(n)`` (not coalesce) so output files are
    even-sized regardless of input skew; coalesce would glue adjacent
    small files into uneven outputs and can collapse parallelism."""
    df = spark.read.parquet(src_path)
    # Sum the source's data-file sizes via the Hadoop FS API (works on
    # any supported filesystem, not just file://).
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    total = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            total += st.getLen()
    n_files = max(1, -(-total // target_file_bytes))  # ceil div
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    out = fs.listFiles(jvm.org.apache.hadoop.fs.Path(dst_path), True)
    n_out = 0
    while out.hasNext():
        if out.next().getPath().getName().endswith(".parquet"):
            n_out += 1
    return n_out


def write_parquet_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, within-file-sorted parquet write — the
    clustering layout that makes parquet row-group min/max statistics
    selective (a filter on ``sort_cols`` prunes whole files/row groups
    at scan time, the poor man's Z-order for a single sort key).

    ``repartitionByRange`` samples the sort key to build balanced
    ranges (one shuffle), then ``sortWithinPartitions`` orders rows
    inside each output task — no global sort barrier."""
    cols = [F.col(c) for c in sort_cols]
    parted = (
        df.repartitionByRange(n_files, *cols) if n_files else df.repartitionByRange(*cols)
    )
    parted.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution-tolerant parquet read: union the schemas of
    every file footer (``mergeSchema``) so a dataset whose writers
    added columns over time reads as one table — old files surface the
    new columns as NULL. Off by default in Spark because footer-merging
    costs a pass over file metadata at planning time; turn it on only
    for datasets that actually evolved (at 100 TB, prefer a declared
    catalog schema and backfill)."""
    return spark.read.option("mergeSchema", True).parquet(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink (Spark 4 built-in `xml` format — the spark-xml package
    folded into core): for the B2B/legacy estates that still exchange
    XML. Row-oriented, no pushdown — use only at the edges, never as
    the analytic store."""
    df.write.mode(mode).format("xml").option("rootTag", root_tag).option(
        "rowTag", row_tag
    ).save(path)


def read_xml(spark: SparkSession, path: str, row_tag: str = "row") -> DataFrame:
    """XML source (Spark 4 built-in). Schema inference scans the files;
    pass an explicit schema in production ingest."""
    return spark.read.format("xml").option("rowTag", row_tag).load(path)
