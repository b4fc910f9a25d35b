"""IVF index persistence: build once, serve from disk (the vector twin
of ``operators/tfidf.py::save_tfidf/load_tfidf``).

Layout IS the index: vectors are written hive-partitioned BY LABEL
(the IVF bucket), so a probe that reads one bucket becomes a partition
filter the parquet source prunes BEFORE any I/O — the on-disk
equivalent of the broadcast-codebook + bucket-equi-join plan that
``plans/vectors.py::ivf_ann_topk`` runs in memory. At 100 TB the
difference is scanning |N|/|labels| bytes instead of filtering |N|
rows after reading them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def save_ivf_index(embeddings: DataFrame, path: str) -> None:
    """Materialize the two index tables: the per-label centroid
    codebook (tiny — one row per (label, pos)) and the vectors,
    hive-partitioned by label."""
    cents = (
        embeddings.select("label", F.posexplode(F.col("embedding").cast("array<double>")))
        .select("label", (F.col("pos") + 1).cast("long").alias("pos"), F.col("col").alias("x"))
        .groupBy("label", "pos")
        .agg(
            (
                F.round(
                    F.sum(F.col("x").cast("decimal(18,9)")).cast("double") / F.count(F.lit(1)), 8
                )
                + F.lit(0.0)
            ).alias("c")
        )
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids.parquet")
    embeddings.write.mode("overwrite").partitionBy("label").parquet(f"{path}/vectors.parquet")


def load_ivf_index(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """(centroids, vectors). The vectors DataFrame carries the hive
    partitioning, so ``vectors.where(label = k)`` plans PartitionFilters
    — assert-able via EXPLAIN (tests/test_vector_index.py)."""
    cents = spark.read.parquet(f"{path}/centroids.parquet")
    vecs = spark.read.parquet(f"{path}/vectors.parquet")
    return cents, vecs


def ivf_probe_saved(
    spark: SparkSession, path: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Serve one query from the saved index: score the broadcast-size
    codebook driver-side… no — entirely engine-side: join the query
    against the centroid table to pick the probe label, then scan ONLY
    that label's partition for the exact re-rank. Returns (vec_id,
    cosine, rn) for the top-k."""
    from pyspark.sql.window import Window

    cents, vecs = load_ivf_index(spark, path)
    q = spark.createDataFrame(
        [(i + 1, float(x)) for i, x in enumerate(query_vec)], "pos long, x double"
    )
    qc = (
        q.join(cents, "pos")
        .groupBy("label")
        .agg(
            F.round(
                F.sum(F.col("x") * F.col("c"))
                / (
                    F.sqrt(F.sum(F.col("x") * F.col("x")))
                    * F.sqrt(F.sum(F.col("c") * F.col("c")))
                ),
                8,
            ).alias("ccos")
        )
    )
    best_label = qc.orderBy(F.desc("ccos"), "label").limit(1).collect()[0].label

    # The collected scalar becomes a LITERAL partition filter — this is
    # the line the partition pruning comes from.
    bucket = vecs.where(F.col("label") == int(best_label))
    qarr = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col("embedding").cast("array<double>")
    dot = F.aggregate(
        F.zip_with(qarr, v, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    qnorm = sum(float(x) * float(x) for x in query_vec) ** 0.5
    vnorm = F.sqrt(
        F.aggregate(F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    )
    scored = bucket.select(
        "vec_id", (F.round(dot / (F.lit(qnorm) * vnorm), 8) + F.lit(0.0)).alias("cosine")
    )
    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
