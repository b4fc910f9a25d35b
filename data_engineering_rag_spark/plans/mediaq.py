"""Multimodal-column queries (north-star EXT): binary payloads +
mapInPandas feature extraction. The sha256 of the payload is
SQL-computable in DuckDB, so even the stubbed decode is value-checked;
the float feature vector itself is rows-only (numpy-derived)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import extract_media_features, synthetic_media
from . import load, query


@query(
    "media_feature_stats",
    """
    SELECT kind, count(*) AS n_media,
           cast(sum(length(text)) as bigint) AS total_bytes,
           count(DISTINCT sha256(text)) AS n_distinct_payloads
    FROM (SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                      WHEN doc_id % 3 = 1 THEN 'audio'
                      ELSE 'video' END AS kind, text
          FROM documents)
    GROUP BY kind
    """,
)
def media_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline end-to-end: synthesize media rows → Arrow
    batch feature extraction → aggregate. n_bytes/sha survive the
    Python round-trip, which is what the oracle checks (payloads are
    UTF-8 text bytes, so DuckDB's sha256(text) matches)."""
    media = synthetic_media(spark, load(spark, sf_dir, "documents"))
    feats = extract_media_features(media, fake=True)
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.countDistinct("payload_sha").alias("n_distinct_payloads"),
    )


@query("media_features_sample", None)
def media_features_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: the deterministic-fake feature vectors themselves
    (array<float> shape check; exact values pinned in pytest)."""
    media = synthetic_media(spark, load(spark, sf_dir, "documents"))
    return extract_media_features(media, fake=True).where(F.col("media_id") < 20)
