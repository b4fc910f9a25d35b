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


@query(
    "media_resize_audit",
    """
    SELECT doc_id AS media_id,
           cast(224 as bigint) AS width, cast(224 as bigint) AS height,
           sha256(concat(text, '|resize224x224')) AS resized_sha
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def media_resize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pass value check: the stubbed resize derives the output
    payload as sha256(payload | tag), which DuckDB reproduces over the
    UTF-8 source bytes — so the whole mapInPandas resize path (filter,
    Arrow round-trip, tagging) is hash-verified, not just row-counted."""
    from ..operators.multimodal import resize_images

    media = synthetic_media(spark, load(spark, sf_dir, "documents"))
    return resize_images(media, width=224, height=224, fake=True).select(
        "media_id", "width", "height", "resized_sha"
    )


@query(
    "media_frame_index",
    """
    SELECT doc_id AS media_id,
           cast(f.i as bigint) AS frame_idx,
           cast(f.i * 1000 as bigint) AS t_ms,
           sha256(concat(text, '|', cast(f.i as varchar))) AS frame_sha
    FROM documents, unnest(generate_series(0, (n_chars * 10) // 1000)) AS f(i)
    WHERE doc_id % 3 = 2
    """,
)
def media_frame_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out value check: every video (doc_id%3=2,
    duration = n_chars·10 ms) emits one row per sampled second; the
    oracle recomputes the fan-out arithmetic AND the stub frame hashes,
    pinning the one-input-row→many-output-rows mapInPandas shape."""
    from ..operators.multimodal import sample_frames

    media = synthetic_media(spark, load(spark, sf_dir, "documents"))
    return sample_frames(media, every_ms=1000, fake=True).select(
        "media_id", "frame_idx", "t_ms", "frame_sha"
    )
