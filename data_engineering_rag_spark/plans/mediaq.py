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


@query(
    "media_audio_windows",
    """
    SELECT doc_id AS media_id,
           cast(w.i as bigint) AS win_idx,
           cast(w.i * 1000 as bigint) AS start_ms,
           cast(least(w.i * 1000 + 2000, n_chars * 10) as bigint) AS end_ms,
           sha256(concat(text, '|win|', cast(w.i as varchar))) AS window_sha
    FROM documents, unnest(generate_series(0, (n_chars * 10 - 1) // 1000)) AS w(i)
    WHERE doc_id % 3 = 1
    """,
)
def media_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing fan-out value check: every audio row (doc_id%3=1,
    duration = n_chars·10 ms) emits overlapping 2 s windows on a 1 s
    hop, end clamped to duration — the time-axis analogue of the text
    chunker, run as mapInPandas fan-out with stub payload derivatives;
    the oracle recomputes the window arithmetic and stub hashes."""
    from ..operators.multimodal import synthetic_media, window_audio

    media = synthetic_media(spark, load(spark, sf_dir, "documents"))
    return window_audio(media, win_ms=2000, hop_ms=1000).select(
        "media_id", "win_idx", "start_ms", "end_ms", "window_sha"
    )


@query(
    "media_dedup_payloads",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS kind,
             sha256(text) AS payload_sha
      FROM documents)
    SELECT payload_sha, kind,
           cast(count(*) as bigint) AS n_copies,
           min(media_id) AS canonical_media_id
    FROM m
    GROUP BY payload_sha, kind
    HAVING count(*) >= 2
    """,
)
def media_dedup_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup on the BINARY payload column: duplicate
    payloads within a modality collapse to a canonical (min media_id)
    survivor. sha2 runs JVM-side on the bytes — no Python in the loop —
    so at 100 TB the shuffle carries 32-byte digests, never payloads;
    the reference pattern for 'did two crawls fetch the same image'."""
    media = synthetic_media(spark, load(spark, sf_dir, "documents"))
    return (
        media.groupBy(F.sha2(F.col("payload"), 256).alias("payload_sha"), "kind")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min("media_id").alias("canonical_media_id"),
        )
        .where(F.col("n_copies") >= 2)
    )
