"""Multimodal-column queries (north-star EXT): REAL binary payloads +
mapInPandas decode/feature extraction (round 11, VERDICT r10 item 3).

``synthetic_media`` now emits real encoded bytes — 8x8 grayscale PNGs
(zlib level 0, pixels = sha256(text) digest tiled) for images, 8 kHz
16-bit mono WAV (samples = digest tiled, n_chars*80 samples) for audio
— so every ``fake=False`` query below runs the actual stdlib codec
path (``operators/codecs.py``) inside its mapInPandas tasks. The
oracles stay value-checking because the payload scheme is built from
SQL-recomputable closed forms:

- byte sizes: level-0 PNG of 8x8 gray = 140 bytes constant; WAV =
  44 + 2*n_samples = 44 + 160*n_chars; video = octet_length(text).
- decoded durations: n_chars*80 samples @ 8 kHz = n_chars*10 ms exact.
- decoded content means: pixels/samples are the sha256(text) digest
  bytes, which DuckDB re-derives from the sha256() hex string via
  strpos('0123456789abcdef', ...) nibble lookups.
- payload identity: injective in text per kind (via sha256), so
  DISTINCT/GROUP BY payload == DISTINCT/GROUP BY text.

Synthetic video payloads stay UTF-8 text bytes (the registered
queries keep the deterministic-fake frame derivation so the oracles
stay closed-form), but the real path no longer needs ffmpeg for
everything: uncompressed 8-bit AVI decodes stdlib-side
(``operators/codecs.py`` — r14), so ``fake=False`` feature extraction
and frame sampling are real for AVI; only COMPRESSED codecs (H.264,
JPEG…) remain the per-codec ffmpeg/PIL seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import extract_media_features, synthetic_media
from . import load, query

#: sha256(text) hex → byte j (0-based): two nibble lookups. DuckDB-side
#: twin of ``hashlib.sha256(text.encode()).digest()[j]``.
_HEX_BYTE = (
    "(strpos('0123456789abcdef', substr(sha, 2*j + 1, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(sha, 2*j + 2, 1)) - 1)"
)


@query(
    "media_feature_stats",
    f"""
    SELECT kind, count(*) AS n_media,
           cast(sum(CASE WHEN kind = 'image' THEN 140
                         WHEN kind = 'audio' THEN 44 + 160 * n_chars
                         ELSE octet_length(encode(text)) END) as bigint)
             AS total_bytes,
           count(DISTINCT text) AS n_distinct_payloads
    FROM (SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                      WHEN doc_id % 3 = 1 THEN 'audio'
                      ELSE 'video' END AS kind, text, n_chars
          FROM documents)
    GROUP BY kind
    """,
)
def media_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline end-to-end on REAL payloads: synthesize
    encoded media rows → Arrow-batch feature extraction (real PNG/WAV
    decode; video features NULL at the ffmpeg seam) → aggregate. The
    oracle recomputes the exact encoded byte sizes (closed forms of the
    level-0 PNG geometry and the WAV sample count) and payload
    distinctness (injective in text), so a codec that emits a single
    wrong byte fails the hash."""
    media = synthetic_media(spark, load(spark, sf_dir, "documents"))
    feats = extract_media_features(media, fake=False, on_unknown="null")
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.countDistinct("payload_sha").alias("n_distinct_payloads"),
    )


@query("media_features_sample", None)
def media_features_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: real decoded feature vectors — luminance histograms
    for PNGs, amplitude histograms for WAV, NULL for video (the
    undecodable-format path). Exact values pinned in pytest.

    The sample filter sits BELOW the synthesis/decode maps: Catalyst
    cannot push a filter through an opaque mapInPandas, so filtering
    after extraction decoded the ENTIRE corpus to keep 20 rows
    (measured 33 s at the sf1-equivalent; <1 s filtered-first —
    media_id IS doc_id, so the pre-filter is result-identical)."""
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    media = synthetic_media(spark, docs)
    return extract_media_features(media, fake=False, on_unknown="null")


@query(
    "media_resize_audit",
    f"""
    WITH img AS (
      SELECT doc_id, sha256(text) AS sha FROM documents WHERE doc_id % 3 = 0
    ), px AS (
      SELECT doc_id, {_HEX_BYTE} AS b
      FROM img, unnest(generate_series(0, 31)) AS t(j)
    )
    SELECT doc_id AS media_id,
           cast(224 as bigint) AS width, cast(224 as bigint) AS height,
           round(sum(b) / 32.0, 6) AS mean_px
    FROM px GROUP BY doc_id
    """,
)
def media_resize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize pass: decode each 8x8 PNG, nearest-neighbor resize
    to 224x224, re-encode, then decode the re-encoded bytes and report
    the mean pixel. 224 = 28*8, so nearest-neighbor replicates every
    source pixel exactly 784x and the mean equals the mean of the 32
    digest bytes — which the oracle recomputes from sha256(text) hex.
    A wrong filter inverse, index map, or encoder would shift it.

    The image pre-filter (kind = doc_id % 3, so ``doc_id % 3 == 0``)
    sits on the documents SCAN: resize_images skips non-images inside
    its UDF anyway, but without the pre-filter every audio/video
    payload is still ENCODED by synthetic_media's Python stage and
    shipped through Arrow just to be discarded — 3x the Python work
    for identical output."""
    from ..operators.multimodal import resize_images

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0)
    media = synthetic_media(spark, docs)
    return resize_images(media, width=224, height=224, fake=False).select(
        "media_id", "width", "height", F.round("mean_px", 6).alias("mean_px")
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
    pinning the one-input-row→many-output-rows mapInPandas shape.
    Stays on the deterministic-fake path over opaque text-byte
    payloads so THIS oracle keeps checking the fan-out arithmetic
    end-to-end; the ``fake=False`` seam itself is REAL since r14 —
    uncompressed 8-bit AVI decodes stdlib-side (``codecs.decode_avi``,
    container parse + frame seek + PNG re-encode, golden-pinned in
    tests/test_multimodal_real.py) and only compressed codecs raise
    the ffmpeg NotImplementedError. Video pre-filter on the scan
    (``doc_id % 3 == 2``): skips encoding PNG/WAV payloads the frame
    sampler would discard anyway."""
    from ..operators.multimodal import sample_frames

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 2)
    media = synthetic_media(spark, docs)
    return sample_frames(media, every_ms=1000, fake=True).select(
        "media_id", "frame_idx", "t_ms", "frame_sha"
    )


@query(
    "media_audio_windows",
    f"""
    WITH aud AS (
      SELECT doc_id, n_chars, sha256(text) AS sha
      FROM documents WHERE doc_id % 3 = 1
    ), dig AS (
      SELECT doc_id, j, {_HEX_BYTE} AS b
      FROM aud, unnest(generate_series(0, 31)) AS t(j)
    ), win AS (
      SELECT doc_id, w.i AS win_idx, w.i * 1000 AS start_ms,
             least(w.i * 1000 + 2000, n_chars * 10) AS end_ms,
             (least(w.i * 1000 + 2000, n_chars * 10) - w.i * 1000) * 8
               AS n_samples
      FROM aud, unnest(generate_series(0, (n_chars * 10 - 1) // 1000)) AS w(i)
    )
    SELECT w.doc_id AS media_id, cast(w.win_idx as bigint) AS win_idx,
           cast(w.start_ms as bigint) AS start_ms,
           cast(w.end_ms as bigint) AS end_ms,
           cast(44 + 2 * w.n_samples as bigint) AS win_bytes,
           round(sum(d.b * (w.n_samples // 32
                            + CASE WHEN d.j < w.n_samples % 32
                                   THEN 1 ELSE 0 END)) * 1.0
                 / w.n_samples, 6) AS mean_amp
    FROM win w JOIN dig d ON w.doc_id = d.doc_id
    GROUP BY w.doc_id, w.win_idx, w.start_ms, w.end_ms, w.n_samples
    """,
)
def media_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio windowing: decode each WAV, take duration from the
    samples (n_chars*10 ms exact at 8 kHz), slice overlapping 2 s / 1 s
    hop windows, re-encode each slice, decode it back and report its
    byte size and mean amplitude. Samples are digest bytes with period
    32 and every window starts on a period boundary (8000 % 32 = 0),
    so the oracle recomputes the mean as a weighted digest-byte sum
    and the size as 44 + 2·samples — both closed forms.
    Audio pre-filter on the scan (``doc_id % 3 == 1``): skips encoding
    the PNG/video payloads the windower would discard anyway."""
    from ..operators.multimodal import synthetic_media, window_audio

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 1)
    media = synthetic_media(spark, docs)
    return window_audio(media, win_ms=2000, hop_ms=1000, fake=False).select(
        "media_id", "win_idx", "start_ms", "end_ms",
        F.length("window_payload").cast("long").alias("win_bytes"),
        F.round("window_mean_amp", 6).alias("mean_amp"),
    )


@query(
    "media_dedup_payloads",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS kind,
             text
      FROM documents
      UNION ALL
      SELECT doc_id + 3000000 AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS kind,
             text
      FROM documents WHERE doc_id % 7 = 0)
    SELECT kind,
           cast(count(*) as bigint) AS n_copies,
           min(media_id) AS canonical_media_id
    FROM m
    GROUP BY kind, text
    HAVING count(*) >= 2
    """,
)
def media_dedup_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup on the REAL binary payload column, made
    non-vacuous by simulating an overlapping re-crawl: every 7th doc is
    re-ingested under a shifted media_id (offset ≡ 0 mod 3 so kind —
    and therefore the encoded payload — is preserved). Duplicate
    payloads within a modality collapse to a canonical (min media_id)
    survivor. sha2 runs JVM-side on the bytes — no Python in the loop —
    so at 100 TB the shuffle carries 32-byte digests, never payloads.
    The oracle groups by text instead, valid because the payload scheme
    is injective in text per kind (sha256-derived pixels/samples)."""
    docs = load(spark, sf_dir, "documents")
    recrawl = docs.where(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + 3000000
    )
    media = synthetic_media(spark, docs).unionByName(synthetic_media(spark, recrawl))
    return (
        media.groupBy("kind", F.sha2(F.col("payload"), 256).alias("payload_sha"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min("media_id").alias("canonical_media_id"),
        )
        .where(F.col("n_copies") >= 2)
        .select("kind", "n_copies", "canonical_media_id")
    )
