"""Multimodal column plumbing (north-star EXT per BASELINE.json).

Media are opaque ``binary`` columns plus typed metadata — the layout
that scales: Spark shuffles/spills binary payloads fine, and all
decode/feature work happens in Arrow-batched ``mapInPandas`` so bytes
cross the JVM↔Python boundary once per batch, not per row.

Decode paths (round 10, VERDICT r9 item 4): PNG images and PCM WAV
audio now have a REAL pure-stdlib decode path (``operators/codecs.py``
— zlib/struct PNG inflate + un-filtering, ``wave``-module PCM), used
when ``deterministic_fake=False`` / ``fake=False``: features come from
actual pixels/samples, resizes re-encode real PNGs, audio windows are
real PCM slices. Formats beyond PNG/WAV (JPEG, video frames) still
raise ``NotImplementedError`` at the same seams — that is where
PIL/ffmpeg drop in.

Round 11 (VERDICT r10 item 3): ``synthetic_media`` emits REAL encoded
PNG/WAV payloads by default (``_synthetic_payload``), so the
registered ``media_*`` queries run ``fake=False`` — the real decode IS
the executed, driver-checked path. ``deterministic_fake=True`` remains
for the video/ffmpeg seam and as the cheap stub for plumbing tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),  # image/video
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),  # audio/video
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("payload_sha", StringType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


class DecodeStub:
    """The image/audio/video decoder seam.

    ``deterministic_fake=True`` → features = FEATURE_DIM floats derived
    from sha256(payload) (stable, testable batch plumbing; the
    oracle-checked path).
    ``False`` → REAL decode for PNG (luminance histogram), PCM WAV
    (amplitude histogram) and uncompressed AVI (whole-clip luminance
    histogram, r14) via the stdlib codecs; anything else raises
    NotImplementedError, marking exactly where PIL/ffmpeg plug in."""

    def __init__(self, deterministic_fake: bool = True):
        self.deterministic_fake = deterministic_fake

    def features(self, payload: bytes) -> np.ndarray:
        if not self.deterministic_fake:
            from . import codecs

            kind = codecs.sniff_kind(payload)
            if kind == "image":
                return codecs.image_features(payload, FEATURE_DIM)
            if kind == "audio":
                return codecs.audio_features(payload, FEATURE_DIM)
            if kind == "video":
                return codecs.video_features(payload, FEATURE_DIM)
            raise NotImplementedError(
                "real decode implemented for PNG/WAV/uncompressed-AVI only "
                "(operators/codecs.py); other formats need PIL/ffmpeg, not "
                "present in this environment"
            )
        digest = hashlib.sha256(payload).digest()
        # 16 stable floats in [0, 1): two digest bytes per feature.
        raw = np.frombuffer(digest, dtype=np.uint16).astype(np.float32)
        return raw / 65536.0


def extract_media_features(
    media: DataFrame, fake: bool = True, on_unknown: str = "raise"
) -> DataFrame:
    """mapInPandas feature extraction: one decoder per task, Arrow
    batches in/out, output rows 1:1 with input (a frame-sampling
    variant would fan out here instead).

    ``on_unknown`` governs the real path on undecodable formats:
    ``"raise"`` (default) keeps the hard NotImplementedError seam;
    ``"null"`` emits ``features=NULL`` for those rows — what a
    production pipeline does with formats its codecs can't read
    (n_bytes/payload_sha stay real either way, they never decode)."""
    if on_unknown not in ("raise", "null"):
        raise ValueError(f"on_unknown must be 'raise' or 'null', got {on_unknown!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        stub = DecodeStub(deterministic_fake=fake)

        def feat(p) -> list | None:
            if p is None:
                return None
            try:
                return stub.features(bytes(p)).tolist()
            except NotImplementedError:
                if on_unknown == "null":
                    return None
                raise

        for pdf in batches:
            feats = [feat(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [None if p is None else len(p) for p in pdf["payload"]],
                    "payload_sha": [
                        None if p is None else hashlib.sha256(bytes(p)).hexdigest()
                        for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


#: Synthetic media geometry — shared constants so the oracle SQL and
#: the pytest pins derive the same closed forms.
SYN_IMG_SIDE = 8       # 8x8 grayscale PNG, pixels = sha256(text) tiled x2
SYN_PNG_BYTES = 140    # level-0 PNG of 8x8 gray: 57 + (2 + 5 + 72 + 4)
SYN_WAV_RATE = 8000    # Hz, mono 16-bit; n_samples = n_chars*80
SYN_WAV_SAMPLES_PER_CHAR = 80  # -> duration = n_chars*10 ms exactly

#: Max approximate bytes of binary payload per yielded Arrow output
#: chunk from the payload-producing mapInPandas stages. Input batches
#: are row/byte-capped by Spark, but UDFs that AMPLIFY their input
#: (text→WAV ~160x, 8x8 PNG→224x224 re-encode ~300x) must slice their
#: OUTPUT themselves — one frame per input batch reached multi-GB
#: record batches at the sf10-equivalent and blew the executor's
#: direct-memory cap (see ``synthetic_media``).
_PAYLOAD_CHUNK_BYTES = 32 << 20


class _ChunkedFrames:
    """Byte-bounded output accumulator for payload-producing
    mapInPandas generators: ``add()`` one row at a time (checked PER
    ROW, so even a single fat row's fan-out cannot overshoot the cap
    by more than that one row) and yield whatever it returns; call
    ``tail()`` for the final partial chunk. One implementation so the
    flush policy cannot drift between the three producers."""

    __slots__ = ("cols", "chunk_bytes", "rows", "nbytes")

    def __init__(self, cols: tuple, chunk_bytes: int = _PAYLOAD_CHUNK_BYTES):
        self.cols = cols
        self.chunk_bytes = chunk_bytes
        self.rows = {k: [] for k in cols}
        self.nbytes = 0

    def add(self, values: tuple, payload_bytes: int):
        for k, v in zip(self.cols, values):
            self.rows[k].append(v)
        self.nbytes += payload_bytes + 128  # per-row fixed-width slack
        if self.nbytes >= self.chunk_bytes:
            out = pd.DataFrame(self.rows)
            self.rows = {k: [] for k in self.cols}
            self.nbytes = 0
            return out
        return None

    def tail(self):
        # Drain-and-reset so a second call (or tail-then-add reuse)
        # cannot double-emit the buffered rows.
        if not self.rows[self.cols[0]]:
            return None
        out = pd.DataFrame(self.rows)
        self.rows = {k: [] for k in self.cols}
        self.nbytes = 0
        return out


def _synthetic_payload(kind: str, text: str, n_chars: int) -> bytes:
    """REAL encoded payload derived deterministically from the text.

    - image: 8x8 grayscale PNG whose 64 pixels are the sha256(text)
      digest tiled twice, encoded with zlib level 0 so the byte size is
      the closed-form constant SYN_PNG_BYTES (oracle-recomputable).
    - audio: 8 kHz mono 16-bit WAV, n_chars*80 samples (duration =
      n_chars*10 ms exactly), sample[i] = digest[i % 32] — periodic so
      window means are closed forms of the digest bytes.
    - video: UTF-8 text bytes — kept opaque so the registered-query
      oracles stay closed-form; the real AVI codec path is exercised
      by the fixture clips (tests/fixtures/mediagen.py), not here.

    Injective in text per kind (via sha256), so payload-level dedup is
    equivalent to text-level dedup — which is what the oracle SQL
    checks, since DuckDB cannot re-encode PNG/WAV."""
    from . import codecs

    data = text.encode("utf-8")
    if kind == "video":
        return data
    digest = np.frombuffer(hashlib.sha256(data).digest(), dtype=np.uint8)
    if kind == "image":
        px = np.tile(digest, 2).reshape(SYN_IMG_SIDE, SYN_IMG_SIDE, 1)
        return codecs.encode_png(px, level=0)
    n = int(n_chars) * SYN_WAV_SAMPLES_PER_CHAR
    samples = np.tile(digest, (n + 31) // 32)[:n].astype("<i2").reshape(-1, 1)
    return codecs.encode_wav(samples, SYN_WAV_RATE)


def synthetic_media(spark, docs: DataFrame, real_payloads: bool = True) -> DataFrame:
    """Deterministic media derived from document text (the container
    has no real media files): kind cycles by doc_id; payloads are REAL
    PNG/WAV bytes (``_synthetic_payload``, built per Arrow batch in
    mapInPandas) by default, or raw UTF-8 text bytes with
    ``real_payloads=False`` (the pre-round-11 stub scheme). Exercises
    the binary column path end-to-end either way.

    The real-payload generator yields BYTE-BOUNDED output chunks
    (``_PAYLOAD_CHUNK_BYTES``): Arrow's input side is row/byte-capped,
    but a mapInPandas that AMPLIFIES its input (~160x here, text →
    WAV samples) and yields one frame per input batch emits one giant
    output record batch — multi-GB at the sf10-equivalent — which the
    Python worker serializes whole and 32 concurrent JVM readers then
    materialize: measured io.netty OutOfDirectMemoryError (8.5 GB
    direct-memory cap) and a follow-up JVM SIGSEGV in the huge
    arraycopies. Output-side slicing must live in the PRODUCER —
    the worker does not re-slice UDF output for this eval type."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.col("text"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    # r16 OPTIMIZATION: the encode stage below is pure Python work per
    # row; a single-file corpus scan (one partition) runs it in ONE
    # Python worker while the other cores idle — the mapInPandas
    # sibling of the r15 scan-serialization hazard. Guard on the narrow
    # projection; multi-file inputs pass through unchanged.
    from .scale import ensure_scan_parallelism

    base = ensure_scan_parallelism(base, label="synthetic_media documents scan")
    if not real_payloads:
        return base.select(
            "media_id",
            "kind",
            F.encode(F.col("text"), "UTF-8").alias("payload"),
            F.lit("application/octet-stream").alias("mime"),
            F.when(F.col("media_id") % 3 == 0, F.lit(640)).cast("long").alias("width"),
            F.when(F.col("media_id") % 3 == 0, F.lit(480)).cast("long").alias("height"),
            F.when(F.col("media_id") % 3 != 0, F.col("n_chars") * 10)
            .cast("long")
            .alias("duration_ms"),
        )

    mimes = {"image": "image/png", "audio": "audio/wav", "video": "application/octet-stream"}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf = _ChunkedFrames(
            ("media_id", "kind", "payload", "mime", "width", "height", "duration_ms")
        )
        for pdf in batches:
            for mid, k, t, n in zip(
                pdf["media_id"], pdf["kind"], pdf["text"], pdf["n_chars"]
            ):
                payload = _synthetic_payload(k, t, n)
                chunk = buf.add(
                    (
                        mid,
                        k,
                        payload,
                        mimes[k],
                        SYN_IMG_SIDE if k == "image" else None,
                        SYN_IMG_SIDE if k == "image" else None,
                        None if k == "image" else int(n) * 10,
                    ),
                    len(payload),
                )
                if chunk is not None:
                    yield chunk
        tail = buf.tail()
        if tail is not None:
            yield tail

    return base.mapInPandas(run, MEDIA_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("resized_sha", StringType(), True),
        # mean pixel value of the DECODED resized payload (real path
        # only; NULL on the fake path) — a content stat the oracle SQL
        # recomputes from sha256(text) hex, closing the encode→decode
        # loop per row.
        StructField("mean_px", DoubleType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("t_ms", LongType(), False),
        StructField("frame_payload", BinaryType(), True),
        StructField("frame_sha", StringType(), True),
    ]
)


def _fake_derivative(payload: bytes, tag: str) -> bytes:
    """Deterministic stand-in for a decoded derivative (resized image /
    extracted frame): sha256(payload | tag). A real codec replaces this
    one call; everything around it — schema, Arrow batching, fan-out —
    is the production plumbing."""
    return hashlib.sha256(payload + b"|" + tag.encode()).digest()


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, fake: bool = True
) -> DataFrame:
    """Image resize pass: filters kind='image', emits 1:1 rows with the
    target dims and the resized payload. mapInPandas — one decoder per
    task, bytes cross the boundary once per Arrow batch. ``fake=False``
    runs the REAL stdlib path on PNG payloads (decode → nearest-
    neighbor resize → re-encode); non-PNG real payloads raise at the
    PIL seam."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        stub = DecodeStub(deterministic_fake=fake)
        tag = f"resize{width}x{height}"
        # byte-bounded output chunks: the re-encode AMPLIFIES payloads
        # (8x8 source -> width x height), so output must be sliced by
        # the producer (see _ChunkedFrames / _PAYLOAD_CHUNK_BYTES)
        buf = _ChunkedFrames(
            ("media_id", "kind", "width", "height", "payload", "resized_sha", "mean_px")
        )
        for pdf in batches:
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "image" or payload is None:
                    continue
                if stub.deterministic_fake:
                    # oracle contract: resized_sha = sha256(payload|tag),
                    # reproducible SQL-side — do not change
                    resized = _fake_derivative(bytes(payload), tag)
                    sha = hashlib.sha256(bytes(payload) + b"|" + tag.encode()).hexdigest()
                    mean_px = None
                else:
                    from . import codecs

                    if codecs.sniff_kind(bytes(payload)) != "image":
                        raise NotImplementedError(
                            "real resize implemented for PNG only (operators/codecs.py); "
                            "other formats need PIL"
                        )
                    resized = codecs.encode_png(
                        codecs.resize_nearest(codecs.decode_png(bytes(payload)), width, height)
                    )
                    sha = hashlib.sha256(resized).hexdigest()
                    # decode the bytes we just encoded: mean_px certifies
                    # the full encode→decode loop, not the ndarray alone
                    mean_px = float(codecs.decode_png(resized).mean())
                chunk = buf.add(
                    (mid, kind, width, height, resized, sha, mean_px), len(resized)
                )
                if chunk is not None:
                    yield chunk
        tail = buf.tail()
        if tail is not None:
            yield tail

    return media.mapInPandas(run, RESIZED_SCHEMA)


def _real_video_frames(payload: bytes, every_ms: int):
    """Decode ONCE, then index: yields (i, t_ms, png_bytes) for each
    sampled timestamp 0, every_ms, … ≤ duration_ms — the inclusive
    boundary convention shared with the fake path. The r14 version
    called ``codecs.avi_frame_at_ms`` (a whole-clip decode) once per
    timestamp — O(n_frames × n_samples) re-decodes (ADVICE r15); this
    indexes the one decoded frame array. Each timestamp maps to its
    covering frame t·fps//1000, clamped to the last frame (so an
    exact-multiple endpoint re-samples the final frame's pixels at
    the clip's end timestamp, matching the documented contract)."""
    from . import codecs

    if codecs.sniff_kind(payload) != "video":
        raise NotImplementedError(
            "real frame extraction for non-AVI video containers "
            "requires ffmpeg, not present in this environment "
            "(uncompressed 8-bit AVI decodes stdlib-side)"
        )
    frames, fps = codecs.decode_avi(payload)
    dur_ms = len(frames) * 1000 // max(1, fps)
    for i in range(dur_ms // every_ms + 1):
        t_ms = i * every_ms
        idx = min(len(frames) - 1, t_ms * fps // 1000)
        yield i, t_ms, codecs.encode_png(frames[idx][..., None])


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame sampling: each video row FANS OUT to one row per
    sampled timestamp (0, every_ms, 2·every_ms, … ≤ duration_ms,
    INCLUSIVE of an exact-multiple endpoint — the same boundary
    convention on both paths, ADVICE r15) — the mapInPandas shape
    where output rows ≠ input rows.

    ``fake=True`` (the registered, oracle-checked path) emits stubbed
    derivative payloads keyed on the opaque video bytes — duration
    comes from the metadata column. ``fake=False`` (r14) REALLY
    decodes: the payload must be an uncompressed 8-bit AVI, decoded
    ONCE per payload (``_real_video_frames``; duration = the
    container's frame count × fps), each sampled timestamp indexing
    its covering frame in the decoded array — never a per-timestamp
    re-decode — and the emitted frame payload is that frame re-encoded
    as PNG: the same decode→derive→re-encode loop as the image/audio
    real paths. Compressed streams raise NotImplementedError inside
    the codec: the ffmpeg drop-in seam, per-frame rather than
    per-modality."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs

        stub = DecodeStub(deterministic_fake=fake)
        # Fan-out producer, so byte-bounded output chunks like the
        # other payload producers: fake frames are 32-byte stubs, but
        # the real path (and an ffmpeg drop-in) emits whole encoded
        # frames per timestamp — exactly the output amplification
        # _ChunkedFrames exists to cap.
        buf = _ChunkedFrames(
            ("media_id", "frame_idx", "t_ms", "frame_payload", "frame_sha")
        )
        for pdf in batches:
            for mid, kind, payload, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["duration_ms"]
            ):
                if kind != "video" or payload is None:
                    continue
                if stub.deterministic_fake:
                    if dur is None or pd.isna(dur):
                        continue
                    for i in range(int(dur) // every_ms + 1):
                        frame = _fake_derivative(bytes(payload), str(i))
                        sha = hashlib.sha256(
                            bytes(payload) + b"|" + str(i).encode()
                        ).hexdigest()
                        chunk = buf.add((mid, i, i * every_ms, frame, sha), len(frame))
                        if chunk is not None:
                            yield chunk
                    continue
                for i, t_ms, frame in _real_video_frames(bytes(payload), every_ms):
                    sha = hashlib.sha256(frame).hexdigest()
                    chunk = buf.add((mid, i, t_ms, frame, sha), len(frame))
                    if chunk is not None:
                        yield chunk
        tail = buf.tail()
        if tail is not None:
            yield tail

    return media.mapInPandas(run, FRAME_SCHEMA)


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("win_idx", LongType(), False),
        StructField("start_ms", LongType(), False),
        StructField("end_ms", LongType(), False),
        StructField("window_payload", BinaryType(), True),
        StructField("window_sha", StringType(), True),
        # mean sample amplitude of the DECODED window slice (real path
        # only; NULL on the fake path) — closed-form recomputable by
        # the oracle when samples are periodic in the text digest.
        StructField("window_mean_amp", DoubleType(), True),
    ]
)


def window_audio(
    media: DataFrame, win_ms: int = 2000, hop_ms: int = 1000, fake: bool = True
) -> DataFrame:
    """Audio windowing: each audio row fans out to overlapping
    fixed-length windows (start = 0, hop, 2·hop, … < duration; end
    clamped to duration) — the sliding-window chunker's semantics
    applied to a time axis, as mapInPandas fan-out. ``fake=True``
    (the oracle-checked path) windows by the duration_ms metadata with
    stubbed derivative payloads; ``fake=False`` decodes REAL PCM WAV
    payloads, takes duration from the samples themselves, and emits
    re-encoded WAV slices — a librosa/ffmpeg feature extractor drops
    into the same per-window call for other formats."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        stub = DecodeStub(deterministic_fake=fake)
        # byte-bounded output chunks: overlapping windows roughly
        # DOUBLE the payload bytes, so the producer slices its output —
        # checked PER WINDOW so one long audio row can't overshoot
        # (see _ChunkedFrames / _PAYLOAD_CHUNK_BYTES)
        buf = _ChunkedFrames(
            (
                "media_id", "win_idx", "start_ms", "end_ms",
                "window_payload", "window_sha", "window_mean_amp",
            )
        )
        for pdf in batches:
            for mid, kind, payload, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["duration_ms"]
            ):
                if kind != "audio" or payload is None:
                    continue
                if stub.deterministic_fake:
                    if dur is None or pd.isna(dur):
                        continue
                    dur = int(dur)
                else:
                    from . import codecs

                    if codecs.sniff_kind(bytes(payload)) != "audio":
                        raise NotImplementedError(
                            "real audio slicing implemented for PCM WAV only "
                            "(operators/codecs.py); other formats need ffmpeg"
                        )
                    # the samples, not the metadata, are authoritative
                    dur = codecs.wav_duration_ms(bytes(payload))
                i = 0
                while i * hop_ms < dur:
                    start = i * hop_ms
                    end = min(start + win_ms, dur)
                    if stub.deterministic_fake:
                        wpayload = _fake_derivative(bytes(payload), f"win|{i}")
                        wsha = hashlib.sha256(
                            bytes(payload) + b"|win|" + str(i).encode()
                        ).hexdigest()
                        wmean = None
                    else:
                        from . import codecs

                        wpayload = codecs.slice_wav_ms(bytes(payload), start, end)
                        wsha = hashlib.sha256(wpayload).hexdigest()
                        # decode the slice we just encoded — certifies
                        # the full slice→encode→decode loop per window
                        pcm, _rate = codecs.decode_wav(wpayload)
                        wmean = float(pcm.mean()) if pcm.size else None
                    chunk = buf.add(
                        (mid, i, start, end, wpayload, wsha, wmean), len(wpayload)
                    )
                    if chunk is not None:
                        yield chunk
                    i += 1
        tail = buf.tail()
        if tail is not None:
            yield tail

    return media.mapInPandas(run, AUDIO_WINDOW_SCHEMA)
