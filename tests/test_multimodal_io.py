"""Multimodal binary-column plumbing + JSON/CSV/Parquet round-trips."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from data_engineering_rag_spark.operators.multimodal import (
    DecodeStub,
    FEATURE_DIM,
    extract_media_features,
    synthetic_media,
)
from data_engineering_rag_spark.plans import load
from data_engineering_rag_spark.sources import io as eio


def test_decode_stub_contract():
    stub = DecodeStub(deterministic_fake=True)
    f1 = stub.features(b"payload")
    f2 = stub.features(b"payload")
    assert (f1 == f2).all() and len(f1) == FEATURE_DIM
    assert ((0 <= f1) & (f1 < 1)).all()
    with pytest.raises(NotImplementedError):
        DecodeStub(deterministic_fake=False).features(b"x")


def test_media_features_roundtrip(spark, sf_dir):
    media = synthetic_media(spark, load(spark, sf_dir, "documents")).where(
        F.col("media_id") < 10
    )
    rows = {r.media_id: r for r in extract_media_features(media, fake=True).collect()}
    src = {r.media_id: r for r in media.collect()}
    stub = DecodeStub(deterministic_fake=True)
    for mid, r in rows.items():
        payload = bytes(src[mid].payload)
        assert r.n_bytes == len(payload)
        assert r.payload_sha == hashlib.sha256(payload).hexdigest()
        assert len(r.features) == FEATURE_DIM
        expected = stub.features(payload)
        assert all(abs(a - b) < 1e-7 for a, b in zip(r.features, expected))
        assert r.kind in ("image", "audio", "video")


def test_json_csv_parquet_roundtrip(spark, tmp_path):
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
        ]
    )
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, None)], schema)

    jp = str(tmp_path / "j")
    eio.write_json(df, jp)
    back = eio.read_json(spark, jp, schema)
    assert sorted((r.id, r.name) for r in back.collect()) == [(1, "a"), (2, "b"), (3, None)]

    cp = str(tmp_path / "c")
    eio.write_csv(df, cp)
    back = eio.read_csv(spark, cp, schema)
    assert sorted((r.id, r.name) for r in back.collect()) == [(1, "a"), (2, "b"), (3, None)]

    pp = str(tmp_path / "p")
    eio.write_parquet(df, pp, partition_by=["name"])
    back = eio.read_parquet(spark, pp)
    assert back.count() == 3
    # partition pruning works on the partition column
    assert back.where(F.col("name") == "a").count() == 1


def test_resize_and_frame_sample_plumbing(spark):
    import pandas as pd

    from data_engineering_rag_spark.operators.multimodal import (
        resize_images,
        sample_frames,
        synthetic_media,
    )

    docs = spark.createDataFrame(
        [(0, "an image doc", 12), (2, "a video doc!", 12), (5, "video two xy", 12)],
        ["doc_id", "text", "n_chars"],
    )
    media = synthetic_media(spark, docs)
    resized = resize_images(media, width=64, height=32).collect()
    assert [(r.media_id, r.width, r.height) for r in resized] == [(0, 64, 32)]
    assert len(resized[0].payload) == 32  # sha256 digest stands in for pixels

    frames = sample_frames(media, every_ms=40).collect()
    # videos: doc_id 2 and 5, duration 120ms -> frames at 0,40,80,120
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    assert set(by_media) == {2, 5}
    for mid, rows in by_media.items():
        assert [r.frame_idx for r in sorted(rows, key=lambda x: x.frame_idx)] == [0, 1, 2, 3]
        assert {r.t_ms for r in rows} == {0, 40, 80, 120}
        assert len({r.frame_sha for r in rows}) == 4  # distinct per frame


def test_real_codec_path_raises(spark):
    import pytest as _pytest

    from data_engineering_rag_spark.operators.multimodal import (
        resize_images,
        sample_frames,
        synthetic_media,
    )
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    docs = spark.createDataFrame([(0, "img", 3), (2, "vid", 3)], ["doc_id", "text", "n_chars"])
    media = synthetic_media(spark, docs)
    with _pytest.raises((PythonException, Py4JJavaError), match="NotImplementedError"):
        resize_images(media, fake=False).collect()
    with _pytest.raises((PythonException, Py4JJavaError), match="NotImplementedError"):
        sample_frames(media, fake=False).collect()
