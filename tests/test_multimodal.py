"""Multimodal binary-column plumbing: schema, determinism, decode seam,
feature shapes, resize math, 1→N frame fan-out, byte balancing."""

import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    repartition_by_bytes,
    resize_images,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def images(spark):
    return synth_media(spark, 20, "image").cache()


@pytest.fixture(scope="module")
def videos(spark):
    return synth_media(spark, 10, "video").cache()


def test_synth_media_schema_and_determinism(spark, images):
    rows = {r.media_id: r for r in images.collect()}
    again = {r.media_id: r for r in synth_media(spark, 20, "image").collect()}
    assert len(rows) == 20
    for k in rows:
        assert bytes(rows[k].content) == bytes(again[k].content)
        assert rows[k].meta.width >= 16 and rows[k].meta.height >= 16
        assert rows[k].meta.fmt == "fake-img"


def test_decode_roundtrip(spark, images):
    decoded = decode_media(images.select("media_id", "kind", "content", "meta"))
    orig = {r.media_id: r.meta for r in images.collect()}
    out = {r.media_id: r.meta for r in decoded.collect()}
    assert orig.keys() == out.keys()
    for k in orig:
        assert out[k].width == orig[k].width and out[k].height == orig[k].height


def test_decode_rejects_real_formats(spark):
    df = spark.createDataFrame(
        [(1, "image", bytearray(b"\x89PNG....real"), None)],
        "media_id long, kind string, content binary, meta struct<width: int, height: int, sample_rate: int, n_frames: int, fmt: string>",
    )
    with pytest.raises(Exception, match="NotImplementedError|not present"):
        decode_media(df).collect()


def test_extract_features(spark, images):
    feats = extract_features(images).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r.feature) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r.feature)
    # deterministic
    again = extract_features(images).collect()
    assert sorted((r.media_id, tuple(r.feature)) for r in again) == sorted(
        (r.media_id, tuple(r.feature)) for r in feats
    )


def test_resize(spark, images):
    resized = resize_images(images, 8, 8).collect()
    for r in resized:
        assert r.meta.width == 8 and r.meta.height == 8
        assert len(bytes(r.content)) == 17 + 64  # header + 8x8 payload


def test_sample_frames_fanout(spark, videos):
    metas = {r.media_id: r.meta.n_frames for r in videos.collect()}
    frames = sample_frames(videos, every=2).collect()
    expected = sum((nf + 1) // 2 for nf in metas.values())
    assert len(frames) == expected
    for r in frames:
        assert r.frame_idx % 2 == 0
        assert len(bytes(r.frame)) == 256


def test_repartition_by_bytes(spark, images):
    out = repartition_by_bytes(images, target_bytes=4096)
    assert out.count() == 20
    assert out.rdd.getNumPartitions() >= 2
    assert out.columns == ["media_id", "kind", "content", "meta"]
