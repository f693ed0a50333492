"""operators/image_dedup.py — perceptual (dHash) image near-dup
detection with planted duplicates: re-encoded, resized, brightness-
shifted copies must be found; unrelated images must not."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.operators.image_dedup import (
    dhash_bits,
    image_hashes,
    near_dup_images,
)
from dataset_dedupe_estimator_spark.operators.jpeg_codec import jpeg_encode
from dataset_dedupe_estimator_spark.operators.multimodal import MEDIA_DDL
from dataset_dedupe_estimator_spark.operators.png_codec import encode_png


@pytest.fixture(scope="module")
def spark():
    from dataset_dedupe_estimator_spark import get_spark

    return get_spark(app_name="test-image-dedup", shuffle_partitions=8)


def _img(seed, h=64, w=64):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (8, 8, 3))
    # smooth structured image: upsampled random blocks (dHash needs
    # gradients, pure noise hashes unstably under resize)
    return np.repeat(np.repeat(base, h // 8, axis=0), w // 8, axis=1).astype(np.uint8)


def test_dhash_invariances():
    img = _img(1)
    h0 = dhash_bits(img)
    # re-encode roundtrip (JPEG q90) barely moves the hash
    from dataset_dedupe_estimator_spark.operators.jpeg_codec import jpeg_decode

    h_jpeg = dhash_bits(jpeg_decode(jpeg_encode(img, quality=90)))
    assert bin(h0 ^ h_jpeg).count("1") <= 6
    # uniform brightness shift: near-identical hash (clipping at 255
    # may flip a borderline gradient or two)
    shifted = np.clip(img.astype(int) + 30, 0, 255).astype(np.uint8)
    assert bin(h0 ^ dhash_bits(shifted)).count("1") <= 2
    # 2x downscale: close hash
    assert bin(h0 ^ dhash_bits(img[::2, ::2])).count("1") <= 6
    # different image: far hash
    assert bin(h0 ^ dhash_bits(_img(2))).count("1") > 16


def test_near_dup_images_finds_planted_copies(spark):
    rows = []
    for i in range(6):
        img = _img(100 + i)
        rows.append((i * 10, "image", bytearray(encode_png(img)), None))
        # planted near-dups for the first three: JPEG re-encode + resize
        if i < 3:
            rows.append(
                (i * 10 + 1, "image", bytearray(jpeg_encode(img, quality=90)), None)
            )
            rows.append(
                (i * 10 + 2, "image", bytearray(encode_png(img[::2, ::2])), None)
            )
    # a stray non-image blob must be skipped, not crash the scan
    rows.append((999, "junk", bytearray(b"not an image at all"), None))
    media = spark.createDataFrame(rows, MEDIA_DDL)
    assert image_hashes(media).count() == len(rows) - 1
    pairs = {(r.img_a, r.img_b) for r in near_dup_images(media).collect()}
    for i in range(3):
        assert (i * 10, i * 10 + 1) in pairs  # re-encoded copy found
        assert (i * 10, i * 10 + 2) in pairs  # resized copy found
    # no cross-image false positives between distinct base images
    for a, b in pairs:
        assert a // 10 == b // 10


def test_near_dup_videos_finds_reencoded_and_trimmed(spark):
    """Two MJPEG clips that are re-encodes (different quality) and a
    trimmed prefix of one must surface; unrelated clips must not."""
    from dataset_dedupe_estimator_spark.operators.image_dedup import (
        near_dup_videos,
        video_frame_hashes,
    )
    from dataset_dedupe_estimator_spark.operators.multimodal import (
        avi_encode_mjpeg,
    )

    def clip(seed, n=6):
        rng = np.random.default_rng(seed)
        frames = []
        for k in range(n):
            base = rng.integers(0, 256, (8, 8, 3))
            frames.append(
                np.repeat(np.repeat(base, 8, axis=0), 8, axis=1).astype(np.uint8)
            )
        return frames

    c1, c2 = clip(1), clip(2)
    rows = [
        (1, "video", bytearray(avi_encode_mjpeg(c1, fps=5)), None),
        (2, "video", bytearray(avi_encode_mjpeg(c1, fps=5)), None),  # re-encode
        (3, "video", bytearray(avi_encode_mjpeg(c1[:4], fps=5)), None),  # trim
        (4, "video", bytearray(avi_encode_mjpeg(c2, fps=5)), None),  # unrelated
    ]
    media = spark.createDataFrame(rows, MEDIA_DDL)
    assert video_frame_hashes(media).count() == 6 + 6 + 4 + 6
    pairs = {(r.vid_a, r.vid_b): r.overlap for r in near_dup_videos(media).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.99
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.99  # trimmed prefix fully covered
    assert all(4 not in p for p in pairs)
