"""operators/jpeg_codec.py — the pure-numpy baseline JPEG codec.

Roundtrip accuracy bounds: at quality=100 the Annex-K tables scale to
all-ones, so the only loss is DCT float rounding and the YCbCr
transform (≤ a couple of codes); subsampled chroma adds bounded error
on smooth images. The decoder is exercised on streams the encoder
produces AND on structural variations (restart markers, 4:2:0,
grayscale) — the marker/DHT/DQT parsing paths a third-party baseline
JPEG would hit."""

import numpy as np
import pytest

from dataset_dedupe_estimator_spark.operators.jpeg_codec import (
    ZZ,
    jpeg_decode,
    jpeg_encode,
)


def _gradient(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)


def test_zigzag_is_the_standard_scan():
    assert list(ZZ[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(ZZ) == list(range(64))
    assert ZZ[63] == 63


def test_roundtrip_color_444_q100_near_lossless():
    img = _gradient()
    out = jpeg_decode(jpeg_encode(img, quality=100))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_roundtrip_grayscale():
    yy, xx = np.mgrid[0:24, 0:33]
    g = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(g, quality=100))
    assert out.shape == g.shape and out.ndim == 2
    assert int(np.abs(out.astype(int) - g.astype(int)).max()) <= 2


def test_roundtrip_420_subsampled_smooth():
    yy, xx = np.mgrid[0:40, 0:56]
    smooth = np.stack([yy * 2, xx * 2, yy + xx], axis=2).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(smooth, quality=95, subsample=True))
    assert out.shape == smooth.shape
    assert int(np.abs(out.astype(int) - smooth.astype(int)).max()) <= 8


def test_restart_markers_roundtrip():
    img = _gradient()
    for ri in (1, 3):
        out = jpeg_decode(jpeg_encode(img, quality=100, restart_interval=ri))
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2
    out = jpeg_decode(
        jpeg_encode(img, quality=92, subsample=True, restart_interval=2)
    )
    assert out.shape == img.shape


def test_lossy_quality_tracks_error():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    errs = []
    for q in (95, 75, 40):
        out = jpeg_decode(jpeg_encode(img, quality=q))
        errs.append(float(np.abs(out.astype(int) - img.astype(int)).mean()))
    assert errs[0] < errs[1] < errs[2]  # lower quality, higher error


def test_odd_dimensions_pad_and_crop():
    img = _gradient(h=13, w=17)
    out = jpeg_decode(jpeg_encode(img, quality=100))
    assert out.shape == (13, 17, 3)
    out2 = jpeg_decode(jpeg_encode(img, quality=95, subsample=True))
    assert out2.shape == (13, 17, 3)


def test_arithmetic_and_hierarchical_rejected_with_labeled_seam():
    img = _gradient(16, 16)
    for sof_marker in (0xC9, 0xC3):  # arithmetic / hierarchical
        data = bytearray(jpeg_encode(img))
        sof = data.find(b"\xff\xc0")
        data[sof + 1] = sof_marker
        with pytest.raises(NotImplementedError, match="hierarchical/arithmetic"):
            jpeg_decode(bytes(data))


def test_malformed_progressive_scan_header_rejected():
    img = _gradient(16, 16)
    data = bytearray(jpeg_encode(img))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # claim progressive, but the scan is Ss=0..Se=63
    with pytest.raises(ValueError, match="Se=0"):
        jpeg_decode(bytes(data))


def test_not_a_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"PNG whatever")


def test_sof_meta_agrees_with_header_walk():
    from dataset_dedupe_estimator_spark.operators.multimodal import jpeg_meta

    img = _gradient(h=21, w=37)
    data = jpeg_encode(img, quality=80)
    assert jpeg_meta(data) == (37, 21)


def test_multimodal_jpeg_features_and_resize(spark):
    """The JPEG leg of the media pipeline end to end on REAL bytes:
    decode_media metadata, pixel features (match the decoded luminance),
    and resize re-encoding a decodable baseline JPEG."""
    from dataset_dedupe_estimator_spark.operators.multimodal import (
        MEDIA_DDL,
        decode_media,
        extract_features,
        resize_images,
    )

    img = _gradient(h=32, w=48)
    blob = jpeg_encode(img, quality=100)
    df = spark.createDataFrame(
        [(1, "image", bytearray(blob), None)], MEDIA_DDL
    )
    meta = decode_media(df).collect()[0].meta
    assert (meta.width, meta.height, meta.fmt) == (48, 32, "jpeg")

    feat = extract_features(df).collect()[0].feature
    decoded = jpeg_decode(blob)
    lum = decoded[:, :, :3].mean(axis=2).astype(np.float32)
    assert abs(feat[0] - lum.mean() / 255.0) < 1e-5
    assert abs(sum(feat[2:]) - 1.0) < 1e-5

    small = resize_images(decode_media(df), 16, 8).collect()[0]
    assert (small.meta.width, small.meta.height) == (16, 8)
    out_px = jpeg_decode(bytes(small.content))
    assert out_px.shape == (8, 16, 3)


# ---- progressive (SOF2) ---------------------------------------------------


def test_progressive_decodes_bit_identical_to_baseline():
    """Progressive reorganizes the SAME quantized coefficients, so its
    decode must EXACTLY equal the baseline decode — across successive
    approximation (DC+AC), spectral selection, subsampling, and the
    EOB-run-heavy flat-image case."""
    from dataset_dedupe_estimator_spark.operators.jpeg_codec import (
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(7)
    grad = _gradient()
    cases = [
        (grad, dict(quality=75, dc_al=0, ac_al=0)),  # spectral selection only
        (grad, dict(quality=85, dc_al=1, ac_al=1)),
        (grad, dict(quality=85, subsample=True, dc_al=1, ac_al=1)),
        (rng.integers(0, 256, (24, 40, 3), dtype=np.uint8), dict(quality=60, dc_al=2, ac_al=2)),
        (np.full((32, 32, 3), 130, dtype=np.uint8), dict(quality=85, dc_al=1, ac_al=1)),
        (grad, dict(quality=85, dc_al=0, ac_al=1, bands=((1, 63),))),
    ]
    for img, kw in cases:
        base = jpeg_decode(
            jpeg_encode(img, quality=kw.get("quality", 85), subsample=kw.get("subsample", False))
        )
        prog_bytes = jpeg_encode_progressive(img, **kw)
        assert b"\xff\xc2" in prog_bytes  # really SOF2
        assert np.array_equal(base, jpeg_decode(prog_bytes)), kw


def test_progressive_grayscale_and_meta():
    from dataset_dedupe_estimator_spark.operators.jpeg_codec import (
        jpeg_encode_progressive,
    )
    from dataset_dedupe_estimator_spark.operators.multimodal import jpeg_meta

    yy, xx = np.mgrid[0:24, 0:33]
    g = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    data = jpeg_encode_progressive(g, quality=100, dc_al=1, ac_al=1)
    assert np.array_equal(jpeg_decode(data), jpeg_decode(jpeg_encode(g, quality=100)))
    assert jpeg_meta(data) == (33, 24)  # SOF walk reads SOF2 frames too


def test_progressive_refinement_zrl_before_correction_bits():
    """Regression: a 16-zero-history run BEFORE an already-significant
    coefficient, followed by a newly-significant one, desynchronized the
    AC refinement scan (correction bit buffered across an unflushed ZRL
    — the libjpeg flush-ordering rule). Pixels are crafted through the
    inverse DCT so the quantized zigzag is exactly [DC, 16 zeros, 3, 0,
    1, ...]."""
    from dataset_dedupe_estimator_spark.operators import jpeg_codec as J

    qt = J._scaled_qt(J.QT_LUM, 85)
    zzvec = np.zeros(64)
    zzvec[0] = 4
    zzvec[22] = 3  # |c| >= 2: already significant in the first AC scan
    zzvec[24] = 1  # newly significant in the refinement scan
    blk = np.zeros(64)
    blk[J.ZZ] = zzvec
    px = J._idct2((blk.reshape(8, 8) * qt)) + 128
    img = np.clip(np.round(px), 0, 255).astype(np.uint8)
    # confirm the crafted pattern survives the encoder's own quantizer
    req = np.round(J._dct2(img.astype(np.float64) - 128) / qt).ravel()[J.ZZ]
    assert req[22] == 3 and req[24] == 1 and not req[6:22].any()
    base = jpeg_decode(jpeg_encode(img, quality=85))
    prog = jpeg_decode(J.jpeg_encode_progressive(img, quality=85))
    assert np.array_equal(base, prog)


def test_truncated_entropy_stream_raises():
    """A JPEG cut mid-scan must raise, not silently decode the missing
    MCUs as flat gray."""
    import pytest

    g = (np.arange(32 * 32, dtype=np.uint64) * 37 % 256).astype(np.uint8).reshape(32, 32)
    data = jpeg_encode(g, quality=85)
    cut = data[: len(data) // 2]
    with pytest.raises(ValueError, match="truncated"):
        jpeg_decode(cut)
