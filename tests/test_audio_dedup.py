"""operators/audio_dedup.py — energy-contour audio fingerprinting with
planted transcoded/resampled/gain-adjusted copies."""

import io
import wave

import numpy as np
import pytest

from dataset_dedupe_estimator_spark.operators.audio_dedup import (
    audio_hash_bits,
    audio_hashes,
    near_dup_audio,
)
from dataset_dedupe_estimator_spark.operators.multimodal import MEDIA_DDL


@pytest.fixture(scope="module")
def spark():
    from dataset_dedupe_estimator_spark import get_spark

    return get_spark(app_name="test-audio-dedup", shuffle_partitions=8)


def _signal(seed, n=16000, rate_mod=1.0):
    """Structured signal: random piecewise amplitude envelope over a
    tone — energy contour is the identity; pure noise has a flat one."""
    rng = np.random.default_rng(seed)
    env = np.repeat(rng.uniform(0.05, 1.0, 40), n // 40 + 1)[:n]
    t = np.arange(n)
    return (np.sin(2 * np.pi * 440 * rate_mod * t / 16000) * env * 20000).astype("<i2")


def _wav(pcm, rate=16000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _ham(a, b):
    return bin(a ^ b).count("1")


def test_hash_invariances():
    pcm = _signal(1)
    h0 = audio_hash_bits(pcm.reshape(-1, 1))
    # uniform gain: identical (energy ratios unchanged)
    assert audio_hash_bits((pcm // 2).reshape(-1, 1)) == h0
    # 2x downsample: same duration-normalized contour
    assert _ham(h0, audio_hash_bits(pcm[::2].reshape(-1, 1))) <= 6
    # mu-law transcode roundtrip: companding preserves energy ordering
    from dataset_dedupe_estimator_spark.operators.multimodal import (
        _mulaw_expand,
    )

    # crude mu-law compress (inverse of the expansion's segment map)
    def mulaw_compress(x):
        x = np.clip(x.astype(np.int32), -32124, 32124) // 4
        sign = (x < 0).astype(np.uint8) * 0x80
        mag = np.abs(x) + 33
        exp = np.floor(np.log2(mag / 33)).astype(np.int32).clip(0, 7)
        mant = ((mag >> (exp + 1)) - 16).clip(0, 15)
        return (~(sign | (exp.astype(np.uint8) << 4) | mant.astype(np.uint8))) & 0xFF

    trans = _mulaw_expand(mulaw_compress(pcm).astype(np.uint8))
    assert _ham(h0, audio_hash_bits(trans.reshape(-1, 1))) <= 6
    # different recording: far
    assert _ham(h0, audio_hash_bits(_signal(2).reshape(-1, 1))) > 16


def test_near_dup_audio_finds_planted_copies(spark):
    rows = []
    for i in range(4):
        pcm = _signal(50 + i)
        rows.append((i * 10, "audio", bytearray(_wav(pcm)), None))
        if i < 2:
            rows.append((i * 10 + 1, "audio", bytearray(_wav((pcm // 3))), None))
            rows.append((i * 10 + 2, "audio", bytearray(_wav(pcm[::2], rate=8000)), None))
    rows.append((999, "junk", bytearray(b"RIFFxxxxNOPE"), None))
    media = spark.createDataFrame(rows, MEDIA_DDL)
    assert audio_hashes(media).count() == len(rows) - 1
    pairs = {(r.clip_a, r.clip_b) for r in near_dup_audio(media).collect()}
    for i in range(2):
        assert (i * 10, i * 10 + 1) in pairs  # gain-adjusted copy
        assert (i * 10, i * 10 + 2) in pairs  # resampled copy
    for a, b in pairs:
        assert a // 10 == b // 10  # no cross-recording pairs
