"""Perceptual audio near-duplicate detection — the audio leg of the
multimodal dedup triple (text MinHash / image dHash / this), for
speech/audio training corpora where byte dedup misses transcoded,
resampled, or volume-adjusted copies of the same recording.

Fingerprint: a 64-bit energy-contour hash. Decode (any wav_samples
format: PCM, float, G.711) → mono → TIME-NORMALIZED energy envelope
(the signal is split into {N_FRAMES+1} equal-duration frames regardless
of sample rate, so a resampled copy lands on the same contour) → sign
bits of consecutive-frame energy RATIOS. Ratios make the hash invariant
to uniform gain; time normalization makes it invariant to sample rate;
G.711 companding preserves energy ordering, so transcoded copies match.

Candidate search mirrors image_dedup: 16-bit bands over the 64-bit
hash, equi-join per band through one posexplode, exact Hamming
verification on candidates only — never all-pairs, pixels/samples never
shuffle (only 8-byte keys do).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

N_FRAMES = 64  # energy-gradient bits
N_BANDS = 4
DEFAULT_MAX_HAMMING = 10


def audio_hash_bits(samples: np.ndarray) -> int:
    """64-bit energy-contour hash of decoded (frames, channels) int16."""
    mono = samples.astype(np.float64).mean(axis=1) if samples.ndim == 2 else samples.astype(np.float64)
    n = mono.shape[0]
    if n < N_FRAMES + 1:
        mono = np.pad(mono, (0, N_FRAMES + 1 - n))
        n = mono.shape[0]
    # equal-DURATION frames: index bins scale with the signal length
    bounds = (np.arange(N_FRAMES + 2) * n) // (N_FRAMES + 1)
    energy = np.array(
        [
            float(np.mean(mono[bounds[i] : max(bounds[i] + 1, bounds[i + 1])] ** 2))
            for i in range(N_FRAMES + 1)
        ]
    )
    bits = energy[1:] > energy[:-1]
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def audio_hashes(media: DataFrame) -> DataFrame:
    """(media_id, hi, lo) for every decodable WAV row; undecodable rows
    are skipped, not failed."""

    def fn(batches):
        import pyarrow as pa

        from dataset_dedupe_estimator_spark.operators.multimodal import (
            is_wav,
            wav_samples,
        )

        for batch in batches:
            idx = {n: i for i, n in enumerate(batch.schema.names)}
            ids = batch.column(idx["media_id"]).to_pylist()
            contents = batch.column(idx["content"]).to_pylist()
            out = []
            for mid, content in zip(ids, contents):
                try:
                    if not is_wav(content):
                        continue
                    h = audio_hash_bits(wav_samples(content))
                except (ValueError, NotImplementedError):
                    continue
                out.append((mid, h >> 32, h & 0xFFFFFFFF))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([m for m, _, _ in out], pa.int64()),
                    pa.array([h for _, h, _ in out], pa.int64()),
                    pa.array([l for _, _, l in out], pa.int64()),
                ],
                names=["media_id", "hi", "lo"],
            )

    return media.select("media_id", "content").mapInArrow(
        fn, "media_id long, hi long, lo long"
    )


def near_dup_audio(
    media: DataFrame, max_hamming: int = DEFAULT_MAX_HAMMING
) -> DataFrame:
    """(clip_a, clip_b, hamming) for audio pairs within ``max_hamming``
    contour bits that share >= 1 exact 16-bit band — the image_dedup
    join shape over audio fingerprints."""
    hashes = audio_hashes(media)
    band = F.array(
        *[
            F.expr(f"hi div {1 << (16 * b - 32)} % 65536") if b >= 2
            else F.expr(f"lo div {1 << (16 * b)} % 65536")
            for b in range(N_BANDS)
        ]
    )
    banded = hashes.select(
        "media_id", "hi", "lo", F.posexplode(band).alias("band_id", "band_val")
    )
    a = banded.select(
        "band_id", "band_val",
        F.col("media_id").alias("clip_a"), F.col("hi").alias("hi_a"), F.col("lo").alias("lo_a"),
    )
    b = banded.select(
        "band_id", "band_val",
        F.col("media_id").alias("clip_b"), F.col("hi").alias("hi_b"), F.col("lo").alias("lo_b"),
    )
    ham = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    )
    return (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("clip_a") < F.col("clip_b"))
        .select("clip_a", "clip_b", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("clip_a", "clip_b")
    )
