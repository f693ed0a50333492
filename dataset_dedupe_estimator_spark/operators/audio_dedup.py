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
from pyspark.sql import DataFrame

N_FRAMES = 64  # energy-gradient bits
# band math and thresholds live in image_dedup (one candidate generator
# for all modalities); re-exported for callers of this module
from dataset_dedupe_estimator_spark.operators.image_dedup import (  # noqa: E402
    DECODE_ERRORS,
    DEFAULT_MAX_HAMMING,
    N_BANDS,
)


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
                except DECODE_ERRORS:
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
    contour bits that share >= 1 exact 16-bit band — the SAME banded
    join (``image_dedup.banded_hamming_pairs``) as images and video
    frames, over audio fingerprints: one candidate generator for all
    three modalities, hot-band cap included."""
    from dataset_dedupe_estimator_spark.operators.image_dedup import (
        banded_hamming_pairs,
    )

    hashes = audio_hashes(media).localCheckpoint(eager=True)
    return banded_hamming_pairs(hashes, "clip_a", "clip_b", max_hamming).orderBy(
        "clip_a", "clip_b"
    )
