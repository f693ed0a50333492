"""Perceptual image near-duplicate detection — the image-side analogue
of the text MinHash pipeline, for VLM / multimodal training data where
byte-identical dedup misses re-encoded, resized, or lightly edited
copies of the same picture.

Fingerprint: dHash (difference hash) — decode → grayscale → box-resample
to (HASH_W+1) x HASH_H → 64 horizontal gradient sign bits. dHash is
invariant to re-encoding, uniform brightness shifts, and scaling, and
two images within a few bits of Hamming distance are near-certain
visual duplicates (the classic operating point is <= 10/64 bits).

Candidate search is BANDED, never all-pairs: the 64-bit hash splits
into {N_BANDS} x 16-bit bands; by pigeonhole, any pair within
{N_BANDS - 1} bits of Hamming distance collides on at least one exact
band — a plain equi-join per band, unioned through ONE posexplode (the
simhash_candidates shape). Exact Hamming verification runs only on the
banded candidates.

Scale: decode + hash is a map-only Arrow pass (rides the media scan);
the band join shuffles 8-byte keys, not pixels; verification touches
candidate pairs only. Same never-all-pairs discipline as every dedup
surface in this repo.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

HASH_W = 8  # gradient bits per row
HASH_H = 8  # rows → 64-bit hash
N_BANDS = 4  # 16-bit bands; catches all pairs with Hamming <= 3 for sure
DEFAULT_MAX_HAMMING = 10
# degenerate fingerprints (blank/solid images, silence) collapse onto one
# band value and would make the band join quadratic; values hotter than
# this are dropped from candidate generation (see banded_hamming_pairs)
DEFAULT_MAX_BAND_MEMBERS = 1024

# what the pure-python/numpy codecs actually raise on malformed bytes —
# struct/zlib/Index errors escape a (ValueError,) guard and would fail
# the whole corpus scan on one corrupt row
import struct as _struct
import zlib as _zlib

DECODE_ERRORS = (
    ValueError,
    NotImplementedError,
    IndexError,
    _struct.error,
    _zlib.error,
)


def banded_hamming_pairs(
    hashes: DataFrame,
    id_a: str,
    id_b: str,
    max_hamming: int = DEFAULT_MAX_HAMMING,
    carry: tuple = (),
    max_band_members: int | None = DEFAULT_MAX_BAND_MEMBERS,
) -> DataFrame:
    """Banded 16-bit LSH self-join + exact Hamming verify over a
    ``(media_id, hi, lo, *carry)`` fingerprint frame — the ONE candidate
    generator behind image, video-frame, and audio near-dup (identical
    band math everywhere; fix it here, every modality inherits it).

    Hot-band cap: a band value held by more than ``max_band_members``
    rows is dropped from candidate generation (its join contribution is
    quadratic; such values come from degenerate fingerprints — blank
    frames, silent clips — whose mutual near-duplicates are better
    found with an exact hash groupBy than a pair explosion). Pass
    ``None`` to disable. The cap table is a broadcast of hot values
    only, so the guard costs one aggregate over 8-byte keys.
    """
    band = F.array(
        *[
            F.expr(f"hi div {1 << (16 * b - 32)} % 65536") if b >= 2
            else F.expr(f"lo div {1 << (16 * b)} % 65536")
            for b in range(N_BANDS)
        ]
    )
    banded = hashes.select(
        "media_id", "hi", "lo", *carry,
        F.posexplode(band).alias("band_id", "band_val"),
    )
    if max_band_members is not None:
        hot = (
            banded.groupBy("band_id", "band_val")
            .agg(F.count(F.lit(1)).alias("_members"))
            .filter(F.col("_members") > max_band_members)
            .select("band_id", "band_val")
        )
        banded = banded.join(F.broadcast(hot), ["band_id", "band_val"], "left_anti")

    def side(suffix, id_name):
        cols = [
            F.col("band_id"), F.col("band_val"),
            F.col("media_id").alias(id_name),
            F.col("hi").alias(f"hi_{suffix}"), F.col("lo").alias(f"lo_{suffix}"),
        ]
        cols += [F.col(c).alias(f"{c}_{suffix}") for c in carry]
        return banded.select(*cols)

    a, b = side("a", id_a), side("b", id_b)
    ham = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    )
    keep = [id_a, id_b]
    keep += [f"{c}_a" for c in carry] + [f"{c}_b" for c in carry]
    return (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col(id_a) < F.col(id_b))
        .select(*keep, ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def dhash_bits(px: np.ndarray) -> int:
    """64-bit dHash of a decoded uint8 image ((h, w) or (h, w, C))."""
    if px.ndim == 3:
        px = px[:, :, : min(3, px.shape[2])].mean(axis=2)
    g = px.astype(np.float64)
    h0, w0 = g.shape
    # box-resample to (HASH_H, HASH_W+1) via mean pooling over index bins
    ys = (np.arange(h0) * HASH_H) // max(1, h0)
    xs = (np.arange(w0) * (HASH_W + 1)) // max(1, w0)
    small = np.zeros((HASH_H, HASH_W + 1))
    counts = np.zeros((HASH_H, HASH_W + 1))
    np.add.at(small, (ys[:, None], xs[None, :]), g)
    np.add.at(counts, (ys[:, None], xs[None, :]), 1.0)
    small /= np.maximum(counts, 1.0)
    bits = (small[:, 1:] > small[:, :-1]).ravel()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def image_hashes(media: DataFrame) -> DataFrame:
    """(media_id, hi, lo) — the 64-bit dHash as two 32-bit halves —
    for every decodable image row (PNG or JPEG —
    both real codecs). Non-image/undecodable rows are skipped, not
    failed: a corpus scan must survive stray bytes."""

    def fn(batches):
        import pyarrow as pa

        from dataset_dedupe_estimator_spark.operators import png_codec
        from dataset_dedupe_estimator_spark.operators.jpeg_codec import jpeg_decode
        from dataset_dedupe_estimator_spark.operators.multimodal import is_jpeg

        for batch in batches:
            idx = {n: i for i, n in enumerate(batch.schema.names)}
            ids = batch.column(idx["media_id"]).to_pylist()
            contents = batch.column(idx["content"]).to_pylist()
            out_ids, out_hashes = [], []
            for mid, content in zip(ids, contents):
                try:
                    if png_codec.is_png(content):
                        px = png_codec.decode_png(content)
                    elif is_jpeg(content):
                        px = jpeg_decode(content)
                    else:
                        continue
                except DECODE_ERRORS:
                    continue
                out_ids.append(mid)
                h = dhash_bits(px)
                out_hashes.append((h >> 32, h & 0xFFFFFFFF))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_ids, pa.int64()),
                    pa.array([h for h, _ in out_hashes], pa.int64()),
                    pa.array([l for _, l in out_hashes], pa.int64()),
                ],
                names=["media_id", "hi", "lo"],
            )

    # the 64-bit hash travels as two int64 halves (Spark has no uint64
    # Arrow mapping, and a signed long top bit would break div math)
    return media.select("media_id", "content").mapInArrow(
        fn, "media_id long, hi long, lo long"
    )


def video_frame_hashes(media: DataFrame, every: int = 1) -> DataFrame:
    """(media_id, frame_idx, hi, lo): dHash of every ``every``-th frame
    of each MJPEG-AVI row (operators/multimodal.sample_frames semantics
    inlined so decode+hash stay one Arrow pass — frames never leave the
    task)."""

    def fn(batches):
        import pyarrow as pa

        from dataset_dedupe_estimator_spark.operators.jpeg_codec import jpeg_decode
        from dataset_dedupe_estimator_spark.operators.multimodal import (
            avi_mjpeg_frames,
            is_avi,
        )

        for batch in batches:
            idx = {n: i for i, n in enumerate(batch.schema.names)}
            ids = batch.column(idx["media_id"]).to_pylist()
            contents = batch.column(idx["content"]).to_pylist()
            out = []
            for mid, content in zip(ids, contents):
                if not is_avi(content):
                    continue
                try:
                    for f_idx, frame in enumerate(avi_mjpeg_frames(content)):
                        if f_idx % every:
                            continue
                        h = dhash_bits(jpeg_decode(frame))
                        out.append((mid, f_idx, h >> 32, h & 0xFFFFFFFF))
                except DECODE_ERRORS:
                    continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([m for m, _, _, _ in out], pa.int64()),
                    pa.array([f for _, f, _, _ in out], pa.int32()),
                    pa.array([h for _, _, h, _ in out], pa.int64()),
                    pa.array([l for _, _, _, l in out], pa.int64()),
                ],
                names=["media_id", "frame_idx", "hi", "lo"],
            )

    return media.select("media_id", "content").mapInArrow(
        fn, "media_id long, frame_idx int, hi long, lo long"
    )


def near_dup_videos(
    media: DataFrame,
    max_hamming: int = DEFAULT_MAX_HAMMING,
    min_overlap: float = 0.5,
) -> DataFrame:
    """(vid_a, vid_b, n_matched_frames, overlap): video pairs where at
    least ``min_overlap`` of the shorter video's frames have a
    near-dup frame (banded dHash, exact Hamming verify) in the other —
    re-encoded or trimmed copies of the same clip. Frame pairs come
    from the same banded join as images; the rollup counts DISTINCT
    matched frames of each side so repeated stills can't inflate the
    overlap."""
    # decode + per-frame hash is the dominant cost and feeds TWO
    # consumers (the banded join and the frame-count aggregate) with
    # different partitionings — checkpoint so every video decodes once
    fh = video_frame_hashes(media).localCheckpoint(eager=True)
    frame_pairs = banded_hamming_pairs(
        fh, "vid_a", "vid_b", max_hamming, carry=("frame_idx",)
    )
    counts = fh.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_frames"))
    ca = counts.select(F.col("media_id").alias("vid_a"), F.col("n_frames").alias("n_a"))
    cb = counts.select(F.col("media_id").alias("vid_b"), F.col("n_frames").alias("n_b"))
    matched = frame_pairs.groupBy("vid_a", "vid_b").agg(
        F.countDistinct("frame_idx_a").alias("ma"),
        F.countDistinct("frame_idx_b").alias("mb"),
    )
    # the documented metric: fraction of the SHORTER video's frames with
    # a near-dup in the other — the numerator must be the matched count
    # of that same shorter side (least(ma, mb) false-negatives when the
    # short side's frames all map onto few distinct frames of the long
    # side, e.g. a lower-effective-frame-rate copy)
    m_short = F.when(F.col("n_a") <= F.col("n_b"), F.col("ma")).otherwise(F.col("mb"))
    overlap = m_short / F.least("n_a", "n_b")
    return (
        matched.join(F.broadcast(ca), "vid_a")
        .join(F.broadcast(cb), "vid_b")
        .select(
            "vid_a", "vid_b",
            m_short.alias("n_matched_frames"),
            F.round(overlap, 3).alias("overlap"),
        )
        .filter(F.col("overlap") >= min_overlap)
        .orderBy("vid_a", "vid_b")
    )


def near_dup_images(
    media: DataFrame, max_hamming: int = DEFAULT_MAX_HAMMING
) -> DataFrame:
    """(img_a, img_b, hamming) for every image pair whose dHash Hamming
    distance is <= max_hamming AND that collides on >= 1 exact 16-bit
    band (banding recall: certain for distance < N_BANDS, high for the
    near-dup regime). Never all-pairs."""
    # checkpoint: the hot-band guard aggregates over the banded frame,
    # which would otherwise re-decode every image a second time
    hashes = image_hashes(media).localCheckpoint(eager=True)
    return banded_hamming_pairs(hashes, "img_a", "img_b", max_hamming).orderBy(
        "img_a", "img_b"
    )
