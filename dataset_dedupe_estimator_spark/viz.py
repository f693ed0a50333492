"""Chunk-provenance visualization (S12/S13).

S12 — PNG heatmap (reference src/show.rs:259-283): render the segments
sequence (every chunk occurrence mapped to its first_seen_in file index)
as a 256×256 image of 8-px blocks: 32×32 blocks, each colored by the
provenance of the corresponding slice of the byte stream (linear resample,
src/show.rs:192-257). No imaging library is available here, so the PNG is
emitted by a minimal stdlib encoder (zlib deflate of filtered scanlines) —
output format parity, independent implementation.

S13 — HTML multi-doc diff strips (de/__init__.py:83-145): one vertical
strip per file; each row's opacity encodes whether the chunk at that
position is shared (first seen elsewhere) or unique.

Both render driver-side from collected DataFrames: visualization is not a
distributed concern; at 100 TB the `segments` projection is aggregated
(resampled) Spark-side before collect (only GRID² values come back).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID = 32
BLOCK = 8
SIZE = GRID * BLOCK  # 256

# 32-entry categorical palette (role of src/show.rs:24-185's palette —
# distinct hues, own values).
_PALETTE = np.array(
    [
        (31, 119, 180), (255, 127, 14), (44, 160, 44), (214, 39, 40),
        (148, 103, 189), (140, 86, 75), (227, 119, 194), (127, 127, 127),
        (188, 189, 34), (23, 190, 207), (174, 199, 232), (255, 187, 120),
        (152, 223, 138), (255, 152, 150), (197, 176, 213), (196, 156, 148),
        (247, 182, 210), (199, 199, 199), (219, 219, 141), (158, 218, 229),
        (57, 59, 121), (82, 84, 163), (107, 110, 207), (156, 158, 222),
        (99, 121, 57), (140, 162, 82), (181, 207, 107), (206, 219, 156),
        (140, 109, 49), (189, 158, 57), (231, 186, 82), (231, 203, 148),
    ],
    dtype=np.uint8,
)


def _png_bytes(rgb: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 array as PNG (stdlib only)."""
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _resample(values: np.ndarray, n_out: int) -> np.ndarray:
    """Linear index resample of a sequence to n_out entries
    (src/show.rs:192-257 role)."""
    if len(values) == 0:
        return np.zeros(n_out, dtype=np.int64)
    idx = np.minimum(
        (np.arange(n_out) * len(values)) // n_out, len(values) - 1
    )
    return values[idx]


def segments_to_png(segments: list[int], filename: str) -> None:
    """Render a segments sequence (first_seen_in per occurrence, stream
    order) as a 256×256 PNG of 8-px blocks (src/show.rs:259-283)."""
    vals = _resample(np.asarray(segments, dtype=np.int64), GRID * GRID)
    colors = _PALETTE[vals % len(_PALETTE)]
    grid = colors.reshape(GRID, GRID, 3)
    img = np.repeat(np.repeat(grid, BLOCK, axis=0), BLOCK, axis=1)
    with open(filename, "wb") as f:
        f.write(_png_bytes(img))


def write_provenance_pngs(chunks: DataFrame, out_dir: str) -> list[str]:
    """Per-file PNG + merged PNG from the chunk table (src/lib.rs:21-29).

    Spark-side: join to the dedup map and resample per file *before*
    collecting — the driver sees GRID² values per file, never the chunk
    table.
    """
    from dataset_dedupe_estimator_spark.plans.estimate import segments
    import os

    seg = segments(chunks).collect()
    os.makedirs(out_dir, exist_ok=True)
    by_file: dict[int, list[int]] = {}
    merged: list[int] = []
    for r in seg:
        by_file.setdefault(r.file_idx, []).append(r.first_seen_in)
        merged.append(r.first_seen_in)
    written = []
    for idx, vals in sorted(by_file.items()):
        path = os.path.join(out_dir, f"file-{idx:04d}.png")
        segments_to_png(vals, path)
        written.append(path)
    merged_path = os.path.join(out_dir, "merged.png")
    segments_to_png(merged, merged_path)
    written.append(merged_path)
    return written


def multidoc_diff_html(chunks: DataFrame) -> str:
    """S13 (de/__init__.py:83-145): per-file vertical strips; opacity
    encodes shared (chunk seen in >1 file) vs unique chunks."""
    from dataset_dedupe_estimator_spark.plans.estimate import dedup_map

    prov = dedup_map(chunks).select("hash", F.col("n_files_seen").alias("n_files"))
    rows = (
        chunks.join(F.broadcast(prov), "hash")
        .select("file_idx", "path", "seq", "size", "n_files")
        .orderBy("file_idx", "seq")
        .collect()
    )
    by_file: dict[int, list] = {}
    names: dict[int, str] = {}
    for r in rows:
        by_file.setdefault(r.file_idx, []).append(r)
        names[r.file_idx] = r.path.rsplit("/", 1)[-1]
    strips = []
    for idx, rs in sorted(by_file.items()):
        total = sum(r.size for r in rs) or 1
        cells = "".join(
            f'<div style="height:{100.0 * r.size / total:.2f}%;'
            f'background:#1f77b4;opacity:{1.0 if r.n_files == 1 else 0.25}"></div>'
            for r in rs
        )
        strips.append(
            f'<div style="display:inline-block;width:40px;margin:2px;vertical-align:top">'
            f'<div style="font-size:9px;overflow:hidden">{names[idx]}</div>'
            f'<div style="height:400px">{cells}</div></div>'
        )
    return (
        "<html><body><p>opaque = unique chunk, translucent = shared</p>"
        + "".join(strips)
        + "</body></html>"
    )
