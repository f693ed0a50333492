"""Pure-stdlib PNG codec for the multimodal operators.

The container has no imaging libraries, but PNG needs none: the format
is zlib (stdlib) + per-scanline byte filters (numpy). This makes the
image path of the multimodal pipeline REAL for the most common lossless
format — decode, resize, feature-extract, and re-encode all operate on
actual pixels — while JPEG/audio/video remain clearly-labeled stub
seams (operators/multimodal.py).

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced. Indexed (3), 16-bit, and interlaced images
raise ValueError with a precise reason — a seam, not a silent wrong
answer.

Spec: the public PNG specification (RFC 2083 / ISO 15948): IHDR/IDAT
chunk layout, and the five scanline filters None/Sub/Up/Average/Paeth.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from dataset_dedupe_estimator_spark.operators import native

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_SIG


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W) uint8 for grayscale or (H, W, C) uint8.

    Scanline un-filtering is row-serial by spec (each row references the
    previous reconstructed row) but vectorized within the row; decode
    runs inside Arrow-batched executor tasks, so files parallelize."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + CRC
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type} (indexed not supported)")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = np.ascontiguousarray(arr[:, 0])
    if filters.max(initial=0) > 4:
        raise ValueError(f"bad PNG filter {int(filters.max())}")
    out = np.ascontiguousarray(arr[:, 1:])
    if not native.png_unfilter(out, filters, ch):
        _unfilter_python(out, filters, ch)
    if ch == 1:
        return out.reshape(height, width)
    return out.reshape(height, width, ch)


def _unfilter_python(out: np.ndarray, filters: np.ndarray, ch: int) -> None:
    """Fallback un-filter (no C compiler): Up and Sub vectorized (Sub is
    a per-lane running sum mod 256); Average/Paeth per-pixel — row-serial
    data dependencies, spec-faithful."""
    height, stride = out.shape
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = filters[y]
        cur = out[y]
        if f == 1:  # Sub: prefix sum per channel lane, wraparound
            lanes = cur.reshape(-1, ch).astype(np.int64)
            cur[:] = (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            cur += prev
        elif f == 3:  # Average
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pr) & 0xFF
        prev = cur


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """(H, W) or (H, W, {1,2,3,4}) uint8 → PNG bytes (filter 0 rows)."""
    if img.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = np.zeros((h, w * ch + 1), dtype=np.uint8)
    raw[:, 1:] = img.reshape(h, w * ch)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw.tobytes(), compress_level))
        + chunk(b"IEND", b"")
    )


def png_meta(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the IHDR without decompressing."""
    if not is_png(data):
        raise ValueError("not a PNG")
    if data[12:16] != b"IHDR":
        raise ValueError("IHDR not first chunk")
    width, height, _depth, color_type, _c, _f, _i = struct.unpack(">IIBBBBB", data[16:29])
    return width, height, _CHANNELS.get(color_type, 0)


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width); channel-preserving."""
    h0, w0 = img.shape[0], img.shape[1]
    yy = (np.arange(height) * h0) // height
    xx = (np.arange(width) * w0) // width
    return img[yy][:, xx]
