"""Pure-stdlib PNG codec for the multimodal operators.

The container has no imaging libraries, but PNG needs none: the format
is zlib (stdlib) + per-scanline byte filters (numpy). This makes the
image path of the multimodal pipeline REAL for the most common lossless
format — decode, resize, feature-extract, and re-encode all operate on
actual pixels — while JPEG/audio/video remain clearly-labeled stub
seams (operators/multimodal.py).

Supported (r5: the full still-image spec surface): bit depths 1/2/4/8/16,
color types 0 (gray), 2 (RGB), 3 (indexed, PLTE + optional tRNS → RGBA),
4 (gray+alpha), 6 (RGBA), and BOTH interlace modes (none / Adam7).
16-bit samples decode to their high byte (8-bit output contract).
Malformed streams raise ValueError with a precise reason — never a
silent wrong answer.

Spec: the public PNG specification (RFC 2083 / ISO 15948): IHDR/PLTE/
tRNS/IDAT chunk layout, the five scanline filters None/Sub/Up/Average/
Paeth, and the Adam7 pass grid.
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


# Adam7 pass grid: (x0, y0, dx, dy) per pass, in stream order
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _unfilter_pass(raw: bytes, off: int, h: int, stride: int, byte_bpp: int):
    """Un-filter one image (or Adam7 pass): consume h*(stride+1) bytes
    at ``off``, return ((h, stride) uint8 of reconstructed bytes, new
    offset)."""
    end = off + h * (stride + 1)
    if end > len(raw):
        raise ValueError("PNG data length mismatch")
    arr = np.frombuffer(raw[off:end], dtype=np.uint8).reshape(h, stride + 1)
    filters = np.ascontiguousarray(arr[:, 0])
    if filters.max(initial=0) > 4:
        raise ValueError(f"bad PNG filter {int(filters.max())}")
    out = np.ascontiguousarray(arr[:, 1:])
    if not native.png_unfilter(out, filters, byte_bpp):
        _unfilter_python(out, filters, byte_bpp)
    return out, end


def _bytes_to_samples(rows: np.ndarray, w: int, ch: int, depth: int) -> np.ndarray:
    """(h, scanline_bytes) reconstructed bytes → (h, w, ch) uint8 samples
    (16-bit keeps the high byte; sub-byte depths unpack MSB-first)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * ch].reshape(h, w, ch)
    if depth == 16:
        return rows[:, : w * ch * 2].reshape(h, w, ch, 2)[..., 0]
    # 1/2/4-bit: single-channel only (gray or palette indices)
    bits = np.unpackbits(rows, axis=1)
    spp = 8 // depth
    vals = np.zeros((h, rows.shape[1] * spp), dtype=np.uint8)
    for b in range(depth):
        vals = (vals << 1) | bits[:, b :: depth][:, : vals.shape[1]]
    # bits[:, b::depth] walks each sample's b-th bit in MSB-first order
    return vals[:, :w].reshape(h, w, 1)


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
    plte = trns = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + CRC
        if tag == b"IHDR":
            if len(body) != 13:
                raise ValueError(f"IHDR length {len(body)} != 13")
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    ch = 1 if color_type == 3 else _CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    valid_depths = {
        0: (1, 2, 4, 8, 16),
        2: (8, 16),
        3: (1, 2, 4, 8),
        4: (8, 16),
        6: (8, 16),
    }[color_type]
    if bit_depth not in valid_depths:
        raise ValueError(
            f"invalid PNG bit depth {bit_depth} for color type {color_type}"
        )
    if color_type == 3 and plte is None:
        raise ValueError("indexed PNG without PLTE")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    byte_bpp = max(1, (bit_depth * ch) // 8)

    def scan_bytes(w):
        return (w * ch * bit_depth + 7) // 8

    if not interlace:
        rows, end = _unfilter_pass(raw, 0, height, scan_bytes(width), byte_bpp)
        if end != len(raw):
            raise ValueError("PNG data length mismatch")
        samples = _bytes_to_samples(rows, width, ch, bit_depth)
    elif interlace == 1:
        samples = np.zeros((height, width, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows, off = _unfilter_pass(raw, off, ph, scan_bytes(pw), byte_bpp)
            samples[y0::dy, x0::dx] = _bytes_to_samples(rows, pw, ch, bit_depth)
        if off != len(raw):
            raise ValueError("PNG data length mismatch")
    else:
        raise ValueError(f"unknown PNG interlace method {interlace}")

    if color_type == 3:
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if color_type == 0 and bit_depth < 8:
        # scale sub-byte gray to full 8-bit range (spec sample scaling)
        samples = samples * (255 // ((1 << bit_depth) - 1))
    if ch == 1:
        return samples.reshape(height, width)
    return samples


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
    if len(data) < 29:
        raise ValueError("truncated IHDR")
    width, height, _depth, color_type, _c, _f, _i = struct.unpack(">IIBBBBB", data[16:29])
    if color_type == 3:
        # indexed decodes to RGB — or RGBA when a tRNS chunk adds alpha
        # (decode_png returns 4 channels then; report what decode yields)
        channels = 4 if _has_chunk(data, b"tRNS") else 3
    elif color_type in _CHANNELS:
        channels = _CHANNELS[color_type]
    else:
        raise ValueError(f"unknown PNG color type {color_type}")
    return width, height, channels


def _has_chunk(data: bytes, name: bytes) -> bool:
    """Walk the chunk stream for ``name`` (stops at IDAT/IEND — ancillary
    chunks that matter for metadata precede the image data)."""
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        if ctype == name:
            return True
        if ctype in (b"IDAT", b"IEND"):
            return False
        pos += 12 + length
    return False


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width); channel-preserving."""
    h0, w0 = img.shape[0], img.shape[1]
    yy = (np.arange(height) * h0) // height
    xx = (np.arange(width) * w0) // width
    return img[yy][:, xx]
