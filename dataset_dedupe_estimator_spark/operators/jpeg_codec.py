"""Baseline JPEG codec — pure numpy/stdlib, no imaging library.

Implements ITU-T T.81 baseline sequential DCT, both directions:

* ``jpeg_encode(pixels, quality=85, subsample=False)`` — RGB (h, w, 3)
  or grayscale (h, w) uint8 → JFIF bytes. Standard Annex-K quantization
  tables with the libjpeg quality scaling; Huffman tables are CUSTOM
  canonical tables embedded in DHT (flat 4-bit DC / 8-bit AC codes —
  valid prefix codes any conformant decoder reads from the stream;
  simpler than Annex K's optimized tables at some compression cost).
  ``subsample=True`` writes 4:2:0 chroma.
* ``jpeg_decode(data)`` — baseline JFIF/Exif bytes → uint8 ndarray
  ((h, w, 3) for color, (h, w) for grayscale). Reads DQT/DHT/SOF0/
  SOS/DRI from the stream (so it decodes third-party baseline JPEGs,
  not just its own output), supports component sampling factors 1-2
  (4:4:4 / 4:2:2 / 4:2:0) and restart markers. Progressive (SOF2),
  arithmetic coding, and 12-bit precision raise labeled
  NotImplementedError seams.

Used by operators/multimodal.py to make the JPEG leg of the media
pipeline real end-to-end (metadata was already real via the SOF walk;
this adds pixels). Reference behavior: the reference treats media as
opaque bytes — this module exists for the multimodal feature/resize
operators the 100 TB training-data pipeline needs.
"""

from __future__ import annotations

import numpy as np

# ---- shared tables -------------------------------------------------------

# ITU-T T.81 Annex K.1 example quantization tables (the de-facto standard)
QT_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
QT_CHR = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)


def _zigzag():
    """The 8x8 zigzag scan, generated (not memorized): diagonals in
    order; odd diagonals walk row-ascending, even ones row-descending."""
    pts = sorted(
        ((i, j) for i in range(8) for j in range(8)),
        key=lambda p: (p[0] + p[1], p[0] if (p[0] + p[1]) % 2 else -p[0]),
    )
    return np.array([i * 8 + j for i, j in pts])


ZZ = _zigzag()  # block.ravel()[ZZ] = zigzag vector
UNZZ = np.argsort(ZZ)

_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _c = np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        _T[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16)


def _dct2(b):
    return _T @ b @ _T.T


def _idct2(f):
    return _T.T @ f @ _T


def _scaled_qt(base, quality: int):
    """libjpeg quality scaling: 1..100 → per-entry divisor in [1, 255]."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = np.floor((base * scale + 50) / 100)
    return np.clip(t, 1, 255)


# DC symbols 0..11 all at 4 bits; AC symbols (EOB, ZRL, 160 run/size
# pairs) all at 8 bits — valid canonical tables (the all-ones code of
# each length stays unused).
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_DC_BITS = [0] * 16
_DC_BITS[3] = len(_DC_SYMS)  # all length 4 (index 3 = length 4)
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_SYMS)  # all length 8


def _canonical_codes(bits, syms):
    """JPEG canonical assignment: (symbol -> (code, length))."""
    out = {}
    code = 0
    k = 0
    for li, count in enumerate(bits):
        length = li + 1
        for _ in range(count):
            out[syms[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMS)
AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMS)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---- bit I/O -------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-pad


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        d = self.data
        while self.n <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0
                self.n += 8
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # a real marker: pad with zeros, leave pos AT the
                    # 0xFF so the caller can see the marker
                    self.acc = (self.acc << 8) | 0
                    self.n += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def bits(self, length: int) -> int:
        if length == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return v

    def align_to_marker(self):
        """Drop buffered bits and consume an RST marker at self.pos."""
        self.acc = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker, hit end of stream")


# ---- encoder -------------------------------------------------------------


def _encode_value(w: _BitWriter, v: int, cat: int):
    if cat:
        w.write(v if v >= 0 else v + (1 << cat) - 1, cat)


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int) -> int:
    dc = int(zz[0])
    diff = dc - pred
    cat = _category(diff)
    code, ln = DC_CODES[cat]
    w.write(code, ln)
    _encode_value(w, diff, cat)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = AC_CODES[0xF0]
            w.write(code, ln)
            run -= 16
        cat = _category(v)
        code, ln = AC_CODES[(run << 4) | cat]
        w.write(code, ln)
        _encode_value(w, v, cat)
        run = 0
    if last_nz < 63:
        code, ln = AC_CODES[0x00]
        w.write(code, ln)
    return dc


def _pad8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _plane_blocks(plane: np.ndarray, qt: np.ndarray):
    """Quantized zigzag vectors for every 8x8 block, row-major order."""
    p = _pad8(plane.astype(np.float64) - 128.0)
    h, w = p.shape
    out = []
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            f = _dct2(p[by : by + 8, bx : bx + 8])
            q = np.round(f / qt).astype(np.int64)
            out.append(q.ravel()[ZZ])
    return out, h // 8, w // 8


def _rgb_to_ycbcr(px: np.ndarray):
    r, g, b = (px[..., 0].astype(np.float64), px[..., 1].astype(np.float64), px[..., 2].astype(np.float64))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _marker(tag: int, body: bytes) -> bytes:
    return bytes([0xFF, tag]) + (len(body) + 2).to_bytes(2, "big") + body


def _dht_segment(tc: int, th: int, bits, syms) -> bytes:
    return _marker(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(syms))


def jpeg_encode(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 pixels ((h, w) gray or (h, w, 3) RGB) as baseline
    JFIF. ``subsample=True`` → 4:2:0 chroma (box-filtered);
    ``restart_interval=N`` emits a DRI segment and an RSTn marker every
    N MCUs (what camera JPEGs do for error resilience)."""
    px = np.asarray(pixels)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    qt_l = _scaled_qt(QT_LUM, quality)
    qt_c = _scaled_qt(QT_CHR, quality)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xDB, bytes([0]) + bytes(int(v) for v in qt_l.ravel()[ZZ]))
    if not gray:
        out += _marker(0xDB, bytes([1]) + bytes(int(v) for v in qt_c.ravel()[ZZ]))

    if gray:
        comps = [(1, 1, 1, 0)]
    elif subsample:
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, hs << 4 | vs, tq])
    out += _marker(0xC0, sof)

    out += _dht_segment(0, 0, _DC_BITS, _DC_SYMS)
    out += _dht_segment(1, 0, _AC_BITS, _AC_SYMS)
    if not gray:
        out += _dht_segment(0, 1, _DC_BITS, _DC_SYMS)
        out += _dht_segment(1, 1, _AC_BITS, _AC_SYMS)

    if restart_interval:
        out += _marker(0xDD, int(restart_interval).to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for cid, _, _, _ in comps:
        td_ta = 0x00 if cid == 1 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, sos)

    if gray:
        planes = [px]
        qts = [qt_l]
    else:
        y, cb, cr = _rgb_to_ycbcr(px)
        if subsample:
            ph, pw = -h % 2, -w % 2
            cbp = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
            crp = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = (cbp[0::2, 0::2] + cbp[1::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 1::2]) / 4.0
            cr = (crp[0::2, 0::2] + crp[1::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 1::2]) / 4.0
        planes = [y, cb, cr]
        qts = [qt_l, qt_c, qt_c]

    blocks = []
    dims = []
    for plane, qt in zip(planes, qts):
        bl, bh, bw = _plane_blocks(plane, qt)
        blocks.append(bl)
        dims.append((bh, bw))

    wtr = _BitWriter()
    preds = [0] * len(planes)
    rst_state = {"n": 0, "m": 0}
    if gray or not subsample:
        total_mcus = dims[0][0] * dims[0][1]
    else:
        total_mcus = dims[1][0] * dims[1][1]

    def _mcu_done():
        rst_state["n"] += 1
        if (
            restart_interval
            and rst_state["n"] % restart_interval == 0
            and rst_state["n"] < total_mcus
        ):
            wtr.flush()
            wtr.buf += bytes([0xFF, 0xD0 + rst_state["m"]])
            rst_state["m"] = (rst_state["m"] + 1) % 8
            for ci in range(len(planes)):
                preds[ci] = 0

    if gray or not subsample:
        n_by, n_bx = dims[0]
        for by in range(n_by):
            for bx in range(n_bx):
                for ci in range(len(planes)):
                    preds[ci] = _encode_block(
                        wtr, blocks[ci][by * dims[ci][1] + bx], preds[ci]
                    )
                _mcu_done()
    else:
        # 4:2:0 MCU: 2x2 luma blocks then one block of each chroma
        ly, lx = dims[0]
        cy, cx = dims[1]
        for my in range(cy):
            for mx in range(cx):
                for dy in range(2):
                    for dx in range(2):
                        by, bx = my * 2 + dy, mx * 2 + dx
                        if by >= ly or bx >= lx:
                            zzv = np.zeros(64, dtype=np.int64)
                            zzv[0] = preds[0]
                        else:
                            zzv = blocks[0][by * lx + bx]
                        preds[0] = _encode_block(wtr, zzv, preds[0])
                for ci in (1, 2):
                    preds[ci] = _encode_block(
                        wtr, blocks[ci][my * cx + mx], preds[ci]
                    )
                _mcu_done()
    wtr.flush()
    out += wtr.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- decoder -------------------------------------------------------------


class _HuffTable:
    """Canonical decode via (mincode, maxcode, valptr) per length."""

    def __init__(self, bits, syms):
        self.min = [0] * 17
        self.max = [-1] * 17
        self.valptr = [0] * 17
        self.syms = syms
        code = 0
        k = 0
        for li in range(16):
            length = li + 1
            if bits[li]:
                self.valptr[length] = k
                self.min[length] = code
                code += bits[li]
                k += bits[li]
                self.max[length] = code - 1
            code <<= 1

    def decode(self, rdr: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | rdr.bits(1)
            if self.max[length] >= 0 and code <= self.max[length]:
                return self.syms[self.valptr[length] + code - self.min[length]]
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes → uint8 pixels ((h, w, 3) color,
    (h, w) grayscale). Raises labeled NotImplementedError for
    progressive / arithmetic / 12-bit streams."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffTable] = {}
    ac_tabs: dict[int, _HuffTable] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    i = 2
    scan_comps = None
    while i < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
        body = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq:
                    raise NotImplementedError("16-bit quant tables (12-bit JPEG) unsupported")
                tbl = np.zeros(64)
                tbl[ZZ] = np.frombuffer(body[j + 1 : j + 65], dtype=np.uint8)
                qts[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                n = sum(bits)
                syms = list(body[j + 17 : j + 17 + n])
                (ac_tabs if tc else dc_tabs)[th] = _HuffTable(bits, syms)
                j += 17 + n
        elif marker == 0xC0 or marker == 0xC1:
            if body[0] != 8:
                raise NotImplementedError("only 8-bit precision baseline JPEG")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}: progressive/"
                "hierarchical/arithmetic) — baseline sequential only"
            )
        elif marker == 0xDD:
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tdta = body[1 + 2 * c : 3 + 2 * c]
                scan_comps.append({"id": cid, "td": tdta >> 4, "ta": tdta & 0x0F})
            i = i + 2 + seg_len
            break
        i = i + 2 + seg_len
    if comps is None or scan_comps is None:
        raise ValueError("JPEG without SOF/SOS")
    for c in comps:
        if not (1 <= c["h"] <= 2 and 1 <= c["v"] <= 2):
            raise NotImplementedError("sampling factors beyond 2 unsupported")
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    planes = {}
    for c in comps:
        pw = mcus_x * c["h"] * 8
        ph = mcus_y * c["v"] * 8
        planes[c["id"]] = np.zeros((ph, pw))

    rdr = _BitReader(data, i)
    preds = {c["id"]: 0 for c in comps}
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                rdr.align_to_marker()
                preds = {c["id"]: 0 for c in comps}
            for sc in scan_comps:
                c = by_id[sc["id"]]
                for dy in range(c["v"]):
                    for dx in range(c["h"]):
                        dct = dc_tabs[sc["td"]]
                        act = ac_tabs[sc["ta"]]
                        zz = np.zeros(64, dtype=np.int64)
                        cat = dct.decode(rdr)
                        diff = _extend(rdr.bits(cat), cat)
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = act.decode(rdr)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _extend(rdr.bits(rs & 0x0F), rs & 0x0F)
                            k += 1
                        blk = np.zeros(64)
                        blk[ZZ] = zz  # de-zigzag
                        f = blk.reshape(8, 8) * qts[c["tq"]]
                        pix = _idct2(f) + 128.0
                        py = (my * c["v"] + dy) * 8
                        pxx = (mx * c["h"] + dx) * 8
                        planes[c["id"]][py : py + 8, pxx : pxx + 8] = pix
            n_mcu += 1

    if len(comps) == 1:
        out = planes[comps[0]["id"]][:h, :w]
        return np.clip(np.round(out), 0, 255).astype(np.uint8)
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
