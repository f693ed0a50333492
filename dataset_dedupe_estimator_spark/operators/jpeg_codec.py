"""JPEG codec — pure numpy/stdlib, no imaging library.

Implements ITU-T T.81 Huffman DCT modes, both directions:

* ``jpeg_encode(pixels, quality=85, subsample=False)`` — RGB (h, w, 3)
  or grayscale (h, w) uint8 → baseline JFIF bytes. Standard Annex-K
  quantization tables with the libjpeg quality scaling; Huffman tables
  are CUSTOM canonical tables embedded in DHT (flat 4-bit DC / 8-bit AC
  codes — valid prefix codes any conformant decoder reads from the
  stream; simpler than Annex K's optimized tables at some compression
  cost). ``subsample=True`` writes 4:2:0 chroma; ``restart_interval``
  emits DRI + RSTn markers.
* ``jpeg_encode_progressive(...)`` — PROGRESSIVE (SOF2) encoding:
  interleaved DC first + refinement scans (successive approximation)
  and per-component spectral-selection AC bands with EOB runs and AC
  refinement scans.
* ``jpeg_decode(data)`` — baseline OR progressive JFIF/Exif bytes →
  uint8 ndarray ((h, w, 3) color, (h, w) grayscale). Reads DQT/DHT/
  SOF/SOS/DRI from the stream (so it decodes third-party JPEGs, not
  just its own output), supports sampling factors 1-2 (4:4:4 / 4:2:2 /
  4:2:0), restart markers, and every progressive scan kind (DC/AC x
  first/refinement, EOB runs). Arithmetic coding, hierarchical mode,
  and 12-bit precision raise labeled NotImplementedError seams.

Correctness oracle: progressive reorganizes the SAME quantized
coefficients as baseline, so its decode is asserted BIT-IDENTICAL to
the baseline decode in tests.

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


# DC symbols 0..11 all at 4 bits; AC symbols (EOB0, ZRL, the 160
# run/size pairs, and the EOBn run-length symbols 0x10..0xE0 progressive
# scans need) all at 8 bits — valid canonical tables (the all-ones code
# of each length stays unused).
_DC_SYMS = list(range(12))
_AC_SYMS = (
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(1, 15)]
)
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
                # a well-formed stream always ends in a marker (EOI at
                # minimum), so prefetch stops at the 0xFF branch below;
                # running off the raw end means the entropy data was cut
                # — zero-padding here would decode the missing MCUs as
                # flat gray, a silent wrong answer
                raise ValueError("truncated JPEG entropy stream")
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


def _encode_common(pixels: np.ndarray, quality: int, subsample: bool, sof_marker: int):
    """Shared front half of both encoders — headers (SOI/JFIF/DQT/SOF/
    DHT, only the SOF marker byte differs) plus the quantized block
    planes. Baseline and progressive MUST agree on everything here or
    the bit-identical decode oracle breaks; one implementation keeps
    them in lockstep. Returns (out, gray, comps, blocks, dims)."""
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
    out += _marker(sof_marker, sof)

    out += _dht_segment(0, 0, _DC_BITS, _DC_SYMS)
    out += _dht_segment(1, 0, _AC_BITS, _AC_SYMS)
    if not gray:
        out += _dht_segment(0, 1, _DC_BITS, _DC_SYMS)
        out += _dht_segment(1, 1, _AC_BITS, _AC_SYMS)

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
    return out, gray, comps, blocks, dims


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
    out, gray, comps, blocks, dims = _encode_common(pixels, quality, subsample, 0xC0)
    planes_n = len(comps)

    if restart_interval:
        out += _marker(0xDD, int(restart_interval).to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for cid, _, _, _ in comps:
        td_ta = 0x00 if cid == 1 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, sos)

    wtr = _BitWriter()
    preds = [0] * planes_n
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
            for ci in range(planes_n):
                preds[ci] = 0

    if gray or not subsample:
        n_by, n_bx = dims[0]
        for by in range(n_by):
            for bx in range(n_bx):
                for ci in range(planes_n):
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


# ---- progressive encoder -------------------------------------------------


def _emit_eobrun(wtr: _BitWriter, eob_state: dict):
    """Flush a pending EOB run: the EOBn symbol (run length 2^r..2^(r+1)-1,
    r extension bits), then every correction bit buffered for the blocks
    inside the run, in block order — exactly what the decoder's trailing
    refine loops will read back."""
    n = eob_state["run"]
    if n:
        r = n.bit_length() - 1
        code, ln = AC_CODES[r << 4]
        wtr.write(code, ln)
        if r:
            wtr.write(n - (1 << r), r)
        eob_state["run"] = 0
    for b in eob_state["bits"]:
        wtr.write(b, 1)
    eob_state["bits"] = []


def _encode_ac_first(wtr, zz, ss, se, al, eob_state):
    """First AC scan of a successive-approximation band: magnitudes
    point-transformed by >> al, zero bands folded into EOB runs."""
    vals = []
    for k in range(ss, se + 1):
        t = abs(int(zz[k])) >> al
        vals.append(t if zz[k] >= 0 else -t)
    ke = -1
    for idx in range(len(vals) - 1, -1, -1):
        if vals[idx]:
            ke = idx
            break
    if ke < 0:
        eob_state["run"] += 1
        if eob_state["run"] == 0x7FFF:
            _emit_eobrun(wtr, eob_state)
        return
    _emit_eobrun(wtr, eob_state)
    r = 0
    for idx in range(ke + 1):
        v = vals[idx]
        if v == 0:
            r += 1
            continue
        while r > 15:
            code, ln = AC_CODES[0xF0]
            wtr.write(code, ln)
            r -= 16
        cat = _category(v)
        code, ln = AC_CODES[(r << 4) | cat]
        wtr.write(code, ln)
        _encode_value(wtr, v, cat)
        r = 0
    if ke < len(vals) - 1:
        eob_state["run"] += 1
        if eob_state["run"] == 0x7FFF:
            _emit_eobrun(wtr, eob_state)


def _encode_ac_refine(wtr, zz, ss, se, al, eob_state):
    """Refinement AC scan: newly-significant coefficients (|c|>>al == 1)
    as run/1 symbols with a sign bit; already-significant ones as
    buffered correction bits (their al-th magnitude bit), emitted after
    the next symbol — the mirror of the decoder's interleaved reads."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    r = 0
    br: list[int] = []
    for idx, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        # flush pending ZRLs BEFORE the correction-bit branch: a
        # correction bit buffered across an unflushed 16-zero run would
        # ride a later ZRL the decoder has already walked past
        # (libjpeg's encode_mcu_AC_refine does this hoist for the same
        # reason) — desynchronizing the entropy stream
        while r > 15:
            _emit_eobrun(wtr, eob_state)
            code, ln = AC_CODES[0xF0]
            wtr.write(code, ln)
            r -= 16
            for b in br:
                wtr.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        # t == 1: newly significant
        _emit_eobrun(wtr, eob_state)
        code, ln = AC_CODES[(r << 4) | 1]
        wtr.write(code, ln)
        wtr.write(1 if zz[ss + idx] >= 0 else 0, 1)
        for b in br:
            wtr.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        eob_state["run"] += 1
        eob_state["bits"].extend(br)
        if eob_state["run"] == 0x7FFF:
            _emit_eobrun(wtr, eob_state)


def _sos_marker(scan_comps, ss, se, ah, al) -> bytes:
    body = bytes([len(scan_comps)])
    for cid, td, ta in scan_comps:
        body += bytes([cid, td << 4 | ta])
    body += bytes([ss, se, ah << 4 | al])
    return _marker(0xDA, body)


def jpeg_encode_progressive(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    dc_al: int = 1,
    ac_al: int = 1,
    bands: tuple = ((1, 5), (6, 63)),
) -> bytes:
    """Encode uint8 pixels as PROGRESSIVE JPEG (SOF2): an interleaved DC
    first scan at point transform ``dc_al`` plus DC refinement scans,
    then per-component spectral-selection AC bands at ``ac_al`` plus AC
    refinement scans. The quantized coefficients are identical to
    ``jpeg_encode``'s, only the entropy organization differs — so
    decoding must reproduce the baseline output EXACTLY (the test
    oracle). Set ``dc_al=ac_al=0`` for spectral selection only."""
    out, gray, comps, blocks, dims = _encode_common(pixels, quality, subsample, 0xC2)
    n_comp = len(comps)
    cids = [c[0] for c in comps]

    def dc_block_iter():
        """Interleaved MCU order over every component's DC, padding
        4:2:0 luma to the MCU grid like the baseline encoder."""
        if gray or not subsample:
            n_by, n_bx = dims[0]
            for by in range(n_by):
                for bx in range(n_bx):
                    for ci in range(n_comp):
                        yield ci, blocks[ci][by * dims[ci][1] + bx]
        else:
            ly, lx = dims[0]
            cy, cx = dims[1]
            for my in range(cy):
                for mx in range(cx):
                    for dy in range(2):
                        for dx in range(2):
                            by, bx = my * 2 + dy, mx * 2 + dx
                            if by >= ly or bx >= lx:
                                yield 0, None  # pad block: zero diff
                            else:
                                yield 0, blocks[0][by * lx + bx]
                    yield 1, blocks[1][my * cx + mx]
                    yield 2, blocks[2][my * cx + mx]

    # scan 1: DC first, interleaved, point transform dc_al
    wtr = _BitWriter()
    preds = [0] * n_comp
    for ci, zz in dc_block_iter():
        dc = preds[ci] if zz is None else int(zz[0]) >> dc_al
        diff = dc - preds[ci]
        preds[ci] = dc
        cat = _category(diff)
        code, ln = DC_CODES[cat]
        wtr.write(code, ln)
        _encode_value(wtr, diff, cat)
    wtr.flush()
    out += _sos_marker(
        [(cids[ci], 0 if ci == 0 else 1, 0) for ci in range(n_comp)], 0, 0, 0, dc_al
    )
    out += wtr.buf

    # DC refinement scans, one bit layer at a time
    for al in range(dc_al - 1, -1, -1):
        wtr = _BitWriter()
        last_pad_dc = [0] * n_comp
        for ci, zz in dc_block_iter():
            dc = last_pad_dc[ci] if zz is None else int(zz[0])
            last_pad_dc[ci] = dc
            wtr.write((dc >> al) & 1, 1)
        wtr.flush()
        out += _sos_marker(
            [(cids[ci], 0 if ci == 0 else 1, 0) for ci in range(n_comp)],
            0, 0, al + 1, al,
        )
        out += wtr.buf

    # AC scans: per component, per spectral band — first then refinements
    for ci in range(n_comp):
        ta = 0 if ci == 0 else 1
        for b0, b1 in bands:
            wtr = _BitWriter()
            eob = {"run": 0, "bits": []}
            for zz in blocks[ci]:
                _encode_ac_first(wtr, zz, b0, b1, ac_al, eob)
            _emit_eobrun(wtr, eob)
            wtr.flush()
            out += _sos_marker([(cids[ci], 0, ta)], b0, b1, 0, ac_al)
            out += wtr.buf
    for al in range(ac_al - 1, -1, -1):
        for ci in range(n_comp):
            ta = 0 if ci == 0 else 1
            for b0, b1 in bands:
                wtr = _BitWriter()
                eob = {"run": 0, "bits": []}
                for zz in blocks[ci]:
                    _encode_ac_refine(wtr, zz, b0, b1, al, eob)
                _emit_eobrun(wtr, eob)
                wtr.flush()
                out += _sos_marker([(cids[ci], 0, ta)], b0, b1, al + 1, al)
                out += wtr.buf

    out += b"\xff\xd9"
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


def _decode_scan(
    data, start, comps, by_id, scan_comps, coefs, dc_tabs, ac_tabs,
    w, h, hmax, vmax, mcus_x, mcus_y, restart_interval,
    ss, se, ah, al, progressive,
):
    """Entropy-decode ONE scan into the per-component coefficient
    arrays (zigzag index space). Handles baseline full-range scans and
    every progressive scan kind (DC/AC x first/refinement), interleaved
    and single-component geometry, restart markers, and EOB runs."""
    rdr = _BitReader(data, start)
    preds = {c["id"]: 0 for c in comps}
    state = {"eobrun": 0}

    def dc_first(cid, td, coef):
        cat = dc_tabs[td].decode(rdr)
        diff = _extend(rdr.bits(cat), cat)
        preds[cid] += diff
        coef[0] = preds[cid] << al

    def dc_refine(coef):
        if rdr.bits(1):
            coef[0] |= 1 << al

    def ac_baseline(ta, coef):
        k = 1
        while k < 64:
            rs = ac_tabs[ta].decode(rdr)
            if rs == 0x00:
                break
            if rs == 0xF0:
                k += 16
                continue
            k += rs >> 4
            if k > 63:
                raise ValueError("AC run past end of block")
            coef[k] = _extend(rdr.bits(rs & 0x0F), rs & 0x0F)
            k += 1

    def ac_first(ta, coef):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = ac_tabs[ta].decode(rdr)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += rdr.bits(r)
                break
            k += r
            if k > se:
                raise ValueError("AC run past end of band")
            coef[k] = _extend(rdr.bits(s), s) << al
            k += 1

    def _refine_nonzero(coef, k):
        p1, m1 = 1 << al, -1 << al
        if rdr.bits(1) and (coef[k] & p1) == 0:
            coef[k] += p1 if coef[k] >= 0 else m1

    def ac_refine(ta, coef):
        p1, m1 = 1 << al, -1 << al
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = ac_tabs[ta].decode(rdr)
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s == 0:
                    if r != 15:
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += rdr.bits(r)
                        break
                    # r == 15: run of 16 zero-HISTORY positions
                else:
                    if s != 1:
                        raise ValueError("AC refinement symbol with size != 1")
                    newval = p1 if rdr.bits(1) else m1
                while k <= se:
                    if coef[k] != 0:
                        _refine_nonzero(coef, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    coef[k] = newval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if coef[k] != 0:
                    _refine_nonzero(coef, k)
                k += 1
            state["eobrun"] -= 1

    def decode_block(sc, coef):
        if not progressive:
            dc_first(sc["id"], sc["td"], coef)
            ac_baseline(sc["ta"], coef)
        elif ss == 0:
            if ah == 0:
                dc_first(sc["id"], sc["td"], coef)
            else:
                dc_refine(coef)
        else:
            if ah == 0:
                ac_first(sc["ta"], coef)
            else:
                ac_refine(sc["ta"], coef)

    n_unit = 0

    def maybe_restart():
        nonlocal preds
        if restart_interval and n_unit and n_unit % restart_interval == 0:
            rdr.align_to_marker()
            preds = {c["id"]: 0 for c in comps}
            state["eobrun"] = 0

    if len(scan_comps) > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart()
                for sc in scan_comps:
                    c = by_id[sc["id"]]
                    for dy in range(c["v"]):
                        for dx in range(c["h"]):
                            by, bx = my * c["v"] + dy, mx * c["h"] + dx
                            decode_block(sc, coefs[c["id"]][by, bx])
                n_unit += 1
    else:
        sc = scan_comps[0]
        c = by_id[sc["id"]]
        bw = (-(-w * c["h"] // hmax) + 7) // 8
        bh = (-(-h * c["v"] // vmax) + 7) // 8
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                decode_block(sc, coefs[c["id"]][by, bx])
                n_unit += 1
    return rdr.pos


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode baseline OR progressive JPEG bytes → uint8 pixels
    ((h, w, 3) color, (h, w) grayscale). Two stages: every scan's
    entropy data accumulates into per-component DCT coefficient arrays
    (progressive scans refine them successively), then one
    dequant/IDCT/upsample/color pass reconstructs pixels. Arithmetic
    coding, hierarchical mode, and 12-bit precision raise labeled
    NotImplementedError seams."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffTable] = {}
    ac_tabs: dict[int, _HuffTable] = {}
    comps = None
    coefs = None
    h = w = 0
    hmax = vmax = mcus_x = mcus_y = 0
    restart_interval = 0
    progressive = False
    i = 2
    saw_scan = False
    while i < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte before a marker
            i += 1
            continue
        if marker in (0xD8, 0x01, 0x00) or 0xD0 <= marker <= 0xD7:
            i += 2  # 0x00 = stuffed FF straggler in post-scan slack
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
        elif marker in (0xC0, 0xC1, 0xC2):
            if body[0] != 8:
                raise NotImplementedError("only 8-bit precision JPEG")
            progressive = marker == 0xC2
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            for c in comps:
                if not (1 <= c["h"] <= 2 and 1 <= c["v"] <= 2):
                    raise NotImplementedError("sampling factors beyond 2 unsupported")
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            coefs = {
                c["id"]: np.zeros(
                    (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32
                )
                for c in comps
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG mode (SOF marker 0xFF{marker:02X}: "
                "hierarchical/arithmetic) — baseline + progressive Huffman only"
            )
        elif marker == 0xDD:
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:
            if comps is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tdta = body[1 + 2 * c : 3 + 2 * c]
                scan_comps.append({"id": cid, "td": tdta >> 4, "ta": tdta & 0x0F})
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if progressive:
                if ss == 0 and se != 0:
                    raise ValueError("progressive DC scan must have Se=0")
                if ss > 0 and ns != 1:
                    raise ValueError("progressive AC scans are single-component")
            else:
                ss, se, ah, al = 0, 63, 0, 0
            by_id = {c["id"]: c for c in comps}
            i = _decode_scan(
                data, i + 2 + seg_len, comps, by_id, scan_comps,
                coefs, dc_tabs, ac_tabs, w, h, hmax, vmax, mcus_x, mcus_y,
                restart_interval, ss, se, ah, al, progressive,
            )
            saw_scan = True
            continue
        i = i + 2 + seg_len
    if comps is None or not saw_scan:
        raise ValueError("JPEG without SOF/SOS")

    planes = {}
    for c in comps:
        cf = coefs[c["id"]]
        bh, bw = cf.shape[:2]
        plane = np.zeros((bh * 8, bw * 8))
        qt = qts[c["tq"]]
        for by in range(bh):
            for bx in range(bw):
                blk = np.zeros(64)
                blk[ZZ] = cf[by, bx]  # de-zigzag
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _idct2(blk.reshape(8, 8) * qt) + 128.0
                )
        planes[c["id"]] = plane

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
