"""Pure-numpy baseline JPEG codec (no imaging libraries).

Implements ITU-T T.81 baseline sequential DCT, enough for a scanned-page
pipeline (reference encodes OCR payloads as JPEG via PIL,
``claude_vision_engine.py:107-127``, and accepts ``.jpg`` inputs,
``ocr.py:25``):

- **Encode**: 8-bit grayscale → baseline JFIF with the Annex K luminance
  quantization table scaled by the libjpeg quality formula and the Annex K
  Huffman tables. The DCT/quantization/zigzag/category math is fully
  vectorized over all 8x8 blocks; only the entropy coding walks blocks in
  Python (cheap: a few symbols per block after quantization).
- **Decode**: baseline grayscale or 4:4:4 YCbCr (Y kept as luma — scanned
  pages are gray; chroma blocks are entropy-decoded to keep bitstream sync
  and discarded). Progressive (SOF2), arithmetic coding, and subsampled
  chroma raise clear errors. Restart markers (DRI/RSTn) are honored.

The quality ladder semantics in ``functions.imageprep.encode_under_limit``
mirror the reference exactly once this codec is plugged in: quality 95 → 50
in steps of 10, then rescale x0.8 and reset.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

Q_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

# zigzag scan order: ZIGZAG[i] = raster index of the i-th zigzag coefficient
def _zigzag_order() -> np.ndarray:
    order = sorted(
        ((y, x) for y in range(8) for x in range(8)),
        key=lambda p: (p[0] + p[1],
                       p[1] if (p[0] + p[1]) % 2 else p[0]))
    return np.array([y * 8 + x for y, x in order], dtype=np.int64)

ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

DC_LUM_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]  # [1..16]
DC_LUM_VALS = list(range(12))

AC_LUM_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: forward F = D @ B @ D.T
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8))


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """(bits[1..16], values) → symbol -> (code, length), T.81 Annex C."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out

_DC_CODES = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
_AC_CODES = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)


def quality_table(quality: int, base: np.ndarray = Q_LUM) -> np.ndarray:
    """libjpeg quality scaling: 1..100 → scaled quantization table."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    tbl = (base.astype(np.int64) * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill padding
        return bytes(self.buf)


def _blocks(img: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad to multiples of 8 (edge replicate) and split into (n, 8, 8)."""
    h, w = img.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)), mode="edge")
    hh, ww = img.shape
    b = img.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
    return b.reshape(-1, 8, 8), hh // 8, ww // 8


def _category(v: np.ndarray) -> np.ndarray:
    """JPEG magnitude category: bit length of |v| (0 for 0)."""
    out = np.zeros(v.shape, dtype=np.int32)
    a = np.abs(v)
    nz = a > 0
    out[nz] = np.floor(np.log2(a[nz])).astype(np.int32) + 1
    return out


def encode_jpeg(img: np.ndarray, quality: int = 75) -> bytes:
    """uint8 HxW grayscale → baseline JFIF bytes."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError(f"expected uint8 HxW grayscale, got {img.dtype} "
                         f"ndim={img.ndim}")
    h, w = img.shape
    qt = quality_table(quality)

    blocks, _, _ = _blocks(img)
    f = blocks.astype(np.float64) - 128.0
    coef = _D @ f @ _D.T
    q = np.round(coef / qt.astype(np.float64)).astype(np.int32)
    zz = q.reshape(-1, 64)[:, ZIGZAG]

    # DC differentials + categories, vectorized; value bits two's-ish coding
    dc = zz[:, 0].copy()
    diff = np.diff(dc, prepend=0)
    cats = _category(zz)
    valbits = np.where(zz < 0, zz + (1 << cats) - 1, zz)
    dcat = _category(diff.reshape(-1, 1)).ravel()
    dval = np.where(diff < 0, diff + (1 << dcat) - 1, diff)

    bw = _BitWriter()
    dc_codes, ac_codes = _DC_CODES, _AC_CODES
    n_blocks = len(zz)
    for i in range(n_blocks):
        c, l = dc_codes[int(dcat[i])]
        bw.write(c, l)
        if dcat[i]:
            bw.write(int(dval[i]), int(dcat[i]))
        row = zz[i]
        nz = np.flatnonzero(row[1:]) + 1
        prev = 0
        for j in nz:
            run = j - prev - 1
            while run >= 16:
                c, l = ac_codes[0xF0]  # ZRL
                bw.write(c, l)
                run -= 16
            sym = (run << 4) | int(cats[i, j])
            c, l = ac_codes[sym]
            bw.write(c, l)
            bw.write(int(valbits[i, j]), int(cats[i, j]))
            prev = j
        if prev < 63:
            c, l = ac_codes[0x00]  # EOB
            bw.write(c, l)
    scan = bw.flush()

    # --- markers -----------------------------------------------------------
    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    qzz = qt.ravel()[ZIGZAG].astype(np.uint8).tobytes()
    out += b"\xFF\xDB" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + qzz
    out += b"\xFF\xC0" + struct.pack(">H", 2 + 6 + 3) + b"\x08" \
        + struct.pack(">HH", h, w) + b"\x01" + bytes([1, 0x11, 0])
    dc_def = bytes(DC_LUM_BITS[1:]) + bytes(DC_LUM_VALS)
    out += b"\xFF\xC4" + struct.pack(">H", 2 + 1 + len(dc_def)) + b"\x00" + dc_def
    ac_def = bytes(AC_LUM_BITS[1:]) + bytes(AC_LUM_VALS)
    out += b"\xFF\xC4" + struct.pack(">H", 2 + 1 + len(ac_def)) + b"\x10" + ac_def
    out += b"\xFF\xDA" + struct.pack(">H", 2 + 1 + 2 + 3) + b"\x01" \
        + bytes([1, 0x00]) + bytes([0, 63, 0])
    out += scan
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; RSTn handled by
    the caller via ``resync``."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0  # trailing zero-fill
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:  # a real marker: stop consuming
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def resync(self) -> None:
        """Skip to just past the next RST marker (byte-aligned)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        i = self.pos
        while i + 1 < len(d):
            if d[i] == 0xFF and 0xD0 <= d[i + 1] <= 0xD7:
                self.pos = i + 2
                return
            i += 1
        self.pos = len(d)


def _build_decode_table(bits: list[int], vals: bytes | list[int]):
    """→ dict (length, code) -> symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG: huffman code not found")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 HxW grayscale (Y plane for color)."""
    if buf[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0

    while pos < len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", buf, pos)
        seg = buf[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                t = np.frombuffer(seg, np.uint8, 64, p + 1).astype(np.int32)
                qtables[tq] = t[UNZIGZAG].reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = [0] + list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = seg[p + 17 : p + 17 + nv]
                htables[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled chroma (h/v factors != 1) unsupported")
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("invalid JPEG: SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cs, tt >> 4, tt & 0xF))
            data_start = pos + seglen
            return _decode_scan(buf[data_start:], frame, scan_comps,
                                qtables, htables, restart_interval)
        pos += seglen
    raise ValueError("invalid JPEG: no scan data")


def _decode_scan(data, frame, scan_comps, qtables, htables,
                 restart_interval) -> np.ndarray:
    h, w, comps = frame
    ncomp = len(comps)
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    n_mcu = bh * bwid
    br = _BitReader(data)

    # per-component tables; component 0 is the luma we keep
    ctabs = []
    for cs, td, ta in scan_comps:
        tq = next(tq for cid, tq in comps if cid == cs)
        ctabs.append((htables[(0, td)], htables[(1, ta)],
                      qtables[tq].astype(np.float64)))

    out_coef = np.zeros((n_mcu, 64), dtype=np.float64)
    preds = [0] * ncomp
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br.resync()
            preds = [0] * ncomp
        for ci in range(ncomp):
            dc_tab, ac_tab, qt = ctabs[ci]
            s = _read_symbol(br, dc_tab)
            diff = _extend(br.read(s), s)
            preds[ci] += diff
            if ci == 0:
                blk = out_coef[m]
                blk[0] = preds[ci]
            k = 1
            while k <= 63:
                rs = _read_symbol(br, ac_tab)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("invalid JPEG: AC index out of range")
                v = _extend(br.read(s), s)
                if ci == 0:
                    out_coef[m, k] = v
                k += 1

    qt0 = ctabs[0][2].ravel()[ZIGZAG]
    coef = (out_coef * qt0)[:, UNZIGZAG].reshape(n_mcu, 8, 8)
    pix = _D.T @ coef @ _D + 128.0
    pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
    img = pix.reshape(bh, bwid, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8,
                                                                    bwid * 8)
    return np.ascontiguousarray(img[:h, :w])
