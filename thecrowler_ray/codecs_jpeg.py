"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT, JFIF).

The reference downloads and stores web images as typed binary blobs
(``pkg/crawler/web.go:163-517``); most of the real web is JPEG. This
container has no PIL/libjpeg, but baseline JPEG is fully specified in
public ITU-T T.81 (quantization/Huffman tables below are Annex K — the
spec's own example tables, which libjpeg also ships as its defaults), so
the codec here is built from the spec with numpy doing the DCT math.

Scope (documented, asserted):
- Encode: 8-bit gray or RGB, 4:4:4 or 4:2:0, quality 1-100 (libjpeg
  scaling curve), optional restart intervals. Entropy coding uses the
  Annex K Huffman tables (no per-image optimization).
- Decode: baseline sequential (SOF0), gray / 3-component YCbCr, any
  sampling factors up to 2x2, restart markers, 16-bit-prefix Huffman
  LUTs. Progressive (SOF2) and arithmetic coding raise ``ValueError``.
- DCT/IDCT are exact orthonormal matrix transforms (einsum over all
  blocks at once); the only loops are per-symbol entropy coding, which
  is inherent to Huffman bitstreams.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# T.81 Annex K.1 — example quantization tables.
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32, dtype=np.int64)

# T.81 Annex K.3 — example Huffman tables: (bits[1..16], values).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# 8-point orthonormal DCT-II matrix: F = M @ B @ M.T, B = M.T @ F @ M.
_k = np.arange(8)
_DCT_M = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) / 2.0
_DCT_M[0] /= np.sqrt(2.0)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality→scale curve (jcparam.c semantics)."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255).astype(np.int64)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman per T.81 C.2: symbol -> (code, length)."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _build_lut(bits: list[int], vals: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-prefix decode LUT: word -> (symbol, code length)."""
    sym = np.zeros(1 << 16, np.int16)
    ln = np.zeros(1 << 16, np.uint8)
    for value, (code, length) in _build_codes(bits, vals).items():
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = value
        ln[lo:hi] = length
    return sym, ln


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

    def pad_align(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _mag_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _seg(tag: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(body) + 2) + body


def _component_blocks(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """uint8 plane -> (by, bx, 64) int32 quantized zigzag coefficients."""
    h, w = plane.shape
    bh, bw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((bh, bw), np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[-1:, :]          # edge-replicate padding
    padded[:, w:] = padded[:, w - 1 : w]
    padded -= 128.0
    blocks = padded.reshape(bh // 8, 8, bw // 8, 8).transpose(0, 2, 1, 3)
    coeff = np.einsum("ux,ijxy,vy->ijuv", _DCT_M, blocks, _DCT_M)
    q = np.rint(coeff.reshape(bh // 8, bw // 8, 64) / quant[UNZIGZAG]
                ).astype(np.int32)
    return q[:, :, ZIGZAG]


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc: dict, ac: dict) -> int:
    dc_val = int(zz[0])
    diff = dc_val - pred
    size = _mag_category(diff)
    code, length = dc[size]
    w.write(code, length)
    if size:
        w.write(_mag_bits(diff, size), size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size = _mag_category(v)
        code, length = ac[(run << 4) | size]
        w.write(code, length)
        w.write(_mag_bits(v, size), size)
        run = 0
    if last < 63:
        code, length = ac[0x00]  # EOB
        w.write(code, length)
    return dc_val


def jpeg_encode(arr: np.ndarray, quality: int = 85, subsample: bool = True,
                restart_interval: int = 0) -> bytes:
    """uint8 (h,w) gray or (h,w,3) RGB -> baseline JFIF bytes.

    ``subsample=True`` uses 4:2:0 chroma (box-filter downsample) like
    virtually every camera/browser JPEG; ``False`` keeps 4:4:4.
    """
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    if gray:
        comps = [(1, 1, 0, _component_blocks(arr, ql))]
    else:
        f = arr.astype(np.float64)
        y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128
        cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128
        if subsample:
            eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
            def down(p):
                q = np.empty((eh, ew), np.float64)
                q[:h, :w] = p
                q[h:, :w] = p[-1:, :]
                q[:, w:] = q[:, w - 1 : w]
                return (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2]
                        + q[1::2, 1::2]) / 4.0
            cb, cr = down(cb), down(cr)
            sampling = [(2, 2), (1, 1), (1, 1)]
        else:
            sampling = [(1, 1), (1, 1), (1, 1)]
        comps = [
            (sampling[0][0], sampling[0][1], 0,
             _component_blocks(np.clip(y, 0, 255), ql)),
            (sampling[1][0], sampling[1][1], 1,
             _component_blocks(np.clip(cb, 0, 255), qc)),
            (sampling[2][0], sampling[2][1], 1,
             _component_blocks(np.clip(cr, 0, 255), qc)),
        ]

    hmax = max(c[0] for c in comps)
    vmax = max(c[1] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(ql.tolist()))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(qc.tolist()))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for idx, (hs, vs, tq, _) in enumerate(comps):
        sof += bytes([idx + 1, (hs << 4) | vs, tq])
    out += _seg(0xC0, sof)
    for cls, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        if gray and tid == 1:
            continue
        out += _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for idx in range(len(comps)):
        td = 0 if idx == 0 else 1
        sos += bytes([idx + 1, (td << 4) | td])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    writer = _BitWriter()
    preds = [0] * len(comps)
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and (my * mcus_x + mx) and \
                    (my * mcus_x + mx) % restart_interval == 0:
                writer.pad_align()
                out += writer.buf
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * len(comps)
            for ci, (hs, vs, _tq, blocks) in enumerate(comps):
                dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for by in range(vs):
                    for bx in range(hs):
                        yy = min(my * vs + by, blocks.shape[0] - 1)
                        xx = min(mx * hs + bx, blocks.shape[1] - 1)
                        preds[ci] = _encode_block(
                            writer, blocks[yy, xx], preds[ci], dc, ac)
    writer.pad_align()
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            byte = self.data[self.pos] if self.pos < len(self.data) else 0xFF
            self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self._fill(n)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _split_entropy(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes from ``pos`` until the next real marker,
    unstuffed, split on RST markers. Returns (segments, pos_after)."""
    segs, cur = [], bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = data[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, pos


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 (h,w) gray or (h,w,3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    restart_interval = 0
    scans: list[tuple[list, list[bytes]]] = []
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                quant[tq] = np.frombuffer(
                    body[bpos + 1 : bpos + 65], np.uint8).astype(np.int64)
                bpos += 65
        elif marker == 0xC4:
            bpos = 0
            while bpos < len(body):
                cls, tid = body[bpos] >> 4, body[bpos] & 0xF
                bits = list(body[bpos + 1 : bpos + 17])
                cnt = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + cnt])
                huff[(cls, tid)] = _build_lut(bits, vals)
                bpos += 17 + cnt
        elif marker in (0xC0, 0xC1):
            _prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for i in range(nc):
                cid, sf, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, sf >> 4, sf & 0xF, tq))
            frame = (fh, fw, comps)
        elif marker == 0xC2:
            raise ValueError("progressive JPEG unsupported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker {marker:#x}")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            sel = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                sel.append((cs, tt >> 4, tt & 0xF))
            segs, pos = _split_entropy(data, pos)
            scans.append((sel, segs))
    if frame is None or not scans:
        raise ValueError("truncated JPEG (no frame/scan)")
    fh, fw, comps = frame
    sel, segs = scans[0]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    by_id = {c[0]: i for i, c in enumerate(comps)}
    order = [by_id[cs] for cs, _, _ in sel]
    tables = {by_id[cs]: (huff[(0, td)], huff[(1, ta)])
              for cs, td, ta in sel}
    coefs = []
    for _cid, hs, vs, _tq in comps:
        coefs.append(np.zeros((mcus_y * vs, mcus_x * hs, 64), np.int32))

    seg_i = 0
    reader = _BitReader(segs[0])
    preds = [0] * len(comps)
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_i += 1
            if seg_i < len(segs):
                reader = _BitReader(segs[seg_i])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci in order:
            _cid, hs, vs, _tq = comps[ci]
            (dsym, dlen), (asym, alen) = tables[ci]
            for by in range(vs):
                for bx in range(hs):
                    zz = coefs[ci][my * vs + by, mx * hs + bx]
                    word = reader.peek16()
                    size = int(dsym[word])
                    ln = int(dlen[word])
                    if ln == 0:
                        raise ValueError("bad Huffman code (DC)")
                    reader.skip(ln)
                    diff = _extend(reader.read(size), size) if size else 0
                    preds[ci] += diff
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        word = reader.peek16()
                        rs = int(asym[word])
                        ln = int(alen[word])
                        if ln == 0:
                            raise ValueError("bad Huffman code (AC)")
                        reader.skip(ln)
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += rs >> 4
                        size = rs & 0xF
                        if k > 63:
                            raise ValueError("AC index overflow")
                        zz[k] = _extend(reader.read(size), size)
                        k += 1

    planes = []
    for ci, (_cid, hs, vs, tq) in enumerate(comps):
        zz = coefs[ci]
        deq = zz.astype(np.float64) * quant[tq][None, None, :]
        blocks = deq[:, :, UNZIGZAG].reshape(zz.shape[0], zz.shape[1], 8, 8)
        pix = np.einsum("xu,ijuv,yv->ixjy", _DCT_M.T, blocks, _DCT_M.T)
        plane = pix.reshape(zz.shape[0] * 8, zz.shape[1] * 8) + 128.0
        plane = np.repeat(np.repeat(plane, vmax // vs, 0), hmax // hs, 1)
        planes.append(plane[:fh, :fw])
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def jpeg_info(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from the SOF header only."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos, n = 2, len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if marker in (0xC0, 0xC1, 0xC2):
            _p, h, w, nc = struct.unpack(">BHHB", data[pos + 4 : pos + 10])
            return w, h, nc
        pos += 2 + length
    raise ValueError("no SOF found")
