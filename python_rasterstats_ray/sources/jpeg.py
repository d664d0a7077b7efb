"""Minimal from-scratch baseline JPEG (JFIF) codec — pure stdlib + numpy.

Like sources/png.py and sources/wav.py, this makes another leg of the
multimodal path REAL: baseline sequential JPEG is fully specified public
knowledge (ITU-T T.81 / JFIF) and needs no external codec.

Scope:
- decoder: baseline sequential DCT (SOF0) AND progressive DCT (SOF2 —
  spectral selection + successive approximation, EOB runs, refinement
  correction bits, interleaved DC and non-interleaved AC scans), 8-bit,
  1 or 3 components, sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0),
  restart intervals; arithmetic coding raises NotImplementedError.
- encoder: baseline 4:4:4 / 4:2:2 / 4:2:0 / grayscale with the T.81
  Annex K quantization and Huffman tables, quality-scaled; plus a
  progressive encoder (``jpeg_encode_progressive``, same subsamplings,
  optional restart markers) emitting a libjpeg-style scan script with
  OPTIMAL per-scan Huffman tables built by the Annex K.2 algorithm —
  enough to fixture every decoder path, including interleaved DC with
  sampling factors and real-vs-padded AC block grids.
  Progressive re-arranges the SAME quantized coefficients, so its
  decode is bit-identical to the baseline decode of the same image.

The 8x8 DCT runs as two numpy matrix products per block batch, whole
image at once: A @ X @ A.T over a (n_blocks, 8, 8) stack — vectorized,
no per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i in the coded stream -> (row, col) in the 8x8 block
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# T.81 Annex K.1 quantization tables (luminance, chrominance)
_QT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QT_CHR = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# T.81 Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis A: forward F = A X A^T, inverse
    X = A^T F A."""
    k = np.arange(8, dtype=np.float64)
    A = np.sqrt(0.25) * np.cos((2.0 * k[None, :] + 1.0) * k[:, None] * np.pi / 16.0)
    A[0] *= 1.0 / np.sqrt(2.0)
    return A


_A = _dct_basis()


def _canonical_codes(bits, huffval):
    """(bits, huffval) -> list of (symbol, code, length)."""
    out = []
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((huffval[i], code, length))
            code += 1
            i += 1
        code <<= 1
    return out


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 3 and data[:3] == b"\xff\xd8\xff"


# ----------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s per T.81


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_coeff_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (qt * s + 50) // 100
    return np.clip(q, 1, 255)


def _block_coeffs(plane: np.ndarray, qt: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    """Pad plane to (bh*8, bw_*8) by edge replication, forward-DCT every
    8x8 block (one batched matmul), quantize, zigzag -> (bh*bw_, 64)."""
    ph, pw = bh * 8, bw_ * 8
    h, w = plane.shape
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
    blocks = p.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    F = _A @ blocks @ _A.T
    return np.round(F / qt.reshape(8, 8)).astype(np.int64).reshape(-1, 64)[:, _ZZ]


def _write_block(bw, zz, pred, dc_tab, ac_tab) -> int:
    diff = int(zz[0]) - pred
    size = _category(diff)
    code, ln = dc_tab[size]
    bw.write(code, ln)
    if size:
        bw.write(_encode_coeff_bits(diff, size), size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = ac_tab[(run << 4) | size]
        bw.write(code, ln)
        bw.write(_encode_coeff_bits(v, size), size)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def jpeg_encode(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """HxW (grayscale) or HxWx3 uint8 RGB -> baseline JFIF bytes.

    ``subsampling``: "4:4:4", "4:2:2" (chroma box-averaged 1x2) or
    "4:2:0" (chroma box-averaged 2x2).
    ``restart_interval``: emit DRI + RSTn markers every N MCUs (0 = off).
    """
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("jpeg_encode expects uint8")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsampling not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError(subsampling)
    sub420 = subsampling == "4:2:0" and not gray
    sub422 = subsampling == "4:2:2" and not gray

    if gray:
        planes = [img.astype(np.float64)]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub420:
            ph2, pw2 = -(-h // 2) * 2, -(-w // 2) * 2
            cb = np.pad(cb, ((0, ph2 - h), (0, pw2 - w)), mode="edge")
            cr = np.pad(cr, ((0, ph2 - h), (0, pw2 - w)), mode="edge")
            cb = cb.reshape(ph2 // 2, 2, pw2 // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph2 // 2, 2, pw2 // 2, 2).mean(axis=(1, 3))
        elif sub422:
            pw2 = -(-w // 2) * 2
            cb = np.pad(cb, ((0, 0), (0, pw2 - w)), mode="edge")
            cr = np.pad(cr, ((0, 0), (0, pw2 - w)), mode="edge")
            cb = cb.reshape(h, pw2 // 2, 2).mean(axis=2)
            cr = cr.reshape(h, pw2 // 2, 2).mean(axis=2)
        planes = [y, cb, cr]

    qts = [_quality_scale(_QT_LUM, quality)]
    if not gray:
        qts.append(_quality_scale(_QT_CHR, quality))

    # component layout: (h_samp, v_samp, qt index)
    if gray:
        layout = [(1, 1, 0)]
    elif sub420:
        layout = [(2, 2, 0), (1, 1, 1), (1, 1, 1)]
    elif sub422:
        layout = [(2, 1, 0), (1, 1, 1), (1, 1, 1)]
    else:
        layout = [(1, 1, 0), (1, 1, 1), (1, 1, 1)]
    hmax = max(sh for sh, _, _ in layout)
    vmax = max(sv for _, sv, _ in layout)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    comps = []
    for p, (sh, sv, tq) in zip(planes, layout):
        bh, bw_ = mcuy * sv, mcux * sh
        comps.append(
            {
                "h": sh, "v": sv, "tq": tq, "bw": bw_,
                "coef": _block_coeffs(p, qts[tq], bh, bw_),
            }
        )

    dc_tabs = [dict((s, (c, l)) for s, c, l in _canonical_codes(*_DC_LUM))]
    ac_tabs = [dict((s, (c, l)) for s, c, l in _canonical_codes(*_AC_LUM))]
    if not gray:
        dc_tabs.append(dict((s, (c, l)) for s, c, l in _canonical_codes(*_DC_CHR)))
        ac_tabs.append(dict((s, (c, l)) for s, c, l in _canonical_codes(*_AC_CHR)))

    bw = _BitWriter()
    pred = [0] * len(comps)
    rst = 0
    body = bytearray()
    for mi in range(mcux * mcuy):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.flush()
            body += bytes(bw.buf)
            bw = _BitWriter()
            body += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            pred = [0] * len(comps)
        my, mx = divmod(mi, mcux)
        for ci, c in enumerate(comps):
            ti = 0 if ci == 0 else 1
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    idx = (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                    pred[ci] = _write_block(
                        bw, c["coef"][idx], pred[ci], dc_tabs[ti], ac_tabs[ti]
                    )
    bw.flush()
    body += bytes(bw.buf)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for i, q in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([i]) + bytes(int(v) for v in q[_ZZ])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    nc = len(comps)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci, c in enumerate(comps):
        out += bytes([ci + 1, (c["h"] << 4) | c["v"], c["tq"]])
    huffs = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if not gray:
        huffs += [(0x01, _DC_CHR), (0x11, _AC_CHR)]
    for tc, (bits, vals) in huffs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tc])
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"
    out += bytes(body)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------- progressive encoding


def _optimal_table(freq: np.ndarray) -> tuple[list[int], list[int]]:
    """T.81 Annex K.2 optimal Huffman table from symbol frequencies
    (256-entry array) -> (bits[1..16], huffval). Symbol 256 is the
    reserved code that guarantees no all-ones codeword."""
    freq = np.append(freq.astype(np.int64), 1)
    if freq[:256].sum() == 0:
        freq[0] = 1  # degenerate scan: keep the table well-formed
    codesize = np.zeros(257, np.int64)
    others = np.full(257, -1, np.int64)
    while True:
        nz = np.nonzero(freq > 0)[0]
        if len(nz) <= 1:
            break
        f = freq[nz]
        v1 = nz[f == f.min()][-1]  # least frequent, largest symbol
        rest = nz[nz != v1]
        fr = freq[rest]
        v2 = rest[fr == fr.min()][-1]
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = np.zeros(33, np.int64)
    for s in range(257):
        if codesize[s]:
            bits[min(int(codesize[s]), 32)] += 1
    i = 32  # Annex K.3: limit code length to 16
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the reserved code
    order = sorted((int(codesize[s]), s) for s in range(256) if codesize[s])
    return list(int(b) for b in bits[1:17]), [s for _, s in order]


class _FreqSink:
    """Pass 1: count Huffman symbols per table slot (bits are free)."""

    def __init__(self, n_slots: int):
        self.freq = [np.zeros(256, np.int64) for _ in range(n_slots)]

    def symbol(self, slot: int, sym: int) -> None:
        self.freq[slot][sym] += 1

    def bits(self, value: int, length: int) -> None:
        pass

    def restart(self, idx: int) -> None:
        pass


class _WriteSink:
    """Pass 2: emit with the tables built from pass 1."""

    def __init__(self, tables: list[dict]):
        self.bw = _BitWriter()
        self.tables = tables

    def symbol(self, slot: int, sym: int) -> None:
        code, ln = self.tables[slot][sym]
        self.bw.write(code, ln)

    def bits(self, value: int, length: int) -> None:
        if length:
            self.bw.write(value, length)

    def restart(self, idx: int) -> None:
        self.bw.flush()  # byte-align, then the RSTn marker mid-stream
        self.bw.buf += bytes([0xFF, 0xD0 + (idx & 7)])


def _mcu_blocks(comps):
    """Yield (mcu_index, comp_index, flat block index) in interleaved
    MCU order — per MCU each component contributes its v*h blocks of
    the PADDED grid, exactly the decoder's traversal."""
    mcux, mcuy = comps[0]["mcux"], comps[0]["mcuy"]
    for mi in range(mcux * mcuy):
        my, mx = divmod(mi, mcux)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    yield mi, ci, (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)


def _scan_dc_first(comps, al, slot_of, sink, ri: int = 0) -> None:
    """Interleaved first DC scan: DPCM over arithmetic-shifted DC."""
    preds = [0] * len(comps)
    rst = 0
    last_mi = 0
    for mi, ci, idx in _mcu_blocks(comps):
        if ri and mi != last_mi and mi % ri == 0:
            sink.restart(rst)
            rst += 1
            preds = [0] * len(comps)
        last_mi = mi
        v = int(comps[ci]["coef"][idx][0]) >> al
        diff = v - preds[ci]
        preds[ci] = v
        s = _category(diff)
        sink.symbol(slot_of[ci], s)
        sink.bits(_encode_coeff_bits(diff, s), s)


def _scan_dc_refine(comps, al, sink, ri: int = 0) -> None:
    """Interleaved DC refinement: one raw bit per block (no symbols)."""
    rst = 0
    last_mi = 0
    for mi, ci, idx in _mcu_blocks(comps):
        if ri and mi != last_mi and mi % ri == 0:
            sink.restart(rst)
            rst += 1
        last_mi = mi
        sink.bits((int(comps[ci]["coef"][idx][0]) >> al) & 1, 1)


def _scan_ac_first(c, ss, se, al, slot, sink, ri: int = 0) -> None:
    """Non-interleaved first AC scan with EOB-run coding."""
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            sink.symbol(slot, r << 4)
            sink.bits(eobrun - (1 << r), r)
            eobrun = 0

    rst = 0
    for bi in range(c["nbh"] * c["nbw"]):  # REAL block grid, not padding
        row, col = divmod(bi, c["nbw"])
        zz = c["coef"][row * c["bw"] + col]
        if ri and bi and bi % ri == 0:
            flush_eob()
            sink.restart(rst)
            rst += 1
        band = zz[ss : se + 1]
        sign = np.sign(band)
        t = sign * (np.abs(band) >> al)  # point transform, toward zero
        nz = np.nonzero(t)[0]
        if len(nz) == 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        last = nz[-1]
        for k in range(last + 1):
            v = int(t[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                sink.symbol(slot, 0xF0)  # ZRL
                run -= 16
            s = _category(v)
            sink.symbol(slot, (run << 4) | s)
            sink.bits(_encode_coeff_bits(v, s), s)
            run = 0
        if last < se - ss:
            eobrun = 1
    flush_eob()


def _scan_ac_refine(c, ss, se, al, slot, sink, ri: int = 0) -> None:
    """Non-interleaved AC refinement scan (T.81 G.1.2.3 / the
    correction-bit protocol): newly-significant coefficients code
    (run<<4)|1 + sign; already-nonzero ones contribute correction bits
    interleaved EXACTLY where the decoder's advance visits them — per
    ZRL span (the 16 skipped zero-history positions), per new-coef
    span, or with the EOB run. The pending span is kept as an event
    queue (None = zero-history position, 0/1 = correction bit) so a
    ZRL flushes only the bits up to its 16th zero."""
    eobrun = 0
    run_pend: list[int] = []  # correction bits owned by the open EOB run

    def flush_eob() -> None:
        nonlocal eobrun, run_pend
        if eobrun:
            r = eobrun.bit_length() - 1
            sink.symbol(slot, r << 4)
            sink.bits(eobrun - (1 << r), r)
            for b in run_pend:
                sink.bits(b, 1)
            eobrun = 0
            run_pend = []

    rst = 0
    for bi in range(c["nbh"] * c["nbw"]):  # REAL block grid, not padding
        row, col = divmod(bi, c["nbw"])
        zz = c["coef"][row * c["bw"] + col]
        if ri and bi and bi % ri == 0:
            flush_eob()
            sink.restart(rst)
            rst += 1
        band = zz[ss : se + 1]
        t = np.abs(band) >> al
        events: list = []  # since last symbol: None (zero) / int (bit)
        nzeros = 0
        for k in range(se - ss + 1):
            temp = int(t[k])
            if temp == 0:
                events.append(None)
                nzeros += 1
                continue
            if temp > 1:  # already nonzero at this precision
                events.append(temp & 1)
                continue
            # temp == 1: newly significant at this scan
            while nzeros > 15:
                flush_eob()
                sink.symbol(slot, 0xF0)
                zc = i = 0
                while zc < 16:  # bits the ZRL advance consumes
                    ev = events[i]
                    i += 1
                    if ev is None:
                        zc += 1
                    else:
                        sink.bits(ev, 1)
                events = events[i:]
                nzeros -= 16
            flush_eob()
            sink.symbol(slot, (nzeros << 4) | 1)
            sink.bits(1 if band[k] > 0 else 0, 1)
            for ev in events:
                if ev is not None:
                    sink.bits(ev, 1)
            events = []
            nzeros = 0
        if events:  # trailing zeros/bits: this block joins an EOB run
            eobrun += 1
            run_pend.extend(ev for ev in events if ev is not None)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def jpeg_encode_progressive(
    img: np.ndarray,
    quality: int = 90,
    restart_interval: int = 0,
    subsampling: str = "4:4:4",
) -> bytes:
    """HxW (grayscale) or HxWx3 uint8 RGB -> progressive (SOF2) JFIF.

    Emits a libjpeg-style scan script — interleaved DC first (Al=1),
    per-component AC bands 1-5 and 6-63 first scans (Al=2), two AC
    refinement passes (2->1, 1->0), DC refinement last — with OPTIMAL
    per-scan Huffman tables (Annex K.2) re-defined via DHT before each
    scan. ``subsampling`` supports 4:4:4, 4:2:2 and 4:2:0 (interleaved
    DC MCUs carry v*h luma blocks; AC scans walk each component's REAL
    block grid, not the MCU padding — the decoder paths this fixtures).
    ``restart_interval`` emits DRI + RSTn markers every N units in every
    scan (DPCM/EOB-run state resets at each marker). The quantized
    coefficients are identical to ``jpeg_encode``'s with the same
    subsampling, so decodes of both match bit-exactly.
    """
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("jpeg_encode_progressive expects uint8")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsampling not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError(subsampling)
    sub420 = subsampling == "4:2:0" and not gray
    sub422 = subsampling == "4:2:2" and not gray

    if gray:
        planes = [img.astype(np.float64)]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub420:
            ph2, pw2 = -(-h // 2) * 2, -(-w // 2) * 2
            cb = np.pad(cb, ((0, ph2 - h), (0, pw2 - w)), mode="edge")
            cr = np.pad(cr, ((0, ph2 - h), (0, pw2 - w)), mode="edge")
            cb = cb.reshape(ph2 // 2, 2, pw2 // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph2 // 2, 2, pw2 // 2, 2).mean(axis=(1, 3))
        elif sub422:
            pw2 = -(-w // 2) * 2
            cb = np.pad(cb, ((0, 0), (0, pw2 - w)), mode="edge")
            cr = np.pad(cr, ((0, 0), (0, pw2 - w)), mode="edge")
            cb = cb.reshape(h, pw2 // 2, 2).mean(axis=2)
            cr = cr.reshape(h, pw2 // 2, 2).mean(axis=2)
        planes = [y, cb, cr]
    qts = [_quality_scale(_QT_LUM, quality)]
    if not gray:
        qts.append(_quality_scale(_QT_CHR, quality))
    if gray:
        layout = [(1, 1, 0)]
    elif sub420:
        layout = [(2, 2, 0), (1, 1, 1), (1, 1, 1)]
    elif sub422:
        layout = [(2, 1, 0), (1, 1, 1), (1, 1, 1)]
    else:
        layout = [(1, 1, 0), (1, 1, 1), (1, 1, 1)]
    hmax = max(sh for sh, _, _ in layout)
    vmax = max(sv for _, sv, _ in layout)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comps = []
    for p, (sh, sv, tq) in zip(planes, layout):
        bh, bw_ = mcuy * sv, mcux * sh
        cw = -(-(w * sh) // hmax)
        ch = -(-(h * sv) // vmax)
        comps.append(
            {
                "coef": _block_coeffs(p, qts[tq], bh, bw_),
                "tq": tq, "h": sh, "v": sv, "bw": bw_, "bh": bh,
                "nbw": -(-cw // 8), "nbh": -(-ch // 8),
                "mcux": mcux, "mcuy": mcuy,
            }
        )
    slot_of = [0] + [1] * (len(comps) - 1)  # comp -> huffman table slot

    # scan script: (kind, comp index or None, ss, se, ah, al)
    script = [("dc_first", None, 0, 0, 0, 1)]
    for ci in range(len(comps)):
        script.append(("ac_first", ci, 1, 5, 0, 2))
        script.append(("ac_first", ci, 6, 63, 0, 2))
    for ci in range(len(comps)):
        script.append(("ac_refine", ci, 1, 63, 2, 1))
        script.append(("ac_refine", ci, 1, 63, 1, 0))
    script.append(("dc_refine", None, 0, 0, 1, 0))

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for i, q in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([i]) + bytes(int(v) for v in q[_ZZ])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    nc = len(comps)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci, c in enumerate(comps):
        out += bytes([ci + 1, (c["h"] << 4) | c["v"], c["tq"]])

    for kind, ci, ss, se, ah, al in script:
        scan_comps = comps if ci is None else [comps[ci]]
        n_slots = 2 if (ci is None and nc > 1) else 1
        ri = restart_interval

        def run(sink):
            if kind == "dc_first":
                _scan_dc_first(comps, al, slot_of, sink, ri=ri)
            elif kind == "dc_refine":
                _scan_dc_refine(comps, al, sink, ri=ri)
            elif kind == "ac_first":
                _scan_ac_first(comps[ci], ss, se, al, 0, sink, ri=ri)
            else:
                _scan_ac_refine(comps[ci], ss, se, al, 0, sink, ri=ri)

        tc = 0x00 if kind.startswith("dc") else 0x10
        tables = []
        if kind == "dc_refine":  # raw bits only: no tables, no DHT
            pass
        else:
            fs = _FreqSink(n_slots)
            run(fs)
            for slot in range(n_slots):
                bits, vals = _optimal_table(fs.freq[slot])
                out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
                out += bytes([tc | slot]) + bytes(bits) + bytes(vals)
                tables.append(
                    dict((s, (co, ln)) for s, co, ln in _canonical_codes(bits, vals))
                )
        ws = _WriteSink(tables if tables else [{}])
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(scan_comps), len(scan_comps))
        for sci, c in enumerate(scan_comps):
            comp_id = (ci + 1) if ci is not None else (sci + 1)
            slot = slot_of[ci] if ci is not None else slot_of[sci]
            slot = slot if n_slots > 1 else 0
            td = slot if tc == 0x00 else 0
            ta = slot if tc == 0x10 else 0
            out += bytes([comp_id, (td << 4) | ta])
        out += bytes([ss, se, (ah << 4) | al])
        run(ws)
        ws.bw.flush()
        out += bytes(ws.bw.buf)
    out += b"\xff\xd9"
    return bytes(out)


# ----------------------------------------------------------------- decode


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        while self.n <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0xFF  # pad past end
                self.n += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:  # a real marker: stop feeding real bytes
                    self.acc = (self.acc << 8) | 0xFF
                    self.n += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        if self.n < length:
            self._fill()
        self.n -= length
        v = (self.acc >> self.n) & ((1 << length) - 1)
        return v

    def align_to_marker(self) -> int:
        """Drop buffered bits, scan to the next 0xFFxx marker, return xx."""
        self.acc = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] not in (0x00, 0xFF):
                m = d[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        raise ValueError("no marker found")


class _HuffTree:
    """Canonical Huffman decode via (length -> {code: symbol}) tables."""

    def __init__(self, bits, huffval):
        self.by_len: list[dict[int, int]] = [dict() for _ in range(17)]
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        for sym, code, ln in _canonical_codes(bits, huffval):
            self.by_len[ln][code] = sym

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.read(1)
            tab = self.by_len[ln]
            if code in tab:
                return tab[code]
        raise ValueError("bad huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """JFIF bytes (baseline SOF0/1 or progressive SOF2) -> HxW
    (grayscale) or HxWx3 uint8 RGB."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG stream")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffTree] = {}
    ac_tabs: dict[int, _HuffTree] = {}
    comps = None  # list of dicts: id, h, v, tq, td, ta
    h = w = 0
    restart_interval = 0
    progressive = False
    saw_scan = False

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p : p + 128], ">u2").astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p : p + 64], np.uint8).astype(np.int64)
                    p += 64
                q = np.zeros(64, np.int64)
                q[_ZZ] = vals
                qts[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                p += 17 + n
                tree = _HuffTree(bits, vals)
                (ac_tabs if tc else dc_tabs)[th] = tree
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci], seg[7 + 3 * ci], seg[8 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC9, 0xCA, 0xCB):
            raise NotImplementedError("arithmetic-coded JPEG not supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si], seg[2 + 2 * si]
                for c in comps:
                    if c["id"] == cs:
                        c["td"], c["ta"] = tdta >> 4, tdta & 0xF
                        scan_comps.append(c)
            pos += seglen
            if not progressive:
                return _decode_scan(
                    data, pos, comps, qts, dc_tabs, ac_tabs, h, w, restart_interval
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            _prog_init(comps, h, w)
            pos = _decode_prog_scan(
                data, pos, comps, scan_comps, dc_tabs, ac_tabs,
                ss, se, ahal >> 4, ahal & 0xF, restart_interval,
            )
            saw_scan = True
            continue
        pos += seglen
    if progressive and saw_scan:
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        return _reconstruct(comps, qts, h, w, hmax, vmax)
    raise ValueError("no SOS marker")


def _decode_scan(data, pos, comps, qts, dc_tabs, ac_tabs, h, w, restart_interval):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks per row
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int64)
        c["pred"] = 0

    br = _BitReader(data, pos)
    n_mcu = mcux * mcuy
    for mi in range(n_mcu):
        if restart_interval and mi and mi % restart_interval == 0:
            m = br.align_to_marker()
            if not (0xD0 <= m <= 0xD7):
                raise ValueError(f"expected RST marker, got {m:02x}")
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(mi, mcux)
        for c in comps:
            dct = dc_tabs[c["td"]]
            act = ac_tabs[c["ta"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, np.int64)
                    size = dct.decode(br)
                    if size:
                        diff = _extend(br.read(size), size)
                    else:
                        diff = 0
                    c["pred"] += diff
                    zz[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = act.decode(br)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC index overflow")
                        zz[k] = _extend(br.read(s), s)
                        k += 1
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    c["coef"][row * c["bw"] + col] = zz
    return _reconstruct(comps, qts, h, w, hmax, vmax)


def _reconstruct(comps, qts, h, w, hmax, vmax) -> np.ndarray:
    """Dequantize + IDCT per component (vectorized over all blocks),
    upsample, color-convert — shared by the baseline and progressive
    paths (both end with the same per-component coefficient grids)."""
    planes = []
    for c in comps:
        q = qts[c["tq"]]
        blocks = np.zeros((c["coef"].shape[0], 64), np.float64)
        blocks[:, _ZZ] = c["coef"]
        blocks = blocks.reshape(-1, 8, 8) * q
        px = _A.T @ blocks @ _A + 128.0
        bh, bw_ = c["bh"], c["bw"]
        plane = px.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        # upsample to full resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------ progressive


def _prog_init(comps, h, w) -> None:
    """Allocate the persistent coefficient grids progressive scans
    accumulate into (padded to whole interleaved MCUs, like baseline)."""
    if "coef" in comps[0]:
        return
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int64)
        # non-interleaved scans cover only the REAL block grid of the
        # component (ceil of its sample dimensions), not the MCU padding
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        c["nbw"] = -(-cw // 8)
        c["nbh"] = -(-ch // 8)
        c["mcux"], c["mcuy"] = mcux, mcuy


def _refine_nonzero(zz, k, se, br, p1) -> int:
    """Successive-approximation correction: starting at zigzag index k,
    read one bit per already-nonzero coefficient up to ``se`` and add
    ±p1 where the bit is set (T.81 G.1.2.3); returns the index AFTER
    ``se``. Zero-history coefficients are skipped (callers that must
    count them handle that themselves)."""
    while k <= se:
        if zz[k] != 0 and br.read(1) and (abs(int(zz[k])) & p1) == 0:
            zz[k] += p1 if zz[k] > 0 else -p1
        k += 1
    return k


def _decode_prog_scan(
    data, pos, comps, scan_comps, dc_tabs, ac_tabs, ss, se, ah, al,
    restart_interval,
):
    """Decode ONE progressive scan into the persistent coefficient
    grids; returns the stream position of the next marker."""
    br = _BitReader(data, pos)
    eobrun = 0
    preds = {id(c): 0 for c in scan_comps}

    def check_restart(unit: int) -> None:
        nonlocal eobrun
        if restart_interval and unit and unit % restart_interval == 0:
            m = br.align_to_marker()
            if not (0xD0 <= m <= 0xD7):
                raise ValueError(f"expected RST marker, got {m:02x}")
            eobrun = 0
            for c in scan_comps:
                preds[id(c)] = 0

    def dc_block(c, zz) -> None:
        if ah == 0:  # first DC scan: DPCM in the point-transformed domain
            size = dc_tabs[c["td"]].decode(br)
            diff = _extend(br.read(size), size) if size else 0
            preds[id(c)] += diff
            zz[0] = preds[id(c)] << al
        else:  # refinement: one correction bit per block
            if br.read(1):
                zz[0] |= 1 << al

    def ac_first_block(zz) -> None:
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        act = ac_tabs[scan_comps[0]["ta"]]
        while k <= se:
            rs = act.decode(br)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read(r)
                break
            k += r
            if k > se:
                raise ValueError("AC index overflow in progressive scan")
            zz[k] = _extend(br.read(s), s) << al
            k += 1

    def ac_refine_block(zz) -> None:
        nonlocal eobrun
        p1 = 1 << al
        k = ss
        act = ac_tabs[scan_comps[0]["ta"]]
        if eobrun == 0:
            while k <= se:
                rs = act.decode(br)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r != 15:  # EOBn: current block finishes in the tail
                        eobrun = 1 << r
                        if r:
                            eobrun += br.read(r)
                        break
                    val = 0  # ZRL: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("bad refinement magnitude")
                    val = p1 if br.read(1) else -p1
                while k <= se:
                    if zz[k] != 0:
                        if br.read(1) and (abs(int(zz[k])) & p1) == 0:
                            zz[k] += p1 if zz[k] > 0 else -p1
                    else:
                        if r == 0:
                            if val != 0:
                                zz[k] = val
                            k += 1
                            break
                        r -= 1
                    k += 1
        if eobrun > 0:
            _refine_nonzero(zz, k, se, br, p1)
            eobrun -= 1

    if ss == 0:  # DC scan (se must be 0)
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        if len(scan_comps) > 1:  # interleaved over MCUs
            mcux, mcuy = scan_comps[0]["mcux"], scan_comps[0]["mcuy"]
            for mi in range(mcux * mcuy):
                check_restart(mi)
                my, mx = divmod(mi, mcux)
                for c in scan_comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            row = my * c["v"] + by
                            col = mx * c["h"] + bx
                            dc_block(c, c["coef"][row * c["bw"] + col])
        else:
            c = scan_comps[0]
            for bi in range(c["nbh"] * c["nbw"]):
                check_restart(bi)
                row, col = divmod(bi, c["nbw"])
                dc_block(c, c["coef"][row * c["bw"] + col])
    else:  # AC scan: non-interleaved, single component (T.81 requirement)
        if len(scan_comps) != 1:
            raise ValueError("interleaved AC progressive scan")
        c = scan_comps[0]
        block_fn = ac_first_block if ah == 0 else ac_refine_block
        for bi in range(c["nbh"] * c["nbw"]):
            check_restart(bi)
            row, col = divmod(bi, c["nbw"])
            block_fn(c["coef"][row * c["bw"] + col])
    return br.pos
