"""Minimal from-scratch PNG codec (pure stdlib ``zlib`` + numpy).

Makes the multimodal DECODE stage real for PNG payloads — JPEG/video
stay stubbed because the sandbox ships no codecs, but PNG is fully
decodable from the public spec (RFC 2083 / ISO 15948) with nothing but
DEFLATE and integer filter arithmetic.

Scope: 8-bit depth, grayscale / gray+alpha / RGB / RGBA, non-interlaced,
all five scanline filters on decode; the encoder can emit any single
filter type per image (useful to exercise every decode branch). Chunk
CRCs are written and verified.

The reference engine (perrygeo/python-rasterstats) has no image I/O at
all; this module follows the repo's from-scratch-reader discipline
(sources/geotiff.py) for the training-data media pipeline instead.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_TO_CH = {0: 1, 2: 3, 4: 2, 6: 4}
_CH_TO_COLOR = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))


def png_encode(img: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """Encode HxW (gray) or HxWxC uint8 to PNG bytes using one scanline
    ``filter_type`` (0..4) for every row."""
    img = np.ascontiguousarray(img)
    if img.dtype != np.uint8:
        raise ValueError("png_encode expects uint8")
    if not 0 <= filter_type <= 4:
        raise ValueError("filter_type must be 0..4")
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    raw = img.reshape(h, w * ch).astype(np.int32)
    bpp = ch
    zeros = np.zeros(bpp, np.int32)
    lines = []
    prev = np.zeros(w * ch, np.int32)
    for r in range(h):
        row = raw[r]
        left = np.concatenate([zeros, row[:-bpp]]) if w * ch > bpp else np.zeros_like(row)
        ul = np.concatenate([zeros, prev[:-bpp]]) if w * ch > bpp else np.zeros_like(row)
        if filter_type == 0:
            f = row
        elif filter_type == 1:
            f = row - left
        elif filter_type == 2:
            f = row - prev
        elif filter_type == 3:
            f = row - (left + prev) // 2
        else:
            f = row - _paeth(left, prev, ul)
        lines.append(bytes([filter_type]) + (f % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CH_TO_COLOR[ch], 0, 0, 0)
    idat = zlib.compress(b"".join(lines), level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def is_png(data: bytes) -> bool:
    return data[:8] == _SIG


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> HxW (gray) or HxWxC uint8 ndarray. Verifies CRCs."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = bytearray()
    w = h = ch = None
    while pos + 12 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + ln > len(data):
            raise ValueError(
                f"truncated {tag!r} chunk: declares {ln} bytes, "
                f"{len(data) - pos - 12} remain"
            )
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise NotImplementedError(f"bit depth {depth} (only 8 supported)")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG not supported")
            if color not in _COLOR_TO_CH:
                raise NotImplementedError(f"color type {color} (palette unsupported)")
            ch = _COLOR_TO_CH[color]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    bpp = ch
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    p = 0
    for r in range(h):
        ft = raw[p]
        p += 1
        line = np.frombuffer(raw, np.uint8, stride, p).astype(np.int32)
        p += stride
        if ft == 0:
            cur = line
        elif ft == 2:
            cur = (line + prev) % 256
        else:
            # Sub/Average/Paeth have a left-to-right data dependency:
            # reconstruct sequentially (rows are short for thumbnails;
            # this is the decode-complexity PNG inherently has).
            cur = np.empty(stride, np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                elif ft == 4:
                    pp = a + b - c
                    pa_, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                    pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad filter byte {ft}")
                cur[i] = (line[i] + pred) % 256
        out[r] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(h, w, ch) if ch > 1 else out.reshape(h, w)
    return img
