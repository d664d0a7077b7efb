"""Minimal pure-Python GeoTIFF reader (stdlib struct + numpy only).

Supports the subset of baseline TIFF 6.0 needed for conformance fixtures:
striped or tiled layout, uncompressed, PackBits, LZMA (comp 34925, xz
container per libtiff tif_lzma.c), or LZW/deflate (with horizontal
predictor),
single- or multi-sample, uint8/16/32, int8/16/32, float32/64, plus the
GeoTIFF georeferencing tags (ModelPixelScale + ModelTiepoint or
ModelTransformation) and GDAL's ASCII nodata tag. Internal mask IFDs
(NewSubfileType & 4) are surfaced as a boolean validity mask — the engine
analog of rasterio's per-dataset mask handling that the reference honors at
/root/reference/src/rasterstats/io.py:349-356.

This is a *source* implementation written from the public TIFF 6.0 and
GeoTIFF specs; no GDAL/rasterio involved.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np

from ..functions.affine import Affine

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


def _jpeg_merge_tables(tables: bytes | None, raw: bytes) -> bytes:
    """New-style JPEG-in-TIFF: prepend the JPEGTables-tag stream's table
    segments (an abbreviated SOI..EOI stream) to a strip/tile stream so
    abbreviated strips decode standalone. A complete strip stream passes
    through unchanged (tables then repeat, which JFIF permits)."""
    if not tables or len(tables) <= 4:
        return raw
    if raw[:2] != b"\xff\xd8":
        raise ValueError("JPEG strip missing SOI")
    t = bytes(tables)
    if t[:2] == b"\xff\xd8":
        t = t[2:]
    if t[-2:] == b"\xff\xd9":
        t = t[:-2]
    return b"\xff\xd8" + t + raw[2:]


def _packbits_decode(raw: bytes) -> bytes:
    """TIFF 6.0 §9 PackBits: control byte n in [0,127] copies n+1 literal
    bytes; n in [129,255] repeats the next byte 257-n times; 128 is a
    no-op. Loop is O(runs), not O(bytes)."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        b = raw[i]
        i += 1
        if b < 128:
            out += raw[i : i + b + 1]
            i += b + 1
        elif b > 128:
            out += raw[i : i + 1] * (257 - b)
            i += 1
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (MSB-first bit packing, early code change)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset_table():
        nonlocal table
        table = [bytes([i]) for i in range(256)] + [b"", b""]

    reset_table()
    bitbuf = 0
    bitcnt = 0
    codesize = 9
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while True:
        while bitcnt < codesize and pos < n:
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            bitcnt += 8
        if bitcnt < codesize:
            break
        code = (bitbuf >> (bitcnt - codesize)) & ((1 << codesize) - 1)
        bitcnt -= codesize
        if code == EOI:
            break
        if code == CLEAR:
            reset_table()
            codesize = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out.extend(entry)
        prev = entry
        # early change: bump code size one code early
        if len(table) >= (1 << codesize) - 1 and codesize < 12:
            codesize += 1
    return bytes(out)


@dataclass
class _IFD:
    tags: dict[int, tuple]
    offset: int

    def values(self, tag: int):
        return self.tags.get(tag, (None, None))[1]

    def value(self, tag: int, default=None):
        vals = self.values(tag)
        if vals is None:
            return default
        return vals[0] if isinstance(vals, (list, tuple)) else vals


@dataclass
class GeoTiff:
    """Parsed GeoTIFF: ``array`` (bands, h, w), ``affine``, ``nodata``,
    optional boolean ``mask`` (True = valid) from an internal mask IFD."""

    array: np.ndarray
    affine: Affine
    nodata: float | None
    mask: np.ndarray | None = None
    path: str | None = None

    @property
    def shape(self) -> tuple[int, int]:
        return self.array.shape[-2:]

    def band(self, band: int = 1) -> np.ndarray:
        return self.array[band - 1]


def _read_ifd(data: bytes, bo: str, off: int) -> tuple[_IFD, int]:
    (n,) = struct.unpack_from(bo + "H", data, off)
    tags: dict[int, tuple] = {}
    for i in range(n):
        base = off + 2 + i * 12
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, base)
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(bo + "I", data, base + 8)
        if typ == 2:
            raw = data[voff : voff + cnt]
            vals = raw.split(b"\x00")[0].decode("ascii", "replace")
        elif typ in (5, 10):
            nums = struct.unpack_from(bo + f"{2 * cnt}" + ("I" if typ == 5 else "i"), data, voff)
            vals = [nums[j] / nums[j + 1] if nums[j + 1] else 0.0 for j in range(0, 2 * cnt, 2)]
        else:
            fmt = _TYPE_FMT.get(typ)
            if fmt is None:
                vals = data[voff : voff + size]
            else:
                vals = list(struct.unpack_from(bo + f"{cnt}{fmt}", data, voff))
        tags[tag] = (typ, vals)
    (next_off,) = struct.unpack_from(bo + "I", data, off + 2 + n * 12)
    return _IFD(tags, off), next_off


def _decode_ifd_array(data: bytes, bo: str, ifd: _IFD) -> np.ndarray:
    width = int(ifd.value(256))
    height = int(ifd.value(257))
    spp = int(ifd.value(277, 1))
    bits = ifd.values(258) or [8]
    bps = int(bits[0] if isinstance(bits, (list, tuple)) else bits)
    fmt = int(ifd.value(339, 1))  # 1 uint, 2 int, 3 float
    compression = int(ifd.value(259, 1))
    predictor = int(ifd.value(317, 1))
    planar = int(ifd.value(284, 1))
    if planar != 1 and spp > 1:
        raise NotImplementedError("planar configuration 2 not supported")
    if compression not in (1, 5, 7, 8, 32773, 32946, 34925):
        raise NotImplementedError(f"TIFF compression {compression} not supported")
    if compression == 7 and bps != 8:
        raise NotImplementedError("JPEG-in-TIFF only supported at 8-bit depth")
    # New-style JPEG (comp 7): shared tables live in the JPEGTables tag
    # (347) as an abbreviated SOI..EOI stream; each strip/tile is its own
    # (possibly abbreviated) JPEG stream that inherits them.
    jpeg_tables = ifd.values(347) if compression == 7 else None
    if isinstance(jpeg_tables, (list, tuple)):
        jpeg_tables = bytes(jpeg_tables)

    def _decompress(raw: bytes) -> bytes:
        if compression == 5:
            return _lzw_decode(raw)
        if compression in (8, 32946):
            return zlib.decompress(raw)
        if compression == 32773:
            return _packbits_decode(raw)
        if compression == 34925:
            # libtiff's tif_lzma.c wraps each strip/tile in a full .xz
            # container stream (lzma_stream_encoder, CHECK_NONE); stdlib
            # lzma auto-detects the container, so this reads both our own
            # writer's output and GDAL/libtiff-produced LZMA TIFFs.
            import lzma

            return lzma.decompress(raw)
        if compression == 7:
            from .jpeg import jpeg_decode

            img = jpeg_decode(_jpeg_merge_tables(jpeg_tables, raw))
            if img.ndim == 2:
                img = img[:, :, None]
            if img.shape[2] != spp:
                raise ValueError(
                    f"JPEG strip has {img.shape[2]} components, IFD says {spp}"
                )
            return np.ascontiguousarray(img).tobytes()
        return raw

    if bps < 8:
        # sub-byte samples (e.g. 1-bit masks): decode row-wise bit-packed
        rows_per_strip = int(ifd.value(278, height))
        offsets = ifd.values(273) or []
        counts = ifd.values(279) or []
        if not isinstance(offsets, (list, tuple)):
            offsets = [offsets]
        if not isinstance(counts, (list, tuple)):
            counts = [counts]
        out8 = np.empty((height, width), dtype=np.uint8)
        row = 0
        row_bytes = (width * bps + 7) // 8
        for o, c in zip(offsets, counts):
            nrows = min(rows_per_strip, height - row)
            raw = _decompress(data[int(o) : int(o) + int(c)])
            bitsarr = np.unpackbits(
                np.frombuffer(raw, dtype=np.uint8, count=nrows * row_bytes).reshape(
                    nrows, row_bytes
                ),
                axis=1,
            )[:, : width * bps]
            if bps == 1:
                out8[row : row + nrows] = bitsarr
            else:
                out8[row : row + nrows] = bitsarr.reshape(nrows, width, bps).dot(
                    1 << np.arange(bps - 1, -1, -1)
                )
            row += nrows
        return out8.reshape(height, width, 1).transpose(2, 0, 1)

    kind = {1: "u", 2: "i", 3: "f"}[fmt]
    dtype = np.dtype(f"{bo}{kind}{bps // 8}")

    out = np.empty((height, width * spp), dtype=dtype)

    tile_w = ifd.value(322)
    if tile_w is not None:
        tile_w = int(tile_w)
        tile_h = int(ifd.value(323))
        offsets = ifd.values(324)
        counts = ifd.values(325)
        tiles_across = (width + tile_w - 1) // tile_w
        full = np.empty((height, width, spp), dtype=dtype)
        for idx, (o, c) in enumerate(zip(offsets, counts)):
            raw = _decompress(data[o : o + c])
            arr = np.frombuffer(raw, dtype=dtype, count=tile_h * tile_w * spp).reshape(
                tile_h, tile_w, spp
            )
            if predictor == 2:
                arr = np.cumsum(arr, axis=1, dtype=dtype)
            ty, tx = divmod(idx, tiles_across)
            y0, x0 = ty * tile_h, tx * tile_w
            h = min(tile_h, height - y0)
            w = min(tile_w, width - x0)
            full[y0 : y0 + h, x0 : x0 + w] = arr[:h, :w]
        out = full.reshape(height, width * spp)
    else:
        rows_per_strip = int(ifd.value(278, height))
        offsets = ifd.values(273)
        counts = ifd.values(279)
        if not isinstance(offsets, (list, tuple)):
            offsets = [offsets]
        if not isinstance(counts, (list, tuple)):
            counts = [counts]
        row = 0
        for o, c in zip(offsets, counts):
            nrows = min(rows_per_strip, height - row)
            raw = _decompress(data[int(o) : int(o) + int(c)])
            arr = np.frombuffer(raw, dtype=dtype, count=nrows * width * spp).reshape(
                nrows, width * spp
            )
            if predictor == 2:
                arr = np.cumsum(arr.reshape(nrows, width, spp), axis=1, dtype=dtype).reshape(
                    nrows, width * spp
                )
            out[row : row + nrows] = arr
            row += nrows
    return out.reshape(height, width, spp).transpose(2, 0, 1)


def read_geotiff(path: str) -> GeoTiff:
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError(f"{path} is not a TIFF file")
    magic, first_off = struct.unpack_from(bo + "HI", data, 2)
    if magic != 42:
        raise ValueError(f"{path}: unsupported TIFF magic {magic} (BigTIFF?)")

    ifds = []
    off = first_off
    while off:
        ifd, off = _read_ifd(data, bo, off)
        ifds.append(ifd)

    main = None
    mask_ifd = None
    for ifd in ifds:
        subtype = int(ifd.value(254, 0))
        if subtype & 4:
            mask_ifd = ifd
        elif main is None:
            main = ifd
    if main is None:
        raise ValueError(f"{path}: no image IFD found")

    array = _decode_ifd_array(data, bo, main)

    # Georeferencing: ModelTransformation (34264) wins, else scale+tiepoint.
    affine = Affine.identity()
    mt = main.values(34264)
    if mt is not None and len(mt) >= 8:
        affine = Affine(mt[0], mt[1], mt[3], mt[4], mt[5], mt[7])
    else:
        scale = main.values(33550)
        tie = main.values(33922)
        if scale is not None and tie is not None and len(tie) >= 6:
            sx, sy = float(scale[0]), float(scale[1])
            i, j, _, x, y, _ = (float(v) for v in tie[:6])
            affine = Affine(sx, 0.0, x - i * sx, 0.0, -sy, y + j * sy)

    nodata = None
    nd = main.values(42113)
    if nd is not None:
        try:
            nodata = float(str(nd).strip().split()[0])
        except (ValueError, IndexError):
            nodata = None

    mask = None
    if mask_ifd is not None:
        m = _decode_ifd_array(data, bo, mask_ifd)[0]
        mask = m != 0

    return GeoTiff(array=array, affine=affine, nodata=nodata, mask=mask, path=path)
