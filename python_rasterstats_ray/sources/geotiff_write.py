"""From-scratch GeoTIFF WRITER (counterpart to sources/geotiff.py).

Writes classic little-endian TIFF, single- or multi-band (contiguous),
striped, deflate-, PackBits- or LZMA-compressed (or uncompressed), with GeoTIFF georeference
tags (ModelPixelScale + ModelTiepoint for north-up affines,
ModelTransformation for general ones) and the GDAL_NODATA ascii tag —
the subset our reader (and rasterio/GDAL) understands. Used to export
``raster_out`` mini-rasters and any engine-produced grid; round-trips
bit-exactly through ``read_geotiff``.

Reference semantics: rasterstats returns mini_raster_array/affine/nodata
per zone (reference main.py:304-311); this writer turns those into real
.tif artifacts without GDAL.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

from ..functions.affine import Affine

_SAMPLE_FORMAT = {  # numpy kind -> TIFF SampleFormat
    "u": 1,
    "i": 2,
    "f": 3,
}

_TYPE_CODES = {
    "ascii": 2,
    "short": 3,
    "long": 4,
    "rational": 5,
    "double": 12,
}


def _tag(tag: int, typ: int, values) -> tuple[int, int, list]:
    return (tag, typ, list(values))


def _packbits_encode_row(row: bytes) -> bytes:
    """TIFF 6.0 §9 PackBits encoder for ONE row (the spec forbids packing
    across row boundaries). Runs of >=2 identical bytes become a replicate
    record (257-run, byte); everything else accumulates into <=128-byte
    literal records."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        if j - i >= 2:
            out.append(257 - (j - i))
            out.append(row[i])
            i = j
            continue
        lit = i
        i += 1
        while i < n and i - lit < 128:
            if i + 1 < n and row[i] == row[i + 1]:
                break
            i += 1
        out.append(i - lit - 1)
        out += row[lit:i]
    return bytes(out)


def write_geotiff(
    path: str,
    array: np.ndarray,
    affine: Affine,
    nodata: float | None = None,
    compression: str = "deflate",
    rows_per_strip: int = 64,
    jpeg_quality: int = 90,
) -> str:
    """Write ``array`` ((h, w) or (bands, h, w)) as a striped GeoTIFF.

    ``compression="jpeg"`` (LOSSY, uint8 1- or 3-band only) writes each
    strip as a complete baseline JFIF stream (new-style TIFF comp 7,
    4:4:4 so band values survive within quantization error)."""
    arr = np.asarray(array)
    if arr.ndim == 2:
        arr = arr[None, :, :]
    if arr.ndim != 3:
        raise ValueError("array must be (h, w) or (bands, h, w)")
    bands, h, w = arr.shape
    if arr.dtype.kind not in _SAMPLE_FORMAT:
        raise NotImplementedError(f"dtype {arr.dtype} not supported")
    if compression not in ("deflate", "packbits", "jpeg", "lzma", "none"):
        raise NotImplementedError(f"compression {compression!r} not supported")
    if compression == "jpeg" and (arr.dtype != np.uint8 or bands not in (1, 3)):
        raise NotImplementedError("jpeg compression needs uint8, 1 or 3 bands")
    comp_code = {
        "deflate": 8,
        "packbits": 32773,
        "jpeg": 7,
        "lzma": 34925,
        "none": 1,
    }[compression]
    bits = arr.dtype.itemsize * 8
    fmt_code = _SAMPLE_FORMAT[arr.dtype.kind]

    # band-interleaved-by-pixel (contiguous) strip payloads
    pix = np.ascontiguousarray(np.moveaxis(arr, 0, -1))  # (h, w, bands)
    if pix.dtype.byteorder == ">":
        pix = pix.astype(pix.dtype.newbyteorder("<"))
    row_bytes = w * bands * arr.dtype.itemsize
    strips = []
    for r0 in range(0, h, rows_per_strip):
        if comp_code == 7:
            from .jpeg import jpeg_encode

            block = pix[r0 : r0 + rows_per_strip]
            strips.append(
                jpeg_encode(
                    block[:, :, 0] if bands == 1 else block,
                    quality=jpeg_quality,
                    subsampling="4:4:4",
                )
            )
            continue
        raw = pix[r0 : r0 + rows_per_strip].tobytes()
        if comp_code == 8:
            strips.append(zlib.compress(raw, 6))
        elif comp_code == 34925:
            # Match libtiff tif_lzma.c: one .xz stream per strip, no
            # integrity check (LZMA_CHECK_NONE) — GDAL reads this as-is.
            import lzma

            strips.append(
                lzma.compress(raw, format=lzma.FORMAT_XZ, check=lzma.CHECK_NONE)
            )
        elif comp_code == 32773:
            strips.append(
                b"".join(
                    _packbits_encode_row(raw[p : p + row_bytes])
                    for p in range(0, len(raw), row_bytes)
                )
            )
        else:
            strips.append(raw)

    # ---- tags ------------------------------------------------------
    north_up = affine.b == 0.0 and affine.d == 0.0 and affine.a > 0 and affine.e < 0
    tags = [
        _tag(256, _TYPE_CODES["long"], [w]),
        _tag(257, _TYPE_CODES["long"], [h]),
        _tag(258, _TYPE_CODES["short"], [bits] * bands),
        _tag(259, _TYPE_CODES["short"], [comp_code]),
        # photometric: RGB for 3-band jpeg (the decoded image is RGB),
        # BlackIsZero otherwise
        _tag(262, _TYPE_CODES["short"], [2 if comp_code == 7 and bands == 3 else 1]),
        # 273/279 strip offsets+counts patched below
        _tag(277, _TYPE_CODES["short"], [bands]),
        _tag(278, _TYPE_CODES["long"], [rows_per_strip]),
        _tag(284, _TYPE_CODES["short"], [1]),  # contiguous
        _tag(339, _TYPE_CODES["short"], [fmt_code] * bands),
    ]
    if north_up:
        tags.append(_tag(33550, _TYPE_CODES["double"], [affine.a, -affine.e, 0.0]))
        tags.append(
            _tag(33922, _TYPE_CODES["double"], [0.0, 0.0, 0.0, affine.c, affine.f, 0.0])
        )
    else:
        # row-major 4x4 ModelTransformation
        tags.append(
            _tag(
                34264,
                _TYPE_CODES["double"],
                [
                    affine.a, affine.b, 0.0, affine.c,
                    affine.d, affine.e, 0.0, affine.f,
                    0.0, 0.0, 0.0, 0.0,
                    0.0, 0.0, 0.0, 1.0,
                ],
            )
        )
    # minimal GeoKey directory: model=1 (projected), raster type=1 (PixelIsArea)
    tags.append(
        _tag(
            34735,
            _TYPE_CODES["short"],
            [1, 1, 0, 2, 1024, 0, 1, 1, 1025, 0, 1, 1],
        )
    )
    if nodata is not None:
        nd = f"{nodata:.17g}\x00"
        tags.append((42113, _TYPE_CODES["ascii"], nd))

    # ---- layout: header | strip data | IFD | overflow values --------
    header_size = 8
    data_off = header_size
    strip_offsets, strip_counts = [], []
    off = data_off
    for s in strips:
        strip_offsets.append(off)
        strip_counts.append(len(s))
        off += len(s)
    ifd_off = off + (off % 2)  # word-align the IFD

    tags.append(_tag(273, _TYPE_CODES["long"], strip_offsets))
    tags.append(_tag(279, _TYPE_CODES["long"], strip_counts))
    tags.sort(key=lambda t: t[0])

    type_size = {2: 1, 3: 2, 4: 4, 5: 8, 12: 8}
    type_fmt = {3: "H", 4: "I", 12: "d"}

    n = len(tags)
    ifd_size = 2 + n * 12 + 4
    overflow_off = ifd_off + ifd_size
    entries = b""
    overflow = b""
    for tag, typ, values in tags:
        if typ == 2:
            payload = values.encode("ascii") if isinstance(values, str) else bytes(values)
            cnt = len(payload)
        else:
            payload = struct.pack(f"<{len(values)}{type_fmt[typ]}", *values)
            cnt = len(values)
        if len(payload) <= 4:
            v = payload + b"\x00" * (4 - len(payload))
            entries += struct.pack("<HHI", tag, typ, cnt) + v
        else:
            pos = overflow_off + len(overflow)
            if pos % 2:  # keep value offsets word-aligned
                overflow += b"\x00"
                pos += 1
            entries += struct.pack("<HHII", tag, typ, cnt, pos)
            overflow += payload
    ifd = struct.pack("<H", n) + entries + struct.pack("<I", 0)

    with open(path, "wb") as f:
        f.write(struct.pack("<2sHI", b"II", 42, ifd_off))
        for s in strips:
            f.write(s)
        f.write(b"\x00" * (ifd_off - off))
        f.write(ifd)
        f.write(overflow)
    return path

def write_zone_rasters(zstats_ds, out_dir: str, prefix: str = "zone"):
    """Distributed GeoTIFF sink for ``raster_out`` results: one .tif per
    zone from the mini_raster_* columns (masked cells filled with the
    zone's nodata), written inside the map_batches task that holds the
    batch — no driver round-trip; the (tiny) manifest Dataset
    (zone_id, path, height, width) is the only thing that flows on.

    Files land as ``{out_dir}/{prefix}_{zone_id}.tif`` — a partitioned,
    resumable layout (re-running overwrites per-zone files atomically
    via temp+rename, so a killed run can simply be re-driven)."""
    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        from ..stages.zonal_dist import np_from_bytes

        zids = batch["zone_id"].to_pylist()
        arrs = batch["mini_raster_array"].to_pylist()
        masks = batch["mini_raster_mask"].to_pylist()
        affs = batch["mini_raster_affine"].to_pylist()
        nds = batch["mini_raster_nodata"].to_pylist()
        paths, hs, ws = [], [], []
        for zid, ab, mb, aff6, nd in zip(zids, arrs, masks, affs, nds):
            data = np_from_bytes(ab)
            mask = np_from_bytes(mb)
            if nd is None:
                nd = float("nan") if data.dtype.kind == "f" else 0
            filled = np.where(mask, np.asarray(nd, dtype=data.dtype), data)
            path = os.path.join(out_dir, f"{prefix}_{zid}.tif")
            tmp = path + ".tmp"
            write_geotiff(tmp, filled, Affine(*aff6), nodata=float(nd))
            os.replace(tmp, path)
            paths.append(path)
            hs.append(data.shape[0])
            ws.append(data.shape[1])
        return pa.table(
            {
                "zone_id": batch["zone_id"],
                "path": pa.array(paths, pa.string()),
                "height": pa.array(hs, pa.int64()),
                "width": pa.array(ws, pa.int64()),
            }
        )

    return zstats_ds.map_batches(write_batch, batch_format="pyarrow", zero_copy_batch=True)
