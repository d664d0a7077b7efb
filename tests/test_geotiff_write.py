"""GeoTIFF writer roundtrips + the distributed per-zone raster sink."""

import numpy as np
import pytest

from python_rasterstats_ray.functions.affine import Affine
from python_rasterstats_ray.sources.geotiff import read_geotiff
from python_rasterstats_ray.sources.geotiff_write import write_geotiff


@pytest.mark.parametrize(
    "dtype", ["uint8", "int16", "uint16", "int32", "float32", "float64"]
)
def test_roundtrip_dtypes(tmp_path, dtype):
    arr = (np.arange(37 * 23, dtype=np.float64).reshape(37, 23) % 97).astype(dtype)
    aff = Affine(30.0, 0.0, 1000.0, 0.0, -30.0, 5000.0)
    p = str(tmp_path / "rt.tif")
    write_geotiff(p, arr, aff, nodata=7.0)
    g = read_geotiff(p)
    assert g.array.dtype == arr.dtype
    assert (g.array[0] == arr).all()
    assert g.affine == aff
    assert g.nodata == 7.0


def test_roundtrip_multiband_general_affine_uncompressed(tmp_path):
    arr = np.random.RandomState(0).rand(3, 50, 40).astype(np.float32)
    aff = Affine(30.0, 1.5, 10.0, 2.5, -29.0, 99.0)
    p = str(tmp_path / "rt2.tif")
    write_geotiff(p, arr, aff, compression="none")
    g = read_geotiff(p)
    assert g.array.shape == (3, 50, 40)
    assert (g.array == arr).all()
    assert g.affine == aff


def test_roundtrip_via_engine_zonal(tmp_path):
    """A written tif must behave identically to the in-memory raster in
    the sequential oracle (same masking, same stats)."""
    from python_rasterstats_ray import zonal_stats
    from python_rasterstats_ray.sources.synthetic import generate_raster

    arr, aff, nodata = generate_raster((120, 120), kind="holes", seed=9)
    p = str(tmp_path / "holes.tif")
    write_geotiff(p, arr, aff, nodata=nodata)
    geom = {
        "type": "Polygon",
        "coordinates": [[(10.0, 10.0), (90.0, 12.0), (80.0, 95.0), (12.0, 70.0), (10.0, 10.0)]],
    }
    a = zonal_stats([geom], arr, affine=aff, nodata=nodata, stats="count min max mean sum std")
    b = zonal_stats([geom], p, stats="count min max mean sum std")
    assert a == b


def test_write_zone_rasters_sink(ray_session, tmp_path):
    import ray.data

    from python_rasterstats_ray.sources.geotiff_write import write_zone_rasters
    from python_rasterstats_ray.sources.synthetic import generate_raster, generate_zones
    from python_rasterstats_ray.stages.zonal_dist import (
        unpack_mini_raster,
        zonal_stats_broadcast,
    )

    arr, affine, nodata = generate_raster((200, 200), kind="classes", seed=3)
    zones = generate_zones(10, extent=(-15.0, -15.0, 215.0, 215.0), seed=5)
    out = zonal_stats_broadcast(
        ray.data.from_arrow(zones), (arr, affine, nodata),
        stats="count", raster_out=True,
    )
    manifest = write_zone_rasters(out, str(tmp_path / "tifs")).to_pandas()
    assert len(manifest) == 10
    src = out.to_pandas().set_index("zone_id")
    for _, row in manifest.iterrows():
        masked, aff, nod = unpack_mini_raster(src.loc[row["zone_id"]])
        g = read_geotiff(row["path"])
        assert g.array.shape[-2:] == masked.shape == (row["height"], row["width"])
        assert g.affine == aff
        got = g.array[0]
        valid = ~np.ma.getmaskarray(masked)
        assert (got[valid] == np.asarray(masked)[valid]).all()
        # masked cells were filled with nodata
        assert (got[~valid] == np.asarray(nod, dtype=got.dtype)).all()


def test_packbits_decode_spec_vector():
    """The worked example from TIFF 6.0 §9 (Apple PackBits)."""
    from python_rasterstats_ray.sources.geotiff import _packbits_decode

    packed = bytes.fromhex("FEAA0280002AFDAA038000 2A22F7AA".replace(" ", ""))
    want = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22" + "AA" * 10)
    assert _packbits_decode(packed) == want


def test_packbits_encode_decode_fuzz():
    from python_rasterstats_ray.sources.geotiff import _packbits_decode
    from python_rasterstats_ray.sources.geotiff_write import _packbits_encode_row

    rng = np.random.RandomState(42)
    for trial in range(60):
        n = int(rng.randint(0, 700))
        # mix long runs and noise so both record types get exercised
        row = rng.choice([0, 0, 0, 7, 255], size=n).astype(np.uint8)
        if n and trial % 3 == 0:
            row[: n // 2] = 9  # one big run (can exceed 128)
        b = row.tobytes()
        assert _packbits_decode(_packbits_encode_row(b)) == b


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "float32"])
def test_roundtrip_packbits(tmp_path, dtype):
    rng = np.random.RandomState(3)
    arr = (rng.randint(0, 5, size=(41, 29)) * 11).astype(dtype)
    aff = Affine(10.0, 0.0, 0.0, 0.0, -10.0, 410.0)
    p = str(tmp_path / "pb.tif")
    write_geotiff(p, arr, aff, nodata=0.0, compression="packbits")
    g = read_geotiff(p)
    assert g.array.dtype == arr.dtype
    assert (g.array[0] == arr).all()
    assert g.affine == aff


def test_roundtrip_packbits_multiband(tmp_path):
    arr = np.random.RandomState(5).randint(0, 3, size=(2, 33, 17)).astype(np.uint8)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 33.0)
    p = str(tmp_path / "pb2.tif")
    write_geotiff(p, arr, aff, compression="packbits")
    g = read_geotiff(p)
    assert (g.array == arr).all()


@pytest.mark.parametrize("dtype", ["uint8", "int16", "uint16", "int32", "float32", "float64"])
def test_roundtrip_lzma(tmp_path, dtype):
    """TIFF compression 34925 (libtiff tif_lzma.c): bit-exact roundtrip."""
    rng = np.random.RandomState(11)
    arr = (rng.randint(0, 9, size=(53, 31)) * 13).astype(dtype)
    aff = Affine(10.0, 0.0, 0.0, 0.0, -10.0, 530.0)
    p = str(tmp_path / "xz.tif")
    write_geotiff(p, arr, aff, nodata=0.0, compression="lzma")
    g = read_geotiff(p)
    assert g.array.dtype == arr.dtype
    assert (g.array[0] == arr).all()
    assert g.affine == aff
    assert g.nodata == 0.0


def test_roundtrip_lzma_multiband_and_container(tmp_path):
    """Multiband LZMA roundtrip; the file must declare comp 34925 and each
    strip must be a standalone .xz stream (libtiff-compatible container)."""
    import lzma as _lzma
    import struct as _s

    arr = np.random.RandomState(7).randint(0, 4, size=(3, 40, 21)).astype(np.uint8)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 40.0)
    p = str(tmp_path / "xz3.tif")
    write_geotiff(p, arr, aff, compression="lzma", rows_per_strip=16)
    g = read_geotiff(p)
    assert (g.array == arr).all()
    data = open(p, "rb").read()
    # locate the compression tag (259) in the first IFD and the strips
    ifd_off = _s.unpack_from("<I", data, 4)[0]
    n = _s.unpack_from("<H", data, ifd_off)[0]
    tags = {}
    for i in range(n):
        t, typ, cnt, val = _s.unpack_from("<HHII", data, ifd_off + 2 + 12 * i)
        tags[t] = (typ, cnt, val)
    assert tags[259][2] == 34925
    # strip offsets/counts: resolve inline or offset-stored arrays
    def _vals(tag):
        typ, cnt, val = tags[tag]
        size = 2 if typ == 3 else 4
        fmt = "H" if typ == 3 else "I"
        if cnt * size <= 4:
            return list(_s.unpack_from(f"<{cnt}{fmt}", data, ifd_off + 2 + 12 * list(tags).index(tag) + 8))
        return list(_s.unpack_from(f"<{cnt}{fmt}", data, val))

    offs, cnts = _vals(273), _vals(279)
    assert len(offs) == 3  # ceil(40/16)
    for o, c in zip(offs, cnts):
        strip = data[o : o + c]
        assert strip[:6] == b"\xfd7zXZ\x00"  # .xz magic
        assert _lzma.decompress(strip)  # standalone decodable stream


def _split_jpeg_tables(stream: bytes):
    """Split a complete JFIF stream into (tables_stream, abbreviated) the
    way GDAL's JPEGTables tag does: DQT/DHT segments move to an
    SOI..EOI tables stream; the strip keeps everything else."""
    import struct as _s

    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    pos = 2
    while pos + 4 <= len(stream):
        assert stream[pos] == 0xFF
        marker = stream[pos + 1]
        if marker == 0xDA:  # SOS: header + entropy data to EOI stays
            rest += stream[pos:]
            break
        (seglen,) = _s.unpack(">H", stream[pos + 2 : pos + 4])
        seg = stream[pos : pos + 2 + seglen]
        (tables if marker in (0xDB, 0xC4) else rest).extend(seg)
        pos += 2 + seglen
    tables += b"\xff\xd9"
    return bytes(tables), bytes(rest)


def test_jpeg_in_tiff_roundtrip_gray(tmp_path):
    y, x = np.mgrid[0:70, 0:53]
    arr = (100 + 40 * np.sin(y / 9.0) + 30 * np.cos(x / 7.0)).astype(np.uint8)
    aff = Affine(5.0, 0.0, 0.0, 0.0, -5.0, 350.0)
    p = str(tmp_path / "jp.tif")
    write_geotiff(p, arr, aff, nodata=255.0, compression="jpeg", jpeg_quality=95)
    g = read_geotiff(p)
    assert g.array.shape == (1, 70, 53)
    assert g.affine == aff and g.nodata == 255.0
    d = np.abs(g.array[0].astype(int) - arr.astype(int))
    assert d.max() <= 4 and d.mean() < 1.0  # lossy, smooth field


def test_jpeg_in_tiff_roundtrip_rgb(tmp_path):
    y, x = np.mgrid[0:40, 0:64]
    base = (120 + 60 * np.sin((y + x) / 11.0)).astype(np.uint8)
    rgb = np.stack([base, base // 2 + 30, 255 - base], 0).astype(np.uint8)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 40.0)
    p = str(tmp_path / "jp3.tif")
    write_geotiff(p, rgb, aff, compression="jpeg", jpeg_quality=95)
    g = read_geotiff(p)
    assert g.array.shape == (3, 40, 64)
    d = np.abs(g.array.astype(int) - rgb.astype(int))
    assert d.max() <= 12 and d.mean() < 2.0  # YCbCr roundtrip + quant


def test_jpeg_tables_merge_abbreviated():
    """_jpeg_merge_tables must reassemble a decodable stream from a
    JPEGTables-style split (shared tables + abbreviated strip)."""
    from python_rasterstats_ray.sources.geotiff import _jpeg_merge_tables
    from python_rasterstats_ray.sources.jpeg import jpeg_decode, jpeg_encode

    y, x = np.mgrid[0:24, 0:31]
    img = (90 + 50 * np.sin(x / 5.0) + 20 * np.cos(y / 3.0)).astype(np.uint8)
    full = jpeg_encode(img, quality=92)
    tables, abbreviated = _split_jpeg_tables(full)
    assert b"\xff\xdb" not in abbreviated[:200]  # DQT really moved out
    merged = _jpeg_merge_tables(tables, abbreviated)
    assert (jpeg_decode(merged) == jpeg_decode(full)).all()
    # complete stream passes through untouched when no tables tag
    assert _jpeg_merge_tables(None, full) == full


def test_jpeg_in_tiff_rejects_unsupported():
    with pytest.raises(NotImplementedError):
        write_geotiff(
            "/tmp/never.tif",
            np.zeros((5, 5), np.float32),
            Affine(1.0, 0.0, 0.0, 0.0, -1.0, 5.0),
            compression="jpeg",
        )
