"""Pure-stdlib GeoPackage (OGC 12-128r18) vector reader + minimal writer.

The reference accepts any fiona/OGR datasource, GeoPackage being the
commonest beyond Shapefile (/root/reference/src/rasterstats/io.py:32-45,
94-101). fiona is absent in this environment, so this module reads the
format directly: a GeoPackage is a SQLite database whose feature tables
are declared in ``gpkg_contents`` (data_type='features') with their
geometry column named in ``gpkg_geometry_columns``; geometry values are
GeoPackage Binary (GPB) blobs — an 8-byte header + optional envelope,
then standard ISO WKB, decoded by functions/geometry.from_wkb (both
endians, Z/M tolerated).

Layer selection by name or 0-based index matches fiona.open(obj,
layer=...) semantics (reference tests/test_io.py:58-64).

The writer emits the three mandatory system tables plus one feature
table per call — enough for round-trip tests, for exporting engine
results, and for GDAL/QGIS to open the file.
"""

from __future__ import annotations

import sqlite3
import struct

from ..functions.geometry import Geom, from_wkb, parse_geometry, to_wkb

_ENV_BYTES = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}


def gpb_decode(blob: bytes | None) -> Geom | None:
    """GeoPackage Binary blob -> Geom (None for NULL / empty geometry)."""
    if blob is None:
        return None
    blob = bytes(blob)
    if blob[:2] != b"GP":
        # tolerate raw WKB, as OGR does for aspatial writers
        return from_wkb(blob)
    flags = blob[3]
    env_ind = (flags >> 1) & 0b111
    env_len = _ENV_BYTES.get(env_ind)
    if env_len is None:
        raise ValueError(f"Invalid GPB envelope indicator {env_ind}")
    if flags & 0b100000:
        raise ValueError("Extended GPB geometry types not supported")
    if flags & 0b10000:  # empty-geometry flag: the trailing WKB encodes an
        # EMPTY geometry (e.g. zero-ring Polygon); OGR/fiona surface it as an
        # empty geometry object, NOT geometry: null — decode rather than
        # conflate with a NULL blob (None is reserved strictly for NULL).
        wkb = blob[8 + env_len :]
        if not wkb:  # writer omitted the mandatory WKB — only then NULL
            return None
        g = from_wkb(wkb)
        # the GPKG spec encodes POINT EMPTY as POINT(NaN NaN): strip
        # all-NaN vertices so is_empty reflects the flag — otherwise a
        # one-NaN-vertex Point passes is_empty guards and poisons bounds
        # (NaN windows) and GeoJSON emission (bare NaN is invalid JSON)
        if g is not None and g.pts is not None and len(g.pts):
            import numpy as np

            if np.isnan(np.asarray(g.pts, dtype=np.float64)).all():
                from ..functions.geometry import Geom

                g = Geom(g.gtype, pts=np.empty((0, 2), dtype=np.float64))
        return g
    return from_wkb(blob[8 + env_len :])


def gpb_encode(geom: Geom, srs_id: int = 0) -> bytes:
    """Geom -> GPB blob (little-endian header, no envelope)."""
    return b"GP\x00\x01" + struct.pack("<i", srs_id) + to_wkb(geom)


def list_gpkg_layers(path: str) -> list[str]:
    """Feature-table names, in gpkg_contents order (fiona.listlayers)."""
    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type = 'features'"
        ).fetchall()
    finally:
        con.close()
    return [r[0] for r in rows]


def read_geopackage(path: str, layer: int | str = 0) -> list[dict]:
    """Read one layer of a GeoPackage as GeoJSON-like Feature dicts.

    ``layer`` is a table name or 0-based index into ``list_gpkg_layers``;
    properties are all non-geometry columns (the pk/fid column is surfaced
    as the feature ``id``, mirroring fiona)."""
    layers = list_gpkg_layers(path)
    if isinstance(layer, str):
        if layer not in layers:
            raise ValueError(f"Layer {layer!r} not found; available: {layers}")
        table = layer
    else:
        idx = int(layer)
        if not 0 <= idx < len(layers):
            raise ValueError(f"Layer index {idx} out of range; available: {layers}")
        table = layers[idx]

    con = sqlite3.connect(path)
    try:
        row = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE table_name = ?",
            (table,),
        ).fetchone()
        if row is None:
            raise ValueError(f"No geometry column registered for layer {table!r}")
        geom_col = row[0]
        # integer-primary-key column doubles as the feature id (gpkg req. 29)
        pk = None
        for cid, name, _typ, _nn, _dflt, is_pk in con.execute(
            f'PRAGMA table_info("{table}")'
        ):
            if is_pk:
                pk = name
        cur = con.execute(f'SELECT * FROM "{table}"')
        cols = [d[0] for d in cur.description]
        feats = []
        for i, vals in enumerate(cur):
            rec = dict(zip(cols, vals))
            blob = rec.pop(geom_col, None)
            fid = rec.pop(pk, i) if pk is not None else i
            geom = gpb_decode(blob)
            feats.append(
                {
                    "type": "Feature",
                    "id": str(fid),
                    "properties": rec,
                    "geometry": None if geom is None else geom.to_geojson(),
                }
            )
    finally:
        con.close()
    return feats


_SQL_TYPES = {int: "INTEGER", float: "DOUBLE", str: "TEXT", bytes: "BLOB"}


def write_geopackage(
    path: str,
    features,
    layer: str = "layer",
    srs_id: int = 0,
    geometry_type: str | None = None,
) -> str:
    """Write Feature dicts as one GeoPackage layer (appends a new layer if
    the file already exists). Property columns are typed from the first
    non-None value per key."""
    feats = [
        f if isinstance(f, dict) and f.get("type") == "Feature"
        else {"type": "Feature", "properties": {}, "geometry": f}
        for f in features
    ]
    geoms = [
        None if f.get("geometry") is None else parse_geometry(f["geometry"])
        for f in feats
    ]
    if geometry_type is None:
        kinds = {g.gtype.upper() for g in geoms if g is not None}
        geometry_type = kinds.pop() if len(kinds) == 1 else "GEOMETRY"

    prop_cols: dict[str, str] = {}
    for f in feats:
        for k, v in (f.get("properties") or {}).items():
            if k not in prop_cols or prop_cols[k] is None:
                prop_cols[k] = _SQL_TYPES.get(type(v)) if v is not None else None
    prop_cols = {k: (t or "TEXT") for k, t in prop_cols.items()}

    con = sqlite3.connect(path)
    try:
        con.executescript(
            """
            PRAGMA application_id = 0x47504B47;
            PRAGMA user_version = 10300;
            CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
              srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
              organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
              definition TEXT NOT NULL, description TEXT);
            CREATE TABLE IF NOT EXISTS gpkg_contents (
              table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
              identifier TEXT UNIQUE, description TEXT DEFAULT '',
              last_change DATETIME DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
              min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
              srs_id INTEGER);
            CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
              table_name TEXT NOT NULL, column_name TEXT NOT NULL,
              geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
              z TINYINT NOT NULL, m TINYINT NOT NULL,
              CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name));
            """
        )
        con.execute(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            ("undefined", srs_id, "NONE", srs_id, "undefined", None),
        )
        col_defs = "".join(f', "{k}" {t}' for k, t in prop_cols.items())
        con.execute(
            f'CREATE TABLE "{layer}" '
            f"(fid INTEGER PRIMARY KEY AUTOINCREMENT, geom BLOB{col_defs})"
        )
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, srs_id) "
            "VALUES (?, 'features', ?, ?)",
            (layer, layer, srs_id),
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', ?, ?, 0, 0)",
            (layer, geometry_type, srs_id),
        )
        keys = list(prop_cols)
        ph = ", ".join(["?"] * (1 + len(keys)))
        kcols = "".join(f', "{k}"' for k in keys)
        con.executemany(
            f'INSERT INTO "{layer}" (geom{kcols}) VALUES ({ph})',
            [
                (
                    None if g is None else gpb_encode(g, srs_id),
                    *((f.get("properties") or {}).get(k) for k in keys),
                )
                for f, g in zip(feats, geoms)
            ],
        )
        con.commit()
    finally:
        con.close()
    return path
