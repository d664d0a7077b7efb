"""Polymorphic vector feature input (parity: io.py:48-146 of the reference).

Accepts: path to .shp, .gpkg (GeoPackage) or GeoJSON file, GeoJSON string (Feature /
FeatureCollection / bare geometry), WKT string, WKB bytes (or hex string),
GeoJSON-like Mapping, any object with ``__geo_interface__`` (incl.
GeoDataFrame-likes), or an iterable of any of the above. Unparseable input
raises ``ValueError`` like the reference (io.py:137-138).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterable, Mapping
from os import PathLike

from ..functions.geometry import GEOM_TYPES, from_wkb, from_wkt
from .shapefile import read_shapefile


def wrap_geom(geom) -> dict:
    """Wrap a geometry dict in a GeoJSON Feature."""
    return {"type": "Feature", "properties": {}, "geometry": geom}


def parse_feature(obj) -> dict:
    """Given a python object, attempt to make a GeoJSON-like Feature."""
    gi = getattr(obj, "__geo_interface__", None)
    if gi is not None:
        if gi["type"] in GEOM_TYPES:
            return wrap_geom(gi)
        elif gi["type"] == "Feature":
            return gi

    if isinstance(obj, str):
        try:
            return wrap_geom(from_wkt(obj).to_geojson())
        except ValueError:
            pass
        try:
            return wrap_geom(from_wkb(bytes.fromhex(obj)).to_geojson())
        except ValueError:
            pass

    if isinstance(obj, (bytes, bytearray, memoryview)):
        try:
            return wrap_geom(from_wkb(bytes(obj)).to_geojson())
        except (ValueError, Exception):
            pass

    try:
        if obj["type"] in GEOM_TYPES:
            return wrap_geom(obj)
        elif obj["type"] == "Feature":
            return obj
    except (TypeError, KeyError, IndexError):
        pass

    raise ValueError(f"Can't parse {obj} as a geojson Feature object")


def list_layers(path: str) -> list[str]:
    """Layer names of a datasource (reference: ``fiona.listlayers``).

    A directory is a multi-layer datasource whose layers are its .shp
    basenames (sorted for determinism); a single file is one layer named
    after its basename."""
    if os.path.isdir(path):
        return sorted(
            os.path.splitext(f)[0] for f in os.listdir(path) if f.lower().endswith(".shp")
        )
    if path.lower().endswith(".gpkg"):
        from .geopackage import list_gpkg_layers

        return list_gpkg_layers(path)
    return [os.path.splitext(os.path.basename(path))[0]]


def _resolve_layer(path: str, layer) -> str:
    """layer index-or-name -> concrete .shp path (reference io.py:94-101:
    ``fiona.open(obj, layer=layer)`` accepts either form)."""
    layers = list_layers(path)
    if isinstance(layer, str):
        if layer not in layers:
            raise ValueError(f"Layer {layer!r} not found; available: {layers}")
        name = layer
    else:
        idx = int(layer)
        if not 0 <= idx < len(layers):
            raise ValueError(f"Layer index {idx} out of range; available: {layers}")
        name = layers[idx]
    if os.path.isdir(path):
        return os.path.join(path, name + ".shp")
    return path


def _file_features(path: str, layer=0):
    """Read features from a .shp or GeoJSON file (or a directory
    datasource with ``layer`` selection by index or name)."""
    lower = path.lower()
    if lower.endswith(".gpkg"):
        from .geopackage import read_geopackage

        return read_geopackage(path, layer)
    if os.path.isdir(path) or lower.endswith(".shp"):
        return read_shapefile(_resolve_layer(path, layer))
    with open(path) as f:
        content = f.read()
    mapping = json.loads(content)
    if mapping.get("type") == "FeatureCollection":
        return mapping["features"]
    return [parse_feature(mapping)]


def read_features(obj, layer=0):
    features_iter = None
    if isinstance(obj, (str, PathLike)):
        obj = str(obj)
        if os.path.exists(obj):
            try:
                features_iter = _file_features(obj, layer)
            except (json.JSONDecodeError, NotImplementedError, UnicodeDecodeError):
                features_iter = None
        if features_iter is None:
            try:
                mapping = json.loads(obj)
                if "type" in mapping and mapping["type"] == "FeatureCollection":
                    features_iter = mapping["features"]
                elif mapping["type"] in GEOM_TYPES + ["Feature"]:
                    features_iter = [parse_feature(mapping)]
            except (ValueError, KeyError, json.JSONDecodeError):
                features_iter = [parse_feature(obj)]
    elif isinstance(obj, Mapping):
        if "type" in obj and obj["type"] == "FeatureCollection":
            features_iter = obj["features"]
        else:
            features_iter = [parse_feature(obj)]
    elif isinstance(obj, (bytes, bytearray)):
        features_iter = [parse_feature(obj)]
    elif hasattr(obj, "__geo_interface__"):
        mapping = obj.__geo_interface__
        if mapping["type"] == "FeatureCollection":
            features_iter = mapping["features"]
        else:
            features_iter = [parse_feature(mapping)]
    elif isinstance(obj, Iterable):
        features_iter = (parse_feature(x) for x in obj)

    if not features_iter:
        raise ValueError("Object is not a recognized source of Features")
    return features_iter


def read_featurecollection(obj, layer=0) -> dict:
    features = read_features(obj, layer=layer)
    return {"type": "FeatureCollection", "features": list(features)}
