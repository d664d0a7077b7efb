"""Command-line interface.

Parity surface (reference cli.py:13-131, `rio zonalstats` / `rio
pointquery`): features in as GeoJSON (file or stdin), stats appended to
feature properties, output as a FeatureCollection or an RS/LF-delimited
sequence (RFC 7464). Plus engine subcommands for the distributed pipelines
(suitable as a ``ray job submit`` entrypoint).

Usage:
    python -m python_rasterstats_ray.cli zonalstats FEATURES RASTER [opts]
    python -m python_rasterstats_ray.cli pointquery FEATURES RASTER [opts]
    python -m python_rasterstats_ray.cli flagship SF_DIR OUT_DIR [--parts N]
"""

from __future__ import annotations

import argparse
import json
import sys


def _read_features_arg(arg: str | None):
    if arg is None or arg == "-":
        return sys.stdin.read()
    return arg


def _emit(features: list[dict], sequence: bool, use_rs: bool, fh=None, indent=None) -> None:
    fh = fh or sys.stdout
    if sequence:
        for feat in features:
            if use_rs:
                fh.write("\x1e")
            fh.write(json.dumps(feat, indent=indent) + "\n")
    else:
        fh.write(
            json.dumps({"type": "FeatureCollection", "features": features}, indent=indent)
        )
        fh.write("\n")


def cmd_zonalstats(args) -> int:
    from . import gen_zonal_stats

    if args.info:
        import logging

        logging.basicConfig(level=logging.INFO)
    stats = args.stats
    if stats and stats.lower() == "all":
        stats = "ALL"
    feats = list(
        gen_zonal_stats(
            _read_features_arg(args.features),
            args.raster,
            stats=stats,
            all_touched=args.all_touched,
            band=args.band,
            nodata=args.nodata,
            categorical=args.categorical,
            prefix=args.prefix,
            geojson_out=True,
        )
    )
    _emit(feats, args.sequence, args.rs, indent=args.indent)
    return 0


def cmd_pointquery(args) -> int:
    from . import gen_point_query

    feats = list(
        gen_point_query(
            _read_features_arg(args.features),
            args.raster,
            band=args.band,
            nodata=args.nodata,
            interpolate=args.interpolate,
            property_name=args.property_name,
            geojson_out=True,
        )
    )
    _emit(feats, args.sequence, args.rs, indent=args.indent)
    return 0


def cmd_flagship(args) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    from .pipelines.checkpoint import checkpointed_flagship

    summary = checkpointed_flagship(args.sf_dir, args.out_dir, n_parts=args.parts)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python_rasterstats_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("features", help="vector file / GeoJSON / '-' for stdin")
        sp.add_argument("raster", help="GeoTIFF path")
        sp.add_argument("--band", type=int, default=1)
        sp.add_argument("--nodata", type=float, default=None)
        sp.add_argument("--sequence", action="store_true",
                        help="emit LF-delimited feature sequence instead of a collection")
        sp.add_argument("--rs", action="store_true",
                        help="with --sequence, prefix records with RFC 7464 RS")
        sp.add_argument("--indent", type=int, default=None,
                        help="JSON output indentation (reference cli.py:20)")
        sp.add_argument("--info", action="store_true",
                        help="enable INFO logging (reference cli.py:21)")

    zs = sub.add_parser("zonalstats", help="zonal statistics, GeoJSON out")
    common(zs)
    zs.add_argument("--stats", default=None, help="space-delimited stats or 'all'")
    zs.add_argument("--all-touched", action="store_true")
    zs.add_argument("--categorical", action="store_true")
    # reference zonalstats defaults prefix to "_" (cli.py:23)
    zs.add_argument("--prefix", default="_")
    zs.set_defaults(fn=cmd_zonalstats)

    pq_ = sub.add_parser("pointquery", help="raster values at vertices, GeoJSON out")
    common(pq_)
    pq_.add_argument("--interpolate", default="bilinear", choices=["bilinear", "nearest"])
    pq_.add_argument("--property-name", default="value")
    pq_.set_defaults(fn=cmd_pointquery)

    fl = sub.add_parser("flagship", help="checkpointed distributed pages pipeline")
    fl.add_argument("sf_dir")
    fl.add_argument("out_dir")
    fl.add_argument("--parts", type=int, default=4)
    fl.set_defaults(fn=cmd_flagship)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
