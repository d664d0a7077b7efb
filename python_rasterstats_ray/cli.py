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
import os
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
    ray, owned = _ray_up()
    from .pipelines.checkpoint import checkpointed_flagship

    summary = checkpointed_flagship(args.sf_dir, args.out_dir, n_parts=args.parts)
    print(json.dumps(summary))
    _ray_down(ray, owned)
    return 0


def _ray_up():
    """Attach to the process' Ray session, initialising one only if none
    exists. Returns (ray, owned): ``owned`` is True iff this call did
    the init — only then may the command shut the session down (a CLI
    invoked inside a larger program, e.g. the pytest session, must not
    tear down a session it does not own)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
        return ray, True
    return ray, False


def _ray_down(ray, owned: bool) -> None:
    if owned:
        ray.shutdown()


def cmd_dedup(args) -> int:
    """Fuzzy-dedup a documents parquet: MinHash-LSH -> components ->
    one (doc_id, cluster_id, keep) row per doc, written as parquet."""
    ray, owned = _ray_up()
    import pyarrow as pa
    import ray.data

    from .stages.dedup import minhash_lsh_pairs
    from .stages.graph import components_auto

    ds = ray.data.read_parquet(args.docs, columns=[args.id_col, args.text_col])
    pairs = minhash_lsh_pairs(ds, text_col=args.text_col, id_col=args.id_col)

    def to_edges(batch: "pa.Table") -> "pa.Table":
        return pa.table({"src": batch["id_a"], "dst": batch["id_b"]})

    edges = pairs.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)
    cc = components_auto(edges, ds.select_columns([args.id_col]))

    def finish(batch: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        return pa.table(
            {
                args.id_col: batch["node"],
                "cluster_id": batch["lbl"],
                "keep": pc.equal(batch["node"], batch["lbl"]),
            }
        )

    cc.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        args.out_dir
    )
    print(json.dumps({"out_dir": args.out_dir}))
    _ray_down(ray, owned)
    return 0


def cmd_bpe(args) -> int:
    """Train BPE merges over a documents parquet; prints the readable
    merge table as JSON lines."""
    ray, owned = _ray_up()
    import ray.data

    from .stages.bpe import bpe_train, merge_table_strings

    ds = ray.data.read_parquet(args.docs, columns=[args.text_col])
    merges = merge_table_strings(bpe_train(ds, n_merges=args.merges,
                                           text_col=args.text_col))
    for row in merges.to_pylist():
        print(json.dumps(row))
    _ray_down(ray, owned)
    return 0


def cmd_kmeans(args) -> int:
    """Distributed int64 fixed-point k-means over an embeddings parquet;
    prints one JSON line per cluster."""
    ray, owned = _ray_up()
    import ray.data

    from .stages.similarity import kmeans_clusters

    ds = ray.data.read_parquet(args.embeddings, columns=[args.emb_col])
    out = kmeans_clusters(ds, k=args.k, n_iter=args.iters, emb_col=args.emb_col)
    for row in out.to_pylist():
        print(json.dumps({"cluster_id": row["cluster_id"],
                          "n_members": row["n_members"]}))
    _ray_down(ray, owned)
    return 0


def cmd_tokenize(args) -> int:
    """Train BPE merges then tokenize the corpus: writes one
    (doc_id, n_bpe_tokens) parquet row per document."""
    ray, owned = _ray_up()
    import ray.data

    from .stages.bpe import bpe_encode_counts, bpe_train

    ds = ray.data.read_parquet(args.docs, columns=[args.id_col, args.text_col])
    merges = bpe_train(ds, n_merges=args.merges, text_col=args.text_col)
    bpe_encode_counts(ds, merges, text_col=args.text_col).write_parquet(args.out_dir)
    print(json.dumps({"out_dir": args.out_dir, "n_merges": len(merges)}))
    _ray_down(ray, owned)
    return 0


def cmd_ann_pq(args) -> int:
    """Product-quantization ANN over an embeddings parquet: train
    codebooks, encode the corpus, ADC-scan the first N rows as queries;
    prints one JSON line per (query, neighbor, rank)."""
    ray, owned = _ray_up()
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from .stages.similarity import knn_pq, pq_encode, pq_train_int

    ds = ray.data.read_parquet(args.embeddings, columns=[args.id_col, args.emb_col])
    qt = pq.read_table(args.embeddings, columns=[args.id_col, args.emb_col]).slice(
        0, args.queries
    )
    qids = np.asarray(qt[args.id_col].to_pylist(), dtype=np.int64)
    qmat = np.stack(qt[args.emb_col].to_pylist()).astype(np.float64)
    books = pq_train_int(
        ds, n_subspaces=args.subspaces, n_codes=args.codes, emb_col=args.emb_col
    )
    out = knn_pq(
        pq_encode(ds, books, id_col=args.id_col, emb_col=args.emb_col),
        (qids, qmat),
        books,
        k=args.k,
        id_col=args.id_col,
    )
    for row in out.sort(["query_id", "rank"]).to_pandas().to_dict("records"):
        print(json.dumps(row))
    _ray_down(ray, owned)
    return 0


def cmd_dedup_store(args) -> int:
    """Persist a corpus' content-hash dedup index (hash-bucketed md5)."""
    ray, owned = _ray_up()
    import ray.data

    from .stages.dedup import dedup_store_write

    ds = ray.data.read_parquet(args.docs, columns=[args.id_col, args.text_col])
    dedup_store_write(ds, args.store, n_buckets=args.buckets,
                      text_col=args.text_col, id_col=args.id_col)
    print(json.dumps({"store": args.store, "buckets": args.buckets}))
    _ray_down(ray, owned)
    return 0


def cmd_dedup_probe(args) -> int:
    """Dedup a new shard against a persisted store; writes
    (doc_id, is_dup, dup_of) parquet."""
    ray, owned = _ray_up()
    import ray.data

    from .stages.dedup import dedup_against_store

    ds = ray.data.read_parquet(args.docs, columns=[args.id_col, args.text_col])
    dedup_against_store(ds, args.store, n_buckets=args.buckets,
                        text_col=args.text_col, id_col=args.id_col).write_parquet(
        args.out_dir
    )
    print(json.dumps({"out_dir": args.out_dir}))
    _ray_down(ray, owned)
    return 0


def cmd_shuffle(args) -> int:
    """Deterministic epoch shuffle: (doc_id, epoch_pos) parquet."""
    ray, owned = _ray_up()
    import ray.data

    from .stages.ordering import epoch_shuffle

    ds = ray.data.read_parquet(args.docs, columns=[args.id_col])
    epoch_shuffle(ds, seed=args.seed, id_col=args.id_col).write_parquet(args.out_dir)
    print(json.dumps({"out_dir": args.out_dir, "seed": args.seed}))
    _ray_down(ray, owned)
    return 0


def cmd_focal(args) -> int:
    """Distributed focal mean: derived-tile parquet (fsum/fcnt payloads)."""
    ray, owned = _ray_up()
    import ray.data

    from .stages.focal import focal_mean_tiled

    ds = ray.data.read_parquet(args.tiles)
    out = focal_mean_tiled(
        ds, tuple(args.shape), args.nodata, radius=args.radius, tile_size=args.tile_size
    )
    out.write_parquet(args.out_dir)
    print(json.dumps({"out_dir": args.out_dir, "radius": args.radius}))
    _ray_down(ray, owned)
    return 0


def cmd_flowacc(args) -> int:
    """Distributed D8 flow accumulation: (row, col, acc) parquet."""
    ray, owned = _ray_up()
    import ray.data

    from .stages.focal import flow_accumulation

    ds = ray.data.read_parquet(args.tiles)
    out = flow_accumulation(
        ds, tuple(args.shape), args.nodata, args.sample_mod, tile_size=args.tile_size
    )
    out.write_parquet(args.out_dir)
    print(json.dumps({"out_dir": args.out_dir, "sample_mod": args.sample_mod}))
    _ray_down(ray, owned)
    return 0


def cmd_polygonize(args) -> int:
    """Distributed raster->vector region extraction: one row per
    4-connected equal-value region."""
    ray, owned = _ray_up()
    import ray.data

    from .stages.polygonize import polygonize_tiled

    ds = ray.data.read_parquet(args.tiles)
    out = polygonize_tiled(ds, tuple(args.shape), args.nodata, tile_size=args.tile_size)
    out.write_parquet(args.out_dir)
    print(json.dumps({"out_dir": args.out_dir}))
    _ray_down(ray, owned)
    return 0


def cmd_contour(args) -> int:
    """Distributed contour lines: one row per assembled polyline."""
    ray, owned = _ray_up()
    import ray.data

    from .stages.focal import contour_polylines

    ds = ray.data.read_parquet(args.tiles)
    out = contour_polylines(
        ds, tuple(args.shape), args.nodata, args.levels, tile_size=args.tile_size
    )
    out.write_parquet(args.out_dir)
    print(json.dumps({"out_dir": args.out_dir, "levels": args.levels}))
    _ray_down(ray, owned)
    return 0


def cmd_sieve(args) -> int:
    """Distributed sieve filter: rewritten tile table."""
    ray, owned = _ray_up()
    import ray.data

    from .stages.polygonize import sieve_tiled

    ds = ray.data.read_parquet(args.tiles)
    out = sieve_tiled(
        ds, tuple(args.shape), args.nodata, args.threshold, tile_size=args.tile_size
    )
    out.write_parquet(args.out_dir)
    print(json.dumps({"out_dir": args.out_dir, "threshold": args.threshold}))
    _ray_down(ray, owned)
    return 0


def cmd_mix(args) -> int:
    """Domain-weighted mixture selection: kept (doc_id, domain) parquet.

    --weights is JSON, e.g. '{"en":0.5,"de":0.5}'."""
    ray, owned = _ray_up()
    import ray.data

    from .stages.ordering import corpus_mix

    weights = json.loads(args.weights)
    ds = ray.data.read_parquet(args.docs, columns=[args.id_col, args.group_col])
    corpus_mix(
        ds, weights, args.budget, seed=args.seed,
        id_col=args.id_col, group_col=args.group_col,
    ).write_parquet(args.out_dir)
    print(json.dumps({"out_dir": args.out_dir, "budget": args.budget}))
    _ray_down(ray, owned)
    return 0


def cmd_shards(args) -> int:
    """Training-shard manifest: dedup -> shuffle -> shards -> digests."""
    ray, owned = _ray_up()

    from .pipelines.queries import q_docs_training_shards

    sf_dir = args.sf_dir
    df = q_docs_training_shards(sf_dir).to_pandas()
    print(df.to_json(orient="records"))
    _ray_down(ray, owned)
    return 0


def cmd_prep(args) -> int:
    """End-to-end training-data prep: exact dedup -> epoch shuffle ->
    fixed-size shards WRITTEN as parquet partitioned by shard
    (``out_dir/shard_id=K/``), plus ``_manifest.json`` with per-shard
    doc counts and xor-of-sha256 byte-identity digests computed by
    READING BACK the written files (the manifest doubles as write
    validation — pipelines/checkpoint.py's lineage rule)."""
    ray, owned = _ray_up()
    import numpy as np
    import pyarrow as pa
    import ray.data

    from .pipelines.webpages import sha256_hex
    from .stages.dedup import exact_dedup_keep_first
    from .stages.joins import join_auto
    from .stages.ordering import epoch_shuffle

    full = ray.data.read_parquet(args.docs)
    thin = ray.data.read_parquet(args.docs, columns=[args.id_col, args.text_col])
    survivors = exact_dedup_keep_first(
        thin, text_col=args.text_col, id_col=args.id_col
    ).rename_columns({"rep_doc_id": args.id_col})
    pos = epoch_shuffle(survivors, seed=args.seed, id_col=args.id_col)

    shard_docs = args.shard_docs

    def to_shard(batch: pa.Table) -> pa.Table:
        ep = batch["epoch_pos"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                args.id_col: batch[args.id_col],
                "shard_id": pa.array(ep // shard_docs, pa.int64()),
            }
        )

    assign = pos.map_batches(to_shard, batch_format="pyarrow", zero_copy_batch=True)
    joined = join_auto(full, assign, on=[args.id_col], join_type="inner")
    joined.write_parquet(args.out_dir, partition_cols=["shard_id"])

    # manifest from the WRITTEN files (read-back validation)
    back = ray.data.read_parquet(args.out_dir, columns=["shard_id", args.text_col])

    def digest_partials(batch: pa.Table) -> pa.Table:
        sh = np.asarray(batch["shard_id"].to_pylist(), dtype=np.int64)
        shas = sha256_hex(batch[args.text_col].to_pylist())
        us = np.unique(sh)
        n = np.zeros(len(us), np.int64)
        acc = [0] * len(us)
        idx = np.searchsorted(us, sh)
        for i, h in zip(idx, shas):
            n[i] += 1
            acc[i] ^= int(h, 16)
        return pa.table(
            {
                "shard_id": pa.array(us, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "digest": pa.array([f"{a:064x}" for a in acc], pa.string()),
            }
        )

    from python_rasterstats_ray.pipelines.webpages import shard_digest_merge

    manifest = (
        back.map_batches(digest_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard_id")
        .map_groups(shard_digest_merge, batch_format="pyarrow")
        .to_pandas()
        .sort_values("shard_id")
    )
    rows = manifest.to_dict(orient="records")
    with open(os.path.join(args.out_dir, "_manifest.json"), "w") as f:
        json.dump(rows, f)
    print(json.dumps({"out_dir": args.out_dir, "shards": len(rows),
                      "n_docs": int(manifest["n_docs"].sum())}))
    _ray_down(ray, owned)
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

    dd = sub.add_parser("dedup", help="fuzzy-dedup a documents parquet (LSH->components->survivors)")
    dd.add_argument("docs", help="documents parquet path")
    dd.add_argument("out_dir", help="output parquet directory")
    dd.add_argument("--id-col", default="doc_id")
    dd.add_argument("--text-col", default="text")
    dd.set_defaults(fn=cmd_dedup)

    bp = sub.add_parser("bpe", help="train BPE merges over a documents parquet")
    bp.add_argument("docs", help="documents parquet path")
    bp.add_argument("--merges", type=int, default=30)
    bp.add_argument("--text-col", default="text")
    bp.set_defaults(fn=cmd_bpe)

    km = sub.add_parser("kmeans", help="distributed k-means over an embeddings parquet")
    km.add_argument("embeddings", help="embeddings parquet path")
    km.add_argument("--k", type=int, default=8)
    km.add_argument("--iters", type=int, default=6)
    km.add_argument("--emb-col", default="embedding")
    km.set_defaults(fn=cmd_kmeans)

    tk = sub.add_parser("tokenize", help="train BPE then tokenize the corpus (per-doc token counts)")
    tk.add_argument("docs")
    tk.add_argument("out_dir")
    tk.add_argument("--merges", type=int, default=30)
    tk.add_argument("--text-col", default="text")
    tk.add_argument("--id-col", default="doc_id")
    tk.set_defaults(fn=cmd_tokenize)

    ann = sub.add_parser("ann-pq", help="product-quantization ANN over an embeddings parquet")
    ann.add_argument("embeddings")
    ann.add_argument("--k", type=int, default=10)
    ann.add_argument("--queries", type=int, default=3)
    ann.add_argument("--subspaces", type=int, default=4)
    ann.add_argument("--codes", type=int, default=16)
    ann.add_argument("--id-col", default="vec_id")
    ann.add_argument("--emb-col", default="embedding")
    ann.set_defaults(fn=cmd_ann_pq)

    st = sub.add_parser("dedup-store", help="persist a corpus' content-hash dedup index")
    st.add_argument("docs")
    st.add_argument("store")
    st.add_argument("--buckets", type=int, default=64)
    st.add_argument("--text-col", default="text")
    st.add_argument("--id-col", default="doc_id")
    st.set_defaults(fn=cmd_dedup_store)

    sh = sub.add_parser("shuffle", help="deterministic epoch shuffle -> (id, epoch_pos) parquet")
    sh.add_argument("docs")
    sh.add_argument("out_dir")
    sh.add_argument("--seed", type=int, default=0)
    sh.add_argument("--id-col", default="doc_id")
    sh.set_defaults(fn=cmd_shuffle)

    mx = sub.add_parser("mix", help="domain-weighted mixture selection (JSON weights)")
    mx.add_argument("docs")
    mx.add_argument("out_dir")
    mx.add_argument("--weights", required=True, help='JSON, e.g. \'{"en":0.5,"de":0.5}\'')
    mx.add_argument("--budget", type=int, required=True)
    mx.add_argument("--seed", type=int, default=0)
    mx.add_argument("--id-col", default="doc_id")
    mx.add_argument("--group-col", default="lang")
    mx.set_defaults(fn=cmd_mix)

    tsh = sub.add_parser("shards", help="training-shard manifest (dedup->shuffle->digests)")
    tsh.add_argument("sf_dir", help="directory holding documents.parquet")
    tsh.set_defaults(fn=cmd_shards)

    pp = sub.add_parser("prep", help="dedup->shuffle->write shard parquet + digest manifest")
    pp.add_argument("docs")
    pp.add_argument("out_dir")
    pp.add_argument("--seed", type=int, default=7)
    pp.add_argument("--shard-docs", type=int, default=64)
    pp.add_argument("--id-col", default="doc_id")
    pp.add_argument("--text-col", default="text")
    pp.set_defaults(fn=cmd_prep)

    pr = sub.add_parser("dedup-probe", help="dedup a new shard against a persisted store")
    pr.add_argument("docs")
    pr.add_argument("store")
    pr.add_argument("out_dir")
    pr.add_argument("--buckets", type=int, default=64)
    pr.add_argument("--text-col", default="text")
    pr.add_argument("--id-col", default="doc_id")
    pr.set_defaults(fn=cmd_dedup_probe)

    fo = sub.add_parser("focal", help="focal mean over a tile-table parquet (halo exchange)")
    fo.add_argument("tiles", help="tile table parquet dir (cell,row_off,...,pixels)")
    fo.add_argument("out_dir")
    fo.add_argument("--shape", type=int, nargs=2, required=True, metavar=("H", "W"))
    fo.add_argument("--tile-size", type=int, default=256)
    fo.add_argument("--nodata", type=float, default=-9999.0)
    fo.add_argument("--radius", type=int, default=1)
    fo.set_defaults(fn=cmd_focal)

    fa = sub.add_parser("flowacc", help="D8 flow accumulation over a tile-table parquet")
    fa.add_argument("tiles", help="tile table parquet dir (cell,row_off,...,pixels)")
    fa.add_argument("out_dir")
    fa.add_argument("--shape", type=int, nargs=2, required=True, metavar=("H", "W"))
    fa.add_argument("--tile-size", type=int, default=256)
    fa.add_argument("--nodata", type=float, default=-9999.0)
    fa.add_argument("--sample-mod", type=int, default=1)
    fa.set_defaults(fn=cmd_flowacc)

    pg = sub.add_parser("polygonize", help="raster->vector regions over a tile-table parquet")
    pg.add_argument("tiles", help="tile table parquet dir (cell,row_off,...,pixels)")
    pg.add_argument("out_dir")
    pg.add_argument("--shape", type=int, nargs=2, required=True, metavar=("H", "W"))
    pg.add_argument("--tile-size", type=int, default=256)
    pg.add_argument("--nodata", type=float, default=-9999.0)
    pg.set_defaults(fn=cmd_polygonize)

    ct = sub.add_parser("contour", help="contour polylines over a tile-table parquet")
    ct.add_argument("tiles", help="tile table parquet dir (cell,row_off,...,pixels)")
    ct.add_argument("out_dir")
    ct.add_argument("--shape", type=int, nargs=2, required=True, metavar=("H", "W"))
    ct.add_argument("--tile-size", type=int, default=256)
    ct.add_argument("--nodata", type=float, default=-9999.0)
    ct.add_argument("--levels", type=int, nargs="+", required=True)
    ct.set_defaults(fn=cmd_contour)

    sv = sub.add_parser("sieve", help="remove small regions (gdal_sieve) over a tile-table parquet")
    sv.add_argument("tiles", help="tile table parquet dir (cell,row_off,...,pixels)")
    sv.add_argument("out_dir")
    sv.add_argument("--shape", type=int, nargs=2, required=True, metavar=("H", "W"))
    sv.add_argument("--tile-size", type=int, default=256)
    sv.add_argument("--nodata", type=float, default=-9999.0)
    sv.add_argument("--threshold", type=int, required=True)
    sv.set_defaults(fn=cmd_sieve)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
