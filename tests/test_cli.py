"""CLI golden-output tests (reference tests/test_cli.py analog, argparse
instead of click)."""

import json

import pytest

from python_rasterstats_ray.cli import main

from conftest import REF_DATA


def run_cli(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out
    return rc, out


def test_zonalstats_collection(capsys):
    rc, out = run_cli(
        capsys,
        ["zonalstats", f"{REF_DATA}/featurecollection.geojson", f"{REF_DATA}/slope.tif"],
    )
    assert rc == 0
    fc = json.loads(out)
    assert fc["type"] == "FeatureCollection"
    # reference cli defaults prefix to "_" (cli.py:23)
    assert [f["properties"]["_count"] for f in fc["features"]] == [75, 50]
    assert round(fc["features"][0]["properties"]["_mean"], 2) == 14.66


def test_zonalstats_sequence_rs(capsys):
    rc, out = run_cli(
        capsys,
        [
            "zonalstats",
            f"{REF_DATA}/featurecollection.geojson",
            f"{REF_DATA}/slope.tif",
            "--sequence",
            "--rs",
            "--stats",
            "count",
            "--prefix",
            "z_",
        ],
    )
    assert rc == 0
    records = [r for r in out.split("\x1e") if r.strip()]
    assert len(records) == 2
    assert json.loads(records[0])["properties"]["z_count"] == 75


def test_zonalstats_all_stats(capsys):
    rc, out = run_cli(
        capsys,
        [
            "zonalstats",
            f"{REF_DATA}/feature.geojson",
            f"{REF_DATA}/slope.tif",
            "--stats",
            "all",
        ],
    )
    props = json.loads(out)["features"][0]["properties"]
    for key in ("_count", "_median", "_majority", "_nodata"):
        assert key in props


def test_pointquery(capsys):
    rc, out = run_cli(
        capsys,
        ["pointquery", "POINT(245309 1000064)", f"{REF_DATA}/slope.tif"],
    )
    assert rc == 0
    fc = json.loads(out)
    assert fc["features"][0]["properties"]["value"] == pytest.approx(74.0981759)


def test_pointquery_nearest_property(capsys):
    rc, out = run_cli(
        capsys,
        [
            "pointquery",
            f"{REF_DATA}/points.shp",
            f"{REF_DATA}/slope.tif",
            "--interpolate",
            "nearest",
            "--property-name",
            "elev",
            "--sequence",
        ],
    )
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 3
    assert "elev" in json.loads(lines[0])["properties"]


def test_cli_training_ops(ray_session, capsys, tmp_path):
    """The dedup / bpe / kmeans subcommands run end-to-end on the sf0.001
    testdata: dedup writes a per-doc survivor parquet, bpe prints the
    merge table, kmeans prints one line per cluster."""
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    out_dir = str(tmp_path / "dedup_out")
    rc, _ = run_cli(capsys, ["dedup", f"{sf}/documents.parquet", out_dir])
    assert rc == 0
    t = pq.read_table(out_dir)
    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    assert t.num_rows == n_docs
    assert set(t.column_names) == {"doc_id", "cluster_id", "keep"}
    assert 0 < sum(t["keep"].to_pylist()) <= n_docs

    rc, out = run_cli(capsys, ["bpe", f"{sf}/documents.parquet", "--merges", "8"])
    assert rc == 0
    rows = [json.loads(line) for line in out.strip().splitlines()]
    assert len(rows) == 8 and rows[0]["rank"] == 0 and rows[0]["freq"] >= 2

    rc, out = run_cli(capsys, ["kmeans", f"{sf}/embeddings.parquet", "--k", "4"])
    assert rc == 0
    rows = [json.loads(line) for line in out.strip().splitlines()]
    assert len(rows) == 4
    assert sum(r["n_members"] for r in rows) == pq.read_metadata(
        f"{sf}/embeddings.parquet"
    ).num_rows


def test_cli_round3_ops(ray_session, capsys, tmp_path):
    """tokenize / ann-pq / dedup-store / dedup-probe subcommands run
    end-to-end on the sf0.001 testdata."""
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows

    tok_dir = str(tmp_path / "tok_out")
    rc, out = run_cli(
        capsys, ["tokenize", f"{sf}/documents.parquet", tok_dir, "--merges", "8"]
    )
    assert rc == 0 and json.loads(out.strip().splitlines()[-1])["n_merges"] == 8
    t = pq.read_table(tok_dir)
    assert t.num_rows == n_docs
    assert set(t.column_names) == {"doc_id", "n_bpe_tokens"}

    rc, out = run_cli(
        capsys,
        ["ann-pq", f"{sf}/embeddings.parquet", "--queries", "2", "--k", "3"],
    )
    assert rc == 0
    rows = [json.loads(line) for line in out.strip().splitlines()]
    assert len(rows) == 6
    assert rows[0]["rank"] == 1 and rows[0]["neighbor_id"] == rows[0]["query_id"]

    store = str(tmp_path / "store")
    rc, _ = run_cli(
        capsys, ["dedup-store", f"{sf}/documents.parquet", store, "--buckets", "8"]
    )
    assert rc == 0
    probe_dir = str(tmp_path / "probe_out")
    rc, _ = run_cli(
        capsys,
        ["dedup-probe", f"{sf}/documents.parquet", store, probe_dir, "--buckets", "8"],
    )
    assert rc == 0
    t = pq.read_table(probe_dir)
    assert t.num_rows == n_docs
    # the corpus probed against itself: every doc is a duplicate of one
    assert all(t["is_dup"].to_pylist())


def test_cli_ordering_ops(ray_session, capsys, tmp_path):
    """shuffle / mix / shards subcommands run end-to-end on sf0.001."""
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows

    shuf_dir = str(tmp_path / "shuf_out")
    rc, out = run_cli(
        capsys, ["shuffle", f"{sf}/documents.parquet", shuf_dir, "--seed", "7"]
    )
    assert rc == 0 and json.loads(out.strip().splitlines()[-1])["seed"] == 7
    t = pq.read_table(shuf_dir)
    assert t.num_rows == n_docs
    assert sorted(t["epoch_pos"].to_pylist()) == list(range(n_docs))

    mix_dir = str(tmp_path / "mix_out")
    rc, _ = run_cli(
        capsys,
        ["mix", f"{sf}/documents.parquet", mix_dir,
         "--weights", '{"en":0.5,"de":0.5}', "--budget", "40"],
    )
    assert rc == 0
    t = pq.read_table(mix_dir)
    counts = {}
    for g in t["lang"].to_pylist():
        counts[g] = counts.get(g, 0) + 1
    assert counts.get("en", 0) == 20 and counts.get("de", 0) == 20

    rc, out = run_cli(capsys, ["shards", sf])
    assert rc == 0
    rows = json.loads(out.strip().splitlines()[-1])
    assert sum(r["n_docs"] for r in rows) <= n_docs  # dedup may drop rows
    assert all(len(r["digest"]) == 64 for r in rows)


def test_cli_prep_writes_shards(ray_session, capsys, tmp_path):
    """prep writes shard-partitioned parquet; the read-back manifest
    matches the SQL-oracled docs_training_shards query exactly (same
    dedup+shuffle+digest semantics) and the manifest digests come from
    the WRITTEN files."""
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "shards_out")
    rc, outtxt = run_cli(capsys, ["prep", f"{sf}/documents.parquet", out])
    assert rc == 0
    info = json.loads(outtxt.strip().splitlines()[-1])
    assert info["shards"] >= 2

    import os

    dirs = [d for d in os.listdir(out) if d.startswith("shard_id=")]
    assert len(dirs) == info["shards"]
    manifest = json.load(open(f"{out}/_manifest.json"))

    # cross-check against the oracle-gated composite query
    from python_rasterstats_ray.pipelines.queries import q_docs_training_shards

    ref = q_docs_training_shards(sf).to_pandas().sort_values("shard_id")
    got = {m["shard_id"]: (m["n_docs"], m["digest"]) for m in manifest}
    for r in ref.itertuples():
        assert got[int(r.shard_id)] == (int(r.n_docs), r.digest)
    assert len(got) == len(ref)
    # written rows = survivors
    total = sum(pq.read_table(f"{out}/{d}").num_rows for d in dirs)
    assert total == int(ref["n_docs"].sum())


def test_cli_raster_ops(ray_session, capsys, tmp_path):
    """flowacc / polygonize subcommands run end-to-end over a small tile
    table written from a synthetic raster."""
    import numpy as np
    import pyarrow.parquet as pq

    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.sources.tiles import raster_to_tiles_table

    rng = np.random.default_rng(5)
    arr = rng.integers(1, 4, size=(40, 30)).astype(np.float32)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 40.0)
    tiles_dir = str(tmp_path / "tiles")
    import os

    os.makedirs(tiles_dir)
    pq.write_table(
        raster_to_tiles_table(arr, aff, -9999.0, tile_size=16),
        f"{tiles_dir}/t.parquet",
    )

    fa_dir = str(tmp_path / "fa_out")
    rc, out = run_cli(
        capsys,
        ["flowacc", tiles_dir, fa_dir, "--shape", "40", "30", "--tile-size", "16"],
    )
    assert rc == 0 and json.loads(out.strip().splitlines()[-1])["sample_mod"] == 1
    t = pq.read_table(fa_dir)
    assert t.num_rows == 40 * 30  # no nodata: every pixel sampled at mod 1
    assert int(np.asarray(t["acc"]).sum()) >= 40 * 30  # each pixel counts itself

    pg_dir = str(tmp_path / "pg_out")
    rc, _ = run_cli(
        capsys,
        ["polygonize", tiles_dir, pg_dir, "--shape", "40", "30", "--tile-size", "16"],
    )
    assert rc == 0
    t = pq.read_table(pg_dir)
    assert int(np.asarray(t["px_count"]).sum()) == 40 * 30
    assert t.num_rows > 1


def test_cli_contour_and_sieve(ray_session, capsys, tmp_path):
    """contour / sieve subcommands run end-to-end over a tile table."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.sources.tiles import raster_to_tiles_table

    h, w = 32, 28
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    arr = np.rint(
        50.0 * np.exp(-((yy - 16) ** 2 + (xx - 14) ** 2) / 40.0)
    ).astype(np.float32)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    tiles_dir = str(tmp_path / "tiles")
    os.makedirs(tiles_dir)
    pq.write_table(
        raster_to_tiles_table(arr, aff, -9999.0, tile_size=16),
        f"{tiles_dir}/t.parquet",
    )

    ct_dir = str(tmp_path / "ct_out")
    rc, out = run_cli(
        capsys,
        ["contour", tiles_dir, ct_dir, "--shape", str(h), str(w),
         "--tile-size", "16", "--levels", "20"],
    )
    assert rc == 0 and json.loads(out.strip().splitlines()[-1])["levels"] == [20]
    t = pq.read_table(ct_dir)
    assert t.num_rows >= 1  # the bump yields at least one closed ring
    assert bool(np.asarray(t["closed"]).any())

    # paint a small island to sieve away
    arr2 = np.zeros((h, w), np.float32)
    arr2[4:6, 4:6] = 9.0
    pq.write_table(
        raster_to_tiles_table(arr2, aff, -9999.0, tile_size=16),
        f"{tiles_dir}/t.parquet",
    )
    sv_dir = str(tmp_path / "sv_out")
    rc, out = run_cli(
        capsys,
        ["sieve", tiles_dir, sv_dir, "--shape", str(h), str(w),
         "--tile-size", "16", "--threshold", "5"],
    )
    assert rc == 0
    t = pq.read_table(sv_dir)
    full = np.zeros((h, w), np.float32)
    for i in range(t.num_rows):
        r0 = t["row_off"][i].as_py()
        c0 = t["col_off"][i].as_py()
        th_ = t["height"][i].as_py()
        tw_ = t["width"][i].as_py()
        full[r0 : r0 + th_, c0 : c0 + tw_] = np.frombuffer(
            t["pixels"][i].as_buffer(), dtype=np.dtype(t["dtype"][i].as_py())
        ).reshape(th_, tw_)
    assert (full == 0.0).all()  # the 4-px island was sieved into the sea
