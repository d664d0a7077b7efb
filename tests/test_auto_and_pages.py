"""Hybrid auto-routing zonal + exact input-hint pages pipeline tests."""

import numpy as np
import pytest

from python_rasterstats_ray.functions.geometry import from_wkb
from python_rasterstats_ray.sources.synthetic import generate_raster, generate_zones


def test_zonal_auto_matches_oracle(ray_session):
    import ray.data

    from python_rasterstats_ray import zonal_stats
    from python_rasterstats_ray.stages.zonal_dist import zonal_stats_auto

    arr, affine, nodata = generate_raster((300, 300), kind="holes", seed=7)
    # mega_every guarantees both branches execute
    zones = generate_zones(
        30, extent=(0.0, 0.0, 300.0, 300.0), seed=4, mega_every=11
    )
    out = zonal_stats_auto(
        ray.data.from_arrow(zones),
        (arr, affine, nodata),
        stats="count min max mean nodata",
        window_px_budget=10_000,
    ).to_pandas().reset_index(drop=True)

    feats = [
        {"type": "Feature", "properties": {}, "geometry": from_wkb(w).to_geojson()}
        for w in zones["geom_wkb"].to_pylist()
    ]
    oracle = zonal_stats(feats, arr, affine=affine, nodata=nodata, stats="count min max mean nodata")
    assert len(out) == len(oracle)
    for i, orow in enumerate(oracle):
        assert out.loc[i, "zone_id"] == i
        assert out.loc[i, "count"] == orow["count"]
        assert out.loc[i, "nodata"] == orow["nodata"]
        if orow["count"]:
            assert out.loc[i, "min"] == orow["min"]
            assert out.loc[i, "max"] == orow["max"]
            assert out.loc[i, "mean"] == pytest.approx(orow["mean"], rel=1e-6)


def test_attach_zone_columns(ray_session):
    import ray.data

    from python_rasterstats_ray.stages.zonal_dist import (
        attach_zone_columns,
        zonal_stats_broadcast,
    )

    arr, affine, nodata = generate_raster((100, 100), seed=2)
    zones = generate_zones(10, extent=(0.0, 0.0, 100.0, 100.0), seed=3)
    stats = zonal_stats_broadcast(
        ray.data.from_arrow(zones), (arr, affine, nodata), stats="count"
    ).map_batches(lambda b: b.select(["zone_id", "count"]), batch_format="pyarrow")
    out = attach_zone_columns(stats, ray.data.from_arrow(zones), ["zcat"]).to_pandas()
    assert set(out.columns) == {"zone_id", "count", "zcat"}
    expect = dict(zip(zones["zone_id"].to_pylist(), zones["zcat"].to_pylist()))
    for _, row in out.iterrows():
        assert row["zcat"] == expect[row["zone_id"]]


def test_pages_pipeline_identity(ray_session):
    from python_rasterstats_ray.pipelines.webpages import pages_pipeline

    enriched, zone_stats = pages_pipeline(n_pages=3000, n_zones=12)
    df = zone_stats.to_pandas()
    assert df["n_pages"].sum() == 3000
    # byte identity: text re-derivable from url at the final stage
    assert (df["n_identity_violations"] == 0).all()
    # schema carries the exact input-hint columns through every stage
    cols = set(enriched.schema().names)
    assert {"url", "warc_ts", "html", "text", "lang", "lon", "lat", "zone_id"} <= cols


def test_auto_routes_full_options(ray_session):
    """zonal_stats_auto forwards categorical / add_stats / zone_func to
    BOTH physical paths; results match the sequential oracle."""
    import numpy as np
    import pytest
    import ray.data

    from python_rasterstats_ray import zonal_stats
    from python_rasterstats_ray.functions.geometry import from_wkb
    from python_rasterstats_ray.sources.synthetic import generate_raster, generate_zones
    from python_rasterstats_ray.stages.zonal_dist import zonal_stats_auto

    arr, affine, nodata = generate_raster((220, 220), kind="classes", seed=5)
    zones = generate_zones(12, extent=(5.0, 5.0, 215.0, 215.0), seed=6, mega_every=5)
    add = {"mask_px": lambda m, props, rv: int(rv.sum())}
    out = (
        zonal_stats_auto(
            ray.data.from_arrow(zones), (arr, affine, nodata),
            stats="count majority", categorical=True,
            category_map={1.0: "one"}, add_stats=add, window_px_budget=10_000,
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    feats = [
        {"type": "Feature", "properties": {}, "geometry": from_wkb(w).to_geojson()}
        for w in zones["geom_wkb"].to_pylist()
    ]
    oracle = zonal_stats(
        feats, arr, affine=affine, nodata=nodata, stats="count majority",
        categorical=True, category_map={1.0: "one"}, add_stats=add,
    )
    for i, orow in enumerate(oracle):
        assert out.iloc[i]["count"] == orow["count"]
        assert out.iloc[i]["mask_px"] == orow["mask_px"]
        got = dict(zip(out.iloc[i]["cat_keys"], out.iloc[i]["cat_counts"]))
        want = {str(k): v for k, v in orow.items()
                if k not in ("count", "majority", "mask_px")}
        assert got == want, i
