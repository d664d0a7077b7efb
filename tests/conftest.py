"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import numpy as np
import pytest

REF_DATA = "/root/reference/tests/data"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def slope_tif():
    return f"{REF_DATA}/slope.tif"


@pytest.fixture(scope="session")
def polygons():
    return f"{REF_DATA}/polygons.shp"


@pytest.fixture(scope="session")
def slope_raster():
    """(array, affine, nodata) of slope.tif via the pure-Python reader."""
    from python_rasterstats_ray.sources.geotiff import read_geotiff

    t = read_geotiff(f"{REF_DATA}/slope.tif")
    return t.band(1), t.affine, t.nodata


# ------------------------------------------------------------- slow marks
# The heaviest end-to-end cases (>= ~5 s each, ~40% of suite wall time).
# `pytest -m "not slow" tests/` is the <5 min default gate for iterating;
# the FULL suite (plain `pytest tests/`) remains the round gate and still
# runs every registry-derived oracle case — slow marks only partition, they
# never remove coverage.
_SLOW_NODE_SUBSTRINGS = (
    "test_extra_query_matches_oracle[raster_flow_acc]",
    "test_extra_query_matches_oracle[raster_pyramid]",
    "test_extra_query_matches_oracle[raster_flow_trace]",
    "test_extra_query_matches_oracle[raster_d8_flow]",
    "test_extra_query_matches_oracle[docs_edit_pairs]",
    "test_extra_query_matches_oracle[minhash_pairs]",
    "test_extra_query_matches_oracle[docs_decontaminate_bloom]",
    "test_components_broadcast_matches_shuffle",
    "test_connected_components_chain_and_bridge",
    "test_pagerank_broadcast_matches_naive_and_shuffle",
    "test_checkpointed_flagship_resume",
    "test_byte_identity_detects_corruption",
    "test_cli_round3_ops",
    "test_cli_prep_writes_shards",
    "test_cli_ordering_ops",
    "test_ivf_partitioned_store",
    "test_extra_query_matches_oracle[tpch_q10]",
    "test_extra_rows_only[knn_ivfpq-30]",
    "test_extra_rows_only[media_phash_dups-20]",
    "test_ivfpq_store_matches_sequential",
    "test_decontaminate_bloom_matches_exact",
    "test_q10_two_join_plan_completes_on_small_cluster",
    "test_image_phash_dups_matches_sequential",
    "test_pagerank_matches_naive",
    "test_pagerank_sink_source_isolated",
    "test_pq_train_encode_scan_matches_sequential",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(s in item.nodeid for s in _SLOW_NODE_SUBSTRINGS):
            item.add_marker(pytest.mark.slow)
