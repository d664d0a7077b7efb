"""Differential oracle gate for the pipelines PRUNED from the driver's
50-entry correctness window (VERDICT r2 #1).

Every entry in ``__ray_entry__.extra_queries()`` runs here against its
DuckDB oracle with the same strictness as the driver: row count, column
names, dtypes (representation — the docs_unigram_lm amber was an
int64-vs-float64 artifact) and order-insensitive exact values. The three
rows-only pipelines (knn_ivf, media_features, audio_features,
video_features) get a
row-count + schema-stability check.

Default sf is 0.01 (the driver's gate sf); override with
GRAFT_SF_DIR_ORACLE.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("GRAFT_SF_DIR_ORACLE", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _entrymod():
    import __ray_entry__ as entrymod

    return entrymod


def _extra_names():
    return _entrymod().EXTRA_QUERY_ORDER


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _to_df(result) -> pd.DataFrame:
    import ray.data

    if isinstance(result, ray.data.Dataset):
        df = result.to_pandas()
        if df.shape[1] == 0:
            # Ray's to_pandas drops columns on an EMPTY dataset even when
            # schema() is intact; rebuild the typed empty frame from it
            schema = result.schema()
            if schema is not None:
                df = pd.DataFrame(
                    {
                        n: pd.Series(dtype=t.to_pandas_dtype())
                        for n, t in zip(schema.names, schema.types)
                    }
                )
        return df
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    sort_cols = []
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if np.issubdtype(df[c].dtype, np.floating):
            key = f"__sort_{c}"
            df[key] = df[c].round(6)
            sort_cols.append(key)
        else:
            sort_cols.append(c)
    df = df.sort_values(sort_cols).reset_index(drop=True)
    return df.drop(columns=[c for c in df.columns if c.startswith("__sort_")])


def _assert_equal(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str) -> None:
    assert sorted(ray_df.columns) == sorted(sql_df.columns), name
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} vs {len(sql_df)}"
    for c in sorted(ray_df.columns):
        assert str(ray_df[c].dtype) == str(sql_df[c].dtype), (
            f"{name}.{c}: dtype {ray_df[c].dtype} vs {sql_df[c].dtype}"
        )
    a, b = _canon(ray_df), _canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating):
            both_nan = np.isnan(av.astype(np.float64)) & np.isnan(bv.astype(np.float64))
            ok = np.isclose(av, bv, rtol=1e-9, atol=1e-12) | both_nan
            assert ok.all(), f"{name}.{c} differs at row {int(np.nonzero(~ok)[0][0])}"
        else:
            assert (av == bv).all(), (
                f"{name}.{c} differs at row {int(np.nonzero(av != bv)[0][0])}"
            )


# rows-only extras: no SQL oracle; each carries an exact pytest
# differential elsewhere (tests/test_training_ops.py) or an
# exact-checked companion query. min_rows pins the smoke contract.
ROWS_ONLY = {
    "knn_ivf": 30,
    "knn_pq": 30,
    "media_features": 200,
    "audio_features": 200,
    "video_features": 200,
    "docs_bpe_merges": 10,
    "docs_bpe_encode": 400,
    "embeddings_kmeans": 8,
    "docs_kll_quantiles": 6,
    "embeddings_semdedup": 100,
    "media_phash_dups": 20,
    "knn_ivfpq": 30,
    # exact differential: tests/test_focal.py::test_polygonize_matches_flood_fill
    "raster_polygonize": 100,
    # exact differential: tests/test_focal.py::test_sieve_matches_reference
    "raster_sieve": 1000,
    # exact differential: tests/test_focal.py::test_contour_polylines_match_reference
    "raster_contour_lines": 20,
    # exact differential: tests/test_focal.py::test_weighted_cost_distance_matches_dijkstra
    "raster_cost_weighted": 5000,
    # exact differential: tests/test_focal.py::test_region_group_matches_flood_fill
    "raster_region_group": 1000,
    # exact differential: tests/test_training_ops.py::test_convex_hull_properties
    "docs_convex_hull": 4,
}

# derive the oracled list from the registry so a new extra query is
# auto-covered (a hand-maintained literal silently skips additions)
import __ray_entry__ as _entry_for_params  # noqa: E402

ORACLED_EXTRAS = [n for n in _entry_for_params.EXTRA_QUERY_ORDER if n not in ROWS_ONLY]


@pytest.mark.parametrize("name", ORACLED_EXTRAS)
def test_extra_query_matches_oracle(ray_session, duck, name):
    entrymod = _entrymod()
    extras = entrymod.extra_queries()
    oracles = entrymod.extra_oracle_sql()
    assert name in extras and name in oracles
    ray_df = _to_df(extras[name](SF_DIR))
    sql_df = duck.execute(oracles[name]).df()
    _assert_equal(ray_df, sql_df, name)


@pytest.mark.parametrize("name,min_rows", sorted(ROWS_ONLY.items()))
def test_extra_rows_only(ray_session, name, min_rows):
    entrymod = _entrymod()
    ray_df = _to_df(entrymod.extra_queries()[name](SF_DIR))
    assert len(ray_df) >= min_rows


def test_registry_partition():
    """Driver window is exactly 50, extras cover the rest, no overlap."""
    entrymod = _entrymod()
    q, x = entrymod.queries(), entrymod.extra_queries()
    assert len(q) == 50
    assert not set(q) & set(x)
    # the parametrized list above stays in sync with EXTRA_QUERY_ORDER
    oracled = set(entrymod.extra_oracle_sql())
    assert oracled == set(x) - set(ROWS_ONLY)
