"""Local mimic of the driver's correctness gate: run every queries() entry
at a given sf and compare against oracle_sql() via DuckDB (row count,
column names, order-insensitive values).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_df(result) -> pd.DataFrame:
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


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    sort_cols = []
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if np.issubdtype(df[c].dtype, np.floating):
            # floats are compared with isclose later; round the SORT key so
            # sub-epsilon sum differences can't reorder otherwise-equal rows
            key = f"__sort_{c}"
            df[key] = df[c].round(6)
            sort_cols.append(key)
        else:
            sort_cols.append(c)
    df = df.sort_values(sort_cols).reset_index(drop=True)
    return df.drop(columns=[c for c in df.columns if c.startswith("__sort_")])


def compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns differ: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"row count differ: ray={len(ray_df)} sql={len(sql_df)}")
        return problems
    # Representation gate (VERDICT r2 #3): the driver hashes raw values, so
    # an int64-vs-float64 column with identical values still hash-mismatches
    # (the docs_unigram_lm amber). Fail locally on any dtype divergence.
    for c in sorted(ray_df.columns):
        ad, bd = ray_df[c].dtype, sql_df[c].dtype
        if str(ad) != str(bd):
            problems.append(f"col {c} dtype differs: ray={ad} vs sql={bd}")
    if problems:
        return problems
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            both_nan = np.isnan(av) & np.isnan(bv)
            close = np.isclose(av, bv, rtol=1e-9, atol=1e-12) | both_nan
            if not close.all():
                i = int(np.nonzero(~close)[0][0])
                problems.append(f"col {c} differs at row {i}: {av[i]!r} vs {bv[i]!r}")
        else:
            if not (av == bv).all():
                i = int(np.nonzero(av != bv)[0][0])
                problems.append(f"col {c} differs at row {i}: {av[i]!r} vs {bv[i]!r}")
    return problems


def main():
    argv = [a for a in sys.argv[1:] if a != "--no-extras"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import ray

    if not ray.is_initialized():
        ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = dict(entrymod.queries())
    oracles = dict(entrymod.oracle_sql())
    if "--no-extras" not in sys.argv:
        qs.update(entrymod.extra_queries())
        oracles.update(entrymod.extra_oracle_sql())
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            result = to_df(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name in oracles:
            sql_df = con.execute(oracles[name]).df()
            problems = compare(result, sql_df, name)
            if problems:
                n_fail += 1
                print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems[:3]))
            else:
                print(f"OK   {name} ({dt:.1f}s): {len(result)} rows match oracle")
        else:
            print(f"OK?  {name} ({dt:.1f}s): rows-only, {len(result)} rows")
    print("failures:", n_fail)
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
