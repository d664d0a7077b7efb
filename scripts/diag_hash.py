"""Strict diagnosis of driver hash-amber queries: exact-value and dtype
comparison (no isclose) of queries() vs oracle_sql() at sf0.01.

Usage: python scripts/diag_hash.py [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

SF = "/root/testdata/sf0.01"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    only = set(sys.argv[1:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in only or oracles.keys():
        fn = qs[name]
        res = fn(SF)
        import ray.data

        rdf = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
        odf = con.execute(oracles[name]).df()
        print(f"=== {name}")
        a, b = canon(rdf), canon(odf)
        for c in a.columns:
            da, db = a[c].dtype, b[c].dtype
            note = "" if da == db else f"  DTYPE ray={da} oracle={db}"
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            try:
                exact = (av == bv) | (pd.isna(av) & pd.isna(bv))
                nbad = int((~exact).sum())
            except Exception as e:
                nbad, exact = -1, None
                note += f"  cmp-error {e}"
            print(f"  {c}: exact_mismatch={nbad}{note}")
            if exact is not None and nbad > 0:
                idx = np.nonzero(~exact)[0][:3]
                for i in idx:
                    ia, ib = av[i], bv[i]
                    d = (float(ia) - float(ib)) if isinstance(ia, (int, float, np.number)) else None
                    print(f"      row {i}: ray={ia!r} oracle={ib!r} diff={d}")
    ray.shutdown()


if __name__ == "__main__":
    main()
