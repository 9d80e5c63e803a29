"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin on the same sf dir and
compare row count, sorted-column schema, and values (order-insensitive).

Usage: python tools/check_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

import ray

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"[FAIL-run ] {name}: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)}")
            continue
        try:
            exp = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"[FAIL-sql ] {name}: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"[FAIL-rows] {name}: ray={len(got)} oracle={len(exp)}")
            failures += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"[FAIL-cols] {name}: ray={list(got.columns)} oracle={list(exp.columns)}")
            failures += 1
            continue
        ok = True
        for c in got.columns:
            a, b = got[c].to_numpy(), exp[c].to_numpy()
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                same = np.allclose(a.astype(float), b.astype(float), atol=1e-9, equal_nan=True)
            else:
                same = (a == b).all()
            if not same:
                bad = np.flatnonzero(~(a == b) if a.dtype.kind != "f" else
                                     ~np.isclose(a.astype(float), b.astype(float), atol=1e-9, equal_nan=True))[:3]
                print(f"[FAIL-vals] {name}.{c}: e.g. rows {bad.tolist()} "
                      f"ray={a[bad][:3].tolist()} oracle={b[bad][:3].tolist()}")
                ok = False
        if ok:
            print(f"[OK       ] {name}: {len(got)} rows")
        else:
            failures += 1
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
