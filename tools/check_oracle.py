"""Dev harness emulating the driver's correctness gate: run each query
and its DuckDB oracle at a given sf, compare row-count + column names +
order-insensitive values.  Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(got.columns) != sorted(want.columns):
        errs.append(f"columns differ: ray={sorted(got.columns)} sql={sorted(want.columns)}")
        return errs
    g, w = normalize(got), normalize(want)
    if len(g) != len(w):
        errs.append(f"row count differ: ray={len(g)} sql={len(w)}")
        return errs
    for c in g.columns:
        if pd.api.types.is_float_dtype(g[c]) or pd.api.types.is_float_dtype(w[c]):
            ok = np.allclose(
                g[c].astype(float).to_numpy(), w[c].astype(float).to_numpy(),
                rtol=0, atol=1e-9, equal_nan=True,
            )
        else:
            ok = (g[c].astype(str).to_numpy() == w[c].astype(str).to_numpy()).all()
        if not ok:
            bad = np.flatnonzero(g[c].astype(str).to_numpy() != w[c].astype(str).to_numpy())[:5]
            errs.append(f"col {c} mismatch at rows {bad.tolist()}: "
                        f"ray={g[c].iloc[bad].tolist()} sql={w[c].iloc[bad].tolist()}")
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    # Ray-internal empty-sort-range blocks trigger a harmless
    # schema-mismatch warning (see bench._silence_ray_empty_block_warning)
    import bench

    bench._silence_ray_empty_block_warning()

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failed = []
    import time

    for name, sql in oracles.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(qs[name](sf_dir))
            want = con.sql(sql).df()
            errs = compare(name, got, want)
        except Exception as ex:
            errs = [f"EXCEPTION: {type(ex).__name__}: {ex}"]
        dt = time.time() - t0
        status = "OK " if not errs else "FAIL"
        print(f"{status} {name:24s} {dt:6.1f}s" + ("" if not errs else "  " + "; ".join(errs)[:400]))
        if errs:
            failed.append(name)
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all oracle queries match")
    ray.shutdown()


if __name__ == "__main__":
    main()
