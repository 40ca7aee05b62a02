"""Self-check harness: run a Ray query and its DuckDB oracle side-by-side.

Mirrors the driver's correctness gate: convert both results to pandas, sort
columns by name, sort rows, compare values (exact for strings/ints, small
tolerance-free equality for rounded floats). Used by tests and the dev loop.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def run_oracle(sql: str, sf_dir: str | None = None) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        if sf_dir:
            for t in ("region", "nation", "customer", "supplier", "part",
                      "orders", "lineitem", "events", "documents",
                      "embeddings"):
                con.sql(f"create view {t} as select * from "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
        return con.sql(sql).df()
    finally:
        con.close()


def compare(ray_result, sql: str, sf_dir: str | None = None,
            float_tol: float = 1e-9) -> tuple[bool, str]:
    a = normalize(to_pandas(ray_result))
    b = normalize(run_oracle(sql, sf_dir))
    if list(a.columns) != list(b.columns):
        return False, f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"row counts differ: {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating) or \
           np.issubdtype(b[c].dtype, np.floating):
            ok = np.allclose(av.astype(float), bv.astype(float),
                             rtol=0, atol=float_tol, equal_nan=True)
        else:
            ok = (av == bv).all()
        if not ok:
            idx = int(np.argmax(av != bv)) if len(av) else 0
            return False, (f"column {c} differs, e.g. row {idx}: "
                           f"{av[idx]!r} vs {bv[idx]!r}")
    return True, f"OK ({len(a)} rows, {len(a.columns)} cols)"
