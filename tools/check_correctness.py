"""Local stand-in for the driver's correctness gate: run every
queries() entry and its oracle_sql() side-by-side at a given sf and
compare row count, schema (column names), and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

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
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")  # int/float dtype-insensitive
    return df.sort_values(list(df.columns), kind="stable").reset_index(
        drop=True)


def dtype_kind(s: pd.Series) -> str:
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def compare(name, ray_df, sql_df) -> str:
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return (f"SCHEMA ray={sorted(ray_df.columns)} "
                f"sql={sorted(sql_df.columns)}")
    if len(ray_df) != len(sql_df):
        return f"ROWS ray={len(ray_df)} sql={len(sql_df)}"
    # the driver's value hash is dtype-sensitive (round-2 regression:
    # int32 Ray column vs DOUBLE oracle hashed differently with equal
    # values) — flag kind mismatches loudly even when values match
    for c in ray_df.columns:
        a, b = dtype_kind(ray_df[c]), dtype_kind(sql_df[c])
        if a == b:
            continue
        if {a, b} <= {"int", "float"} and (
                ray_df[c].isna().any() or sql_df[c].isna().any()):
            continue  # nullable-int -> float64 pandas coercion
        return (f"DTYPE col={c} ray={ray_df[c].dtype} "
                f"sql={sql_df[c].dtype} (driver hash-fail risk)")
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype == object:
            if not (av.fillna("\0") == bv.fillna("\0")).all():
                bad = (av.fillna("\0") != bv.fillna("\0"))
                return f"VALUES col={c} ndiff={bad.sum()}"
        else:
            if not np.allclose(av.to_numpy(dtype=float),
                               bv.to_numpy(dtype=float),
                               rtol=1e-7, atol=1e-9, equal_nan=True):
                bad = ~np.isclose(av.to_numpy(dtype=float),
                                  bv.to_numpy(dtype=float),
                                  rtol=1e-7, atol=1e-9, equal_nan=True)
                i = int(np.flatnonzero(bad)[0])
                return (f"VALUES col={c} ndiff={bad.sum()} "
                        f"first@{i}: ray={av.iloc[i]} sql={bv.iloc[i]}")
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, ".")
    from openmldb_ray.context import tune_data_context
    tune_data_context()
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception:
            print(f"{name:24s} RAY-ERROR")
            traceback.print_exc(limit=5)
            n_bad += 1
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(ray_df)} rows "
                  f"({time.time()-t0:.1f}s)")
            n_ok += 1
            continue
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name:24s} SQL-ERROR {e}")
            n_bad += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        flag = "ok" if verdict == "OK" else "FAIL"
        if flag == "ok":
            n_ok += 1
        else:
            n_bad += 1
        print(f"{name:24s} {flag:4s} {verdict} ({time.time()-t0:.1f}s)")
    print(f"\n{n_ok} ok, {n_bad} failed")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
