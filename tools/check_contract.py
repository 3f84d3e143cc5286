"""Local stand-in for the driver's correctness check: run every
queries() callable at a given sf dir, run its oracle_sql() through
DuckDB over the same tables, and compare row counts + order-insensitive
values (columns sorted by name, rows sorted by all columns).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res.reset_index(drop=True)
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    # integer-vs-float dtype mismatches: compare as float where numeric
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.context import tune_data_context
    tune_data_context()

    sys.path.insert(0, "/root/repo")
    import os

    # align the persisted-artifact oracles with the tier under test
    _t = os.path.basename(os.path.normpath(sf_dir))
    os.environ["GRAFT_ORACLE_TIER"] = _t if _t.startswith("sf") else "sf0.01"
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: rows={len(got)} cols={list(got.columns)} ({dt:.1f}s, rows-only)")
            continue
        try:
            want = canon(con.execute(sqls[name]).df())
        except Exception as exc:
            print(f"FAIL {name}: oracle raised {exc}")
            failures.append(name)
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures.append(name)
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures.append(name)
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=False, rtol=0, atol=1e-6)
            print(f"ok   {name}: rows={len(got)} MATCH ({dt:.1f}s)")
        except AssertionError as exc:
            print(f"FAIL {name}: values differ: {str(exc)[:400]}")
            failures.append(name)
    print("\nfailures:", failures or "none")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
