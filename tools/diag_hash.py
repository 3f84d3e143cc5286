"""Strict parity diagnostic: run a queries() entry and its oracle_sql()
and report EXACT (bit-level) value differences and dtype differences,
emulating a driver hasher that sorts columns by name, sorts rows, and
hashes raw values. Usage: python tools/diag_hash.py sf_dir q_name [...]"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res.reset_index(drop=True)
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def canon_order(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    key = df.copy()
    for c in key.columns:
        if key[c].dtype == object:
            key[c] = key[c].astype(str)
    order = key.sort_values(list(key.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
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

    _t = os.path.basename(os.path.normpath(sf_dir))
    os.environ["GRAFT_ORACLE_TIER"] = _t if _t.startswith("sf") else "sf0.01"
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')")

    for name in names:
        got = canon_order(to_pandas(qs[name](sf_dir)))
        want = canon_order(con.execute(sqls[name]).df())
        print(f"=== {name}: got {got.shape} want {want.shape}")
        for c in sorted(set(got.columns) | set(want.columns)):
            if c not in got.columns or c not in want.columns:
                print(f"  COLUMN MISSING: {c} (got={c in got.columns} want={c in want.columns})")
                continue
            g, w = got[c], want[c]
            note = ""
            if str(g.dtype) != str(w.dtype):
                note += f" DTYPE got={g.dtype} want={w.dtype}"
            if pd.api.types.is_float_dtype(g) and pd.api.types.is_float_dtype(w):
                ga, wa = g.to_numpy(float), w.to_numpy(float)
                exact = np.array_equal(ga, wa, equal_nan=True)
                if not exact:
                    diff = np.abs(ga - wa)
                    bad = int((~np.isclose(ga, wa, atol=0, rtol=0, equal_nan=True)).sum())
                    note += (f" FLOAT-DIFF rows={bad} maxabs={np.nanmax(diff):.3e}")
                    idx = int(np.nanargmax(diff))
                    note += f" e.g. row{idx}: {ga[idx]!r} vs {wa[idx]!r}"
            else:
                eq = g.astype(str).eq(w.astype(str))
                if not eq.all():
                    idx = int((~eq).idxmax())
                    note += f" VAL-DIFF rows={int((~eq).sum())} e.g. row{idx}: {g.iloc[idx]!r} vs {w.iloc[idx]!r}"
            if note:
                print(f"  {c}:{note}")
        print("  (clean = exact match incl. dtypes)" )


if __name__ == "__main__":
    main()
