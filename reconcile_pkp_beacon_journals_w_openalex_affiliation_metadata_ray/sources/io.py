"""Source readers beyond Parquet (SURVEY.md §2.1 S1-S4).

The reference reads CSV with DictReader + required-column validation
(`get_journal...py:42-46`, `check...openalex.py:51-82`) and streams
gzipped JSONL (`main.rs:680-747`, `parse_record...py:385-390`). Here
both map to Ray Data native readers plus an explicit required-column
gate that fails fast with the reference's error shape instead of
schema-on-read surprises downstream.
"""

from __future__ import annotations

import os


class MissingColumnsError(ValueError):
    pass


def require_columns(ds, required, source: str = "input"):
    """Fail fast if the dataset lacks required columns (the reference's
    required-column validation, `check...openalex.py:58-62`)."""
    names = set(ds.schema().names)
    missing = [c for c in required if c not in names]
    if missing:
        raise MissingColumnsError(
            f"{source} missing required columns: {', '.join(missing)}")
    return ds


def read_csv_table(path: str, required=(), **kwargs):
    """CSV -> Dataset with required-column validation (S1)."""
    import ray.data as rd

    ds = rd.read_csv(path, **kwargs)
    return require_columns(ds, required, source=path)


def read_jsonl(path: str, required=(), **kwargs):
    """(Gzipped) JSONL -> Dataset (S4). Ray's read_json handles .gz via
    arrow's automatic codec detection from the file extension."""
    import ray.data as rd

    ds = rd.read_json(path, **kwargs)
    return require_columns(ds, required, source=path)


def sample_exact(ds, k: int, seed: int = 42, id_col: str | None = None):
    """Uniform random sample WITHOUT replacement of exactly
    min(k, n) rows (O3 parity: `sample_csv/sample.py:5-14` clamps k to
    the population).

    Scale shape: every row is ranked by a seeded deterministic hash
    (md5 of ``seed:id`` when ``id_col`` is given — SQL-reproducible —
    else pandas' stable row hash of all columns) and the global k
    smallest ranks win. Each batch keeps only its local top-k, so the
    driver merges at most k rows per block — the same partial-top-k +
    tiny-merge shape as the KNN operator. The previous
    ``random_shuffle(seed).limit(k)`` was an ALL-TO-ALL exchange of the
    entire corpus to pick k rows; at 100 TB that is the whole dataset
    through the object store. A test asserts random_shuffle is never
    called."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    def _rank(b: pd.DataFrame) -> pd.Series:
        if id_col is not None:
            return b[id_col].map(lambda v: int(
                hashlib.md5(f"{seed}:{v}".encode("utf-8")).hexdigest()[:16], 16))
        from pandas.util import hash_pandas_object

        return hash_pandas_object(b.astype("string"), index=False,
                                  hash_key=f"{seed & 0xFFFF:016d}").astype("uint64")

    def _partial_topk(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return b.assign(__rank=pd.Series(dtype="uint64"))
        out = b.assign(__rank=_rank(b).to_numpy())
        return out.nsmallest(min(k, len(out)), "__rank", keep="first")

    parts = ds.map_batches(_partial_topk, batch_format="pandas").to_pandas()
    if parts.empty:
        return rd.from_pandas(parts.drop(columns="__rank", errors="ignore"))
    sort_cols = ["__rank"] + ([id_col] if id_col else [])
    top = (parts.sort_values(sort_cols, kind="mergesort").head(k)
           .drop(columns="__rank").reset_index(drop=True))
    return rd.from_pandas(top)


def stratified_sample(ds, k: int, group_col: str, id_col: str,
                      seed: int = 42):
    """Exactly min(k, group size) rows PER GROUP, deterministic: rows
    are ranked within their group by the md5 of ``seed:id`` (the hex
    string itself — lexicographic order is engine-identical, and SQL
    reproduces it as row_number() over md5). Same partial-top-k shape
    as :func:`sample_exact`, per group: each batch keeps at most k rows
    per group it touches, so the driver merge holds <= k * groups *
    blocks rows — bounded by the strata count, never the corpus."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return b.assign(__rk=pd.Series(dtype="string"))
        rk = b[id_col].map(lambda v: hashlib.md5(
            f"{seed}:{v}".encode("utf-8")).hexdigest())
        return (b.assign(__rk=rk.to_numpy())
                .sort_values("__rk", kind="mergesort")
                .groupby(group_col, sort=False).head(k))

    parts = ds.map_batches(_partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return rd.from_pandas(parts.drop(columns="__rk", errors="ignore"))
    top = (parts.sort_values("__rk", kind="mergesort")
           .groupby(group_col, sort=False).head(k)
           .drop(columns="__rk").reset_index(drop=True))
    return rd.from_pandas(top)


def sample_fraction(ds, frac: float, seed: int = 42):
    """Bernoulli row sample (approximate size), seeded."""
    return ds.random_sample(frac, seed=seed)


def weighted_sample_aes(ds, k: int, weight_col: str, id_col: str,
                        seed: int = 42):
    """Weighted random sample WITHOUT replacement (Efraimidis-Spirakis
    A-ES, Inf. Process. Lett. 2006): inclusion probability proportional
    to weight. Each row gets key = ln(u) / w with u derived from the
    md5 of ``seed:id`` (first 13 hex chars = 52 bits, exact in
    float64), and the k LARGEST keys win — equivalent to ranking by
    u^(1/w) but with one libm call both engines evaluate identically
    (ln + divide; the SQL oracle re-derives the full ranking with the
    verbatim expression, independently of this code).

    Scale shape: per-batch partial top-k, driver merges <= k rows per
    block — no shuffle, same as :func:`sample_exact`. Rows with
    non-positive weight are excluded (by A-ES definition)."""
    import hashlib

    import numpy as np
    import pandas as pd
    import ray.data as rd

    two52 = float(1 << 52)

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[weight_col] > 0]
        if b.empty:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "weight": pd.Series(dtype="float64"),
                                 "__key": pd.Series(dtype="float64")})
        u_int = b[id_col].map(lambda v: int(hashlib.md5(
            f"{seed}:{v}".encode("utf-8")).hexdigest()[:13], 16)).to_numpy(
                dtype="float64")
        w = b[weight_col].to_numpy(dtype="float64")
        key = np.log((u_int + 1.0) / two52) / w
        out = pd.DataFrame({id_col: b[id_col].to_numpy(),
                            "weight": w, "__key": key})
        # same (key desc, id asc) rule as the global merge, so a tie at
        # a batch's k boundary never drops the globally-winning row
        return (out.sort_values(["__key", id_col], ascending=[False, True],
                                kind="mergesort").head(min(k, len(out))))

    parts = ds.map_batches(_partial, batch_format="pandas").to_pandas()
    top = (parts.sort_values(["__key", id_col], ascending=[False, True],
                             kind="mergesort").head(k)
           .drop(columns="__key").reset_index(drop=True))
    return rd.from_pandas(top) if len(top) else rd.from_pandas(parts.drop(
        columns="__key"))
