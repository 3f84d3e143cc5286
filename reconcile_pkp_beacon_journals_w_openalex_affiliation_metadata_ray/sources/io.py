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


def sample_exact(ds, k: int, seed: int = 42):
    """Uniform random sample WITHOUT replacement of exactly
    min(k, n) rows (O3 parity: `sample_csv/sample.py:5-14` clamps k to
    the population). Seeded shuffle then limit."""
    n = ds.count()
    k = min(k, n)
    return ds.random_shuffle(seed=seed).limit(k)


def sample_fraction(ds, frac: float, seed: int = 42):
    """Bernoulli row sample (approximate size), seeded."""
    return ds.random_sample(frac, seed=seed)
