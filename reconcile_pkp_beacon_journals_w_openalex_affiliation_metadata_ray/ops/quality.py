"""Data-quality operators: declarative constraint auditing and
categorical concentration (Gini impurity) profiling.

At 100 TB you cannot eyeball a table; you assert properties and count
violations. Both operators keep everything integer-exact so the driver
oracle can reproduce every value bit-for-bit in SQL:

- :func:`validate_constraints`: ONE streaming pass computes per-batch
  violation partials for not_null / regex / range rules (summed on the
  driver — a handful of integers per rule per batch); each ``unique``
  rule adds one combiner+bucketed distinct count (the only shuffles).
- :func:`categorical_gini`: per-column value counts via ONE melted
  combiner + bucketed reduce, then per-batch integer partials of
  (sum counts, sum squared counts, distinct) merged on the driver.
  Gini = 1 - sum_sq/n^2 stays a ratio of integers — the float is
  computed identically on both sides from the same integer columns.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa


def validate_constraints(ds, rules, num_buckets: int = 64) -> pd.DataFrame:
    """Audit declarative constraints in one pass. ``rules`` is a list of
    dicts:

    - ``{"type": "not_null", "col": c}`` — violations: NULL values.
    - ``{"type": "regex", "col": c, "pattern": p}`` — violations: NULL
      or not matching (search semantics, anchor explicitly).
    - ``{"type": "range", "col": c, "lo": x, "hi": y}`` — violations:
      NULL or outside [lo, hi].
    - ``{"type": "unique", "col": c}`` — violations: excess rows,
      ``n_rows - n_distinct_non_null`` (every NULL counts as excess,
      matching SQL's ``count(*) - count(DISTINCT col)``).

    Returns a small pandas frame (rule, col, n_rows, n_violations) in
    the given rule order — driver-side by design: the result is
    O(rules) regardless of input size."""
    rules = list(rules)
    streaming = [(i, r) for i, r in enumerate(rules) if r["type"] != "unique"]
    compiled = {i: re.compile(r["pattern"]) for i, r in streaming
                if r["type"] == "regex"}

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        out = {"__n": np.int64(len(b))}
        for i, r in streaming:
            col = b[r["col"]]
            if r["type"] == "not_null":
                v = int(col.isna().sum())
            elif r["type"] == "regex":
                pat = compiled[i]
                nn = col.dropna().astype(str)
                v = int(len(b) - len(nn)
                        + (~nn.map(lambda s: bool(pat.search(s)))).sum())
            else:  # range
                v = int(len(b) - ((col >= r["lo"]) & (col <= r["hi"])).sum())
            out[f"__v{i}"] = np.int64(v)
        return pd.DataFrame([out])

    parts = ds.map_batches(_partial, batch_format="pandas").to_pandas()
    totals = parts.sum()
    n_rows = int(totals["__n"])

    from .relational import distinct

    results = []
    for i, r in enumerate(rules):
        if r["type"] == "unique":
            nd = distinct(ds.map_batches(
                lambda b, c=r["col"]: b[[c]].dropna(),
                batch_format="pandas"), [r["col"]],
                num_buckets=num_buckets).count()
            viol = n_rows - int(nd)
        else:
            viol = int(totals[f"__v{i}"])
        results.append({"rule": r["type"], "col": r["col"],
                        "n_rows": n_rows, "n_violations": viol})
    return pd.DataFrame(results).astype({"n_rows": "int64",
                                         "n_violations": "int64"})


def categorical_gini(ds, cols, num_buckets: int = 64) -> pd.DataFrame:
    """Per-column categorical concentration: (col, n non-null rows,
    n_distinct, sum of squared value counts, gini) where
    ``gini = 1 - sum_sq / n^2`` — the Gini impurity, a fully rational
    statistic (unlike entropy) so the float column is reproducible
    bit-for-bit by any engine dividing the same integers. NULLs are
    excluded from the distribution."""
    cols = [cols] if isinstance(cols, str) else list(cols)

    def _melt(b: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in cols:
            vc = b[c].dropna().astype(str).value_counts(sort=False)
            frames.append(pd.DataFrame({"col": c,
                                        "value": vc.index.to_numpy(),
                                        "__cnt": vc.to_numpy()}))
        out = pd.concat(frames, ignore_index=True)
        out["__cnt"] = out["__cnt"].astype("int64")
        return out

    from .relational import bucketed_map_groups

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby(["col", "value"], sort=False)["__cnt"].sum()
             .reset_index())
        # per-bucket integer partials; (col, value) never spans buckets
        agg = s.groupby("col", sort=False).agg(
            n=("__cnt", "sum"), n_distinct=("value", "size"),
            sum_sq=("__cnt", lambda v: int((v.astype(object) ** 2).sum())))
        return agg.reset_index().astype({"n": "int64", "n_distinct": "int64",
                                         "sum_sq": "int64"})

    parts = bucketed_map_groups(
        ds.map_batches(_melt, batch_format="pandas"), ["col", "value"],
        _reduce, num_buckets=num_buckets).to_pandas()
    if parts.empty:
        return pd.DataFrame({"col": pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64"),
                             "n_distinct": pd.Series(dtype="int64"),
                             "sum_sq": pd.Series(dtype="int64"),
                             "gini": pd.Series(dtype="float64")})
    tot = parts.groupby("col", as_index=False)[["n", "n_distinct", "sum_sq"]].sum()
    tot = tot.astype({"n": "int64", "n_distinct": "int64", "sum_sq": "int64"})
    nf = tot["n"].astype("float64")
    # explicit n*n (not pow) — the SQL oracle computes n*n as DOUBLE and
    # IEEE multiply is the bit-identical operation
    tot["gini"] = 1.0 - tot["sum_sq"].astype("float64") / (nf * nf)
    return (tot.sort_values("col", kind="mergesort").reset_index(drop=True)
            [["col", "n", "n_distinct", "sum_sq", "gini"]])
