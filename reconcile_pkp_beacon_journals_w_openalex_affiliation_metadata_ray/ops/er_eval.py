"""Cluster-level ER evaluation and active-learning sampling.

The reference evaluates matching only pairwise (per-mention booleans
aggregated in `get_stats.py`); cluster-level metrics (purity, B-cubed —
Bagga & Baldwin 1998, public) and uncertainty sampling for labeling are
the standard next instruments. Both are built on the repo's scale
primitives:

- :func:`cluster_contingency`: TWO hash-partitioned inputs joined once
  on record_id (ops.relational.bucket_join) then a combiner+bucketed
  count per (pred, truth) cluster pair — the output is
  O(overlapping-cluster pairs) <= O(records), all integers, so the
  driver-side metric helpers work on an already-aggregated frame.
- :func:`uncertainty_band_sample`: band filter + deterministic
  md5-hex rank with PER-BATCH partial top-k (the sample_exact shape —
  at most k rows per block reach the driver; no shuffle). The rank is
  the full 32-char md5 hex string compared lexicographically, which a
  SQL engine reproduces verbatim (DuckDB md5() returns the same hex).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa


def cluster_contingency(pred_ds, truth_ds, num_buckets: int = 32):
    """Predicted vs truth cluster assignments -> integer contingency
    rows (pred_cluster, true_cluster, n), inner-joined on record_id
    (records present in only one assignment are excluded — the caller
    fixes the universe). Both inputs are (record_id, cluster_id)
    Datasets whose labels are canonical min-member ids (what
    stages.cluster.connected_components emits), so no relabeling
    shuffle is needed."""
    from .dedup import _typed_or_empty
    from .relational import bucket_join, pre_aggregated

    def _side(out_col):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"record_id": b["record_id"],
                                 out_col: b["cluster_id"]})
        return fn

    p = pred_ds.map_batches(_side("pred_cluster"), batch_format="pandas")
    t = truth_ds.map_batches(_side("true_cluster"), batch_format="pandas")
    j = bucket_join(p, t, on="record_id", num_buckets=num_buckets)
    agg = pre_aggregated(j, ["pred_cluster", "true_cluster"], counts=True,
                         num_buckets=num_buckets)
    out = agg.map_batches(
        lambda b: b.rename(columns={"n": "n"})[
            ["pred_cluster", "true_cluster", "n"]],
        batch_format="pandas")
    return _typed_or_empty(out, [("pred_cluster", pa.string()),
                                 ("true_cluster", pa.string()),
                                 ("n", pa.int64())])


def bcubed_from_contingency(cont: pd.DataFrame) -> dict:
    """Exact B-cubed precision/recall/F1 and purity from an integer
    contingency frame (driver-side: the frame is already aggregated).
    B3 precision = (1/N) sum_ij n_ij^2 / |pred_i|; recall symmetric
    over truth sizes; purity = sum_i max_j n_ij / N."""
    if cont.empty:
        return {"n_records": 0, "b3_precision": 0.0, "b3_recall": 0.0,
                "b3_f1": 0.0, "purity": 0.0}
    n = int(cont["n"].sum())
    pred_sz = cont.groupby("pred_cluster")["n"].sum()
    true_sz = cont.groupby("true_cluster")["n"].sum()
    sq = cont["n"].astype(float) ** 2
    prec = float((sq / cont["pred_cluster"].map(pred_sz).astype(float)).sum()) / n
    rec = float((sq / cont["true_cluster"].map(true_sz).astype(float)).sum()) / n
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    purity = float(cont.groupby("pred_cluster")["n"].max().sum()) / n
    return {"n_records": n, "b3_precision": prec, "b3_recall": rec,
            "b3_f1": f1, "purity": purity}


def uncertainty_band_sample(pairs_ds, lo: float, hi: float, k: int,
                            score_col: str = "combined_score",
                            id_cols=("left_id", "right_id"), seed: int = 42):
    """Active-learning labeling sample: the k pairs whose score falls in
    the uncertainty band [lo, hi) — the region where fuzzy evidence is
    genuinely ambiguous — picked by a seeded deterministic hash rank so
    the sample is uniform over the band, reproducible, and independent
    of partitioning. Returns a pandas frame (id cols + score + rank),
    sorted by rank.

    Scale: the band filter and the md5 rank run per batch; each batch
    forwards at most k rows, the driver merges <= k x blocks rows.
    The whole corpus of scored pairs never moves."""
    id_cols = list(id_cols)

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        sl = b[(b[score_col] >= lo) & (b[score_col] < hi)]
        cols = id_cols + [score_col]
        sl = sl[cols].copy()
        if sl.empty:
            sl["__rank"] = pd.Series(dtype=object)
            return sl
        key = sl[id_cols[0]].astype(str)
        for c in id_cols[1:]:
            key = key + "|" + sl[c].astype(str)
        sl["__rank"] = [hashlib.md5(f"{seed}:{v}".encode()).hexdigest()
                        for v in key]
        # nsmallest is numeric-only; the rank is a hex string
        return (sl.sort_values(["__rank"] + id_cols, kind="mergesort")
                .head(min(k, len(sl))))

    parts = pairs_ds.map_batches(_partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in id_cols}
                            | {score_col: pd.Series(dtype="float64"),
                               "sample_rank": pd.Series(dtype=object)})
    out = (parts.sort_values(["__rank"] + id_cols, kind="mergesort").head(k)
           .rename(columns={"__rank": "sample_rank"}).reset_index(drop=True))
    return out


def fs_mu_weights(pairs_ds, labels_ds, feature_cols,
                  num_buckets: int = 32) -> pd.DataFrame:
    """Fellegi–Sunter m/u probability estimation (Fellegi & Sunter
    1969, public — the founding record-linkage decision model): join
    candidate-pair boolean feature-agreement indicators to ground-truth
    labels, then for each feature i estimate

        m_i = P(feature agrees | true match)      = m_num / m_den
        u_i = P(feature agrees | true non-match)  = u_num / u_den

    as EXACT integer-count ratios (one IEEE division each, so the
    floats are bit-reproducible by any engine given the same integers;
    log-likelihood weights are left to the caller — libm log parity
    across engines is NOT guaranteed, the counts are the contract).

    Scale shape: ONE bucketed hash join on (left_id, right_id) — the
    labeled set is usually small but this path handles big-big — then
    a per-batch integer combiner emitting O(features) partial rows per
    batch; the driver sums O(features x batches) integers. The pair
    corpus itself never collects.

    ``pairs_ds`` must carry left_id, right_id + boolean feature
    columns; ``labels_ds`` must carry left_id, right_id, is_match."""
    import numpy as np

    from .relational import bucket_join

    feature_cols = list(feature_cols)
    lab = labels_ds.map_batches(
        lambda b: pd.DataFrame({"left_id": b["left_id"],
                                "right_id": b["right_id"],
                                "__label": b["is_match"].astype(bool)}),
        batch_format="pandas")
    j = bucket_join(pairs_ds, lab, on=["left_id", "right_id"],
                    num_buckets=num_buckets)

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        lb = b["__label"].to_numpy(dtype=bool)
        nm, nu = int(lb.sum()), int((~lb).sum())
        rows = []
        for f in feature_cols:
            ag = b[f].to_numpy(dtype=bool)
            rows.append((f, int((ag & lb).sum()), nm,
                         int((ag & ~lb).sum()), nu))
        return pd.DataFrame(rows, columns=["feature", "m_num", "m_den",
                                           "u_num", "u_den"])

    parts = j.map_batches(_partial, batch_format="pandas").to_pandas()
    if parts.empty:
        tot = pd.DataFrame({"feature": feature_cols,
                            "m_num": 0, "m_den": 0,
                            "u_num": 0, "u_den": 0})
    else:
        tot = (parts.groupby("feature", as_index=False)
               [["m_num", "m_den", "u_num", "u_den"]].sum())
        tot = (pd.DataFrame({"feature": feature_cols})
               .merge(tot, on="feature", how="left").fillna(0))
    tot = tot.astype({"m_num": "int64", "m_den": "int64",
                      "u_num": "int64", "u_den": "int64"})
    with np.errstate(divide="ignore", invalid="ignore"):
        tot["m"] = np.where(tot["m_den"] > 0,
                            tot["m_num"].astype("float64")
                            / tot["m_den"].astype("float64"), np.nan)
        tot["u"] = np.where(tot["u_den"] > 0,
                            tot["u_num"].astype("float64")
                            / tot["u_den"].astype("float64"), np.nan)
    return (tot.sort_values("feature", kind="mergesort")
            .reset_index(drop=True))
