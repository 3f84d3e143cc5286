"""Distributed k-means (Lloyd's algorithm) over a list<float> embedding
column — the topic-clustering primitive of a training-data pipeline
(group near-duplicate content, balance domain mixes).

Scale shape per iteration: the k*d float64 centroid matrix is broadcast
once via ``ray.put`` (tiny at any corpus size); each batch assigns its
rows vectorized and emits ONE (k, d) partial-sum + k-vector count blob;
the driver folds the partials (mergeable, like the sketches) and
divides. Nothing but k*d*8-byte partials ever crosses the cluster — no
shuffle at all, O(iters) passes over the data.

Cross-engine reproducibility (what makes the assignment ORACLE-able):

- init centroids are the k rows with the smallest md5("{seed}:{id}")
  hex rank — WHICH rows seed the clusters is SQL-reproducible;
- the final assignment pass recomputes distances from the PERSISTED
  centroids with a sequential over-dimensions accumulation (a Python
  loop of vectorized adds — same rounding order as SQL's list_sum over
  list_transform), rounds to 6 dp, and breaks ties on the lower
  cluster id — the same round-before-rank discipline as the KNN
  operator, so DuckDB re-derives every row's cluster independently.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _mat(series: pd.Series) -> np.ndarray:
    """(n, d) float64 matrix from a list-typed column."""
    return np.asarray([np.asarray(v, dtype=np.float64) for v in series])


def _dist2_sequential(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(n, k) squared L2 distances accumulated dimension-by-dimension
    (sequential rounding order, matching SQL's list_sum; a numpy
    sum(axis=-1) would use pairwise summation and drift in the last
    ulp)."""
    n, d = x.shape
    k = c.shape[0]
    acc = np.zeros((n, k), dtype=np.float64)
    for j in range(d):
        diff = x[:, j, None] - c[None, :, j]
        acc += diff * diff
    return acc


def kmeans_fit(ds, vec_col: str = "embedding", id_col: str = "vec_id",
               k: int = 8, iters: int = 5, seed: int = 42) -> np.ndarray:
    """Run ``iters`` Lloyd iterations; returns the (k, d) centroid
    matrix. Deterministic given a partitioning (partial fold order is
    the block order); empty clusters keep their previous centroid."""
    # ---- deterministic init: k smallest md5(seed:id) ranks ----
    def _init_partial(b: pd.DataFrame) -> pd.DataFrame:
        rk = b[id_col].map(lambda v: hashlib.md5(
            f"{seed}:{v}".encode("utf-8")).hexdigest())
        out = b.assign(__rk=rk.to_numpy()).sort_values("__rk").head(k)
        return out[[id_col, vec_col, "__rk"]]

    init = (ds.map_batches(_init_partial, batch_format="pandas")
            .to_pandas().sort_values("__rk").head(k))
    centroids = _mat(init[vec_col])

    def _assign_partial_factory(cent_ref):
        import ray

        def _partial(b: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cent_ref)
            x = _mat(b[vec_col])
            lab = np.argmin(_dist2_sequential(x, c), axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, lab, x)
            counts = np.bincount(lab, minlength=c.shape[0]).astype(np.int64)
            return pd.DataFrame({"sums": [sums.tobytes()],
                                 "counts": [counts.tobytes()]})

        return _partial

    import ray

    for _ in range(iters):
        cent_ref = ray.put(centroids)
        parts = ds.map_batches(_assign_partial_factory(cent_ref),
                               batch_format="pandas")
        sums = np.zeros_like(centroids)
        counts = np.zeros(k, dtype=np.int64)
        for row in parts.iter_rows():
            sums += np.frombuffer(row["sums"]).reshape(centroids.shape)
            counts += np.frombuffer(row["counts"], dtype=np.int64)
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
    return centroids


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str = "embedding",
                  id_col: str = "vec_id"):
    """Final assignment pass: (id, cluster, dist2 rounded 6 dp) per row,
    argmin on the ROUNDED distance with lower-cluster-id tie-break (the
    SQL-reproducible rank rule)."""
    import ray

    cent_ref = ray.put(centroids)

    def _assign(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "cluster": pd.Series(dtype="int64"),
                                 "dist2": pd.Series(dtype="float64")})
        c = ray.get(cent_ref)
        d2 = _dist2_sequential(_mat(b[vec_col]), c)
        # round-before-rank: both engines rank identical 6-dp values
        d2r = np.floor(d2 * 1e6 + 0.5) / 1e6  # half-away, matches SQL round()
        lab = np.argmin(d2r, axis=1)  # first min = lowest cluster id
        return pd.DataFrame({
            id_col: b[id_col].astype("int64"),
            "cluster": lab.astype("int64"),
            "dist2": d2r[np.arange(len(lab)), lab],
        })

    return ds.map_batches(_assign, batch_format="pandas")


def embedding_dim_stats(ds, vec_col: str = "embedding",
                        scale: int = 1_000_000) -> pd.DataFrame:
    """Per-dimension mean/variance of an embedding column — the
    feature-normalization profile pass (what you compute before
    whitening / standardizing vectors for ANN or training). Components
    are quantized to ``scale`` fixed-point integers per batch, so the
    partials are EXACT and order-independent; the driver merges
    O(batches x dims) rows in arbitrary-precision Python ints (no
    overflow at any corpus size) and derives mean/var_pop as float
    expressions over the SAME integers on both engines (the
    grouped_moments discipline — bit-deterministic IEEE evaluation).
    No shuffle at all: dims are few, so this is a pure combiner +
    driver-reduce. Dimensions are 1-based (SQL generate_subscripts
    parity)."""

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return pd.DataFrame({"dim": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64"),
                                 "sum_s": pd.Series(dtype="int64"),
                                 "sum_sq_s": pd.Series(dtype="int64")})
        x = _mat(b[vec_col])
        vi = np.rint(x * float(scale)).astype("int64")
        d = vi.shape[1]
        return pd.DataFrame({
            "dim": np.arange(1, d + 1, dtype="int64"),
            "n": np.full(d, vi.shape[0], dtype="int64"),
            "sum_s": vi.sum(axis=0, dtype="int64"),
            "sum_sq_s": (vi * vi).sum(axis=0, dtype="int64")})

    parts = ds.map_batches(_partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({"dim": pd.Series(dtype="int64"),
                             "n": pd.Series(dtype="int64"),
                             "sum_s": pd.Series(dtype="int64"),
                             "sum_sq_s": pd.Series(dtype="int64"),
                             "mean": pd.Series(dtype="float64"),
                             "var_pop": pd.Series(dtype="float64")})
    # python-int merge: exact even where int64 partial sums would clip
    agg = {}
    for dim, n, s, sq in parts.itertuples(index=False):
        cur = agg.get(dim, (0, 0, 0))
        agg[dim] = (cur[0] + int(n), cur[1] + int(s), cur[2] + int(sq))
    dims = sorted(agg)
    n = np.array([agg[d][0] for d in dims], dtype="int64")
    s = np.array([agg[d][1] for d in dims], dtype="int64")
    sq = np.array([agg[d][2] for d in dims], dtype="int64")
    nf = n.astype("float64")
    mean = s.astype("float64") / (float(scale) * nf)
    var = (sq.astype("float64") / (float(scale) * float(scale) * nf)
           - mean * mean)
    return pd.DataFrame({"dim": np.array(dims, dtype="int64"),
                         "n": n, "sum_s": s, "sum_sq_s": sq,
                         "mean": mean, "var_pop": var})
