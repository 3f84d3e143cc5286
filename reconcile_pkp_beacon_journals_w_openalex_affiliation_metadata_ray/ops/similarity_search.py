"""Approximate-nearest-neighbor search over an embedding column.

- :func:`knn_bruteforce`: exact cosine top-k — the broadcast-query
  baseline. The (small) query matrix is ``ray.put`` once; every batch
  does one float64 matmul against it and emits only its local top-k
  partials; a final tiny per-query reduction merges partials. The big
  side streams; nothing materializes.
- :func:`knn_ivf`: the scale path — IVF-style coarse quantization:
  k-means centroids fitted on a deterministic sample (driver-side,
  numpy), every vector assigned to its nearest centroid inside
  ``map_batches``, searches probe only ``nprobe`` cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _round_half_away(x: float, ndigits: int) -> float:
    """DuckDB-compatible rounding (half away from zero). Python's
    built-in round() is half-to-even over the decimal expansion, which
    disagrees with DuckDB's ``std::round(x*10^d)/10^d`` at boundaries."""
    f = 10.0 ** ndigits
    return float(np.sign(x) * np.floor(abs(x) * f + 0.5) / f)


def _rank_topk(partials: pd.DataFrame, query_ids, k: int, ndigits: int) -> pd.DataFrame:
    """Merge per-batch top-k partials into global ranks. Cosines are
    rounded (half away, `ndigits`) BEFORE ranking and the tie-break is
    neighbor_id, so the ordering is reproducible bit-for-bit against a
    SQL oracle computing round(cos, ndigits) in float64."""
    if len(partials) == 0:
        return pd.DataFrame([], columns=["query_id", "rank", "neighbor_id",
                                         "cosine"])
    # one vectorized sort + groupby-head over ALL queries (the old
    # per-query iterrows merge was O(queries x k) driver-side Python
    # rows); same elementwise half-away rounding, same (q asc, cosine
    # desc, neighbor asc) stable order, so output is bit-identical
    f = 10.0 ** ndigits
    v = partials["cosine"].to_numpy(np.float64)
    p = pd.DataFrame({
        "q": partials["q"].to_numpy(np.int64),
        "neighbor_id": partials["neighbor_id"].to_numpy(np.int64),
        "cosine": np.sign(v) * np.floor(np.abs(v) * f + 0.5) / f})
    p = p.sort_values(["q", "cosine", "neighbor_id"],
                      ascending=[True, False, True],
                      kind="mergesort").groupby("q", sort=False).head(k)
    qid_arr = np.asarray(list(query_ids), dtype=object)
    return pd.DataFrame({
        # .tolist() so pandas infers the qid dtype from the VALUES
        # (int64 for int ids, object for strings) exactly as the old
        # row-dict construction did
        "query_id": qid_arr[p["q"].to_numpy()].tolist(),
        "rank": (p.groupby("q", sort=False).cumcount() + 1).to_numpy("int64"),
        "neighbor_id": p["neighbor_id"].to_numpy("int64"),
        "cosine": p["cosine"].to_numpy("float64")},
        columns=["query_id", "rank", "neighbor_id", "cosine"])


def knn_bruteforce(emb_ds, queries: np.ndarray, query_ids, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   ndigits: int = 4):
    """Exact cosine top-k. Returns a pandas DataFrame
    (query_id, rank, neighbor_id, cosine) — ranks 1..k, deterministic
    tie-break on (rounded cosine desc, neighbor_id asc)."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q)

    def _partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(q_ref)
        mat = np.array(batch[vec_col].tolist(), dtype=np.float64)
        if mat.shape[0] == 0:
            return pd.DataFrame({"q": [], "neighbor_id": [], "cosine": []})
        sims = _normalize(mat) @ qm.T  # (n, nq)
        ids = batch[id_col].to_numpy()
        out_q, out_id, out_s = [], [], []
        kk = min(k, sims.shape[0])
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            idx = np.argpartition(-col, kk - 1)[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pd.DataFrame({"q": out_q, "neighbor_id": out_id, "cosine": out_s})

    partials = emb_ds.map_batches(_partial_topk, batch_format="pandas").to_pandas()
    return _rank_topk(partials, query_ids, k, ndigits)


def _kmeans_fit(sample: np.ndarray, n_cells: int, iters: int = 8, seed: int = 42):
    rng = np.random.RandomState(seed)
    n = sample.shape[0]
    centroids = sample[rng.choice(n, size=min(n_cells, n), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(centroids.shape[0]):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    centroids[c] = v / norm
    return centroids


def knn_ivf(emb_ds, queries: np.ndarray, query_ids, k: int = 10, n_cells: int = 16,
            nprobe: int = 4, sample_limit: int = 4096, seed: int = 42,
            id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF cosine top-k: centroids fitted on a seeded RANDOM sample (a
    head sample via limit() is biased when the table is ordered — e.g.
    clustered inserts give degenerate centroids), cell assignment in
    map_batches, per-batch search restricted to the nprobe closest
    cells per query. Approximate by construction; recall vs brute
    force is asserted in tests."""
    import ray

    n_total = emb_ds.count()
    frac = min(1.0, (sample_limit * 1.25) / max(n_total, 1))
    sample = (emb_ds.random_sample(frac, seed=seed).limit(sample_limit).to_pandas()
              if frac < 1.0 else emb_ds.to_pandas())
    smat = _normalize(np.array(sample[vec_col].tolist(), dtype=np.float64))
    centroids = _kmeans_fit(smat, n_cells)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_cells = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    cent_ref = ray.put(centroids)
    q_ref = ray.put(q)
    qcell_ref = ray.put(q_cells)

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = ray.get(cent_ref)
        qm = ray.get(q_ref)
        qc = ray.get(qcell_ref)
        mat = np.array(batch[vec_col].tolist(), dtype=np.float64)
        if mat.shape[0] == 0:
            return pd.DataFrame({"q": [], "neighbor_id": [], "cosine": []})
        unit = _normalize(mat)
        cells = np.argmax(unit @ cents.T, axis=1)
        ids = batch[id_col].to_numpy()
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(cells, qc[qi])
            if not mask.any():
                continue
            sims = unit[mask] @ qm[qi]
            sub_ids = ids[mask]
            kk = min(k, sims.shape[0])
            idx = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(sub_ids[idx].tolist())
            out_s.extend(sims[idx].tolist())
        return pd.DataFrame({"q": out_q, "neighbor_id": out_id, "cosine": out_s})

    partials = emb_ds.map_batches(_partial, batch_format="pandas").to_pandas()
    return _rank_topk(partials, query_ids, k, ndigits=4)


def label_centroids(emb_ds, label_col: str = "label", vec_col: str = "embedding",
                    id_col: str = "vec_id"):
    """Per-label mean embedding (vector aggregation): per-batch partial
    (sum vector, count) per label — one small row per (label, batch) —
    then a driver-side combine (labels are few). Returns a pandas frame
    (label, n, centroid list rounded 6)."""
    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for label, g in batch.groupby(label_col, sort=False):
            mat = np.array(g[vec_col].tolist(), dtype=np.float64)
            rows.append({label_col: label, "n": len(g), "vec_sum": mat.sum(axis=0).tolist()})
        return pd.DataFrame(rows)

    parts = emb_ds.map_batches(_partial, batch_format="pandas").to_pandas()
    out = []
    for label, g in parts.groupby(label_col, sort=True):
        total = int(g["n"].sum())
        vec = np.sum(np.array(g["vec_sum"].tolist(), dtype=np.float64), axis=0) / total
        out.append({label_col: int(label), "n": total,
                    "centroid": [float(x) for x in vec]})
    return pd.DataFrame(out)


def _lsh_hyperplanes(n_tables: int, n_bits: int, dim: int) -> np.ndarray:
    """Deterministic ±1 sign-projection hyperplanes derived from md5 so
    a SQL oracle can re-derive the SAME planes (md5 over
    'lsh:{table}:{bit}:{dim_1based}', +1 when the first hex nibble is
    0-7). Sign-random projections are a standard random-projection LSH
    family (Charikar 2002 uses Gaussians; ±1 (Achlioptas 2003) has the
    same cosine-LSH collision behavior)."""
    import hashlib

    planes = np.empty((n_tables * n_bits, dim), dtype=np.float64)
    for t in range(n_tables):
        for b in range(n_bits):
            row = t * n_bits + b
            for d in range(1, dim + 1):
                h = hashlib.md5(f"lsh:{t}:{b}:{d}".encode()).hexdigest()
                planes[row, d - 1] = 1.0 if int(h[0], 16) < 8 else -1.0
    return planes


def _lsh_codes(mat: np.ndarray, planes: np.ndarray, n_tables: int,
               n_bits: int) -> np.ndarray:
    """Per-table bucket codes. The projection accumulates dimension-by-
    dimension (acc += column * plane_row) — the exact IEEE expression
    tree of DuckDB's list_inner_product (sequential dot; probed
    bit-exact 400/400), so the SIGN of every projection — hence every
    bucket code — matches the SQL oracle bit-for-bit."""
    n = mat.shape[0]
    acc = np.zeros((n, planes.shape[0]), dtype=np.float64)
    for d in range(mat.shape[1]):
        acc += mat[:, d:d + 1] * planes[:, d][None, :]
    bits = acc > 0
    weights = (1 << np.arange(n_bits, dtype=np.int64))
    return (bits.reshape(n, n_tables, n_bits) * weights).sum(axis=2)  # (n, n_tables)


def knn_lsh(emb_ds, queries: np.ndarray, query_ids, k: int = 10,
            n_tables: int = 8, n_bits: int = 12,
            id_col: str = "vec_id", vec_col: str = "embedding",
            ndigits: int = 4):
    """Random-hyperplane (sign) LSH approximate top-k: a vector is a
    candidate for a query iff they share a bucket code in ANY of the
    ``n_tables`` independent tables; exact cosine re-ranks candidates.

    Scale shape: the hyperplane matrix (n_tables*n_bits x dim) and the
    queries' bucket codes are tiny — ``ray.put`` once; every batch
    computes its own codes, ORs the per-table equality masks into one
    candidate mask per query, and emits only its local top-k exact
    cosines. No shuffle at all: bucket pruning happens inside the
    streaming map, the driver merges O(num_batches * k) partials.
    Candidate recall vs brute force is asserted in tests; result
    correctness has a fully independent SQL oracle (DuckDB re-derives
    planes from md5, codes via list_inner_product signs, and the
    re-rank via list_cosine_similarity)."""
    import ray

    q64 = np.asarray(queries, dtype=np.float64)
    dim = q64.shape[1]
    planes = _lsh_hyperplanes(n_tables, n_bits, dim)
    q_codes = _lsh_codes(q64, planes, n_tables, n_bits)  # (nq, n_tables)
    qn = _normalize(q64)
    ref = ray.put((planes, q_codes, qn))

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        pl, qc, qm = ray.get(ref)
        mat = np.array(batch[vec_col].tolist(), dtype=np.float64)
        if mat.shape[0] == 0:
            return pd.DataFrame({"q": pd.Series(dtype="int64"),
                                 "neighbor_id": pd.Series(dtype="int64"),
                                 "cosine": pd.Series(dtype="float64")})
        codes = _lsh_codes(mat, pl, n_tables, n_bits)
        unit = _normalize(mat)
        ids = batch[id_col].to_numpy()
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.zeros(mat.shape[0], dtype=bool)
            for t in range(n_tables):
                mask |= codes[:, t] == qc[qi, t]
            if not mask.any():
                continue
            sims = unit[mask] @ qm[qi]
            sub_ids = ids[mask]
            kk = min(k, sims.shape[0])
            idx = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(sub_ids[idx].tolist())
            out_s.extend(sims[idx].tolist())
        return pd.DataFrame({"q": out_q, "neighbor_id": out_id, "cosine": out_s})

    partials = emb_ds.map_batches(_partial, batch_format="pandas").to_pandas()
    return _rank_topk(partials, query_ids, k, ndigits)
