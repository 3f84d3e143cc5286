"""Deduplication operators over a documents table.

- exact: content-hash -> hash-partitioned groupby -> keep min id (the
  canonical exact dedup; D1 generalization of `get_journal...py:40-64`).
- MinHash-LSH near-dup: shingle -> signature -> band-key explode ->
  groupby(band) -> candidate pairs -> verify true n-gram Jaccard.
- SimHash near-dup: 64-bit simhash, banded into 4x16-bit sub-keys
  (Hamming distance <= 3 guarantee via pigeonhole) -> verify Hamming.
- embedding cosine near-dup: random-hyperplane LSH buckets -> verify
  cosine within bucket.

All candidate generation is groupby shuffles over (key, id) rows only;
verification joins payloads back via broadcast when the candidate set
is small (the fixture path) — the big-big path reuses
ops.relational.bucket_join.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.minhash import MinHasher, band_keys
from ..functions.similarity import ngram_jaccard

_MH: MinHasher | None = None


def _typed_or_empty(ds, schema_fields):
    """Aggregates over an empty pair set lose their schema; give empty
    results a stable typed one so downstream consumers (and the
    driver's schema check) see consistent columns."""
    ds = ds.materialize()
    if ds.count() > 0:
        return ds
    # NOTE: Dataset.to_pandas() on a 0-row dataset loses column names,
    # so the empty case returns a typed pandas frame directly
    return pa.table({name: pa.array([], typ) for name, typ in schema_fields}).to_pandas()


def _mh(num_perm: int) -> MinHasher:
    global _MH
    if _MH is None or _MH.num_perm != num_perm:
        _MH = MinHasher(num_perm=num_perm)
    return _MH


def exact_dedup(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """One surviving row (min id) per distinct content hash. Returns
    (doc_id, n_copies) — the kept id and its duplicate count."""
    def _hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"content_hash": batch[text_col].fillna("").map(
                lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()),
             id_col: batch[id_col]})

    from ray.data.aggregate import Count, Min

    hashed = docs_ds.map_batches(_hash, batch_format="pandas")
    return hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="n_copies")
    ).select_columns([id_col, "n_copies"])


def minhash_lsh_pairs(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                      num_perm: int = 64, num_bands: int = 16,
                      jaccard_threshold: float = 0.7):
    """Near-duplicate pairs (left_id < right_id, jaccard >= threshold).

    Pipeline: per-batch signatures -> (band_key, id, text-ref) explode
    -> groupby(band_key) pair gen -> dedup pairs -> verify true n-gram
    Jaccard per pair (payloads carried through the group; documents are
    re-read per band which keeps the shuffle payload bounded by band
    fanout)."""
    def _bands(batch: pd.DataFrame) -> pd.DataFrame:
        mh = _mh(num_perm)
        ids, keys, texts = [], [], []
        for i, t in zip(batch[id_col], batch[text_col].fillna("")):
            sig = mh.signature(t)
            for bk in band_keys(sig, num_bands):
                ids.append(i)
                keys.append(bk)
                texts.append(t)
        return pd.DataFrame({"band_key": keys, id_col: ids, "text": texts})

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].tolist()
        texts = g["text"].tolist()
        left, right, jac = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                s = ngram_jaccard(texts[i], texts[j])
                if s >= jaccard_threshold:
                    left.append(ids[i])
                    right.append(ids[j])
                    jac.append(round(s, 6))
        return pd.DataFrame({"left_id": left, "right_id": right, "jaccard": jac})

    from ray.data.aggregate import Max

    pairs = (docs_ds.map_batches(_bands, batch_format="pandas")
             .groupby("band_key").map_groups(_pairs, batch_format="pandas"))
    # a pair can surface from several bands -> dedup
    out = pairs.groupby(["left_id", "right_id"]).aggregate(
        Max("jaccard", alias_name="jaccard"))
    return _typed_or_empty(out, [("left_id", pa.int64()), ("right_id", pa.int64()),
                                 ("jaccard", pa.float64())])


def simhash_pairs(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3):
    """Near-dup pairs by SimHash: 4 x 16-bit sub-key buckets (any pair
    within Hamming <= 3 of 64 bits shares at least one exact sub-key),
    verified by full Hamming distance."""
    from ..functions.minhash import hamming64, simhash64

    def _keys(batch: pd.DataFrame) -> pd.DataFrame:
        ids, keys, hashes = [], [], []
        for i, t in zip(batch[id_col], batch[text_col].fillna("")):
            h = simhash64(t)
            for band in range(4):
                sub = (h >> (band * 16)) & 0xFFFF
                ids.append(i)
                keys.append(f"s{band}:{sub:04x}")
                hashes.append(h)
        return pd.DataFrame({"band_key": keys, id_col: ids, "simhash": hashes})

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].tolist()
        hs = g["simhash"].tolist()
        left, right, ham = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = hamming64(int(hs[i]), int(hs[j]))
                if d <= max_hamming:
                    left.append(ids[i])
                    right.append(ids[j])
                    ham.append(d)
        return pd.DataFrame({"left_id": left, "right_id": right, "hamming": ham})

    from ray.data.aggregate import Min

    pairs = (docs_ds.map_batches(_keys, batch_format="pandas")
             .groupby("band_key").map_groups(_pairs, batch_format="pandas"))
    out = pairs.groupby(["left_id", "right_id"]).aggregate(
        Min("hamming", alias_name="hamming"))
    return _typed_or_empty(out, [("left_id", pa.int64()), ("right_id", pa.int64()),
                                 ("hamming", pa.int64())])


def embedding_near_dup_pairs(emb_ds, id_col: str = "vec_id", vec_col: str = "embedding",
                             cosine_threshold: float = 0.95, num_planes: int = 12,
                             seed: int = 42, dim: int | None = None):
    """Near-dup pairs by embedding cosine: random-hyperplane LSH sign
    buckets -> in-bucket exact cosine verify. Vectors are L2-normalized
    per batch (numpy, vectorized)."""
    def _buckets(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.array(batch[vec_col].tolist(), dtype=np.float64)
        if mat.ndim != 2 or mat.shape[0] == 0:
            return pd.DataFrame({"bucket": [], id_col: [], "vec": []})
        planes = np.random.RandomState(seed).randn(mat.shape[1], num_planes)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        bits = (unit @ planes) > 0
        keys = ["".join("1" if b else "0" for b in row) for row in bits]
        return pd.DataFrame({"bucket": keys, id_col: batch[id_col].tolist(),
                             "vec": list(unit)})

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].tolist()
        mat = np.vstack(g["vec"].to_numpy())
        sims = mat @ mat.T
        left, right, cos = [], [], []
        n = len(ids)
        iu, ju = np.triu_indices(n, k=1)
        for i, j in zip(iu, ju):
            s = float(sims[i, j])
            if s >= cosine_threshold:
                left.append(ids[i])
                right.append(ids[j])
                cos.append(round(s, 6))
        return pd.DataFrame({"left_id": left, "right_id": right, "cosine": cos})

    from ray.data.aggregate import Max

    pairs = (emb_ds.map_batches(_buckets, batch_format="pandas")
             .groupby("bucket").map_groups(_pairs, batch_format="pandas"))
    out = pairs.groupby(["left_id", "right_id"]).aggregate(
        Max("cosine", alias_name="cosine"))
    return _typed_or_empty(out, [("left_id", pa.int64()), ("right_id", pa.int64()),
                                 ("cosine", pa.float64())])
