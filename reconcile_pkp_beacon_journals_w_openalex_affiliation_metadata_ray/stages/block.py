"""Stage 2 — BLOCK: records -> candidate pairs.

Blocking keys (north-star inventory):
- ``doi:{doi_norm}``      exact DOI equality (the reference's implicit
                          per-DOI grouping, `check...openalex.py:72-74`)
- ``host:{host_key}``     normalized-hostname equality — the reference's
                          Rust broadcast semi-join key (`main.rs:235-243`)
- ``b{i}:{band_hash}``    MinHash-LSH bands over the normalized author
                          name blob (no reference analog; the scale path
                          for fuzzy candidates)

Hot keys (mega-publisher hosts, SURVEY.md §4 skew row) are handled
EXPLICITLY: a first cheap ``groupby().count()`` pass measures block
sizes; keys above ``hot_threshold`` are re-derived with a deterministic
refinement suffix (first two characters of the normalized first author
name, falling back to the DOI prefix). Refinement — unlike random
salting — keeps same-entity records co-blocked, because the refinement
attribute is stable under the corruption model. Oversized blocks after
refinement get a deterministic per-block pair cap with a logged
``dropped_pairs`` count (no silent caps).

Pair generation is ``groupby(block_key).map_groups``; pair dedup is a
second groupby on the pair id keeping the lexicographically-first block
key. All shuffles carry only (key, record_id) — never the heavy record
payloads.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.minhash import MinHasher, band_keys

DEFAULT_NUM_PERM = 64
DEFAULT_NUM_BANDS = 8
DEFAULT_HOT_THRESHOLD = 256
DEFAULT_MAX_PAIRS_PER_BLOCK = 20_000


class BlockKeyEmitter:
    """Actor-pool stage: holds the MinHasher (permutation params built
    once per actor, T5 pattern) and optionally the broadcast hot-key
    set; emits (block_key, record_id) rows."""

    def __init__(self, hot_keys_ref=None, num_perm=DEFAULT_NUM_PERM,
                 num_bands=DEFAULT_NUM_BANDS):
        self.mh = MinHasher(num_perm=num_perm)
        self.num_bands = num_bands
        if hot_keys_ref is not None:
            import ray

            self.hot = ray.get(hot_keys_ref)
        else:
            self.hot = frozenset()

    def _refine(self, key: str, authors_norm, doi_norm: str) -> str:
        if key not in self.hot:
            return key
        if authors_norm:
            return f"{key}~{authors_norm[0][:2]}"
        if doi_norm:
            return f"{key}~{doi_norm.split('/')[0][-2:]}"
        return f"{key}~_"

    def __call__(self, batch: pa.Table) -> pa.Table:
        rids = batch["record_id"].to_pylist()
        dois = batch["doi_norm"].to_pylist()
        hosts = batch["host_key"].to_pylist()
        blobs = batch["name_blob"].to_pylist()
        authors_norm = batch["authors_norm"].to_pylist()
        keys, out_ids = [], []
        for rid, doi, host, blob, a_norm in zip(rids, dois, hosts, blobs, authors_norm):
            if doi:
                keys.append("doi:" + doi)
                out_ids.append(rid)
            if host:
                keys.append(self._refine("host:" + host, a_norm, doi))
                out_ids.append(rid)
            if blob:
                sig = self.mh.signature(blob)
                for bk in band_keys(sig, self.num_bands):
                    keys.append(self._refine(bk, a_norm, doi))
                    out_ids.append(rid)
        return pa.table({"block_key": pa.array(keys, pa.string()),
                         "record_id": pa.array(out_ids, pa.string())})


def emit_block_keys(records_ds, hot_keys_ref=None, concurrency=4):
    return records_ds.map_batches(
        BlockKeyEmitter,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_constructor_kwargs={"hot_keys_ref": hot_keys_ref},
        concurrency=concurrency,
    )


def find_hot_keys(records_ds, threshold=DEFAULT_HOT_THRESHOLD):
    """First pass: measure block sizes, return the set of oversized keys
    (small driver-side result — one row per distinct key above
    threshold)."""
    keys = emit_block_keys(records_ds)
    counts = keys.groupby("block_key").count()
    hot = counts.filter(lambda row: row["count()"] > threshold)
    return frozenset(r["block_key"] for r in hot.take_all())


def _pairs_for_group(g: pd.DataFrame, max_pairs: int) -> pd.DataFrame:
    ids = sorted(set(g["record_id"].tolist()))
    n = len(ids)
    if n < 2:
        return pd.DataFrame({"left_id": [], "right_id": [], "block_key": [],
                             "dropped_pairs": []})
    key = g["block_key"].iloc[0]
    total = n * (n - 1) // 2
    left, right = [], []
    if total <= max_pairs:
        for i in range(n):
            for j in range(i + 1, n):
                left.append(ids[i])
                right.append(ids[j])
        dropped = 0
    else:
        # deterministic subsample: stride over the pair index space
        stride = total / max_pairs
        k = 0
        target = 0.0
        for i in range(n):
            for j in range(i + 1, n):
                if k >= target:
                    left.append(ids[i])
                    right.append(ids[j])
                    target += stride
                    if len(left) >= max_pairs:
                        break
                k += 1
            if len(left) >= max_pairs:
                break
        dropped = total - len(left)
    return pd.DataFrame(
        {"left_id": left, "right_id": right, "block_key": [key] * len(left),
         "dropped_pairs": [dropped] * len(left)}
    )


def candidate_pairs(records_ds, hot_keys_ref=None, max_pairs_per_block=DEFAULT_MAX_PAIRS_PER_BLOCK):
    """records -> deduped candidate pairs (left_id < right_id, block_key
    = lexicographically-first key that produced the pair)."""
    keys = emit_block_keys(records_ds, hot_keys_ref=hot_keys_ref)
    pairs = keys.groupby("block_key").map_groups(
        lambda g: _pairs_for_group(g, max_pairs_per_block), batch_format="pandas"
    )

    def _dedup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("block_key", kind="mergesort")
        return g.head(1)[["left_id", "right_id", "block_key", "dropped_pairs"]]

    return pairs.groupby(["left_id", "right_id"]).map_groups(_dedup, batch_format="pandas")
