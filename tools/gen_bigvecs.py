"""Deterministic big embedding corpus, sharded — the vector-side twin
of gen_bigdocs for proving embedding_near_dup_pairs / ANN at scale.

Planted structure on GLOBAL vec_id (shard size a multiple of 200, so
parents stay in-shard, same rules as gen_bigdocs):

- ``g % 50 == 1``  -> vector g is an EXACT copy of g-1 (cosine 1.0).
- ``g % 40 == 3`` (not exact) -> g = (g-3) + 0.2 * gaussian noise
  (cosine ~0.98, above the 0.95 detection threshold).
- else: independent standard gaussian, 64-d — background pair cosine
  is ~N(0, 1/64), never near 0.95.

Usage: python tools/gen_bigvecs.py [n_vecs] [out_dir]
Defaults: 1_000_000 -> /tmp/graft_fixtures/bigvecs_1000000/embeddings/
"""

from __future__ import annotations

import os
import sys
from multiprocessing import Pool

import numpy as np

DIM = 64
SHARD_SIZE = 50_000  # multiple of 200

# reuse the id-rule ground truth from the docs generator
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_bigdocs import planted_pairs as _planted  # noqa: E402


def planted_pairs(n_vecs: int):
    return _planted(n_vecs, shard_size=SHARD_SIZE)


def gen_shard(args) -> str:
    shard, out_dir, n_clusters = args
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(200_000 + shard)
    n = SHARD_SIZE
    base = shard * SHARD_SIZE
    if n_clusters:
        # clustered regime (real embedding corpora): vec = 2*center +
        # 0.5*noise, centers shared across shards (seed 99) — the
        # corpus IVF/LSH are built for, vs the default unstructured
        # gaussian cloud (their worst case)
        centers = np.random.RandomState(99).randn(n_clusters, DIM)
        cidx = rng.randint(0, n_clusters, size=n)
        M = 2.0 * centers[cidx] + 0.5 * rng.randn(n, DIM)
    else:
        M = rng.randn(n, DIM)
    for i in range(n):
        g = base + i
        if g % 50 == 1 and i >= 1:
            M[i] = M[i - 1]
        elif g % 40 == 3 and i >= 3:
            M[i] = M[i - 3] + 0.2 * rng.randn(DIM)
    ids = np.arange(base, base + n, dtype=np.int64)
    table = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([row.astype(np.float32).tolist() for row in M],
                              pa.list_(pa.float32())),
        "label": pa.array((ids % 10).astype(np.int32)),
    })
    path = os.path.join(out_dir, f"shard-{shard:04d}.parquet")
    pq.write_table(table, path, row_group_size=4096)
    return path


def main():
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    assert n_vecs % SHARD_SIZE == 0, f"n_vecs must be a multiple of {SHARD_SIZE}"
    n_clusters = int(os.environ.get("GRAFT_VEC_CLUSTERS", "0"))
    tag = f"bigvecs_c{n_clusters}_{n_vecs}" if n_clusters else f"bigvecs_{n_vecs}"
    out_dir = (sys.argv[2] if len(sys.argv) > 2
               else f"/tmp/graft_fixtures/{tag}/embeddings")
    os.makedirs(out_dir, exist_ok=True)
    shards = n_vecs // SHARD_SIZE
    with Pool(min(16, os.cpu_count() or 8)) as pool:
        for i, _ in enumerate(pool.imap_unordered(
                gen_shard, [(s, out_dir, n_clusters) for s in range(shards)])):
            if (i + 1) % 5 == 0 or i + 1 == shards:
                print(f"{i + 1}/{shards} shards", flush=True)
    ex, nr = planted_pairs(n_vecs)
    print(f"done: {n_vecs} vecs -> {out_dir}")
    print(f"planted: {len(ex)} exact pairs, {len(nr)} near pairs")


if __name__ == "__main__":
    main()
