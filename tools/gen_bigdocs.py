"""Deterministic big-vocab webtext-like documents corpus, sharded.

The driver testdata documents table tops out at sf0.1 (5,000 docs with a
31-token vocab, which routes every dedup op onto the small-vocab fast
paths). This generator synthesizes a corpus at the MILLIONS-of-docs
scale with a ~50k-word alphabetic vocabulary, so the GENERIC scale
paths (minhash verify="join", big-vocab setsim prefix, md5 exact dedup)
are what actually run — the big-tier proof for the dedup family,
mirroring what tools-generated sf1 pages did for the flagship pipeline.

Planted structure (all rules on the GLOBAL doc id, shard size is a
multiple of 200 so every parent lives in the same shard):

- ``g % 50 == 1``  -> doc g is an EXACT copy of doc g-1.
- ``g % 40 == 3`` (and not an exact copy) -> doc g is a NEAR duplicate
  of doc g-3: 5% of token positions resampled (char-3-gram jaccard
  ~0.9, well above the 0.7 detection threshold).
- everything else: independent draws, log-uniform (zipf-ish) token
  ranks over the vocab, 40-200 tokens/doc.

Usage: python tools/gen_bigdocs.py [n_docs] [out_dir]
Defaults: 2_000_000 docs -> /tmp/graft_fixtures/bigdocs_2000000/documents/
Writes one parquet file per 25k-doc shard (row_group_size=4096) via a
process pool; fully deterministic per (n_docs, shard) regardless of
pool size.
"""

from __future__ import annotations

import os
import sys
from multiprocessing import Pool

import numpy as np

VOCAB_SIZE = 50_000
SHARD_SIZE = 25_000  # multiple of 200 = lcm(40, 50): parents stay in-shard
LANGS = np.array(["en", "de", "fr", "es", "zh"])


def build_vocab() -> np.ndarray:
    """50k distinct lowercase words, 3-8 letters — a 26-letter character
    alphabet keeps the global 3-gram vocabulary far above every
    small-alphabet fast-path gate (bitset minhash: 4096 grams; dense
    setsim: 64 tokens), so benchmarks exercise the generic paths."""
    rng = np.random.RandomState(7)
    words, seen = [], set()
    while len(words) < VOCAB_SIZE:
        n = VOCAB_SIZE - len(words)
        lens = rng.randint(3, 9, size=n)
        chars = rng.randint(0, 26, size=int(lens.sum()))
        off = 0
        letters = "abcdefghijklmnopqrstuvwxyz"
        for ln in lens:
            w = "".join(letters[c] for c in chars[off:off + ln])
            off += ln
            if w not in seen:
                seen.add(w)
                words.append(w)
    return np.array(words, dtype=object)


def _token_ranks(rng, size: int) -> np.ndarray:
    """Log-uniform ranks: heavy head, long tail — zipf-shaped document
    frequency without numpy.zipf's unbounded support."""
    u = rng.uniform(0.0, np.log(float(VOCAB_SIZE)), size=size)
    return np.minimum((np.exp(u) - 1.0).astype(np.int64), VOCAB_SIZE - 1)


def gen_shard(args) -> str:
    shard, out_dir, vocab = args
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(100_000 + shard)
    n = SHARD_SIZE
    base = shard * SHARD_SIZE
    lens = rng.randint(40, 201, size=n)
    idx = _token_ranks(rng, int(lens.sum()))
    offsets = np.concatenate([[0], np.cumsum(lens)])
    tok_idx = [idx[offsets[i]:offsets[i + 1]] for i in range(n)]

    # planted structure — order matters: exact-copy rule wins
    for i in range(n):
        g = base + i
        if g % 50 == 1 and i >= 1:
            tok_idx[i] = tok_idx[i - 1]
        elif g % 40 == 3 and i >= 3:
            t = tok_idx[i - 3].copy()
            k = max(1, len(t) // 20)  # 5% substitutions
            pos = rng.choice(len(t), size=k, replace=False)
            t[pos] = _token_ranks(rng, k)
            tok_idx[i] = t

    texts = [" ".join(vocab[t]) for t in tok_idx]
    ids = np.arange(base, base + n, dtype=np.int64)
    table = pa.table({
        "doc_id": pa.array(ids),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(LANGS[ids % len(LANGS)], pa.string()),
        "source": pa.array([f"src{g % 8}" for g in ids], pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })
    path = os.path.join(out_dir, f"shard-{shard:04d}.parquet")
    pq.write_table(table, path, row_group_size=4096)
    return path


def planted_pairs(n_docs: int, shard_size: int | None = None):
    """(exact_pairs, near_pairs) as (left, right) int64 arrays — the
    ground truth the bench scores recall against. ``shard_size``
    defaults to this module's SHARD_SIZE; gen_bigvecs passes its own
    (the id rule is per-shard, and the two generators shard
    differently)."""
    g = np.arange(n_docs, dtype=np.int64)
    in_shard = g % (shard_size if shard_size is not None else SHARD_SIZE)
    ex = g[(g % 50 == 1) & (in_shard >= 1)]
    nr = g[(g % 40 == 3) & (g % 50 != 1) & (in_shard >= 3)]
    return np.stack([ex - 1, ex], axis=1), np.stack([nr - 3, nr], axis=1)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    assert n_docs % SHARD_SIZE == 0, f"n_docs must be a multiple of {SHARD_SIZE}"
    out_dir = (sys.argv[2] if len(sys.argv) > 2
               else f"/tmp/graft_fixtures/bigdocs_{n_docs}/documents")
    os.makedirs(out_dir, exist_ok=True)
    vocab = build_vocab()
    shards = n_docs // SHARD_SIZE
    with Pool(min(16, os.cpu_count() or 8)) as pool:
        for i, p in enumerate(pool.imap_unordered(
                gen_shard, [(s, out_dir, vocab) for s in range(shards)])):
            if (i + 1) % 10 == 0 or i + 1 == shards:
                print(f"{i + 1}/{shards} shards", flush=True)
    ex, nr = planted_pairs(n_docs)
    print(f"done: {n_docs} docs, {shards} shards -> {out_dir}")
    print(f"planted: {len(ex)} exact pairs, {len(nr)} near pairs")


if __name__ == "__main__":
    main()
