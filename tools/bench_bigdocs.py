"""Big-tier proof for the dedup family over a gen_bigdocs corpus.

Runs the GENERIC scale paths — exact_dedup (md5 partials + bucketed
reduce) and minhash_lsh_pairs with verify="join" (no corpus broadcast;
texts move only onto surviving candidates via two bucketed hash joins)
— at 32 CPUs over the sharded parquet corpus, then scores recall
against the generator's planted ground truth. Prints one JSON line.

Usage:
  python tools/gen_bigdocs.py 2000000
  RAY_GRAFT_CPUS=32 python tools/bench_bigdocs.py 2000000 [ops...]
ops subset of: exact minhash minhash_bcast simhash (default: exact minhash)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pair_recall(found_df, planted: np.ndarray) -> float:
    """Fraction of planted (left, right) pairs present in the found
    pairs (both sides already left<right by construction)."""
    if len(planted) == 0:
        return 1.0
    # pairs pack as left*2^32+right — valid only for non-negative ids
    # below 2^32 (silent collisions past that); guard the assumption
    for arr in (planted, found_df["left_id"].to_numpy(np.int64),
                found_df["right_id"].to_numpy(np.int64)):
        assert arr.size == 0 or (arr.min() >= 0 and arr.max() < (1 << 32)), \
            "pair packing requires 0 <= id < 2^32"
    key = found_df["left_id"].to_numpy(np.int64) * np.int64(1 << 32) \
        + found_df["right_id"].to_numpy(np.int64)
    pkey = planted[:, 0] * np.int64(1 << 32) + planted[:, 1]
    return float(np.isin(pkey, key).mean())


def main():
    import ray
    import ray.data as rd

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    ops = sys.argv[2:] or ["exact", "minhash"]
    corpus = f"/tmp/graft_fixtures/bigdocs_{n_docs}/documents"
    needs_docs = any(o not in ("embed", "knn") for o in ops)
    if needs_docs and not os.path.isdir(corpus):
        sys.exit(f"run tools/gen_bigdocs.py {n_docs} first ({corpus} missing)")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.context import tune_data_context
    tune_data_context()

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.ops import dedup
    from tools.gen_bigdocs import planted_pairs

    exact_gt, near_gt = planted_pairs(n_docs)
    res: dict = {"n_docs": n_docs, "num_cpus": ncpu,
                 "planted_exact": len(exact_gt), "planted_near": len(near_gt)}

    def docs():
        # the read feeding a bandwidth-bound dedup op carries the same
        # per-task CPU reservation as the op's own stages: otherwise
        # read tasks race the capped kernels 32-wide and re-create the
        # oversubscription the cap exists to prevent (measured: sig
        # stage 97 -> 71-80 s at 2M docs, 32 CPUs)
        from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.context import (
            shuffle_task_cpus,
        )

        return rd.read_parquet(corpus, override_num_blocks=ncpu * 4,
                               ray_remote_args={"num_cpus": shuffle_task_cpus()})

    if "exact" in ops:
        t0 = time.time()
        kept = dedup.exact_dedup(docs())
        n_kept = kept.count()
        res["exact_sec"] = round(time.time() - t0, 2)
        res["exact_kept"] = n_kept
        res["exact_removed"] = n_docs - n_kept  # expect == planted_exact

    # near-dup ground truth for minhash includes the exact pairs too
    # (identical docs share every band); score recall on both sets
    # r = num_perm/num_bands = 8: on a low-background-similarity corpus
    # (random webtext pairs have char-3-gram jaccard ~0.1) the band
    # collision probability must shrink below ~1/n_docs or the
    # candidate set grows QUADRATICALLY in corpus size (measured: r=4
    # produced 3.4M candidates for 50k docs — 16*j^4 ~ 2.4e-3 per
    # pair; r=8 gives 8*j^8 ~ 1e-7 while planted j>=0.86 pairs are
    # still caught with P ~ 0.99).
    num_perm = int(os.environ.get("GRAFT_MH_PERM", "64"))
    num_bands = int(os.environ.get("GRAFT_MH_BANDS", "8"))
    res["mh_perm"], res["mh_bands"] = num_perm, num_bands
    for name, verify in (("minhash", "join"), ("minhash_bcast", "broadcast")):
        if name not in ops:
            continue
        t0 = time.time()
        pairs = dedup.minhash_lsh_pairs(docs(), verify=verify,
                                        num_perm=num_perm, num_bands=num_bands,
                                        jaccard_threshold=0.7)
        found = pairs.to_pandas() if hasattr(pairs, "to_pandas") else pairs
        res[f"{name}_sec"] = round(time.time() - t0, 2)
        res[f"{name}_pairs"] = len(found)
        res[f"{name}_near_recall"] = round(pair_recall(found, near_gt), 4)
        res[f"{name}_exact_recall"] = round(pair_recall(found, exact_gt), 4)

    if "setsim" in ops:
        # token-SET jaccard of the planted 5%-position mutations is
        # ~0.85-0.95 (distinct-token overlap); 0.8 catches near all
        thr = float(os.environ.get("GRAFT_SETSIM_THR", "0.8"))
        sv = os.environ.get("GRAFT_SETSIM_VERIFY", "join")
        res["setsim_thr"], res["setsim_verify"] = thr, sv
        t0 = time.time()
        try:
            pairs = dedup.setsim_prefix_pairs(docs(), jaccard_threshold=thr,
                                              verify=sv)
            found = pairs.to_pandas() if hasattr(pairs, "to_pandas") else pairs
            res["setsim_sec"] = round(time.time() - t0, 2)
            res["setsim_pairs"] = len(found)
            res["setsim_near_recall"] = round(pair_recall(found, near_gt), 4)
            res["setsim_exact_recall"] = round(pair_recall(found, exact_gt), 4)
        except ValueError as e:
            # candidate-budget guard: exact setsim is the wrong op on
            # this vocab << corpus regime — the guard prices the merge
            # and refuses instead of spilling to death
            res["setsim_sec"] = round(time.time() - t0, 2)
            res["setsim_guarded"] = str(e).split(".")[0]

    if "simhash" in ops:
        blocks = int(os.environ.get("GRAFT_SIMHASH_BLOCKS", "4"))
        res["simhash_blocks"] = blocks
        t0 = time.time()
        pairs = dedup.simhash_pairs(docs(), num_blocks=blocks)
        found = pairs.to_pandas() if hasattr(pairs, "to_pandas") else pairs
        res["simhash_sec"] = round(time.time() - t0, 2)
        res["simhash_pairs"] = len(found)
        res["simhash_exact_recall"] = round(pair_recall(found, exact_gt), 4)

    if "embed" in ops:
        # random-hyperplane LSH band sizing is the same scale knob as
        # minhash r / simhash blocks: the default 6 bands x 6 planes
        # has only 2^6 buckets per band (quadratic in-bucket pairs at
        # 1M vectors); 16 x 18 gives 2^18 buckets with planted-0.98
        # detection P ~ 0.99 (1-(1-0.9215^18)^16)
        vec_dir = f"/tmp/graft_fixtures/bigvecs_{n_docs}/embeddings"
        if not os.path.isdir(vec_dir):
            sys.exit(f"run tools/gen_bigvecs.py {n_docs} first")
        from tools.gen_bigvecs import planted_pairs as vec_planted

        vex, vnr = vec_planted(n_docs)
        bands = int(os.environ.get("GRAFT_EMB_BANDS", "16"))
        planes = int(os.environ.get("GRAFT_EMB_PLANES", "18"))
        vverify = os.environ.get("GRAFT_EMB_VERIFY", "join")
        res["emb_bands"], res["emb_planes"], res["emb_verify"] = \
            bands, planes, vverify
        t0 = time.time()
        pairs = dedup.embedding_near_dup_pairs(
            rd.read_parquet(vec_dir, override_num_blocks=ncpu * 4),
            cosine_threshold=0.95, num_bands=bands, planes_per_band=planes,
            verify=vverify)
        found = pairs.to_pandas() if hasattr(pairs, "to_pandas") else pairs
        res["embed_sec"] = round(time.time() - t0, 2)
        res["embed_pairs"] = len(found)
        res["embed_near_recall"] = round(pair_recall(found, vnr), 4)
        res["embed_exact_recall"] = round(pair_recall(found, vex), 4)

    if "knn" in ops:
        # ANN at scale: 32 seeded queries against the 1M-vector corpus;
        # brute force is the exact baseline, IVF/LSH report recall@10
        # vs it (overlap of neighbor sets per query)
        vec_dir = f"/tmp/graft_fixtures/bigvecs_{n_docs}/embeddings"
        if not os.path.isdir(vec_dir):
            sys.exit(f"run tools/gen_bigvecs.py {n_docs} first")
        from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.ops import (
            similarity_search as ss,
        )

        rng = np.random.RandomState(11)
        Q = rng.randn(32, 64)
        qids = list(range(32))

        def vds():
            return rd.read_parquet(vec_dir, override_num_blocks=ncpu * 4)

        t0 = time.time()
        bf = ss.knn_bruteforce(vds(), Q, qids, k=10)
        res["knn_bf_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        ivf = ss.knn_ivf(vds(), Q, qids, k=10, n_cells=64, nprobe=8)
        res["knn_ivf_sec"] = round(time.time() - t0, 2)

        def rec(approx):
            hits = 0
            for q in qids:
                a = set(approx.loc[approx["query_id"] == q, "neighbor_id"])
                b = set(bf.loc[bf["query_id"] == q, "neighbor_id"])
                hits += len(a & b)
            return round(hits / (len(qids) * 10), 4)

        res["knn_ivf_recall"] = rec(ivf)

    print(json.dumps(res), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
