"""Per-stage wall-time profile of the reconcile pipeline.

Usage: RAY_GRAFT_CPUS=32 python tools/profile_stages.py [sf_dir]
Materializes each stage in sequence and prints a JSON line of stage
timings — the feedback loop for the e2e headline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.context import tune_data_context
    tune_data_context()

    # GRAFT_PROFILE_REPEATS>1 repeats the whole stage sequence in ONE
    # process and prints every pass — pass 1 carries Ray worker warm-up
    # (~25 s at sf0.1); later passes are the contention-robust numbers
    # (BASELINE §c3 measurement protocol).
    repeats = int(os.environ.get("GRAFT_PROFILE_REPEATS", "1"))
    for _ in range(repeats):
        run_once(ray, sf_dir, ncpu)
    ray.shutdown()


def run_once(ray, sf_dir, ncpu):
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.pipelines.reconcile import (
        load_tables,
    )
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages import (
        block, cluster, records, score,
    )
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages.extract import (
        extract_pages,
    )

    t: dict[str, float] = {}
    total0 = time.time()

    t0 = time.time()
    fdir, pages, works = load_tables(sf_dir)
    extracted = extract_pages(pages)
    recs = records.build_records(extracted, works).materialize()
    t["extract_records"] = round(time.time() - t0, 2)

    t0 = time.time()
    hot = block.find_hot_keys(recs)
    hot_ref = ray.put(hot)
    t["hot_keys"] = round(time.time() - t0, 2)

    t0 = time.time()
    pairs = block.candidate_pairs(recs, hot_keys_ref=hot_ref).materialize()
    n_pairs = pairs.count()
    t["pair_gen_dedup"] = round(time.time() - t0, 2)

    t0 = time.time()
    rec_ref = score.broadcast_records(recs)
    scored = score.score_pairs(pairs, rec_ref).materialize()
    t["scoring"] = round(time.time() - t0, 2)

    t0 = time.time()
    edges = scored.map_batches(
        lambda tb: tb.filter(tb["is_match"]).select(["left_id", "right_id"]),
        batch_format="pyarrow")
    clusters = cluster.connected_components_auto(edges, nodes_ds=recs)
    n_clusters = clusters.count()
    t["clustering"] = round(time.time() - t0, 2)

    t["total"] = round(time.time() - total0, 2)
    print(json.dumps({"stages": t, "pairs": n_pairs, "clusters": n_clusters,
                      "hot_keys": len(hot), "num_cpus": ncpu, "sf_dir": sf_dir}),
          flush=True)


if __name__ == "__main__":
    main()
