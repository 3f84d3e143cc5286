"""Blocking-stage unit tests: key emission, hot-key refinement,
pair-generation caps, pair index math."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages import block


def test_triu_unflatten_roundtrip():
    for n in (2, 3, 5, 17, 100):
        total = n * (n - 1) // 2
        flat = np.arange(total, dtype=np.int64)
        i, j = block._triu_unflatten(flat, n)
        iu, ju = np.triu_indices(n, k=1)
        assert (i == iu).all() and (j == ju).all()


def _emit(records, hot=frozenset()):
    tbl = pa.table({
        "record_id": [r[0] for r in records],
        "doi_norm": [r[1] for r in records],
        "host_key": [r[2] for r in records],
        "path_key": [r[3] for r in records],
        "name_blob": [r[4] for r in records],
        "authors_norm": [r[5] for r in records],
    })
    import reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages.block as b

    b._HOT_CACHE.clear()
    out = block.emit_keys_batch(tbl, hot_keys_ref=None)
    return out.to_pandas()


def test_key_families_emitted():
    df = _emit([
        ("r1", "10.1/x", "https://h:443", "rev1/article/view/1", "alice b smith",
         ["alice b smith"]),
        ("r2", "", "", "", "bob jones", ["bob jones"]),
    ])
    fam = set(df.block_key.str.split(":").str[0])
    assert {"doi", "path", "host", "an", "b0"} <= fam
    # host key is ALWAYS refined by first author
    host_keys = df[df.block_key.str.startswith("host:")].block_key.tolist()
    assert host_keys == ["host:https://h:443~alice b smith"]
    # doi-less record emits no doi key
    assert not df[(df.record_id == "r2") & df.block_key.str.startswith("doi:")].shape[0]


def test_hot_refinement_splits_blocks():
    hot = frozenset(["an:wei wang"])
    tbl = pa.table({
        "record_id": ["a", "b"],
        "doi_norm": ["", "10.9/z"],
        "host_key": ["", ""],
        "path_key": ["", ""],
        "name_blob": ["", ""],
        "authors_norm": [["wei wang"], ["wei wang"]],
    })
    import ray

    block._HOT_CACHE.clear()
    ref = None

    # call _refine directly (no ray needed)
    assert block._refine("an:wei wang", hot, ["wei wang"], "") == "an:wei wang~wei wang"
    assert block._refine("an:wei wang", frozenset(), ["wei wang"], "") == "an:wei wang"


def test_pair_cap_logs_dropped():
    n = 300
    df = pd.DataFrame({
        "block_key": ["an:x"] * n,
        "record_id": [f"r{i:04d}" for i in range(n)],
        "has_doi": [False] * n,
        "ftok": ["x"] * n,
    })
    out = block._pairs_for_bucket(df, max_pairs=1000)
    total = n * (n - 1) // 2
    assert len(out) <= 1000
    assert out.dropped_pairs.max() == total - len(out)  # no silent cap


def test_doi_decided_pairs_pruned():
    df = pd.DataFrame({
        "block_key": ["host:h~x"] * 4,
        "record_id": ["a", "b", "c", "d"],
        "has_doi": [True, True, False, False],
        "ftok": ["x", "x", "y", "y"],
    })
    out = block._pairs_for_bucket(df, max_pairs=10_000)
    pairs = set(zip(out.left_id, out.right_id))
    # both-doi pair (a,b) must be pruned; pairs involving a no-doi side kept
    assert ("a", "b") not in pairs
    assert {("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")} == pairs
    # doi-family blocks keep all pairs
    df2 = df.assign(block_key="doi:10.1/x")
    out2 = block._pairs_for_bucket(df2, max_pairs=10_000)
    assert len(out2) == 6


def test_find_hot_keys_driver_merge_equals_distributed(ray_session):
    """The driver-side partial merge (bounded samples) and the
    distributed bucketed reduce must produce the identical hot set —
    same partials, same sum, same threshold either way."""
    import ray.data as rds

    n = 600
    recs = pd.DataFrame({
        "record_id": [f"r{i}" for i in range(n)],
        "doi_norm": ["" for _ in range(n)],
        # one mega-host name key: every record shares the author name
        "host_key": ["" for _ in range(n)],
        "path_key": ["" for _ in range(n)],
        "name_blob": ["" for _ in range(n)],
        "authors_norm": [["wei wang"] for _ in range(n)],
    })
    ds = rds.from_pandas(recs, override_num_blocks=4)
    # force the SAMPLED regime in both runs (n > sample_min_rows), with
    # eff_threshold low enough that the shared name key is always hot
    common = dict(threshold=64, sample_frac=0.5, sample_min_rows=100)
    hot_driver = block.find_hot_keys(ds, driver_merge_rows=10_000, **common)
    hot_dist = block.find_hot_keys(ds, driver_merge_rows=0, **common)
    assert hot_driver == hot_dist
    assert "an:wei wang" in hot_driver


def test_dedup_by_modes_identical_rows(ray_session):
    """The dedup bucket key ("name" / "left" / "pair") is a locality
    knob only — output pair rows (incl. min block_key, OR'd families,
    max dropped) must be identical across modes."""
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.pipelines import reconcile
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages import records
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages.extract import extract_pages

    _, pages, works = reconcile.load_tables("/root/testdata/sf0.001")
    recs = records.build_records(extract_pages(pages), works).materialize()
    key = ["left_id", "right_id"]
    frames = {}
    for mode in ("name", "left", "pair"):
        df = block.candidate_pairs(recs, dedup_by=mode).to_pandas()
        assert list(df.columns) == ["left_id", "right_id", "block_key",
                                    "dropped_pairs", "families"]
        frames[mode] = df.sort_values(key, kind="mergesort").reset_index(drop=True)
    assert len(frames["name"]) > 0
    pd.testing.assert_frame_equal(frames["name"], frames["left"])
    pd.testing.assert_frame_equal(frames["name"], frames["pair"])


def test_adaptive_num_buckets():
    """Bucket count scales with records: floor at small tiers (keeps
    historical behavior), ~records/4k in the middle, capped at 4096."""
    assert block.adaptive_num_buckets(0) == 32
    assert block.adaptive_num_buckets(21_000) == 32       # sf0.01
    assert block.adaptive_num_buckets(210_000) == 210     # sf0.1
    assert block.adaptive_num_buckets(3_160_000) == 3160  # sf1 records
    assert block.adaptive_num_buckets(100_000_000) == 4096
    # monotone non-decreasing
    vals = [block.adaptive_num_buckets(n) for n in
            (0, 10_000, 200_000, 1_000_000, 50_000_000)]
    assert vals == sorted(vals)


def test_candidate_pairs_bucket_count_invariant(ray_session):
    """num_buckets is a task-granularity knob only: pair rows must be
    identical whether the shuffles run at 5 buckets or 64 (and via the
    adaptive default)."""
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.pipelines import reconcile
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages import records
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages.extract import extract_pages

    _, pages, works = reconcile.load_tables("/root/testdata/sf0.001")
    recs = records.build_records(extract_pages(pages), works).materialize()
    key = ["left_id", "right_id"]
    frames = {}
    for nb in (5, 64, None):
        df = block.candidate_pairs(recs, num_buckets=nb).to_pandas()
        frames[nb] = df.sort_values(key, kind="mergesort").reset_index(drop=True)
    assert len(frames[5]) > 0
    pd.testing.assert_frame_equal(frames[5], frames[64])
    pd.testing.assert_frame_equal(frames[5], frames[None])
