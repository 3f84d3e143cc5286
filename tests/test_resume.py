"""Checkpoint / lineage / resume gates (SURVEY.md §5 item 6)."""

import json
import os
import shutil

import pytest


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path / "ckpt")


def _cluster_map(ds):
    out = {}
    for b in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for r, c in zip(b["record_id"].to_pylist(), b["cluster_id"].to_pylist()):
            out[r] = c
    return out


def test_checkpoint_resume_skips_recompute(ray_session, workdir):
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.pipelines import (
        reconcile,
    )
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.state import (
        manifest as mf,
    )

    sf = "/root/testdata/sf0.001"
    out1, resumed1 = reconcile.run_reconcile_checkpointed(sf, workdir)
    assert resumed1 == {"records": False, "pairs": False, "scored": False,
                       "clusters": False}
    clusters1 = _cluster_map(out1["clusters"])
    assert clusters1

    # manifests exist with lineage fields
    man = mf.read_manifest(workdir, "scored")
    assert man is not None and man["total_rows"] > 0
    assert man["fingerprint"]
    some_part = next(iter(man["partitions"].values()))
    assert some_part["rows"] >= 0 and "files" in some_part
    # score histogram recorded for the scored stage
    assert any("score_histogram" in p for p in man["partitions"].values())

    # second run: every stage must resume (manifest hit, no recompute)
    out2, resumed2 = reconcile.run_reconcile_checkpointed(sf, workdir)
    assert resumed2 == {"records": True, "pairs": True, "scored": True,
                       "clusters": True}
    assert _cluster_map(out2["clusters"]) == clusters1


def test_checkpoint_invalidated_by_fingerprint(ray_session, workdir, tmp_path):
    """A changed input fingerprint must force recompute (no stale
    checkpoint reuse)."""
    import ray.data as rd

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.state import (
        manifest as mf,
    )

    calls = []

    def factory():
        calls.append(1)
        return rd.range(100)

    ds, resumed = mf.checkpoint(factory, workdir, "stage_a", "fp1")
    assert not resumed and ds.count() == 100 and len(calls) == 1
    ds, resumed = mf.checkpoint(factory, workdir, "stage_a", "fp1")
    assert resumed and len(calls) == 1
    ds, resumed = mf.checkpoint(factory, workdir, "stage_a", "fp2")
    assert not resumed and len(calls) == 2


def test_partial_checkpoint_not_trusted(ray_session, workdir):
    """A checkpoint without its manifest (crash before publish) must be
    recomputed, and a tampered manifest partition must invalidate."""
    import ray.data as rd

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.state import (
        manifest as mf,
    )

    mf.checkpoint(lambda: rd.range(10), workdir, "st", "fp")
    stage_dir = os.path.join(workdir, "st")
    # remove a referenced partition dir -> incomplete
    man = mf.read_manifest(workdir, "st")
    part = next(iter(man["partitions"]))
    shutil.rmtree(os.path.join(stage_dir, f"part={part}"))
    assert not mf.is_complete(workdir, "st", "fp")
    # crash-simulated .tmp leftover is ignored entirely
    os.makedirs(stage_dir + ".tmp", exist_ok=True)
    ds, resumed = mf.checkpoint(lambda: rd.range(10), workdir, "st", "fp")
    assert not resumed and ds.count() == 10
