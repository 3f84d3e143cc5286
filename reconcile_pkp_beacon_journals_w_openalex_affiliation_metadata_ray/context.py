"""Session-level Ray Data context tuning.

IMPORTANT: nothing in the library calls this on import — mutating the
global DataContext belongs to whoever owns the Ray session (bench.py,
the CLI, the test fixture, tools/). The driver contract (session owned
by the caller) stays intact.
"""

from __future__ import annotations

import os

# Measured per-node saturation point for shuffle + memory-bandwidth
# bound subgraphs (the dedup family's signature kernels + sorted
# bucketed reduces): BASELINE.md §c7 measured minhash_lsh_pairs at 2M
# docs REGRESSING from 102 s at 16 CPUs to 297-522 s at 32 on this
# host (~21 effective cores) — 32 concurrent reduceat kernels plus
# sort traffic oversubscribe the node's memory bandwidth, which more
# CPU slots cannot add. 16 is the measured knee here; a real
# deployment tunes GRAFT_EFFECTIVE_CORES to the node's core count.
_DEFAULT_EFFECTIVE_CORES = 16


def effective_cores() -> int:
    """Per-NODE effective-core knee for bandwidth-bound stages.
    ``GRAFT_EFFECTIVE_CORES`` overrides (0 disables the cap)."""
    env = os.environ.get("GRAFT_EFFECTIVE_CORES")
    if env is not None:
        return int(env)
    return _DEFAULT_EFFECTIVE_CORES


def shuffle_task_cpus() -> float:
    """``num_cpus`` to reserve per task in the dedup shuffle family so
    at most ``effective_cores()`` such tasks run per node concurrently.

    Memory bandwidth is a PER-NODE resource, so the cap is expressed as
    a per-task CPU reservation (node_cpus / knee), not a global
    concurrency limit: on a multi-node cluster every node still runs
    ``knee`` tasks — the cap scales with node count and can never
    serialize a large cluster the way a global ``concurrency=`` would.
    Returns 1.0 (no-op) when the node is at or below the knee, when the
    cap is disabled, or outside a Ray session."""
    knee = effective_cores()
    if knee <= 0:
        return 1.0
    try:
        import ray

        if not ray.is_initialized():
            return 1.0
        node_cpus = max((n.get("Resources", {}).get("CPU", 0.0)
                         for n in ray.nodes() if n.get("Alive")), default=0.0)
    except Exception:  # pragma: no cover - defensive, session-state races
        return 1.0
    if node_cpus <= knee:
        return 1.0
    return float(node_cpus) / float(knee)


def tune_data_context(ctx=None):
    """Disable Ray Data's per-operator resource reservation for this
    session.

    Ray 2.49's streaming executor reserves ``op_resource_reservation_
    ratio`` (default 0.5) of the cluster split across operators. With a
    long-running map fused upstream of an AllToAll (the shape of every
    bucketed reduce here: signatures/key-emit -> sort) on a LOW-CPU
    session, the map operator's reserved share rounds down to ~1 slot
    and the stage effectively serializes: measured 364 s for the
    minhash candidate subgraph at 8 CPUs with reservation on (machine
    ~95% idle throughout) vs 42.1 s with it off — identical output.
    At >= 16 CPUs the reservation is harmless (51.7 s fused at 16).
    A real multi-node deployment of this engine should set the same
    flag (or raise the ratio) for low-CPU-per-node clusters.
    """
    from ray.data import DataContext

    ctx = ctx or DataContext.get_current()
    ctx.op_resource_reservation_enabled = False
    return ctx
