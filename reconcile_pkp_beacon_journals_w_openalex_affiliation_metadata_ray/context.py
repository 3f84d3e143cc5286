"""Session-level Ray Data context tuning.

IMPORTANT: nothing in the library calls this on import — mutating the
global DataContext belongs to whoever owns the Ray session (bench.py,
the CLI, the test fixture, tools/). The driver contract (session owned
by the caller) stays intact.
"""

from __future__ import annotations


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
