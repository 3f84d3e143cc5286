"""Session-context tuning: the fixture (like every session owner) must
run with op-resource reservation disabled — with it on, a long-task map
fused upstream of an AllToAll serializes on low-CPU sessions (measured
364 s vs 42 s on the minhash candidate subgraph at 8 CPUs, machine ~95%
idle; BASELINE §c7)."""


def test_fixture_session_has_reservation_disabled(ray_session):
    from ray.data import DataContext

    assert DataContext.get_current().op_resource_reservation_enabled is False


def test_tune_data_context_returns_ctx():
    from ray.data import DataContext

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.context import (
        tune_data_context,
    )

    ctx = tune_data_context()
    assert ctx is DataContext.get_current()
    assert ctx.op_resource_reservation_enabled is False
