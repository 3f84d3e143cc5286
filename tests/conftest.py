import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.context import tune_data_context
    tune_data_context(ctx)
    yield ray
    ray.shutdown()
