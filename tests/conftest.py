import pytest

try:
    from hypothesis import settings as _hyp_settings

    # deterministic example generation: a driver/CI run must not discover
    # fresh random counterexamples that local runs never saw
    _hyp_settings.register_profile("ci", derandomize=True)
    _hyp_settings.load_profile("ci")
except ImportError:  # pragma: no cover
    pass


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (per driver contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield
    ray.shutdown()
