import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract: tests own
    their session; library code never calls ray.init)."""
    import ray

    if not ray.is_initialized():
        # workers must be able to unpickle classes defined in test modules
        # (pickled by reference to their module name) → tests dir on path
        tests_dir = os.path.dirname(os.path.abspath(__file__))
        existing = os.environ.get("PYTHONPATH", "")
        pythonpath = f"{tests_dir}:{existing}" if existing else tests_dir
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            runtime_env={"env_vars": {"PYTHONPATH": pythonpath}},
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture()
def tmp_lake(tmp_path):
    root = tmp_path / "lake_root"
    root.mkdir()
    return str(root)


def pytest_configure(config):
    # keep Ray quiet in CI-style runs
    os.environ.setdefault("RAY_DEDUP_LOGS", "0")
