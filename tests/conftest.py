import os

import pytest

import ray

# workers inherit env from the raylet: pin the repo on PYTHONPATH
# BEFORE ray.init so a freshly spawned worker can always import raykg
# even if its cwd drifts (same insurance bench.py carries; chases a
# rare ImportError flake seen once per ~6 full-suite runs)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


@pytest.fixture(scope="session", autouse=True)
def ray_session():
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
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_fixture(tmp_path_factory):
    """Shared small synthetic world (seeded, deterministic)."""
    from raykg import fixtures

    d = str(tmp_path_factory.mktemp("fixture"))
    fixtures.write_fixture(
        d, n_convs=60, n_kb=80, n_nil=12, n_tomb=5, n_epochs=3, seed=42
    )
    return d
