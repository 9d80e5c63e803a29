import os

import pytest

import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
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
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def world(tmp_path_factory):
    """Small deterministic synthetic world shared by the pipeline tests."""
    from greenex_py_ray.sources import synth

    root = str(tmp_path_factory.mktemp("world"))
    paths = synth.ensure_world(root, n_docs=300, seed=42)
    return paths


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
