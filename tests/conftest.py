import numpy as np
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def grid():
    from dggrid4py_ray.dggs.igeo7 import IGeo7Grid

    g = IGeo7Grid()
    g._ensure_anchor_table()
    return g


@pytest.fixture(scope="session")
def random_points():
    rng = np.random.default_rng(42)
    n = 3000
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    return lon, lat
