import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (repo contract)."""
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_small(tmp_path_factory):
    """sf0.001-scale transcript fixture directory (generated once)."""
    from logagent_js_ray.fixtures.gen import ensure_transcripts
    return ensure_transcripts("sf0.001")


@pytest.fixture(scope="session")
def tool_catalog_path():
    from logagent_js_ray.fixtures.gen import ensure_tool_catalog
    return ensure_tool_catalog()
