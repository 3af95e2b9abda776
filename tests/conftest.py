import logging

import pytest
import ray
from ray.data import DataContext


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture()
def tmp_table(tmp_path):
    return str(tmp_path / "table")


@pytest.fixture(scope="session")
def changelog(tmp_path_factory):
    """Session-scoped deterministic changelog: 3000 events, 3 epochs,
    duplicates + out-of-order + deletes + lang appearing at epoch 1."""
    from laketide.sources.changelog import generate_changelog

    d = tmp_path_factory.mktemp("changelog")
    files = generate_changelog(str(d), n_events=3000, n_epochs=3, seed=7)
    return files
