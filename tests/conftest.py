import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session per pytest run (driver contract). Only tests
    that touch Ray request this fixture; pure-semantics tests stay
    Ray-free."""
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_pages_dir(tmp_path_factory):
    """Shared small `pages` fixture: 200 rows across 4 parquet shards."""
    from docling_pdf_ray.sources.fixtures import write_pages_fixture

    d = tmp_path_factory.mktemp("pages_fixture")
    write_pages_fixture(str(d), n_rows=200, seed=7, n_files=4)
    return str(d)
