"""Session-scoped Ray + fixture setup (one ray.init per pytest session)."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Deterministic synthetic KG fixture written once per session."""
    from omop2obo_ray.fixtures.gen import make_fixtures

    d = str(tmp_path_factory.mktemp("kg_fixtures"))
    make_fixtures(d, n_pages=80, n_classes_per_ont=40, seed=42)
    return d


@pytest.fixture(scope="session")
def fixture_frames(fixture_dir):
    import pyarrow.parquet as pq

    names = [
        "pages", "concepts", "dbxrefs", "aliases", "semtypes",
        "ancestors", "vocab_map", "gold_triples",
    ]
    return {
        n: pq.read_table(os.path.join(fixture_dir, f"{n}.parquet")).to_pandas()
        for n in names
    }


@pytest.fixture(scope="session")
def lexicon(fixture_dir):
    from omop2obo_ray.state.lexicon import load_lexicon_from_dir

    return load_lexicon_from_dir(fixture_dir)


@pytest.fixture(scope="session")
def engine_triples(ray_session, fixture_dir, lexicon):
    """End-to-end engine output, computed once per session."""
    import ray.data as rd

    from omop2obo_ray.pipelines.kg import build_kg

    pages = rd.read_parquet(os.path.join(fixture_dir, "pages.parquet"))
    return build_kg(pages, lexicon).to_pandas()
