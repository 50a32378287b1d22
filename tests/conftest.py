import logging
import shutil

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Shared labeled fixture corpus (FIXTURES.md 'tiny'), rows shuffled on disk
    to prove no stage relies on file order."""
    from mediachain_indexer_ray.fixtures import FixtureSpec, write_corpus

    d = tmp_path_factory.mktemp("corpus")
    spec = FixtureSpec(n_base=80, viral_fanout=25)
    write_corpus(spec, str(d), shuffle_rows=True)
    return str(d), spec


@pytest.fixture(scope="session")
def pipeline_outputs(corpus_dir, tmp_path_factory):
    """One full dedupe run shared across e2e tests."""
    from mediachain_indexer_ray.config import Config
    from mediachain_indexer_ray.pipelines.dedupe import dedupe_pipeline

    d, _ = corpus_dir
    work = str(tmp_path_factory.mktemp("work"))
    cfg = Config(work_dir=work)
    out = dedupe_pipeline(f"{d}/transcripts.parquet", cfg)
    yield out, cfg, d
    shutil.rmtree(work, ignore_errors=True)
