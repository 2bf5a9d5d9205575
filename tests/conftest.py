import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_corpus_dir(tmp_path_factory):
    """Synthetic span corpus written to parquet once per session."""
    import pyarrow.parquet as pq

    from swift_readability_ray.fixtures import corpus_to_tables, generate_corpus

    docs = generate_corpus()
    input_tbl, expected_tbl = corpus_to_tables(docs)
    d = tmp_path_factory.mktemp("corpus")
    pq.write_table(input_tbl, str(d / "documents.parquet"))
    pq.write_table(expected_tbl, str(d / "expected.parquet"))
    return str(d)
