import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYTHONHASHSEED", "0")

import pytest


@pytest.fixture(scope="session")
def spark():
    from osu_elastic_indexer_spark.session import get_spark

    s = get_spark("tests", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def corpus_path(tmp_path_factory):
    """Deterministic 1200-doc webtext corpus parquet (FIXTURES.md §1)."""
    from osu_elastic_indexer_spark.sources.fixtures import write_corpus

    p = tmp_path_factory.mktemp("corpus") / "documents.parquet"
    return write_corpus(str(p), n_docs=1200)


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
