import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from ppocr_spark.pipeline import build_session

    s = build_session("ppocr-spark-tests", cores=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """Deterministic 40-doc corpus written once per test session."""
    from ppocr_spark.corpus import write_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(out, 40, media_pool_size=16)
    return out
