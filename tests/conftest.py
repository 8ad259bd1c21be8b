import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from plateau_gis_converter_spark.session import get_spark

    # small local session for tests; 8 threads keeps startup + shuffles quick
    s = get_spark(app="pytest", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pages_small(tmp_path_factory):
    """1,000-page deterministic fixture parquet (FIXTURES.md §5 unit tier)."""
    from plateau_gis_converter_spark.sources import fixtures as fx

    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    fx.write_pages_parquet(path, 1000)
    return path


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
