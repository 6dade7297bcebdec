import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pg_parquet_spark.session import get_spark

    s = get_spark("tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def tmp_parquet(tmp_path):
    def _path(name="out.parquet"):
        return str(tmp_path / name)

    return _path


SF_DIR = "/root/testdata/sf0.001"
