import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pg_parquet_spark.session import session_builder

    # r15 suite-wall fix: a parallelize-sourced frame gets
    # defaultParallelism partitions, and a coalesce(1) single-file
    # write then walks every python partition SEQUENTIALLY in one task
    # (~0.15 s of python-runner handshake each → 4.5 s per tiny
    # write_parquet on local[32], linear in cores — measured). Tests
    # build their fixtures via createDataFrame, so pin the parallelize
    # slice count small; the master keeps all cores for real stages.
    s = (
        session_builder("tests")
        .config("spark.default.parallelism", "4")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def tmp_parquet(tmp_path):
    def _path(name="out.parquet"):
        return str(tmp_path / name)

    return _path


SF_DIR = "/root/testdata/sf0.001"
