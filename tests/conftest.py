import pytest

from samza_spark import SessionConfig, get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        SessionConfig(
            app_name="samza_spark_tests",
            master="local[4]",
            shuffle_partitions=4,
            # keep streaming-state tests light
            use_rocksdb_state=False,
        )
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
