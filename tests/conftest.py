import pytest


@pytest.fixture(scope="session")
def spark():
    from gr_tdigest_spark.plans import get_spark

    s = get_spark(app="gr-tdigest-tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running perf-law / hot-group tests"
    )
