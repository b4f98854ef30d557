import pytest

from buildkite_logs_parquet_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="bklp-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


REFERENCE_TESTDATA = "/root/reference/testdata"
