import pytest

from track0_spark.session import build_spark


@pytest.fixture(scope="session")
def spark():
    s = build_spark(
        cores=4,
        shuffle_partitions=4,
        app_name="track0s-tests",
        driver_memory="4g",
        extra={"spark.sql.execution.arrow.maxRecordsPerBatch": "256"},
    )
    yield s
    s.stop()
