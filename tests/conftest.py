import pytest

from pypond_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("pypond_spark_tests", master="local[4]",
                      shuffle_partitions=4)
    yield spark
    spark.stop()
