import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from open_parse_spark.spark.session import get_spark

    spark = get_spark(app_name="opspark-tests", master="local[4]", shuffle_partitions=8)
    yield spark
    spark.stop()
