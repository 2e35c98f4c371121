import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from contentextractor_spark.plans.pipeline import build_spark

    spark = build_spark(app="cx-tests", master="local[4]", shuffle_partitions=8)
    yield spark
    spark.stop()
