from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_SMALL = "/root/testdata/sf0.001"
# Oracle differential tests run here; default to the small SF for speed,
# override with SPARK_TEST_SF_DIR=/root/testdata/sf0.01 (driver's t2 scale).
SF_ORACLE = os.environ.get("SPARK_TEST_SF_DIR", SF_SMALL)


@pytest.fixture(scope="session")
def spark():
    from data_engineering_individual_assignment_spark.session import get_spark

    s = get_spark("dei-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
