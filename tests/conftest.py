from __future__ import annotations

import pytest

from data_engineering_assessment_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dea-spark-tests", cpus=8, shuffle_partitions=8)
    yield s
