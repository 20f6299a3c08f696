from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipelines_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="data-pipelines-spark-tests")
    yield spark
    spark.stop()
