from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipelines_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Test fixtures are tiny (KBs), so task-dispatch overhead dominates
    # every action: 8 local threads measurably beat local[*]=32 on this
    # suite (test_materialize.py 68.6 s -> 50.2 s, same tests). An
    # explicit $SPARK_GRAFT_CPUS still wins so the driver can size the
    # session itself; nothing here changes what any test asserts.
    kwargs = {}
    if "SPARK_GRAFT_CPUS" not in os.environ:
        kwargs = {"master": "local[8]", "shuffle_partitions": 8}
    spark = get_spark(app_name="data-pipelines-spark-tests", **kwargs)
    yield spark
    spark.stop()
