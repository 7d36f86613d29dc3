from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from hive_nexr_spark.session import get_session

    # Small shuffle-partition count keeps the many tiny test jobs fast.
    spark = get_session(app_name="hive-nexr-spark-tests", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SMOKE_SF_DIR


@pytest.fixture(scope="session")
def dfs(spark, sf_dir):
    from hive_nexr_spark.queries.base import ensure_views

    return ensure_views(spark, sf_dir)
