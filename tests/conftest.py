import os

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master(
            f"local[{os.environ.get('BF_TEST_CPUS', '4')}]"
        )
        .appName("bitfilters-tests")
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("BF_TEST_SHUFFLE", "8"),
        )
        # mirror the session factory's join posture (r14: SHJ preference)
        # so plan-shape tests and the PLAN_AUDIT gate compare like for
        # like with production plans
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m"
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
