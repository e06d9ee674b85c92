from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from parsedmarc_go_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    s = get_spark(
        app_name="parsedmarc-go-spark-tests",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 2,
        # local mode runs all executor threads inside the driver JVM;
        # the 1g default heap is tight for 8 concurrent tasks touching
        # the 2,286-record sample + broadcast dims
        extra_confs={"spark.driver.memory": "6g"},
    )
    yield s
