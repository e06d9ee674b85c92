from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from parsedmarc_go_spark.session import get_spark
    from parsedmarc_go_spark.sinks.jdbc import find_duckdb_jdbc_jar

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    extra = {
        # local mode runs all executor threads inside the driver JVM;
        # the 1g default heap is tight for 8 concurrent tasks touching
        # the 2,286-record sample + broadcast dims
        "spark.driver.memory": "6g",
    }
    # second JDBC engine for the K4 dialect tests — must be on the
    # JVM system classpath (see find_duckdb_jdbc_jar docstring)
    duckdb_jar = find_duckdb_jdbc_jar()
    if duckdb_jar:
        extra["spark.driver.extraClassPath"] = duckdb_jar
        extra["spark.executor.extraClassPath"] = duckdb_jar
    s = get_spark(
        app_name="parsedmarc-go-spark-tests",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 2,
        extra_confs=extra,
    )
    yield s
