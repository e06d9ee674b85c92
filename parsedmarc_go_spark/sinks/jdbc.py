"""K4 — relational sink (SURVEY §2.2; reference: ClickHouse native
inserts, internal/storage/clickhouse/clickhouse.go:238-497).

The engine's canonical store is partitioned Parquet + SQL views
(storage.py) — strictly more Spark-native than pushing rows back into
ClickHouse. For deployments that do want the reference's exact sink,
this builds the JDBC writer (clickhouse-jdbc or any warehouse driver on
the executor classpath); batching is inherent to Spark's JDBC writer,
matching the reference's PrepareBatch/append loop semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BATCH_SIZE = 10_000


def jdbc_driver_available(spark: SparkSession, driver: str) -> bool:
    """True when the JDBC driver class is on the classpath (tests skip
    cleanly otherwise — the reference env-guards clickhouse_test.go the
    same way)."""
    try:
        spark._jvm.java.lang.Class.forName(driver)
        return True
    except Exception:
        return False


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    driver: str = "com.clickhouse.jdbc.ClickHouseDriver",
    user: str | None = None,
    password: str | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    num_partitions: int | None = None,
    isolation_level: str = "NONE",
):
    """Configured DataFrameWriter for `df.write.jdbc`-style appends.
    Returned unexecuted so callers (and tests) can inspect options;
    call `.save()` to insert."""
    out = df.repartition(num_partitions) if num_partitions else df
    writer = (
        out.write.format("jdbc")
        .mode("append")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batch_size))
        # ClickHouse has no transactions → NONE default; real RDBMS
        # targets (the Derby round-trip test) pass READ_COMMITTED
        .option("isolationLevel", isolation_level)
    )
    if user:
        writer = writer.option("user", user)
    if password:
        writer = writer.option("password", password)
    return writer


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str = "com.clickhouse.jdbc.ClickHouseDriver",
    **kwargs,
) -> None:
    """EXECUTE the insert (clickhouse.go:238-360 StoreAggregateReport
    semantics: batched appends). Raises RuntimeError with a clear
    message when the driver class is absent."""
    if not jdbc_driver_available(df.sparkSession, driver):
        raise RuntimeError(f"JDBC driver {driver} not on the classpath")
    jdbc_writer(df, url, table, driver=driver, **kwargs).save()


def read_jdbc(
    spark: SparkSession, url: str, table: str, driver: str
) -> DataFrame:
    """Round-trip read for verification / downstream queries."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .load()
    )
