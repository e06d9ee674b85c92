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

from pyspark.sql import DataFrame

DEFAULT_BATCH_SIZE = 10_000


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    driver: str = "com.clickhouse.jdbc.ClickHouseDriver",
    user: str | None = None,
    password: str | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    num_partitions: int | None = None,
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
        .option("isolationLevel", "NONE")  # ClickHouse has no transactions
    )
    if user:
        writer = writer.option("user", user)
    if password:
        writer = writer.option("password", password)
    return writer
