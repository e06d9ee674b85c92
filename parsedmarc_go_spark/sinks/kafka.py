"""K5 — Kafka producer sink (reference: internal/kafka/kafka.go:33-198).

`sinks.writers.kafka_messages` builds the exact message shape (key,
JSON value, report_type header). This module owns the EXECUTED send:
`.write.format("kafka")` with the connector options the reference's
sarama config maps to (brokers, SASL, TLS). The spark-sql-kafka
connector jar is environment-provided (it is not bundled with a stock
PySpark install); `kafka_available()` detects it so callers and tests
degrade to a clean skip instead of a ClassNotFound stack — the same
pattern as the reference's env-guarded clickhouse_test.go.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parsedmarc_go_spark.sinks.writers import kafka_messages

KAFKA_PROVIDER_CLASS = "org.apache.spark.sql.kafka010.KafkaSourceProvider"


def kafka_package() -> str:
    """Maven coordinate of the spark-sql-kafka connector matching this
    PySpark build — wired into ``spark.jars.packages`` at session build
    when ``cfg.kafka.enabled`` (cli._session_confs), so the produce path
    (kafka.go:33-198) executes wherever the coordinate resolves; the
    kafka_available() guard still degrades to a clean skip offline.
    Scala suffix tracks the PySpark major (3.x ships Scala 2.12 builds,
    4.x ships 2.13 — round-4 advice)."""
    import pyspark

    major = int(pyspark.__version__.split(".")[0])
    scala = "2.13" if major >= 4 else "2.12"
    return f"org.apache.spark:spark-sql-kafka-0-10_{scala}:{pyspark.__version__}"


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(KAFKA_PROVIDER_CLASS)
        return True
    except Exception:
        return False


def kafka_writer(
    df: DataFrame,
    kind: str,
    bootstrap_servers: str,
    topic: str,
    username: str | None = None,
    password: str | None = None,
    ssl: bool = False,
):
    """Configured DataFrameWriter for the kafka sink — returned
    unexecuted so tests can inspect options; `.save()` produces.
    Option mapping mirrors kafka.go's sarama config (hosts, SASL
    PLAIN, TLS)."""
    msgs = kafka_messages(df, kind)
    writer = (
        msgs.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("includeHeaders", "true")
    )
    if username:
        protocol = "SASL_SSL" if ssl else "SASL_PLAINTEXT"
        jaas = (
            "org.apache.kafka.common.security.plain.PlainLoginModule required "
            f'username="{username}" password="{password or ""}";'
        )
        writer = (
            writer.option("kafka.security.protocol", protocol)
            .option("kafka.sasl.mechanism", "PLAIN")
            .option("kafka.sasl.jaas.config", jaas)
        )
    elif ssl:
        writer = writer.option("kafka.security.protocol", "SSL")
    return writer


def send_kafka(
    df: DataFrame,
    kind: str,
    bootstrap_servers: str,
    topic: str,
    username: str | None = None,
    password: str | None = None,
    ssl: bool = False,
    allow_stdlib_fallback: bool = True,
) -> None:
    """Execute the produce (kafka.go SendAggregateReport et al.).

    Connector present → `.write.format("kafka")`. Connector absent →
    the stdlib wire-protocol producer (sinks/kafka_wire.py), still
    distributed via foreachPartition — so the produce path executes even
    where the Maven coordinate can't resolve. The fallback is plaintext
    only; SASL/TLS configs require the connector and raise a clear error
    rather than silently downgrading security."""
    spark = df.sparkSession
    if kafka_available(spark):
        kafka_writer(df, kind, bootstrap_servers, topic, username, password, ssl).save()
        return
    if not allow_stdlib_fallback:
        raise RuntimeError(
            "spark-sql-kafka connector not on the classpath; add "
            f"{kafka_package()} via spark.jars.packages"
        )
    if username or ssl:
        raise RuntimeError(
            "SASL/TLS produce requires the spark-sql-kafka connector; the "
            "stdlib fallback is plaintext-only — add "
            f"{kafka_package()} via spark.jars.packages"
        )
    from parsedmarc_go_spark.sinks.kafka_wire import send_kafka_stdlib

    send_kafka_stdlib(df, kind, bootstrap_servers, topic)
