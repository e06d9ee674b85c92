"""Watermarked windowed rollup + stateful dedup over streams."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SAMPLES = "/root/reference/samples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLES), reason="reference sample corpus not available"
)


@pytest.fixture(scope="module")
def records_path(spark, tmp_path_factory):
    from parsedmarc_go_spark.sources.ingest import ingest

    path = str(tmp_path_factory.mktemp("rollup") / "records")
    ingest(spark, SAMPLES).aggregate_records.write.mode("overwrite").parquet(path)
    return path


def test_streaming_daily_rollup_matches_batch(spark, records_path, tmp_path):
    from parsedmarc_go_spark.streaming.rollups import streaming_daily_rollup

    batch_df = spark.read.parquet(records_path)
    schema = batch_df.schema
    stream = spark.readStream.schema(schema).parquet(records_path)
    rolled = streaming_daily_rollup(stream, watermark="1 day")
    q = (
        rolled.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r.window_start), r.org_name): (r.total_messages, r.aligned_messages)
        for r in spark.sql("SELECT * FROM rollup_test").collect()
    }

    expected_df = (
        batch_df.groupBy(F.window("begin_date", "1 day").alias("w"), "org_name")
        .agg(
            F.sum("count").alias("total"),
            F.sum(F.when(F.col("dmarc_aligned"), F.col("count")).otherwise(0)).alias("aligned"),
        )
        .select(F.col("w.start").alias("ws"), "org_name", "total", "aligned")
    )
    expected = {(str(r.ws), r.org_name): (r.total, r.aligned) for r in expected_df.collect()}

    # append mode withholds windows still inside the watermark of the
    # max event time; everything emitted must match batch exactly, and
    # all but the newest day must have been emitted
    assert got, "no windows emitted"
    for k, v in got.items():
        assert expected[k] == v, f"window {k}: stream={v} batch={expected[k]}"
    missing = set(expected) - set(got)
    newest = max(ws for ws, _ in expected)
    assert all(ws >= newest for ws, _ in missing) or not missing, (
        f"non-final windows withheld: {missing}"
    )


def test_dedupe_stream_exactly_once_per_key(spark, records_path, tmp_path):
    from parsedmarc_go_spark.streaming.rollups import dedupe_stream

    batch_df = spark.read.parquet(records_path)
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(records_path)
    )
    deduped = dedupe_stream(stream, "report_id")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT report_id FROM dedup_test").collect()
    ids = [r.report_id for r in rows]
    assert len(ids) == len(set(ids)), "duplicate keys emitted"
    n_keys = batch_df.select("report_id").distinct().count()
    assert len(ids) == n_keys, f"emitted {len(ids)} of {n_keys} distinct keys"
