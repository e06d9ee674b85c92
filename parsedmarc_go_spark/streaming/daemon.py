"""Daemon mode (SURVEY §2.10, milestone 4): Structured Streaming over a
file-drop landing zone.

The reference's daemon is an IMAP poll loop (300 s default,
config.go:208) plus an HTTP push endpoint (http/server.go:353-420);
both ultimately produce raw report payloads one at a time. The Spark
shape: an external fetcher (IMAP/HTTP receiver — mailbox protocol does
not belong in the engine) lands raw files in `landing_dir`; this stream
picks them up, runs the *same* batch transforms via foreachBatch, and
appends the five Parquet tables. Checkpointed file source ⇒ each file
processed exactly once; `maxFilesPerTrigger` is the backpressure knob
(the analogue of the reference's rate limiter, server.go:239-270).

Batch/stream parity is structural: foreachBatch calls the identical
parse functions the batch path uses, so tests assert table equality.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from parsedmarc_go_spark.sources.ingest import (
    extract_reports,
    parse_aggregate,
    parse_forensic,
    parse_smtp_tls,
)

BINARY_FILE_SCHEMA = "path string, modificationTime timestamp, length long, content binary"


def stream_ingest(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = 300,
    max_files_per_trigger: int = 1000,
    available_now: bool = False,
) -> StreamingQuery:
    """readStream(binaryFile) → extraction/parse DAG → foreachBatch
    appending the five flat Parquet tables + rejects quarantine."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(landing_dir)
        .select("path", "length", "content")
    )

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        extracted = extract_reports(batch).cache()
        try:
            agg_reports, agg_records, agg_bad = parse_aggregate(extracted)
            forensic = parse_forensic(extracted)
            tls_reports, tls_failures, tls_bad = parse_smtp_tls(extracted)
            hard = extracted.filter(F.col("kind") == "error").select(
                "path", F.lit("unknown").alias("kind"), "error"
            )
            outputs = {
                "aggregate_reports": agg_reports,
                "aggregate_records": agg_records,
                "forensic_reports": forensic,
                "smtp_tls_reports": tls_reports,
                "smtp_tls_failures": tls_failures,
                "rejects": hard.unionByName(agg_bad).unionByName(tls_bad),
            }
            for name, df in outputs.items():
                df.write.mode("append").parquet(os.path.join(out_dir, name))
        finally:
            extracted.unpersist()

    writer = files.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
