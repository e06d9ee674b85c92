"""Daemon mode (SURVEY §2.10, milestone 4): Structured Streaming over a
file-drop landing zone.

The reference's daemon is an IMAP poll loop (300 s default,
config.go:208) plus an HTTP push endpoint (http/server.go:353-420);
both ultimately produce raw report payloads one at a time. The Spark
shape: an external fetcher (IMAP/HTTP receiver — mailbox protocol does
not belong in the engine) lands raw files in `landing_dir`; this stream
picks them up, runs the *same* batch transforms via foreachBatch, and
writes the five Parquet tables. `maxFilesPerTrigger` is the
backpressure knob (the analogue of the reference's rate limiter,
server.go:239-270).

End-to-end exactly-once: the checkpointed file source replays a failed
micro-batch with the SAME batch_id, and every table write is an
idempotent dynamic-partition OVERWRITE of that batch's own
`__batch_id=N` partition — a crash after some of the five writes
re-runs the batch and replaces exactly what it wrote before, never
appending duplicates. (Plain `append` here would silently degrade to
at-least-once across the five non-atomic writes.) Readers drop the
bookkeeping column via `read_stream_table`.

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

STREAM_TABLES = (
    "aggregate_reports",
    "aggregate_records",
    "forensic_reports",
    "smtp_tls_reports",
    "smtp_tls_failures",
    "rejects",
)


def _write_table(df: DataFrame, out_dir: str, name: str, batch_id: int) -> None:
    """One idempotent table commit: dynamic partition overwrite scoped
    to THIS batch's __batch_id partition. Module-level (not a closure)
    so the crash test can fail-inject between the five table writes."""
    (
        df.withColumn("__batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .partitionBy("__batch_id")
        .parquet(os.path.join(out_dir, name))
    )


def make_batch_processor(
    out_dir: str,
    enrichment=None,
    metrics_path: str | None = None,
    as_of: str | None = None,
):
    """foreachBatch body, factored out so idempotence is directly
    testable: calling it twice with the same batch_id (the
    crash-and-replay case) must leave every table unchanged.

    `enrichment` is an optional functions.enrich.EnrichmentContext —
    when given, aggregate records and forensic reports get GeoIP /
    reverse-DNS / sender classification applied in-batch, replacing the
    offline defaults exactly where the reference enriches per record
    (parser.go:1272-1299).

    `metrics_path`: when set, cumulative reports/failures counters are
    published there (atomic textfile) after every batch — the file the
    HTTP receiver's GET /metrics bridges into its scrape output, which
    mirrors the reference's shared Prometheus registry
    (metrics.go:24-179). Counters are process-local and monotone within
    a daemon run, exactly like the reference's in-process counters. Each
    batch's contribution is keyed by batch_id, so the crash-and-replay
    case the table writes are designed for is idempotent in the
    counters too: re-running batch N overwrites N's contribution
    instead of double-counting (round-4 advice)."""

    batch_contribs: dict[int, dict[tuple[str, str], float]] = {}

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        from parsedmarc_go_spark.functions.enrich import enrich_records

        spark = batch.sparkSession
        extracted = extract_reports(batch).cache()
        prev_overwrite_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        try:
            # `as_of` pins the ingest clock: with it set, a crash-and-
            # replay of batch N rewrites byte-identical files (created_at
            # included) instead of merely row-equivalent ones
            agg_reports, agg_records, agg_bad = parse_aggregate(extracted, as_of)
            forensic = parse_forensic(extracted, as_of)
            tls_reports, tls_failures, tls_bad = parse_smtp_tls(extracted, as_of)
            if enrichment is not None:
                agg_records = enrich_records(agg_records, enrichment)
                forensic = enrich_records(forensic, enrichment)
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
            # idempotent commit: a replay of batch N replaces batch N's
            # files and touches nothing else (see _write_table)
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            for name, df in outputs.items():
                _write_table(df, out_dir, name, batch_id)
            if metrics_path:
                from parsedmarc_go_spark.metrics import (
                    escape_label_value,
                    write_metrics_textfile,
                )

                # counts re-derive from the cached `extracted` frame, so
                # these are cheap follow-up jobs, not a second file scan
                contrib: dict[tuple[str, str], float] = {}
                for family, df in (
                    ("aggregate", agg_reports),
                    ("forensic", forensic),
                    ("smtp_tls", tls_reports),
                ):
                    key = (
                        "parsedmarc_parser_reports_total",
                        f'type="{family}",source="stream"',
                    )
                    contrib[key] = contrib.get(key, 0.0) + df.count()
                for r in outputs["rejects"].groupBy("kind", "error").count().collect():
                    key = (
                        "parsedmarc_parser_failures_total",
                        f'type="{r["kind"]}",source="stream",'
                        f'reason="{escape_label_value(r["error"] or "")}"',
                    )
                    contrib[key] = contrib.get(key, 0.0) + r["count"]
                batch_contribs[batch_id] = contrib  # replay-safe overwrite
                totals: dict[tuple[str, str], float] = {}
                for c in batch_contribs.values():
                    for key, v in c.items():
                        totals[key] = totals.get(key, 0.0) + v
                write_metrics_textfile(totals, metrics_path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_overwrite_mode)
            extracted.unpersist()

    return process_batch


def read_stream_table(spark: SparkSession, out_dir: str, name: str) -> DataFrame:
    """Read one of the daemon's output tables, dropping the __batch_id
    bookkeeping partition column."""
    return spark.read.parquet(os.path.join(out_dir, name)).drop("__batch_id")


def stream_ingest(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = 300,
    max_files_per_trigger: int = 1000,
    available_now: bool = False,
    enrichment=None,
    metrics_path: str | None = None,
    as_of: str | None = None,
) -> StreamingQuery:
    """readStream(binaryFile) → extraction/parse DAG → foreachBatch
    appending the five flat Parquet tables + rejects quarantine.
    `as_of` (optional) pins the ingest clock — see normalize.ingest_ts."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(landing_dir)
        .select("path", "length", "content")
    )

    writer = files.writeStream.foreachBatch(
        make_batch_processor(out_dir, enrichment, metrics_path, as_of)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
