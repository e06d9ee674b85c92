"""Continuous curation: the batch curation passes (PII redaction,
Gopher repetition stats, benchmark n-gram decontamination —
operators/curation.py — and optionally CCNet LM quality scoring,
operators/lm.py) run as a Structured Streaming stage over arriving
document shards.

A training-data pipeline does not curate once: shards arrive
continuously (crawl dumps, ingest landings) and each must pass the same
hygiene stack before joining the corpus. Every pass here is per-document
math against a FIXED reference (the benchmark n-gram set), so
stream-over-shards equals batch-over-the-union exactly — pinned in
tests/test_streaming_curation.py on a two-trigger run.

The commit protocol is the daemon's (streaming/daemon.py): each output
table write is an idempotent dynamic-partition overwrite of the batch's
own ``__batch_id`` partition, so a crash-and-replay of batch N replaces
exactly N's files. The benchmark n-gram frame is computed ONCE at
processor build (the stream-static pattern) and broadcast into every
micro-batch's probe join — the eval set never re-tokenizes per trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from parsedmarc_go_spark.operators.curation import (
    benchmark_ngrams,
    ngram_decontaminate,
    pii_redact,
    repetition_stats,
)
from parsedmarc_go_spark.operators.classify import nb_score, train_nb_classifier
from parsedmarc_go_spark.operators.lm import lm_score, train_bigram_lm
from parsedmarc_go_spark.streaming.daemon import _write_table

CURATION_TABLES = ("docs_redacted", "repetition_stats", "decontamination")
LM_TABLE = "lm_scores"
NB_TABLE = "nb_scores"
POSTINGS_TABLE = "postings"


def make_curation_processor(
    out_dir: str,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    lm_ref: DataFrame | None = None,
    nb_labeled: DataFrame | None = None,
    emit_postings: bool = False,
):
    """foreachBatch body for the curation stage, factored out (like the
    daemon's make_batch_processor) so idempotence and parity are
    directly testable without a streaming harness.

    ``lm_ref`` (optional) enables the CCNet LM quality pass: the
    bigram LM is trained ONCE at processor build — the same
    stream-static pattern as the benchmark n-grams — its three frames
    cached, and every micro-batch is scored against the fixed model
    into the ``lm_scores`` table. ``nb_labeled`` (optional, a frame
    with ``label``/text columns) does the same for the NB quality
    classifier into ``nb_scores``. ``emit_postings=True`` maintains an
    incremental inverted index: each batch's (term, doc_id, tf)
    postings land under its own ``__batch_id`` partition, so the
    accumulated ``postings`` table equals ``inverted_postings`` over
    the union — per-document rows, no cross-batch state, idempotent
    replay like every other table here. Like every pass the math is
    per-document against a fixed reference, so stream == batch holds
    exactly."""
    bench_ngrams = benchmark_ngrams(benchmark, n, text_col).cache()
    lm = None
    if lm_ref is not None:
        lm = tuple(f.cache() for f in train_bigram_lm(lm_ref, text_col=text_col))
    nb = None
    if nb_labeled is not None:
        nb = tuple(
            f.cache() for f in train_nb_classifier(nb_labeled, text_col=text_col)
        )

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        try:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            outputs = {
                "docs_redacted": batch.select(
                    "doc_id", pii_redact(F.col(text_col)).alias(text_col)
                ),
                "repetition_stats": repetition_stats(batch, text_col),
                "decontamination": ngram_decontaminate(
                    batch, n=n, text_col=text_col, bench_ngrams=bench_ngrams
                ),
            }
            if lm is not None:
                outputs[LM_TABLE] = lm_score(batch, *lm, text_col=text_col)
            if nb is not None:
                outputs[NB_TABLE] = nb_score(batch, nb, text_col=text_col)
            if emit_postings:
                from parsedmarc_go_spark.operators.retrieval import (
                    inverted_postings,
                )

                outputs[POSTINGS_TABLE] = inverted_postings(
                    batch, text_col=text_col
                )
            for name, df in outputs.items():
                _write_table(df, out_dir, name, batch_id)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return process_batch


def stream_curation(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    schema=None,
    max_files_per_trigger: int = 1000,
    available_now: bool = True,
    trigger_seconds: int | None = None,
    lm_ref: DataFrame | None = None,
    nb_labeled: DataFrame | None = None,
    emit_postings: bool = False,
) -> StreamingQuery:
    """readStream(parquet document shards) → curation passes →
    foreachBatch writing the curation tables (plus ``lm_scores`` /
    ``nb_scores`` when ``lm_ref`` / ``nb_labeled`` are given).
    ``schema`` defaults to the benchmark frame's schema (shards and
    eval set share the documents layout); ``maxFilesPerTrigger`` is
    the backpressure knob, as in the ingest daemon."""
    docs = (
        spark.readStream.schema(schema or benchmark.schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(landing_dir)
    )
    writer = docs.writeStream.foreachBatch(
        make_curation_processor(
            out_dir, benchmark, n, text_col, lm_ref=lm_ref,
            nb_labeled=nb_labeled, emit_postings=emit_postings,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
