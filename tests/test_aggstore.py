"""Incremental additive aggregation store (streaming/aggstore.py):
stream-over-shards must equal batch-aggregation-over-the-union, a
replayed batch must be a no-op, and compaction must preserve totals
exactly while writing the folded base across many tasks."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

# streaming aggregation-store e2e: excluded from the default (driver-visible) lane — run with -m ""
pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    from parsedmarc_go_spark.tables import load

    return load(spark, SF_DIR, "documents").select("doc_id", "text")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_token_counts_two_trigger_vocab_parity(spark, tmp_path):
    from parsedmarc_go_spark.operators.retrieval import build_vocab
    from parsedmarc_go_spark.streaming.aggstore import (
        stream_token_counts,
        vocab_snapshot,
    )

    docs = _docs(spark)
    landing = tmp_path / "landing"
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)

    docs.filter(F.col("doc_id") < 250).write.parquet(str(landing / "s1"))
    q = stream_token_counts(spark, str(landing), store, ckpt, docs.schema)
    q.awaitTermination(120)
    docs.filter(F.col("doc_id") >= 250).write.parquet(str(landing / "s2"))
    q = stream_token_counts(spark, str(landing), store, ckpt, docs.schema)
    q.awaitTermination(120)

    got = vocab_snapshot(spark, store, size=100)
    want = build_vocab(docs, size=100)
    assert _rows(got) == _rows(want)


def test_count_processor_replay_and_weighted(spark, tmp_path):
    from parsedmarc_go_spark.streaming.aggstore import (
        make_count_processor,
        read_counts,
    )

    store = str(tmp_path / "store")
    proc = make_count_processor(store, ["k"], weight_col="w")
    b0 = spark.createDataFrame([("a", 2), ("a", 3), ("b", 1)], ["k", "w"])
    b1 = spark.createDataFrame([("a", 10), ("c", 4)], ["k", "w"])
    proc(b0, 0)
    proc(b1, 1)
    before = _rows(read_counts(spark, store))
    assert before == [("a", 15), ("b", 1), ("c", 4)]
    proc(b1, 1)  # replay: own-partition overwrite, not double count
    assert _rows(read_counts(spark, store)) == before


def test_count_store_compaction_preserves_totals(spark, tmp_path):
    from parsedmarc_go_spark.streaming.aggstore import (
        compact_count_store,
        make_count_processor,
        read_counts,
    )

    store = str(tmp_path / "store")
    proc = make_count_processor(store, ["k"])
    for b in range(5):
        proc(
            spark.createDataFrame(
                [(f"k{i % 7}",) for i in range(b, b + 20)], ["k"]
            ),
            b,
        )
    before = _rows(read_counts(spark, store))
    files_before, files_after = compact_count_store(
        spark, store, keep_last=2, target_file_mb=0.001
    )
    assert _rows(read_counts(spark, store)) == before  # totals exact
    # the fold landed in a -1 base and only the last 2 batches survive
    ids = {
        r[0]
        for r in spark.read.parquet(os.path.join(store, "counts"))
        .select("__batch_id")
        .distinct()
        .collect()
    }
    assert ids == {-1, 3, 4}
    # a replay of the newest (un-folded) batch is still a no-op
    proc(
        spark.createDataFrame([(f"k{i % 7}",) for i in range(4, 24)], ["k"]),
        4,
    )
    assert _rows(read_counts(spark, store)) == before
    # the tiny target_file_mb forces the base fold across several
    # writers — the single-task-fold regression guard
    base = os.path.join(store, "counts", "__batch_id=-1")
    n_files = sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _, _, fs in os.walk(base)
    )
    assert n_files > 1, n_files


def test_stream_doc_frequencies_parity(spark, tmp_path):
    """Incremental df == batch df over everything that arrived: each
    doc contributes each distinct token once, summed across batches."""
    from parsedmarc_go_spark.streaming.aggstore import (
        read_counts,
        stream_doc_frequencies,
    )

    docs = _docs(spark)
    landing = tmp_path / "landing"
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)

    docs.filter(F.col("doc_id") < 250).write.parquet(str(landing / "s1"))
    q = stream_doc_frequencies(spark, str(landing), store, ckpt, docs.schema)
    q.awaitTermination(120)
    docs.filter(F.col("doc_id") >= 250).write.parquet(str(landing / "s2"))
    q = stream_doc_frequencies(spark, str(landing), store, ckpt, docs.schema)
    q.awaitTermination(120)

    got = _rows(read_counts(spark, store))
    want = _rows(
        docs.select(
            F.explode(
                F.array_distinct(F.split(F.lower("text"), " "))
            ).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    assert got == want
