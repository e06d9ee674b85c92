"""Stream-vs-batch parity for the curation stage
(streaming/curation.py): two triggers over two document shards must
produce exactly the tables the batch operators produce over the union,
and a replayed batch_id must leave every table unchanged."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _rows(df, key="doc_id"):
    return sorted([tuple(r) for r in df.collect()])


def test_stream_curation_two_trigger_parity(spark, tmp_path):
    from parsedmarc_go_spark.operators.curation import (
        ngram_decontaminate,
        pii_redact,
        repetition_stats,
    )
    from parsedmarc_go_spark.streaming.curation import stream_curation
    from parsedmarc_go_spark.streaming.daemon import read_stream_table
    from parsedmarc_go_spark.tables import load

    from parsedmarc_go_spark.operators.classify import nb_score, train_nb_classifier
    from parsedmarc_go_spark.operators.lm import lm_score, train_bigram_lm

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    benchmark = docs.filter(F.col("doc_id") % 50 == 0)
    lm_ref = docs.filter(F.col("doc_id") % 10 == 0)
    m = F.col("doc_id") % 10
    nb_labeled = docs.filter((m == 0) | (m == 5)).select(
        F.when(m == 0, F.lit("hq")).otherwise(F.lit("lq")).alias("label"), "text"
    )

    landing = tmp_path / "landing"
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)

    # trigger 1: first shard lands
    docs.filter(F.col("doc_id") < 250).write.parquet(str(landing / "shard1"))
    q = stream_curation(
        spark, str(landing), out, ckpt, benchmark, lm_ref=lm_ref,
        nb_labeled=nb_labeled, emit_postings=True,
    )
    q.awaitTermination(120)

    # trigger 2: second shard lands, same checkpoint resumes
    docs.filter(F.col("doc_id") >= 250).write.parquet(str(landing / "shard2"))
    q = stream_curation(
        spark, str(landing), out, ckpt, benchmark, lm_ref=lm_ref,
        nb_labeled=nb_labeled, emit_postings=True,
    )
    q.awaitTermination(120)

    got_red = read_stream_table(spark, out, "docs_redacted")
    got_rep = read_stream_table(spark, out, "repetition_stats")
    got_dec = read_stream_table(spark, out, "decontamination")
    got_lm = read_stream_table(spark, out, "lm_scores")
    got_nb = read_stream_table(spark, out, "nb_scores")

    want_red = docs.select("doc_id", pii_redact(F.col("text")).alias("text"))
    want_rep = repetition_stats(docs)
    want_dec = ngram_decontaminate(docs, benchmark)
    want_lm = lm_score(docs, *train_bigram_lm(lm_ref))
    want_nb = nb_score(docs, train_nb_classifier(nb_labeled))

    assert _rows(got_red) == _rows(want_red)
    assert _rows(got_rep) == _rows(want_rep)
    assert _rows(got_dec) == _rows(want_dec)
    # per-doc LM/NB math against models trained once from the same
    # fixed reference slices -> grid-exact scores match batch
    # bit-for-bit
    assert _rows(got_lm) == _rows(want_lm)
    assert _rows(got_nb) == _rows(want_nb)
    # incremental inverted index: accumulated postings == batch
    # postings over the union (per-document rows, no cross-batch state)
    from parsedmarc_go_spark.operators.retrieval import inverted_postings

    got_post = read_stream_table(spark, out, "postings")
    assert _rows(got_post) == _rows(inverted_postings(docs))


def test_curation_processor_replay_idempotent(spark, tmp_path):
    from parsedmarc_go_spark.streaming.curation import (
        CURATION_TABLES,
        LM_TABLE,
        make_curation_processor,
    )
    from parsedmarc_go_spark.streaming.daemon import read_stream_table
    from parsedmarc_go_spark.tables import load

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    benchmark = docs.filter(F.col("doc_id") % 50 == 0)
    lm_ref = docs.filter(F.col("doc_id") % 10 == 0)
    out = str(tmp_path / "curated")
    proc = make_curation_processor(out, benchmark, lm_ref=lm_ref)
    tables = CURATION_TABLES + (LM_TABLE,)

    shard = docs.filter(F.col("doc_id") < 100)
    proc(shard, 0)
    before = {t: _rows(read_stream_table(spark, out, t)) for t in tables}
    proc(shard, 0)  # crash-and-replay of the same batch_id
    after = {t: _rows(read_stream_table(spark, out, t)) for t in tables}
    assert before == after
