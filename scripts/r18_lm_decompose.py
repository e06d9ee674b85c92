"""Decompose quality_lm_score / tokenize_maxmunch walls (round-18,
guide §1): which sub-jobs carry the gate's time at sf0.1."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def timed(label, fn, n=3, warm=2):
    for _ in range(warm):
        fn()
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        samples.append(round(time.perf_counter() - t0, 3))
    samples.sort()
    print(f"{label}: {samples} median={samples[len(samples)//2]}", flush=True)


def main() -> None:
    from parsedmarc_go_spark.session import get_spark

    spark = get_spark(app_name="r18-decompose", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from parsedmarc_go_spark.operators.lm import (
        _token_pairs,
        lm_score,
        train_bigram_lm,
    )
    from parsedmarc_go_spark.tables import load

    docs = load(spark, SF_DIR, "documents")
    ref = docs.filter(F.col("doc_id") % 10 == 0)

    # --- quality_lm_score decomposition ---
    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    timed("lm: ref bigram table (groupBy w1,w2)",
          lambda: noop(train_bigram_lm(ref)[0]))
    timed("lm: vocab countDistinct", lambda: noop(train_bigram_lm(ref)[2]))
    timed("lm: corpus pair stream only", lambda: noop(_token_pairs(docs, "doc_id", "text")))

    def full():
        b, h, v = train_bigram_lm(ref)
        lm_score(docs, b, h, v).collect()

    timed("lm: full gate", full)

    # construction wall
    def construct():
        b, h, v = train_bigram_lm(ref)
        lm_score(docs, b, h, v)

    t0 = time.perf_counter()
    construct()
    print(f"lm: construction wall {time.perf_counter() - t0:.3f}s", flush=True)

    # --- tokenize_maxmunch decomposition ---
    from parsedmarc_go_spark.operators.bpe import maxmunch_encode
    from parsedmarc_go_spark.tables import spread_scan

    itext = F.when(
        F.col("doc_id") % 11 == 3, F.concat(F.col("text"), F.lit(" zz#q"))
    ).otherwise(F.col("text"))
    t = spread_scan(docs.select("doc_id", itext.alias("text")), "doc_id")
    toks = t.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    top30 = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(30).select("token")
    chars = (
        counts.select(F.explode(F.split(F.col("token"), "")).alias("token"))
        .filter(F.col("token").rlike("^[a-z0-9]$"))
        .distinct()
    )
    vocab = top30.union(chars).distinct()

    timed("mm: vocab build only", lambda: noop(vocab))
    timed("mm: distinct words only",
          lambda: noop(
              t.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"))
              .filter(F.col("word") != "").select("word").distinct()
          ))
    timed("mm: full encode", lambda: maxmunch_encode(t, vocab, max_piece_len=8).collect())

    # vocab stats: distinct words, piece length histogram
    lens = vocab.select(F.length("token").alias("l")).groupBy("l").count().collect()
    print("mm: vocab piece-length histogram:", sorted((r["l"], r["count"]) for r in lens), flush=True)
    nw = (
        t.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"))
        .filter(F.col("word") != "").select("word").distinct().count()
    )
    print("mm: distinct words:", nw, flush=True)
    wl = (
        t.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"))
        .filter(F.col("word") != "").select(F.length("word").alias("l"))
        .agg(F.max("l"), F.avg("l")).collect()
    )
    print("mm: word length max/avg:", wl, flush=True)


if __name__ == "__main__":
    main()
