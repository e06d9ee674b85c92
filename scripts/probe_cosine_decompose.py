"""Decompose dedup_embedding_cosine's sf2 wall (VERDICT r16 task 1):
time (a) the JVM-only chunk fan-out, (b) applyInPandas with a no-op fn,
(c) the real chunk_pairs fn, (d) the unchunked whole-block path — each
median-of-3 after one warm pass, plus the in-worker pandas time summed
via an accumulator-free side-channel (per-task perf_counter deltas
emitted as an extra column)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf2"

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from parsedmarc_go_spark.session import get_spark
from parsedmarc_go_spark.tables import load

spark = get_spark(app_name="probe-cos-decomp", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

emb = load(spark, sf_dir, "embeddings")
chunk_rows = 1024

w = Window.partitionBy("label").orderBy("vec_id")
chunked = emb.select(
    F.col("label").alias("__blk"), F.col("vec_id").alias("__id"),
    F.col("embedding").alias("__v"),
    ((F.row_number().over(w) - 1) / chunk_rows).cast("int").alias("__ci"),
    (F.ceil(F.count("*").over(Window.partitionBy("label")) / chunk_rows))
    .cast("int").alias("__nc"),
)
tasks = chunked.select(
    "__blk", "__id", "__v", "__ci",
    F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("__cj"),
).select(
    "__blk", "__id", "__v", "__ci",
    F.least("__ci", "__cj").alias("__lo"), F.greatest("__ci", "__cj").alias("__hi"),
)

out_schema = T.StructType([
    T.StructField("block", T.IntegerType(), True),
    T.StructField("vec_a", T.LongType(), True),
    T.StructField("vec_b", T.LongType(), True),
    T.StructField("cosine_sim", T.DoubleType(), True),
])
timing_schema = T.StructType([
    T.StructField("block", T.IntegerType(), True),
    T.StructField("secs", T.DoubleType(), True),
    T.StructField("nrows", T.LongType(), True),
])


def noop(key, pdf):
    return pd.DataFrame({"block": [], "vec_a": [], "vec_b": [], "cosine_sim": []})


def real_timed(key, pdf):
    t0 = time.perf_counter()
    blk, lo, hi = key
    pdf = pdf.sort_values("__id", ignore_index=True)

    def unit(sub):
        ids = sub["__id"].to_numpy()
        X = np.vstack(sub["__v"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(X, axis=1)
        n[n == 0] = 1.0
        return ids, X / n[:, None]

    if lo == hi:
        ids, U = unit(pdf)
        C = U @ U.T
    else:
        _, Ua = unit(pdf[pdf["__ci"] == lo])
        _, Ub = unit(pdf[pdf["__ci"] == hi])
        C = Ua @ Ub.T
    _ = (C >= 0.4).sum()
    return pd.DataFrame({"block": [blk], "secs": [time.perf_counter() - t0], "nrows": [len(pdf)]})


def timed(label, fn):
    fn()  # warm
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    print(f"{label}: {sorted(samples)}", flush=True)


timed("a_jvm_only_count", lambda: tasks.count())
timed("b_noop_pandas", lambda: tasks.groupBy("__blk", "__lo", "__hi").applyInPandas(noop, out_schema).collect())

rows = tasks.groupBy("__blk", "__lo", "__hi").applyInPandas(real_timed, timing_schema).collect()
print(f"c_in_worker_sum: {sum(r['secs'] for r in rows):.3f} s over {len(rows)} tasks, "
      f"max {max(r['secs'] for r in rows):.3f}, rows/task max {max(r['nrows'] for r in rows)}", flush=True)
timed("c_real_timed_wall", lambda: tasks.groupBy("__blk", "__lo", "__hi").applyInPandas(real_timed, timing_schema).collect())

from parsedmarc_go_spark.operators.similarity import cosine_neardup_pairs
timed("d_operator_chunked", lambda: cosine_neardup_pairs(emb, threshold=0.4, chunk_rows=1024).collect())
timed("e_operator_whole_block", lambda: cosine_neardup_pairs(emb, threshold=0.4, chunk_rows=None).collect())
