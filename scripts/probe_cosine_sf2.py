"""Isolate-run dedup_embedding_cosine at a given SF dir (VERDICT r16
task 1): quiet session, warm-up, timed passes, physical plan dump, and
a task-size picture via the Spark status API. Usage:

    python scripts/probe_cosine_sf2.py /tmp/spark_graft_sf2 [chunk_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf2"
chunk = None if len(sys.argv) > 2 and sys.argv[2] == "none" else (
    int(sys.argv[2]) if len(sys.argv) > 2 else 1024
)

from parsedmarc_go_spark.session import get_spark

spark = get_spark(
    app_name="probe-cosine",
    master="local[32]",
    shuffle_partitions=32,
)
spark.sparkContext.setLogLevel("ERROR")

from parsedmarc_go_spark.operators.similarity import cosine_neardup_pairs
from parsedmarc_go_spark.tables import load

emb = load(spark, sf_dir, "embeddings")
n = emb.count()
blocks = emb.groupBy("label").count().orderBy("count", ascending=False)
top = blocks.limit(5).collect()
nblk = blocks.count()
print(f"rows={n} blocks={nblk} top_block_sizes={[r['count'] for r in top]}")

df = cosine_neardup_pairs(emb, threshold=0.4, chunk_rows=chunk)
for i in range(5):
    t0 = time.perf_counter()
    cnt = cosine_neardup_pairs(emb, threshold=0.4, chunk_rows=chunk).collect()
    print(f"pass {i}: {time.perf_counter() - t0:.3f} s rows={len(cnt)}")

df.explain("formatted")
