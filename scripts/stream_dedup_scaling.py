"""Per-batch wall-clock vs fingerprint-store size for the round-10
co-partitioned store layout (VERDICT r9 task 2 'Done' criterion: a
NOTES measurement of per-batch wall vs store size).

Drives mode="paragraph" over N synthetic batches of constant size —
each batch has a fixed fraction of paragraphs repeated from a shared
pool (so the store keeps growing but never saturates) — and records
wall seconds + store row count per batch. Under the r9 layout every
batch paid an O(store) distinct + shuffle before the join; under the
r10 layout the store side is a bucket-pruned SCAN through a broadcast
semi-join, so per-batch wall should grow only with the scan, never a
shuffle. Run: python scripts/stream_dedup_scaling.py [n_batches
batch_docs bloom(0|1)]. Prints one JSON line; paste into NOTES_r{N}.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    batch_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    bloom = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
    # seeded mode: batch 0 lands seed_docs documents so later batches
    # probe a store much larger than themselves — the regime the bloom
    # pre-probe exists for (store >> batch)
    seed_docs = int(sys.argv[4]) if len(sys.argv) > 4 else batch_docs
    # bloom sizing: the sidecar only undercuts the store once the store
    # outgrows the bloom's FIXED footprint, so size it to the expected
    # corpus — an oversized bloom is sparse and as big as the store
    # (the sizing contract in make_dedup_processor's docstring)
    expected = (
        int(sys.argv[5]) if len(sys.argv) > 5 else 4 * (seed_docs or 1)
    )

    from parsedmarc_go_spark.session import local_spark
    from parsedmarc_go_spark.streaming.dedup import (
        make_dedup_processor,
        read_fingerprints,
    )

    # local_spark, not bare get_spark: the masterless form skips the
    # local-mode driver-heap bump and the default 1g JVM OOMs silently
    # partway through longer runs
    spark = local_spark()
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="sds_")
    out, store = f"{base}/out", f"{base}/store"
    proc = make_dedup_processor(
        out, store, bloom=bloom, bloom_expected_items=expected
    )

    def batch(b: int):
        # 4 paragraphs/doc: one from a 500-paragraph shared pool
        # (cross-batch repeats), three unique to the doc
        d = F.col("id")
        text = F.concat_ws(
            "\n\n",
            F.concat(F.lit("shared-pool-"), (d % 500).cast("string")),
            F.concat(F.lit("uniq-a-"), d.cast("string")),
            F.concat(F.lit("uniq-b-"), d.cast("string")),
            F.concat(F.lit("uniq-c-"), d.cast("string")),
        )
        lo = 0 if b == 0 else seed_docs + (b - 1) * batch_docs
        hi = lo + (seed_docs if b == 0 else batch_docs)
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"), text.alias("text")
        )

    rows = []
    try:
        for b in range(n_batches):
            t0 = time.perf_counter()
            proc(batch(b), b)
            wall = round(time.perf_counter() - t0, 3)
            store_rows = read_fingerprints(spark, store).count()
            rows.append({"batch": b, "wall_sec": wall, "store_rows": store_rows})
        print(
            json.dumps(
                {
                    "metric": "stream_dedup_per_batch_wall",
                    "mode": "paragraph",
                    "bloom": bloom,
                    "batch_docs": batch_docs,
                    "seed_docs": seed_docs,
                    "bloom_expected_items": expected,
                    "batches": rows,
                }
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
