"""Measured false-positive rate of the fingerprint-store Bloom sidecar
vs its configured fpp, across load factors (round 10).

The sidecar's correctness story is "false positives only"; this pins
the RATE: insert ``load × expected`` digests, probe ``n_probe`` fresh
digests through bloom_prefilter, report survivors/n_probe. At load 1.0
the measured rate should sit near the configured fpp; overload degrades
it smoothly (the documented saturation behavior), never abruptly.

Run: python scripts/bloom_fpp.py [expected fpp n_probe]. One JSON line;
paste into NOTES_r{N}.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F


def main() -> None:
    expected = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    fpp = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    n_probe = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000

    from parsedmarc_go_spark.session import local_spark
    from parsedmarc_go_spark.streaming.dedup import (
        _bloom_params,
        bloom_prefilter,
        read_bloom_words,
        update_bloom,
    )

    spark = local_spark()
    spark.sparkContext.setLogLevel("ERROR")
    m, k = _bloom_params(expected, fpp)

    def digests(lo: int, hi: int):
        return spark.range(lo, hi).select(
            F.sha2(F.col("id").cast("string"), 256).alias("ph")
        )

    rows = []
    base = tempfile.mkdtemp(prefix="bloomfpp_")
    try:
        inserted = 0
        for load in (0.5, 1.0, 2.0, 4.0):
            target = int(expected * load)
            store = os.path.join(base, "store")
            update_bloom(spark, digests(inserted, target), store, m, k)
            inserted = target
            words = read_bloom_words(spark, store)
            fresh = digests(10_000_000, 10_000_000 + n_probe)
            survivors = bloom_prefilter(fresh, words, m, k).count()
            rows.append(
                {
                    "load": load,
                    "inserted": inserted,
                    "measured_fpp": round(survivors / n_probe, 5),
                }
            )
        print(
            json.dumps(
                {
                    "metric": "bloom_measured_fpp",
                    "expected_items": expected,
                    "configured_fpp": fpp,
                    "m_bits": m,
                    "k": k,
                    "n_probe": n_probe,
                    "points": rows,
                }
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
