"""One-off wall timer for the containment family at an arbitrary SF dir.

Round-16 task 1 feedback loop: fresh-session walls for the containment
gates (the r15 stress pass's 2.46x sf2/sf1 outlier) before/after the
index-side positional cut. One warm-up pass per gate, then N timed
fresh-query passes; prints fresh (first timed) and median.

The action is ``collect()``, NOT ``count()`` (round-17 correction —
the original count() walls under-read the keep gates by up to 15x):
the keep gates end in ``docs LEFT JOIN drops`` where ``drops`` is an
aggregate ON the join key, so under a count() Catalyst proves the
right side duplicate-free, prunes its columns, ELIMINATES the join —
and with it the whole candidate/verify pipeline: count() measured
only the eager build-time work (cache materialization + sizing
probe). A timing action must drain the real output columns.

Usage: python scripts/containment_walls.py /tmp/spark_graft_sf1 [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATES = [
    "dedup_containment",
    "dedup_keep_best_containment",
    "dedup_keep_best_containment_prefix",
]


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    gates = sys.argv[3].split(",") if len(sys.argv) > 3 else GATES
    from parsedmarc_go_spark.session import get_spark

    spark = get_spark(
        app_name="containment-walls", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    from parsedmarc_go_spark.plans import QUERIES

    out = {}
    for g in gates:
        fn = QUERIES[g]
        fn(spark, sf_dir).collect()  # warm-up (JIT/codegen), off the clock
        walls = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn(spark, sf_dir).collect()
            walls.append(round(time.monotonic() - t0, 3))
        out[g] = {"passes": walls, "median": round(statistics.median(walls), 3)}
        print(json.dumps({g: out[g]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "gates": out}))


if __name__ == "__main__":
    main()
