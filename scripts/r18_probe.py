"""Round-18 measurement probe (guide §1: measure first).

Isolates the round's target gates on a quiet local[32] session with the
bench's own protocol (2 warm-up passes, 3 timed collect() passes,
median), dumps .explain("formatted") for each to plans/r18/<name>_<tag>.txt,
and decomposes construction vs execution wall for the py4j-heavy
builders (minhash, curation_pipeline).

Usage: python scripts/r18_probe.py [before|after] [gate ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = set(sys.argv[2:])

GATES = [
    "quality_lm_score",
    "tokenize_maxmunch",
    "dedup_minhash_lsh",
    "retrieval_hybrid_rerank",
    "curation_pipeline",
    "semdedup_embeddings",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r18")


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    from parsedmarc_go_spark.session import get_spark

    spark = get_spark(
        app_name="r18-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    from parsedmarc_go_spark.plans import QUERIES

    gates = [g for g in GATES if not ONLY or g in ONLY]
    results: dict[str, dict] = {}
    for name in gates:
        spark.sparkContext.setJobDescription(f"r18-probe warmup {name}")
        # construction wall: time to BUILD the DataFrame (py4j/analysis),
        # measured on the second build so one-time imports don't alias in
        QUERIES[name](spark, SF_DIR)
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        construct = time.perf_counter() - t0
        # plan dump
        plan = df._jdf.queryExecution().explainString(
            spark.sparkContext._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(OUT_DIR, f"{name}_{TAG}.txt"), "w") as fh:
            fh.write(plan)
        # warm twice, time 3x (bench protocol)
        for _ in range(2):
            QUERIES[name](spark, SF_DIR).collect()
        samples = []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"r18-probe timed {name}")
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).collect()
            samples.append(round(time.perf_counter() - t0, 3))
        samples.sort()
        results[name] = {
            "construct_s": round(construct, 3),
            "samples": samples,
            "median": samples[1],
            "exchanges": plan.count("Exchange"),
        }
        print(f"{name}: construct={construct:.3f}s samples={samples} "
              f"exchanges={plan.count('Exchange')}", flush=True)

    import json

    print(json.dumps({"tag": TAG, "sf_dir": SF_DIR, "cpus": CPUS, "gates": results}))


if __name__ == "__main__":
    main()
