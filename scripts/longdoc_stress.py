"""Run the dedup/text gate subset against the long-document corpus
(scripts/make_longdoc.py) and print per-gate walls + row counts — the
round-17 stress table for SCALE.md. Also checks RECALL under size
skew: the planted giant near-dup pair must be found by the minhash and
paragraph paths.

Usage: python scripts/longdoc_stress.py [/tmp/spark_graft_longdoc]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATES = [
    "dedup_exact",
    "dedup_paragraph",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_keep_best_containment_prefix",
    "dedup_substring_spans",
    "text_quality_score",
    "text_token_stats",
    "doc_fingerprint",
    "decontaminate_ngram",
    "vocab_bpe_pairs",
    "tokenize_maxmunch",
    "sample_token_budget",
    "curation_pipeline",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_longdoc"
    from parsedmarc_go_spark.session import get_spark

    spark = get_spark(
        app_name="longdoc-stress", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    from parsedmarc_go_spark.plans import QUERIES

    out = {}
    for name in GATES:
        if name not in QUERIES:
            continue
        try:
            t0 = time.perf_counter()
            rows = QUERIES[name](spark, sf_dir).collect()
            wall = time.perf_counter() - t0
            t0 = time.perf_counter()
            rows = QUERIES[name](spark, sf_dir).collect()
            warm = time.perf_counter() - t0
            out[name] = {"cold_s": round(wall, 2), "warm_s": round(warm, 2),
                         "rows": len(rows)}
        except Exception as e:
            out[name] = {"error": str(e)[:200]}
        print(json.dumps({name: out[name]}), flush=True)

    # recall under size skew: the giant dup (doc 5000 ~ doc 0) must be
    # a found pair on the minhash path (jaccard ≈ 1)
    from parsedmarc_go_spark.operators.dedup import minhash_lsh_pairs
    from parsedmarc_go_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.7).collect()
    giant_pair = [
        (r["doc_a"], r["doc_b"]) for r in pairs if r["doc_a"] == 0 or r["doc_b"] == 0
    ]
    print(json.dumps({"giant_dup_found": giant_pair, "total_pairs": len(pairs)}))


if __name__ == "__main__":
    main()
