"""IVF-PQ recall harness: the same planted-neighbor corpus and
protocol as scripts/ann_recall.py, measuring the ADC-only and
shortlist+rerank operating points of operators/pq.py across nprobe.

Alongside recall@10 and the row-scan fraction it reports bytes_frac —
the fraction of full-precision corpus BYTES the probe reads, which is
where PQ earns its keep: at m=8 byte codes per 64-dim float32 vector
the probed rows cost 8+64 bytes (refine layout) or 8 bytes
(codes-only) instead of 256.

Usage: python scripts/pq_recall.py  → appends rows to RECALL.json and
prints a markdown table for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ann_recall import K, make_corpus  # noqa: E402

M, KS = 8, 16
DIM = 64
FULL_BYTES = DIM * 4  # float32 baseline
REFINE_BYTES = M + DIM  # codes + int8 refine copy


def main() -> None:
    from parsedmarc_go_spark.operators.pq import (
        build_ivf_pq_index,
        ivf_pq_topk_indexed,
        load_ivf_centroids,
    )
    from parsedmarc_go_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="pq-recall", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    corpus_rows, qrows, truth = make_corpus(2000, 20)
    n_total = len(corpus_rows)
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, label int, embedding array<double>"
    ).cache()
    corpus.count()

    idx = "/tmp/spark_graft_recall/ivfpq_idx"
    build_ivf_pq_index(corpus, idx, n_cells=16, m=M, ks=KS, max_iters=5)
    cents = load_ivf_centroids(spark, idx)
    cell_rows = {
        r["cell"]: r["n"]
        for r in spark.read.parquet(idx)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    results: list[dict] = []
    for nprobe in (1, 2, 4):
        for rerank in (0, 50):
            hits, scanned = 0, 0
            for qi, qv in qrows:
                q = spark.createDataFrame([(qv,)], "q array<double>")
                got = {
                    r.vec_id
                    for r in ivf_pq_topk_indexed(
                        spark, idx, q, k=K, nprobe=nprobe, rerank=rerank
                    ).collect()
                }
                hits += len(got & truth[qi])
                uq = np.array(qv) / np.linalg.norm(qv)
                ranked = sorted(
                    range(len(cents)),
                    key=lambda i: (-float(np.dot(cents[i], uq)), i),
                )[:nprobe]
                scanned += sum(cell_rows.get(c, 0) for c in ranked)
            scan_frac = scanned / (n_total * len(qrows))
            results.append(
                {
                    "operator": "ivf_pq_topk_indexed",
                    "config": f"n_cells=16 m={M} ks={KS} nprobe={nprobe} rerank={rerank}",
                    "recall_at_10": round(hits / (K * len(qrows)), 3),
                    "scan_frac": round(scan_frac, 3),
                    "bytes_frac": round(scan_frac * REFINE_BYTES / FULL_BYTES, 4),
                }
            )

    print("| operator | config | recall@10 | scan_frac | bytes_frac |")
    print("|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['operator']} | {r['config']} | {r['recall_at_10']} "
            f"| {r['scan_frac']} | {r['bytes_frac']} |"
        )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "RECALL.json"
    )
    with open(out) as fh:
        record = json.load(fh)
    record["results"] = [
        e for e in record["results"] if e.get("operator") != "ivf_pq_topk_indexed"
    ] + results
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
        fh.write("\n")
    print(f"appended {len(results)} rows to {out}")
    spark.stop()


if __name__ == "__main__":
    main()
