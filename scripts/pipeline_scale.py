"""End-to-end scale curve for the composed curation pipeline
(round-13, VERDICT r12 task 2).

The five stage machineries are individually proven ~linear (SCALE.md
rounds 4-11); this measures the COMPOSITION — checkpoint
materializations, the six-branch fate union, and the doc_id anti-join
glue — which is what a 100 TB run actually executes. Corpus: Zipfian
token text (the containment_skew.py generator's distribution — df-1
tail + stopword-shaped head, i.e. real-web shingle statistics, unlike
the closed-vocabulary bench corpus) with the GATE'S OWN plant applied
on top via plans.curation._pipeline_corpus, so every fate class is
populated at every size and the measured run is semantically the
driver-checked gate, just bigger.

Two modes per size:
  - local:    localCheckpoint stage boundaries (the bench/gate posture)
  - reliable: checkpoint_dir parquet boundaries (the restartable 100 TB
              posture; fresh dir per rep, so the number includes every
              stage WRITE — the overhead share is (reliable-local)/reliable)

Usage: python scripts/pipeline_scale.py [--sizes 10000,20000,40000,80000]
Prints a markdown table + fitted log-log alphas (paste into SCALE.md).
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(out_dir: str, n_docs: int, zipf_s: float = 1.2, seed: int = 11) -> None:
    """documents.parquet with Zipf-token text and the driver-testdata
    column set (doc_id, text, lang, source, n_chars) so
    _pipeline_corpus can plant its fate classes on it unchanged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    vocab_n = 10 * n_docs
    doc_len = 40
    # truncated-Zipf inverse CDF (containment_skew.py's generator):
    # bounded vocabulary so membership isn't corpus-size-dependent
    tail = 1.0 - vocab_n ** (1.0 - zipf_s)
    u = rng.random((n_docs, doc_len))
    ranks = np.minimum(
        vocab_n, np.floor((1.0 - u * tail) ** (1.0 / (1.0 - zipf_s)))
    ).astype(np.int64)
    texts = [" ".join(f"t{r}" for r in row) for row in ranks]
    table = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en", "zh", "de", "fr", "es"][i % 5] for i in range(n_docs)),
            "source": pa.array(f"src{i % 7}" for i in range(n_docs)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, os.path.join(out_dir, "documents.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10000,20000,40000,80000")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--root", default="/tmp/spark_graft_pipescale")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from pyspark.sql import functions as F

    from parsedmarc_go_spark.operators.curation import curation_pipeline
    from parsedmarc_go_spark.plans.curation import _pipeline_corpus
    from parsedmarc_go_spark.session import get_spark

    spark = get_spark(
        app_name="pipeline-scale", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    # the gate's exact parameters (plans/curation.py::curation_pipeline_q)
    kw = dict(budget=2000, quality_thresholds={"max_mean_word_len": 4.5})

    def run(corpus, bench, **extra):
        return curation_pipeline(corpus, bench, **kw, **extra).count()

    rows = []
    for n in sizes:
        d = os.path.join(args.root, f"n{n}")
        make_corpus(d, n)
        t = _pipeline_corpus(spark, d)
        bench = t.filter(F.col("doc_id") % 50 == 0)
        corpus = t.filter(F.col("doc_id") % 50 != 0)

        run(corpus, bench)  # warm-up: JIT/codegen off the clock
        w_local, w_rel, n_out = [], [], 0
        for rep in range(args.reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n_out = run(corpus, bench)
            w_local.append(time.perf_counter() - t0)

            ckpt = os.path.join(args.root, f"ckpt_{n}_{rep}")
            shutil.rmtree(ckpt, ignore_errors=True)
            t0 = time.perf_counter()
            n_rel = run(corpus, bench, checkpoint_dir=ckpt)
            w_rel.append(time.perf_counter() - t0)
            assert n_rel == n_out, (n_rel, n_out)
            shutil.rmtree(ckpt, ignore_errors=True)
        lo = sorted(w_local)[len(w_local) // 2]
        re_ = sorted(w_rel)[len(w_rel) // 2]
        rows.append((n, n_out, lo, re_))
        print(
            f"n={n}: fates={n_out} local={lo:.2f}s reliable={re_:.2f}s "
            f"ckpt_share={(re_ - lo) / re_:.0%}",
            flush=True,
        )

    def alpha(idx: int) -> float:
        xs = [math.log(r[0]) for r in rows]
        ys = [math.log(r[idx]) for r in rows]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )

    print("\n| docs | fates | local s | reliable s | ckpt overhead share |")
    print("|---|---|---|---|---|")
    for n, n_out, lo, re_ in rows:
        print(f"| {n} | {n_out} | {lo:.2f} | {re_:.2f} | {(re_ - lo) / re_:.0%} |")
    if len(rows) > 1:
        print(f"\nfitted alpha: local {alpha(2):.2f}, reliable {alpha(3):.2f}")


if __name__ == "__main__":
    main()
