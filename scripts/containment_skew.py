"""Zipfian-skew proof for the PPJoin containment path (round-11,
VERDICT r10 task 1).

The bench gate corpus has a CLOSED vocabulary (~75k distinct shingles
over 50k docs, mean df ≈ 33, no df-1 tail), which is the adversarial
case for prefix filtering — the r10 negative result showed pruning is
modest there (83M exact pairs -> 14M prefix candidates). Real corpora
are Zipfian: most shingles are df-1 (can never form a pair) and the
prefix filter's rarest-first ordering rides that tail. This script
makes the claim a measurement instead of an argument.

It generates a corpus whose TOKENS are drawn from a Zipf(s)
distribution over a large vocabulary (so shingle document-frequency
has the head-heavy/tail-long shape of web text), plants a 5% quote /
10% carrier containment population (so the true-pair output is
non-trivial and recall is checkable), then at each corpus size runs

  - exact:  ngram_containment_pairs   (Σ df² self-join)
  - prefix: containment_pairs_prefix  (PPJoin prefix + positional)

and reports wall, candidate volume (Σ df² vs post-filter candidates),
and output equality. Expected shape: exact grows superlinearly with
the hot-head df² term while prefix stays ~linear in corpus size — the
gap IS the 100 TB argument.

Usage: python scripts/containment_skew.py [--sizes 10000,20000,40000]
       [--zipf 1.2] [--reps 3]
Prints a markdown table (paste into SCALE.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_zipf_corpus(out_dir: str, n_docs: int, zipf_s: float, seed: int = 11) -> str:
    """documents.parquet with Zipf-token text + planted containment.

    Tokens are ``t<k>`` for Zipf-ranked k over a vocabulary ~10x the
    corpus size (df-1 tail exists at every corpus size). Every 20th
    doc is a short pure-quote doc and every 10th a carrier that embeds
    the same cohort quote, mirroring the gate corpus's plant so the
    true-pair population scales linearly with N."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    vocab_n = 10 * n_docs
    doc_len = 40
    ids, texts = [], []
    # truncated-Zipf inverse CDF (continuous approximation of
    # P(rank=r) ∝ r^-s over [1, V]): CDF(r) = (1 - r^(1-s)) /
    # (1 - V^(1-s)), so r(u) = (1 - u·(1 - V^(1-s)))^(1/(1-s)).
    # numpy's rng.zipf is unbounded — its tail ids would make
    # vocabulary membership corpus-size-dependent. At s=1.2, V=10N this
    # gives p(rank 1) ≈ 14% — a stopword-shaped hot head — plus the
    # df-1 tail that dominates real shingle distributions.
    tail = 1.0 - vocab_n ** (1.0 - zipf_s)
    for d in range(n_docs):
        u = rng.random(doc_len)
        ranks = np.minimum(
            vocab_n,
            np.floor((1.0 - u * tail) ** (1.0 / (1.0 - zipf_s))),
        ).astype(np.int64)
        words = [f"t{r}" for r in ranks]
        cohort = d // 20
        quote = f"qa{cohort} alpha qb{cohort} bravo qc{cohort} charlie qd{cohort}"
        if d % 20 == 5:
            text = quote
        elif d % 10 == 1:
            text = " ".join(words) + " " + quote
        else:
            text = " ".join(words)
        ids.append(d)
        texts.append(text)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "documents.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}), path
    )
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10000,20000,40000")
    ap.add_argument("--zipf", type=float, default=1.2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--threshold", type=float, default=0.8)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from pyspark.sql import functions as F

    from parsedmarc_go_spark.operators.dedup import (
        _shingle_index,
        containment_pairs_prefix,
        ngram_containment_pairs,
    )
    from parsedmarc_go_spark.session import local_spark

    spark = local_spark()
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for n in sizes:
        out = f"/tmp/spark_graft_skew/{n}"
        make_zipf_corpus(out, n, args.zipf)
        docs = spark.read.parquet(os.path.join(out, "documents.parquet")).select(
            "doc_id", "text"
        )
        idx = _shingle_index(docs, "doc_id", 3)
        st = (
            idx.groupBy("shingle")
            .count()
            .agg(
                F.count("*").alias("v"),
                F.sum(F.col("count") * F.col("count")).alias("sum_f2"),
                F.sum(F.when(F.col("count") == 1, 1).otherwise(0)).alias("df1"),
            )
            .collect()[0]
        )

        def timed(fn):
            walls = []
            got = None
            for _ in range(args.reps):
                t0 = time.time()
                got = fn().collect()
                walls.append(time.time() - t0)
            return sorted(walls)[len(walls) // 2], got

        w_exact, r_exact = timed(
            lambda: ngram_containment_pairs(docs, threshold=args.threshold)
        )
        w_pref, r_pref = timed(
            lambda: containment_pairs_prefix(
                docs, threshold=args.threshold, broadcast_small_sides=True
            )
        )
        key = lambda rs: sorted((r.doc_a, r.doc_b, r.shared) for r in rs)  # noqa: E731
        equal = key(r_exact) == key(r_pref)
        rows.append(
            (n, st["v"], int(st["df1"]), int(st["sum_f2"]), len(r_exact), w_exact, w_pref, equal)
        )
        print(
            f"n={n}: vocab={st['v']} df1_frac={st['df1']/st['v']:.2f} "
            f"sum_f2={st['sum_f2']} pairs={len(r_exact)} "
            f"exact={w_exact:.2f}s prefix={w_pref:.2f}s equal={equal}",
            flush=True,
        )

    print("\n| docs | distinct shingles | df-1 share | Σdf² | true pairs | exact s | prefix s | speedup | equal |")
    print("|---|---|---|---|---|---|---|---|---|")
    for n, v, df1, f2, np_, we, wp, eq in rows:
        print(
            f"| {n} | {v} | {df1 / v:.0%} | {f2} | {np_} | {we:.2f} | {wp:.2f} "
            f"| {we / wp:.1f}x | {eq} |"
        )


if __name__ == "__main__":
    main()
