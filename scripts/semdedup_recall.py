"""SemDeDup dup-pair recall vs brute force (round-9 verdict task 4).

The planted-dup tests pin semdedup's keep RULE, but nothing measured
how many true cosine>=tau pairs the k-means cell blocking LOSES at cell
boundaries — the same credibility gap RECALL.json closed for IVF/LSH.
This script plants known near-dup pairs in a synthetic corpus, takes
chunked numpy brute force over ALL pairs as ground truth, and measures
the recall of semdedup's blocked pair stage (kmeans cells →
cosine_neardup_pairs with the cell as block key — exactly the
composition semdedup runs, operators/clustering.py:semdedup) across the
n_clusters grid. Alongside recall it reports the pair-work fraction
sum(|cell|^2)/N^2 — the compute the blocking saves; recall without its
work budget is meaningless.

Corpus (seeded, reproducible): N base ~ N(0,1)^dim (max background
cosine ~ sqrt(2 ln N / dim) ~ 0.56 at N=20k, far below tau=0.95) plus
P planted partners at two tiers — tight (cos ~ 0.99) and
near-threshold (cos ~ 0.965). Ground truth is the measured brute-force
pair set, never the planted design.

Usage: python scripts/semdedup_recall.py [--n-base 20000] [--pairs 200]
Appends/replaces `semdedup_pairs` rows in RECALL.json and prints a
markdown table for SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
TAU = 0.95
TIERS = ((0.12,), (0.27,))  # noise sigmas: cos ~ 1/sqrt(1+sigma^2)


def make_corpus(n_base: int, n_pairs: int, seed: int = 11):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, DIM))
    planted = []
    half = n_pairs // 2
    for i in range(n_pairs):
        sigma = TIERS[0][0] if i < half else TIERS[1][0]
        planted.append(base[i] + sigma * rng.standard_normal(DIM))
    X = np.vstack([base, np.vstack(planted)])
    return X


def true_pairs(X: np.ndarray, tau: float, chunk: int = 2000) -> set:
    """Chunked brute force: every unordered pair with cosine >= tau."""
    U = X / np.linalg.norm(X, axis=1, keepdims=True)
    n = len(U)
    out = set()
    for s in range(0, n, chunk):
        block = U[s : s + chunk] @ U.T  # (chunk, n)
        ii, jj = np.nonzero(block >= tau)
        for i, j in zip(ii + s, jj):
            if i < j:
                out.add((int(i), int(j)))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-base", type=int, default=20000)
    ap.add_argument("--pairs", type=int, default=200)
    ap.add_argument("--out", default="RECALL.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from parsedmarc_go_spark.operators.clustering import assign_cells, kmeans_fit
    from parsedmarc_go_spark.operators.similarity import cosine_neardup_pairs
    from parsedmarc_go_spark.session import get_spark

    spark = get_spark(
        app_name="semdedup-recall", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")

    X = make_corpus(args.n_base, args.pairs)
    truth = true_pairs(X, TAU)
    n = len(X)
    print(f"corpus n={n}  true pairs(cos>={TAU}) = {len(truth)}")

    corpus = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()
    corpus.count()

    def pass_pairs(n_clusters: int, seed):
        """(pair set, work fraction) for one seeded cell blocking."""
        cents, _ = kmeans_fit(corpus, k=n_clusters, max_iters=5, seed=seed)
        assigned = assign_cells(corpus, cents, "embedding", "cell").cache()
        sizes = [
            r["c"]
            for r in assigned.groupBy("cell").agg(F.count("*").alias("c")).collect()
        ]
        got = {
            (min(r.vec_a, r.vec_b), max(r.vec_a, r.vec_b))
            for r in cosine_neardup_pairs(
                assigned, threshold=TAU, block_col="cell"
            ).collect()
        }
        assigned.unpersist()
        return got, sum(s * s for s in sizes) / (n * n)

    rows = []
    for n_clusters in (4, 8, 16):
        got, work_frac = pass_pairs(n_clusters, None)
        # blocked pairs are exact within a cell -> no false positives
        assert got <= truth, sorted(got - truth)[:5]
        recall = len(got & truth) / len(truth) if truth else 1.0
        rows.append(
            {
                "operator": "semdedup_pairs",
                "config": f"n={n} tau={TAU} n_clusters={n_clusters}",
                "recall_pairs": round(recall, 3),
                "pair_work_frac": round(work_frac, 4),
            }
        )
        print(rows[-1])

    # multi-pass boundary recovery (semdedup n_passes): union the pair
    # sets of re-seeded blockings — a pair is lost only if it straddles
    # a Voronoi face in EVERY pass
    for n_clusters in (8, 16):
        got, work = pass_pairs(n_clusters, None)
        for p in (1, 2):
            extra, w = pass_pairs(n_clusters, p)
            got |= extra
            work += w
            assert got <= truth
            rows.append(
                {
                    "operator": "semdedup_pairs",
                    "config": (
                        f"n={n} tau={TAU} n_clusters={n_clusters} "
                        f"n_passes={p + 1}"
                    ),
                    "recall_pairs": round(len(got & truth) / len(truth), 3),
                    "pair_work_frac": round(work, 4),
                }
            )
            print(rows[-1])

    art = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            art = json.load(f)
    art.setdefault("results", [])
    art["results"] = [
        r for r in art["results"] if r.get("operator") != "semdedup_pairs"
    ] + rows
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1)
    print(f"wrote {len(rows)} semdedup rows to {args.out}")

    print("\n| operator | config | pair recall | pair-work frac |")
    print("|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['operator']} | {r['config']} | {r['recall_pairs']} "
            f"| {r['pair_work_frac']} |"
        )


if __name__ == "__main__":
    main()
