"""Scale-curve harness for the dedup/LSH path (round-4 verdict task 6).

The 100 TB claims for the text-dedup family were design arguments; this
script turns them into measured points. It generates documents corpora
with the SAME shape as the driver's testdata (doc_id, ~60-word text
from a small vocabulary, lang, source, n_chars) at several sizes with a
FIXED near-duplicate fraction (5% of docs are light mutations of an
earlier doc — so LSH candidate density stays constant as N grows), then
times dedup_exact, dedup_minhash_lsh, and dedup_keep_best at each size
and fits the log-log slope: wall ≈ c·N^alpha. alpha ≈ 1 means the
operator scales linearly in corpus size, which is the property that
survives a 1000-executor 100 TB run; alpha ≈ 2 would flag a hidden
all-pairs term.

Usage: python scripts/scale_curve.py [--sizes 5000,10000,20000,40000]
Writes corpora under /tmp/spark_graft_scale/ and prints a markdown
table + fitted slopes (paste into SCALE.md).
"""

from __future__ import annotations

import argparse
import math
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = (
    "spark batch stream table row column key value hash sort merge scan "
    "filter group agg join window part query plan data fast slow big small "
    "line order cache shard split index"
).split()
LANGS = ["en", "zh", "de", "fr", "es"]


def make_corpus(out_dir: str, n_docs: int, seed: int = 42, dup_frac: float = 0.05) -> str:
    """Write documents.parquet shaped like the driver's testdata."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    texts: list[str] = []
    base_ids: list[int] = []
    for i in range(n_docs):
        if base_ids and rng.random() < dup_frac:
            # near-duplicate: mutate ~3 words of a BASE doc (never a
            # mutated one) so cluster diameter stays bounded as N grows —
            # matching the web-dedup shape where boilerplate clusters are
            # small relative to the corpus; copy-of-copy chains would make
            # label-propagation rounds grow with N and measure the
            # generator, not the operator
            words = texts[rng.choice(base_ids)].split()
            for _ in range(3):
                words[rng.randrange(len(words))] = rng.choice(VOCAB)
            texts.append(" ".join(words))
        else:
            n_words = rng.randint(50, 70)
            texts.append(" ".join(rng.choice(VOCAB) for _ in range(n_words)))
            base_ids.append(i)
    table = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([LANGS[i % len(LANGS)] for i in range(n_docs)], pa.string()),
            "source": pa.array([f"src{i % 7}" for i in range(n_docs)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, os.path.join(out_dir, "documents.parquet"))
    return out_dir


# dedup_keep_best (exact pair graph, the oracle twin) is included
# deliberately: its Σfreq² pair finder is DOCUMENTED as not the scale
# path, and the curve shows why — contrast with the minhash-backed
# variant that the 100 TB pipeline runs.
OPERATORS = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_keep_best_minhash",
    "dedup_keep_best",
]


def make_embeddings(
    out_dir: str,
    n_vecs: int,
    dim: int = 64,
    seed: int = 42,
    per_label: int = 50,
    noise: float = 0.15,
) -> str:
    """embeddings.parquet shaped like the driver's testdata (vec_id,
    array<float> embedding, int label), with label-clustered vectors so
    blocking/LSH behave like a real near-dup corpus. Block COUNT scales
    with N (size stays ~per_label): the block key is a bounded partition
    key (simhash band, domain, shard), so production growth adds blocks
    rather than inflating one — the shape under which the blocked
    operators' claimed linearity is even well-defined. ``noise`` sets
    cluster tightness: 0.15 → dense near-dup clusters (the ANN-curve
    default); >=2 → label nearly uncorrelated with direction, matching
    the driver testdata's sparse-pair statistics (sf0.01: 5 pairs pass
    cosine>=0.4 out of 12k same-label candidates)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    n_labels = max(1, n_vecs // per_label)
    labels = (np.arange(n_vecs) % n_labels).astype(np.int32)
    centers = rng.normal(size=(n_labels, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = (centers[labels] + noise * rng.normal(size=(n_vecs, dim))).astype(np.float32)
    table = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, os.path.join(out_dir, "embeddings.parquet"))
    return out_dir


# The similarity/ANN + text families (round-5 verdict task 5): timed on
# generated embedding corpora (documents too, for tfidf). The probed-IVF
# entry is the INDEXED path — the one-time build_ivf_index cost is off
# the clock by design (it amortizes over every query); the probe should
# stay near-flat because partition pruning reads nprobe/n_cells of the
# corpus no matter how big N gets.
ANN_OPS = [
    "ann_topk_bruteforce",
    "ann_lsh_topk",
    "dedup_embedding_cosine",
    "text_tfidf_topk",
    "ann_ivf_indexed_probe",
]


def ann_points(spark, root: str, sizes: list[int]) -> tuple[dict, dict]:
    """Generate embeddings+documents corpora and prebuild one IVF index
    per point; returns (points, extra_queries)."""
    from parsedmarc_go_spark.operators.clustering import build_ivf_index, ivf_topk_indexed
    from parsedmarc_go_spark.operators.similarity import query_vector
    from parsedmarc_go_spark.tables import load

    points = {}
    for n in sizes:
        d = os.path.join(root, f"ann{n}")
        make_embeddings(d, n)
        make_corpus(d, n)  # documents.parquet for text_tfidf_topk
        build_ivf_index(load(spark, d, "embeddings"), os.path.join(d, "ivf_index"), n_cells=16)
        points[n] = d

    def probe(spark, sf_dir):
        emb = load(spark, sf_dir, "embeddings")
        return ivf_topk_indexed(
            spark, os.path.join(sf_dir, "ivf_index"), query_vector(emb, 0), k=10, nprobe=4
        )

    return points, {"ann_ivf_indexed_probe": probe}


# Representative of each analytics family: scan+agg (a1/a14), conditional
# agg (a4), broadcast join + agg (j1), broadcast interval join (j3b),
# window dedup (w1), explode (p6), distinct (a9). Timed across the
# driver's own sf0.001/0.01/0.1 testdata — two decades of row scale.
ANALYTICS_OPS = [
    "a1_daily_volume",
    "a4_compliance_rate",
    "a14_daily_summary",
    "j1_fact_dim_join",
    "j3b_geoip_range_join",
    "w1_latest_by_key",
    "p6_explode_tokens",
    "a9_distinct_exact",
]

# The tokenizer family (round 10): training gates should scale with
# the DISTINCT-WORD table (sublinear in corpus rows — word_freqs
# saturates as the vocabulary closes over the generator's word list),
# and the encoders with corpus rows (the per-occurrence work is a
# join; the DP itself is distinct-word-sized). Timed across the
# driver's own testdata decades like the analytics family.
TOKENIZER_OPS = [
    "vocab_bpe_pairs",
    "vocab_unigram_seed",
    "vocab_unigram_pieces",
    "tokenize_maxmunch",
    "retrieval_hybrid_rerank",
]


def run_curve(spark, queries, ops, points: dict, unit: str) -> None:
    """Time each op at each (label -> sf_dir) point, median of 3 after a
    warm-up, fit log-log slope vs the numeric label."""
    for op in ops:  # warm-up at the smallest point: JIT/codegen off the clock
        queries[op](spark, next(iter(points.values()))).collect()
    walls: dict[str, dict[float, float]] = {op: {} for op in ops}
    for label, d in points.items():
        for op in ops:
            samples = []
            for _ in range(3):
                # drop frames persisted by a previous run so samples are
                # independent (accumulated caches skew later GC behavior)
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                queries[op](spark, d).collect()
                samples.append(time.perf_counter() - t0)
            walls[op][label] = sorted(samples)[1]
    labels = list(points)
    header = "| operator | " + " | ".join(f"{unit}={n}" for n in labels) + " | fitted alpha |"
    print(header)
    print("|" + "---|" * (len(labels) + 2))
    for op in ops:
        xs = [math.log(n) for n in labels]
        ys = [math.log(walls[op][n]) for n in labels]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        alpha = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        cells = " | ".join(f"{walls[op][n]:.2f} s" for n in labels)
        print(f"| {op} | {cells} | {alpha:.2f} |")


def run_cc_curve(spark) -> None:
    """Chain graphs are the worst case for min-label propagation
    (rounds = diameter) and the design case for large-star/small-star
    (rounds = O(log n)). Wall-clock here is driver-round-dominated, so
    the number that matters is ROUNDS; both are reported. Min-label is
    only run on chains short enough to finish (its wall explodes
    linearly — which is the point)."""
    import time as _t

    from pyspark.sql import functions as F

    from parsedmarc_go_spark.operators.dedup import (
        neardup_clusters,
        neardup_clusters_bigstar,
    )

    def chain(n: int):
        return spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
        )

    print("| algorithm | chain length | rounds | wall | correct |")
    print("|---|---|---|---|---|")
    for algo_name, algo, cap_for in (
        ("min-label", neardup_clusters, lambda n: n + 2),
        ("large/small-star", neardup_clusters_bigstar, lambda n: 50),
    ):
        for n in (100, 1000, 10000):
            if algo_name == "min-label" and n > 100:
                print(f"| {algo_name} | {n} | {n} (= diameter) | (skipped) | — |")
                continue
            stats: dict = {}
            t0 = _t.perf_counter()
            out = algo(chain(n), max_iterations=cap_for(n), stats=stats)
            ok = out.filter(F.col("cluster_id") != 0).count() == 0 and out.count() == n
            wall = _t.perf_counter() - t0
            print(f"| {algo_name} | {n} | {stats['rounds']} | {wall:.1f} s | {ok} |")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="5000,10000,20000,40000")
    ap.add_argument("--root", default="/tmp/spark_graft_scale")
    ap.add_argument(
        "--analytics",
        action="store_true",
        help="time the analytics/join families across the driver's sf0.001/0.01/0.1 "
        "testdata instead of generating dedup corpora",
    )
    ap.add_argument(
        "--ann",
        action="store_true",
        help="time the similarity/ANN + text families on generated embedding corpora",
    )
    ap.add_argument(
        "--cc",
        action="store_true",
        help="time connected-components algorithms on chain-shaped graphs "
        "(the adversarial case for min-label propagation)",
    )
    ap.add_argument(
        "--tokenizer",
        action="store_true",
        help="time the round-10 tokenizer/retrieval family across the "
        "driver's sf0.001/0.01/0.1 testdata",
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from parsedmarc_go_spark.plans import QUERIES
    from parsedmarc_go_spark.session import get_spark

    spark = get_spark(app_name="scale-curve", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    if args.cc:
        run_cc_curve(spark)
        return

    if args.analytics:
        points = {
            sf: f"/root/testdata/sf{sf}" for sf in (0.001, 0.01, 0.1)
        }
        run_curve(spark, QUERIES, ANALYTICS_OPS, points, unit="sf")
        return

    if args.tokenizer:
        points = {
            sf: f"/root/testdata/sf{sf}" for sf in (0.001, 0.01, 0.1)
        }
        run_curve(spark, QUERIES, TOKENIZER_OPS, points, unit="sf")
        return

    if args.ann:
        points, extra = ann_points(spark, args.root, sizes)
        run_curve(spark, {**QUERIES, **extra}, ANN_OPS, points, unit="N")
        return

    dirs = {n: make_corpus(os.path.join(args.root, f"n{n}"), n) for n in sizes}
    run_curve(spark, QUERIES, OPERATORS, dirs, unit="N")


if __name__ == "__main__":
    main()
