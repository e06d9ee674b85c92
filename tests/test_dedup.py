"""LSH-family operators vs their exact counterparts (the oracle-less
queries get their correctness story here)."""

from __future__ import annotations

from parsedmarc_go_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    with_simhash,
)
from parsedmarc_go_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    query_vector,
)
from parsedmarc_go_spark.tables import load
from tests.conftest import SF_CORRECT, SF_SMOKE


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.select("doc_a", "doc_b").collect()}


def test_minhash_lsh_matches_exact_sf001(spark):
    docs = load(spark, SF_SMOKE, "documents")
    exact = _pairs(ngram_jaccard_pairs(docs, threshold=0.7))
    lsh = _pairs(minhash_lsh_pairs(docs, threshold=0.7))
    assert lsh <= exact, "LSH must never emit a pair below the verified threshold"
    missed = exact - lsh
    assert not missed, f"LSH missed pairs at this corpus size: {missed}"


def test_minhash_lsh_matches_exact_sf01(spark):
    docs = load(spark, SF_CORRECT, "documents")
    exact = _pairs(ngram_jaccard_pairs(docs, threshold=0.7))
    lsh = _pairs(minhash_lsh_pairs(docs, threshold=0.7))
    assert lsh <= exact
    recall = len(lsh & exact) / max(len(exact), 1)
    assert recall == 1.0, f"recall {recall}: missed {exact - lsh}"


def test_simhash_deterministic_and_symmetric(spark):
    docs = load(spark, SF_SMOKE, "documents")
    sh1 = {r.doc_id: r.simhash for r in with_simhash(docs).collect()}
    sh2 = {r.doc_id: r.simhash for r in with_simhash(docs).collect()}
    assert sh1 == sh2, "simhash must be deterministic"
    pairs = simhash_pairs(docs, max_hamming=3).collect()
    seen = {(r.doc_a, r.doc_b) for r in pairs}
    assert all(a < b for a, b in seen)
    assert all(r.hamming <= 3 for r in pairs)


def test_ivf_recall_vs_bruteforce(spark):
    emb = load(spark, SF_CORRECT, "embeddings")
    q = query_vector(emb, 0)
    exact = [r.vec_id for r in brute_force_topk(emb, q, k=10).collect()]
    approx = [r.vec_id for r in ivf_topk(emb, q, k=10, nprobe=3).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"IVF recall@10 too low: {recall} ({approx} vs {exact})"
    # the query vector itself lives in a probed cell → must be found
    assert approx[0] == 0


def test_lsh_bucketed_ann_finds_self_and_overlaps(spark):
    from parsedmarc_go_spark.operators.similarity import (
        lsh_bucketed_topk,
        with_hyperplane_buckets,
    )

    emb = load(spark, SF_CORRECT, "embeddings")
    q = query_vector(emb, 0)
    got = [r.vec_id for r in lsh_bucketed_topk(emb, q, k=10, n_planes=4).collect()]
    assert got, "query bucket empty"
    assert got[0] == 0, "query vector must rank first in its own bucket"
    # buckets are deterministic and partition the corpus
    b1 = {r.vec_id: r.hp_bucket for r in with_hyperplane_buckets(emb, 4).collect()}
    b2 = {r.vec_id: r.hp_bucket for r in with_hyperplane_buckets(emb, 4).collect()}
    assert b1 == b2
    assert all(0 <= v < 16 for v in b1.values())


def test_lsh_blocked_cosine_subset_of_threshold(spark):
    from parsedmarc_go_spark.operators.similarity import cosine_neardup_pairs_lsh

    emb = load(spark, SF_CORRECT, "embeddings")
    pairs = cosine_neardup_pairs_lsh(emb, threshold=0.3, n_planes=4).collect()
    assert all(r.cosine_sim >= 0.3 for r in pairs)
    assert all(r.vec_a < r.vec_b for r in pairs)
    # deterministic
    again = cosine_neardup_pairs_lsh(emb, threshold=0.3, n_planes=4).collect()
    assert {(r.vec_a, r.vec_b) for r in pairs} == {(r.vec_a, r.vec_b) for r in again}
