"""Deduplication operators for large-scale corpora:

- exact dedup (hash group-by on a normalized fingerprint),
- exact n-gram Jaccard pairs (shingle inverted-index self-join),
- MinHash + LSH banding (the 100 TB-scale near-dup path),
- SimHash with banded Hamming blocking.

All of it is DataFrame-native (higher-order functions + hash joins) —
no Python UDFs, no driver-side loops. The LSH variants keep the shuffle
keyed on (band, signature) buckets, so work scales with the number of
*colliding* documents, not with |docs|² — the property that makes
near-dedup feasible at 100 TB where the exact inverted-index join is
only feasible per-block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parsedmarc_go_spark.functions.text import normalized_text


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: one output row per
    distinct content, keeping the smallest id as the representative.
    Single hash-aggregate with map-side partial agg; the group key is the
    (short) normalized text, so the shuffle payload stays bounded."""
    return (
        df.select(F.col(id_col), normalized_text(text_col).alias("norm_text"))
        .groupBy("norm_text")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def _shingle_index(docs: DataFrame, id_col: str, shingle_df_n: int = 3) -> DataFrame:
    """(doc, n_shingles, shingle) inverted index, distinct per doc.

    n_shingles rides along with every row so downstream Jaccard needs no
    extra per-doc aggregation or join — one less shuffle, and the index
    subtree is persisted by callers that consume it more than once.

    Built with posexplode + window lead() rather than a
    transform/sequence higher-order expression: HOF lambdas evaluate
    interpreted (~45 µs/shingle measured — 13 s at bench SF), while
    posexplode/lead/concat_ws stay inside whole-stage codegen (~3×
    faster cold, ~15× warm). The window shuffle on doc also supplies
    full parallelism regardless of input file layout."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc").orderBy("pos")
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "tok"),
    )
    leads = [F.lead("tok", j).over(w).alias(f"t{j}") for j in range(1, shingle_df_n)]
    sh = (
        toks.select("doc", "tok", *leads)
        .filter(F.col(f"t{shingle_df_n - 1}").isNotNull())
        .select(
            "doc",
            F.concat_ws(" ", "tok", *[f"t{j}" for j in range(1, shingle_df_n)]).alias("shingle"),
        )
        .distinct()
    )
    return sh.withColumn("n_shingles", F.count("*").over(Window.partitionBy("doc")))


def _pairs_with_jaccard(index: DataFrame, candidates: DataFrame | None = None) -> DataFrame:
    """Exact Jaccard for doc pairs sharing shingles. If `candidates`
    (doc_a, doc_b) is given, only those pairs are scored (LSH verify
    step); otherwise all co-shingled pairs are scored (exact mode).
    One shuffle join on shingle + one hash aggregate — n_a/n_b are
    constants per doc carried by the index rows."""
    a = index.select(F.col("doc").alias("doc_a"), F.col("n_shingles").alias("n_a"), "shingle")
    b = index.select(F.col("doc").alias("doc_b"), F.col("n_shingles").alias("n_b"), "shingle")
    if candidates is not None:
        # verify mode: restrict BEFORE the shingle join — candidate sets
        # are tiny relative to the all-pairs space, so the expensive
        # inverted-index self-join shrinks to |candidates| × |doc shingles|
        a = a.join(candidates.select("doc_a").distinct(), "doc_a")
        b = b.join(candidates.select("doc_b").distinct(), "doc_b")
    shared = (
        a.join(b, ["shingle"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"), F.first("n_a").alias("n_a"), F.first("n_b").alias("n_b"))
    )
    if candidates is not None:
        shared = shared.join(candidates, ["doc_a", "doc_b"], "inner")
    return shared.select(
        "doc_a",
        "doc_b",
        "n_a",
        "n_b",
        "shared",
        (
            F.col("shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("shared")).cast("double")
        ).alias("jaccard"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame, id_col: str = "doc_id", n: int = 3, threshold: float = 0.6
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shingle inverted index.
    Cost is Σ freq(shingle)² — fine per-block / at test SF; at 100 TB use
    minhash_lsh_pairs (same output contract) instead."""
    index = _shingle_index(docs, id_col, n).persist()
    return _pairs_with_jaccard(index).filter(F.col("jaccard") >= threshold)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 16,
) -> DataFrame:
    """MinHash + LSH near-dup pairs, verified with exact Jaccard.

    shingle → K minhashes (xxhash64 with per-permutation salt, one
    hash-aggregate) → `bands` banded signatures → bucket self-join →
    candidate pairs → exact-Jaccard verify. With K=32, b=16, r=2 the
    S-curve catches j≥0.7 with P ≈ 1 - (1-j²)^16 ≈ 1 - 2e-5, while
    keeping bucket collisions (and thus the join fan-out) sparse.
    """
    rows = num_hashes // bands
    # the index feeds three consumers (minhash agg + both sides of the
    # verify join); those are INDEPENDENT stages of one job and would
    # race to compute the subtree before the cache fills, so persist AND
    # materialize eagerly — the scan+shingle explode then runs once
    index = _shingle_index(docs, id_col, n).persist()
    index.count()
    # K independent salted xxhash64 permutations. (A cheaper affine /
    # double-hashing family was measured here and rejected: its
    # permutations correlate — the same shingle tends to win adjacent k
    # — which collapses r=2 bands toward r=1 and bloats the bucket join.
    # The K hash evaluations are <1 s at bench SF; the join is what
    # matters.)
    mins = index.groupBy("doc").agg(
        *[
            F.min(F.xxhash64(F.lit(f"mh{k}"), F.col("shingle"))).alias(f"mh_{k}")
            for k in range(num_hashes)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(*[F.col(f"mh_{b * rows + r}") for r in range(rows)]).alias("sig"),
            )
            for b in range(bands)
        ]
    )
    buckets = mins.select("doc", F.explode(band_structs).alias("bs")).select(
        "doc", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    left = buckets.select(F.col("doc").alias("doc_a"), "band", "sig")
    right = buckets.select(F.col("doc").alias("doc_b"), "band", "sig")
    candidates = (
        left.join(right, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        # feeds three consumers in the verify join — persist + eager
        # materialization for the same stage-race reason as the index
        .persist()
    )
    candidates.count()
    return _pairs_with_jaccard(index, candidates).filter(F.col("jaccard") >= threshold)


def with_simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document: per-token xxhash64, ±1 bit voting,
    sign → bit.

    Bit votes are 64 conditional-sum AGGREGATES over the exploded token
    hashes — whole-stage-codegen'd, one hash-aggregate pass. (A previous
    formulation collected hashes per doc and evaluated nested
    transform/aggregate lambdas; interpreted HOF evaluation made it
    ~30× slower at bench SF.) The final hash assembles from the 64 vote
    columns in one projection."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), " "))).alias("tok"),
    ).select(id_col, F.xxhash64("tok").alias("h"))
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.expr(f"(h >> {j}) & 1 = 1"), 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(64)
        ]
    )
    simhash = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN shiftleft(1L, {j}) ELSE 0L END)" for j in range(64)
    )
    return votes.select(id_col, F.expr(simhash).alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: block on 16-bit bands (a pair within
    Hamming ≤ bands-1 of 64 bits must agree on ≥1 of 4 bands — pigeonhole
    guarantees recall for distance < bands), then verify with
    bit_count(xor)."""
    width = 64 // bands
    sh = with_simhash(docs, id_col, text_col)
    banded = sh.select(
        F.col(id_col).alias("doc"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"(simhash >> {b * width}) & {(1 << width) - 1}").alias("val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bv"),
    ).select("doc", "simhash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    left = banded.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("sh_a"), "band", "val")
    right = banded.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("sh_b"), "band", "val")
    return (
        left.join(right, ["band", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.expr("bit_count(sh_a ^ sh_b)").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
