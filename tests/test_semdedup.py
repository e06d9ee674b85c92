"""SemDeDup (operators/clustering.py::semdedup): semantic dedup over
embeddings — planted exact/near duplicates must collapse to one keeper
per group, the keeper must follow the keep-low-centroid-similarity
rule, and untouched vectors must all survive."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _with_planted_dups(spark, emb, dup_ids, offset=100_000):
    """Append an exact copy of each vector in dup_ids under id+offset —
    cosine(copy, original) = 1.0, so any tau groups them."""
    dups = (
        emb.filter(F.col("vec_id").isin(dup_ids))
        .withColumn("vec_id", F.col("vec_id") + offset)
    )
    return emb.unionByName(dups)


def test_semdedup_collapses_planted_duplicates(spark):
    from parsedmarc_go_spark.operators.clustering import semdedup
    from parsedmarc_go_spark.tables import load

    emb = load(spark, SF_DIR, "embeddings")
    n = emb.count()
    dup_ids = [0, 7, 42, 99]
    corpus = _with_planted_dups(spark, emb, dup_ids)

    out = semdedup(corpus, n_clusters=8, tau=0.9999, max_iters=3)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == n + len(dup_ids)  # one output row per input vector

    for d in dup_ids:
        a, b = rows[d], rows[d + 100_000]
        # the copy pair is grouped: same cluster, exactly one kept
        assert a["cluster_id"] == b["cluster_id"] and a["cluster_id"] is not None
        assert {a["keep"], b["keep"]} == {True, False}
        # identical vectors -> identical centroid_sim -> tie breaks to
        # the smaller id: the ORIGINAL survives
        assert a["keep"] and not b["keep"]

    # survivors = everything minus one member per planted group (the
    # corpus has no natural >=0.9999 near-dups at this SF)
    n_kept = sum(1 for r in rows.values() if r["keep"])
    assert n_kept == n


def test_semdedup_keep_rule_prefers_low_centroid_similarity(spark):
    """Non-tied case: a NEAR-duplicate (slightly perturbed copy) forms
    a 2-group where the paper's rule keeps the member with the LOWER
    cosine to its cell centroid."""
    from parsedmarc_go_spark.operators.clustering import semdedup
    from parsedmarc_go_spark.tables import load

    emb = load(spark, SF_DIR, "embeddings")
    # perturb vec 0 toward its own direction scaled — same direction =
    # same cosine; instead blend with another vector for a real angle
    (v0,) = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    (v1,) = emb.filter(F.col("vec_id") == 1).select("embedding").collect()
    blended = [0.999 * a + 0.001 * b for a, b in zip(v0[0], v1[0])]
    extra = emb.sparkSession.createDataFrame(
        [(100_000, blended, -1)], ["vec_id", "embedding", "label"]
    ).withColumn("embedding", F.col("embedding").cast("array<float>")).withColumn(
        "label", F.col("label").cast("long")
    )
    corpus = emb.select("vec_id", "embedding", "label").unionByName(extra)

    out = semdedup(corpus, n_clusters=8, tau=0.999, max_iters=3)
    rows = {r["vec_id"]: r for r in out.collect()}
    a, b = rows[0], rows[100_000]
    assert a["cluster_id"] == b["cluster_id"] and a["cluster_id"] is not None
    kept, dropped = (a, b) if a["keep"] else (b, a)
    assert not dropped["keep"]
    assert kept["centroid_sim"] <= dropped["centroid_sim"]


def test_semdedup_window_never_sees_singletons(spark):
    """Scale guard (round-9 fix): at high tau the overwhelming majority
    of a real corpus is singletons (cluster_id null). The keep-rule
    window must be computed over ONLY the paired subset — if singletons
    entered it they would all hash to one null-key window partition, a
    single task sorting nearly the whole corpus. Fixture is ~95%
    singletons; the assert pins the plan shape, not just the values."""
    from parsedmarc_go_spark.operators.clustering import semdedup
    from parsedmarc_go_spark.tables import load

    emb = load(spark, SF_DIR, "embeddings")
    n = emb.count()
    # plant dups for ~5% of ids -> ~95% of the corpus stays singleton
    dup_ids = list(range(0, n, 20))
    corpus = _with_planted_dups(spark, emb, dup_ids)

    out = semdedup(corpus, n_clusters=8, tau=0.9999, max_iters=3)

    # Plan pin: exactly one Window node; its subtree is the inner join
    # onto the component frame (paired docs only), and the full-corpus
    # LeftOuter join sits ABOVE it -- so no null cluster_id row can
    # ever reach the window.
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Window [row_number()") == 1
    left_outer_at = plan.index("Join LeftOuter, (vec_id")
    window_at = plan.index("Window [row_number()")
    assert left_outer_at < window_at, "keep window must be below the left join"
    below_window = plan[window_at:]
    assert "Join Inner, (vec_id" in below_window, (
        "window input must be the paired-only inner join, not the full corpus"
    )

    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == n + len(dup_ids)
    # every singleton survives with a null cluster
    singles = [
        r for vid, r in rows.items()
        if vid < 100_000 and vid not in set(dup_ids)
    ]
    assert all(r["keep"] and r["cluster_id"] is None for r in singles)
    # each planted pair collapses to exactly one keeper (tie -> lower id)
    for d in dup_ids:
        a, b = rows[d], rows[d + 100_000]
        assert a["cluster_id"] == b["cluster_id"] is not None
        assert a["keep"] and not b["keep"]


def test_semdedup_forest_pairs_equal_all_pairs_on_hot_clique(spark):
    """Round-18 recall contract for pair_mode='forest': on a corpus
    with a planted HOT CLIQUE (60 near-identical vectors — the
    output-quadratic pathology, C(60,2)=1770 qualifying pairs) plus
    scattered 2-dup groups, semdedup with forest edges must produce
    EXACTLY the all-pairs output row-for-row: components over the
    union of per-task spanning forests equal components over the full
    edge set. chunk_rows=16 forces the clique across 4+ chunks so
    cross-chunk forest tasks are exercised, not just the self case."""
    from parsedmarc_go_spark.operators.clustering import semdedup
    from parsedmarc_go_spark.operators.similarity import cosine_neardup_pairs
    from parsedmarc_go_spark.tables import load

    emb = load(spark, SF_DIR, "embeddings")
    (v0,) = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    base = list(v0[0])
    hot = spark.createDataFrame(
        [
            # tiny distinct perturbations: pairwise cosine ~1 > tau,
            # distinct centroid_sims so the keep rule is exercised
            (200_000 + i, [x * (1.0 + i * 1e-9) for x in base], -1)
            for i in range(60)
        ],
        ["vec_id", "embedding", "label"],
    ).withColumn("embedding", F.col("embedding").cast("array<float>")).withColumn(
        "label", F.col("label").cast("long")
    )
    corpus = (
        emb.select("vec_id", "embedding", "label")
        .unionByName(hot)
        .unionByName(
            _with_planted_dups(spark, emb, [7, 42]).filter(
                F.col("vec_id") >= 100_000
            ).select("vec_id", "embedding", "label")
        )
    )

    kw = dict(n_clusters=8, tau=0.9999, max_iters=3, chunk_rows=16)
    all_rows = sorted(
        tuple(r) for r in semdedup(corpus, pair_mode="all", **kw).collect()
    )
    forest_rows = sorted(
        tuple(r) for r in semdedup(corpus, pair_mode="forest", **kw).collect()
    )
    assert forest_rows == all_rows

    # and the forest pair stream really is linear, not quadratic: the
    # 60-clique contributes ≤ 59 edges + per-task overlap, never 1770
    from parsedmarc_go_spark.operators.clustering import assign_cells, kmeans_fit

    cents, _ = kmeans_fit(corpus, k=8, max_iters=3)
    asg = assign_cells(corpus, cents, "embedding", "cell")
    n_all = cosine_neardup_pairs(
        asg, threshold=0.9999, block_col="cell", chunk_rows=16, pair_mode="all"
    ).count()
    n_forest = cosine_neardup_pairs(
        asg, threshold=0.9999, block_col="cell", chunk_rows=16, pair_mode="forest"
    ).count()
    assert n_all >= 1770  # the clique's quadratic pair set is real
    assert n_forest < n_all / 5  # forest output is linear-ish per task


def test_semdedup_multipass_keeps_invariants_and_adds_only_pairs(spark):
    """n_passes=2: re-seeded second blocking can only ADD pairs (union
    before components), so every single-pass dup group still collapses,
    the keep rule is unchanged, and output stays one row per vector."""
    from parsedmarc_go_spark.operators.clustering import semdedup
    from parsedmarc_go_spark.tables import load

    emb = load(spark, SF_DIR, "embeddings")
    n = emb.count()
    dup_ids = [0, 7, 42, 99]
    corpus = _with_planted_dups(spark, emb, dup_ids)

    out = semdedup(corpus, n_clusters=8, tau=0.9999, max_iters=3, n_passes=2)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == n + len(dup_ids)
    for d in dup_ids:
        a, b = rows[d], rows[d + 100_000]
        assert a["cluster_id"] == b["cluster_id"] and a["cluster_id"] is not None
        assert a["keep"] and not b["keep"]
    assert sum(1 for r in rows.values() if r["keep"]) == n
