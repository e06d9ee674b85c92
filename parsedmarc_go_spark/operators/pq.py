"""Product quantization for embedding search (Jégou, Douze, Schmid
2011, "Product Quantization for Nearest Neighbor Search" — public
paper): the IVF-PQ layout that makes billion-vector indexes fit.

The embedding is unit-normalized, split into ``m`` subvectors, and
each subvector is replaced by the index of its nearest centroid in a
per-subspace codebook of ``ks`` entries — the stored row shrinks from
``dim`` floats to ``m`` byte codes (64-dim float32 → 8 bytes = 32×).
Queries score codes with an ADC lookup table: ``dot(q, x̂) =
Σ_s LUT[s][code_s]`` where ``LUT[s][j] = dot(q_s, c_sj)`` — m array
lookups + adds per candidate, never a decode.

Spark-first realization:

- codebook training = per-subspace Lloyd iterations with the same
  deterministic machinery as clustering.kmeans_fit (xxhash-order init,
  literal-argmin assignment, bounded ks×dsub collects), but minimizing
  L2 with MEAN updates — PQ centroids reconstruct subvectors, so they
  must not be re-normalized the way cosine cell centroids are;
- encoding = pure column expressions (the assign_cells literal-argmax
  trick per subspace, scored as ``2·dot(v_s,c) − ‖c‖²`` which argmins
  L2 without materializing differences);
- the index persists codes ``partitionBy(cell)`` over the SAME coarse
  quantizer as build_ivf_index, so probes stay partition-pruned reads;
- ADC scoring is one literal lookup-table expression over the probed
  slice → TakeOrderedAndProject. No UDFs anywhere.

Defaults (m=8, ks=16) fit the 64-dim test fixture; production uses
ks=256 (byte codes) and m=dim/4..dim/8 — the literal-plan budget check
guards the codebook size either way. Like IVF-SQ8 this trades recall
for bytes: measure it (scripts/ann_recall.py pattern) before choosing.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parsedmarc_go_spark.operators.clustering import (
    LITERAL_CENTROID_BUDGET,
    _unit,
    assign_cells,
    kmeans_fit,
    load_ivf_centroids,
)


def _unit_vec_expr(vec_col: str):
    v = f"transform({vec_col}, x -> CAST(x AS DOUBLE))"
    n = f"sqrt(aggregate({v}, 0D, (a, x) -> a + x * x))"
    return F.expr(
        f"CASE WHEN {n} > 0 THEN transform({v}, x -> x / {n}) ELSE {v} END"
    )


def _pq_kmeans(
    subs: DataFrame, ks: int, max_iters: int, dsub: int
) -> list[list[float]]:
    """L2 Lloyd on a (id, sv) subvector frame: deterministic
    xxhash-order init, literal argmin assignment, MEAN updates (empty
    cells keep their centroid). Bounded collects only (ks×dsub)."""
    init = subs.orderBy(F.xxhash64(F.col("__id")), F.col("__id")).limit(ks).collect()
    cents = [list(r["sv"]) for r in init]
    if not cents:
        raise ValueError("_pq_kmeans on an empty frame")
    while len(cents) < ks:
        cents.append(cents[len(cents) % len(init)])
    for _ in range(max_iters):
        assigned = subs.withColumn("__c", _pq_code_expr(cents, "sv"))
        stats = (
            assigned.select("__c", F.posexplode("sv").alias("__d", "__x"))
            .groupBy("__c", "__d")
            # exact decimal sum — codebooks bit-identical under any
            # partitioning (kmeans_fit's rationale; ADVICE r14 flagged
            # the accumulation-order hash flaps this removes)
            .agg(
                F.sum(F.col("__x").cast("decimal(38,18)")).alias("__s"),
                F.count("*").alias("__n"),
            )
            .groupBy("__c")
            .agg(
                F.array_sort(F.collect_list(F.struct("__d", "__s"))).alias("__dm"),
                F.first("__n").alias("__n"),
            )
            .select(
                "__c",
                F.expr("transform(__dm, s -> CAST(s.__s AS DOUBLE))").alias("__sum"),
                "__n",
            )
            .collect()
        )
        by_cell = {r["__c"]: (list(r["__sum"]), r["__n"]) for r in stats}
        cents = [
            [x / by_cell[i][1] for x in by_cell[i][0]] if i in by_cell else cents[i]
            for i in range(ks)
        ]
    return cents


def _pq_code_expr(cents: list[list[float]], sub_col: str):
    """0-based argmin-L2 code for one subspace as a pure expression:
    argmax of ``2·dot(v,c) − ‖c‖²`` (row norm is constant within the
    argmax), ties to the lowest code like assign_cells."""
    mat = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in cents])
    c2 = F.array(*[F.lit(float(sum(x * x for x in c))) for c in cents])
    scores = F.zip_with(
        mat,
        c2,
        lambda c, n2: F.aggregate(
            F.zip_with(F.col(sub_col), c, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        * F.lit(2.0)
        - n2,
    )
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def train_pq_codebooks(
    vectors: DataFrame,
    m: int = 8,
    ks: int = 16,
    max_iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Train the m per-subspace codebooks (each ks × dim/m) on the
    unit-normalized vectors. One small Lloyd run per subspace — a
    build-once cost amortized over every encode and probe."""
    dim = len(vectors.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    # the real literal size is ks*dsub doubles per _pq_code_expr and
    # ks*dim TOTAL across pq_encode's m subspace expressions — so the
    # guard follows assign_cells' k*dim rule (clustering.py:65), after
    # dim is known; an m*ks-only test let dim=4096 codebooks through at
    # 16x the budget (ADVICE r9)
    if ks * dim > LITERAL_CENTROID_BUDGET:
        raise ValueError(
            f"ks*dim = {ks}*{dim} exceeds the literal-plan centroid "
            f"budget ({LITERAL_CENTROID_BUDGET}); lower ks or use a "
            "broadcast-join encode"
        )
    dsub = dim // m
    base = vectors.select(
        F.col(id_col).alias("__id"), _unit_vec_expr(vec_col).alias("__u")
    ).cache()
    books = []
    try:
        for s in range(m):
            subs = base.select(
                "__id", F.slice("__u", s * dsub + 1, dsub).alias("sv")
            ).cache()
            try:
                books.append(_pq_kmeans(subs, ks, max_iters, dsub))
            finally:
                subs.unpersist()
    finally:
        base.unpersist()
    return books


def pq_encode(
    df: DataFrame,
    books: list[list[list[float]]],
    vec_col: str = "embedding",
    out: str = "pq_codes",
) -> DataFrame:
    """Add ``out`` = array<tinyint> of m codes, computed with one
    argmin expression per subspace over the unit-normalized vector —
    purely map-side, no shuffle, no Python."""
    m = len(books)
    dsub = len(books[0][0])
    u = _unit_vec_expr(vec_col)
    pieces = []
    tmp = df.withColumn("__u", u)
    for s in range(m):
        tmp = tmp.withColumn(f"__sv{s}", F.slice("__u", s * dsub + 1, dsub))
        pieces.append(_pq_code_expr(books[s], f"__sv{s}"))
    return tmp.withColumn(out, F.array(*pieces).cast("array<tinyint>")).drop(
        "__u", *[f"__sv{s}" for s in range(m)]
    )


def build_ivf_pq_index(
    vectors: DataFrame,
    path: str,
    n_cells: int = 8,
    m: int = 8,
    ks: int = 16,
    max_iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    refine: bool = True,
) -> None:
    """IVF-PQ index build: coarse cosine cells (the build_ivf_index
    quantizer) + PQ codes instead of vectors. The persisted rows are
    (id, label, pq_codes) partitionBy(cell) — m bytes of payload per
    vector — with two sidecars: ``.centroids`` (coarse, reopened by
    load_ivf_centroids) and ``.pq`` (codebooks as (s, j, centroid)
    rows).

    ``refine=True`` (default) additionally stores the int8 SQ8 copy
    (embedding_q + q_scale, +dim bytes/vector) so probes can rerank
    the ADC shortlist exactly — the standard two-stage IVF-PQ+refine
    layout: PQ bytes drive the scan, the shortlist (tens of rows) is
    re-scored at full fidelity. ``refine=False`` is the pure-PQ
    m-bytes-per-vector layout for when even dim extra bytes are too
    many; measure the recall cost first."""
    spark = vectors.sparkSession
    cents, _ = kmeans_fit(
        vectors, k=n_cells, max_iters=max_iters, vec_col=vec_col, id_col=id_col
    )
    books = train_pq_codebooks(
        vectors, m, ks, max_iters=max_iters, vec_col=vec_col, id_col=id_col
    )
    assigned = pq_encode(
        assign_cells(vectors, cents, vec_col, "cell"), books, vec_col
    )
    cols = [id_col, "label", "pq_codes", "cell"]
    if refine:
        from parsedmarc_go_spark.operators.similarity import quantize_embeddings

        assigned = quantize_embeddings(assigned, vec_col)
        cols += ["embedding_q", "q_scale"]
    assigned.select(*cols).write.mode("overwrite").partitionBy("cell").parquet(path)
    cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(cents)]
    (
        spark.createDataFrame(cent_rows, "cell int, centroid array<double>")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path.rstrip("/") + ".centroids")
    )
    book_rows = [
        (s, j, [float(x) for x in c])
        for s, book in enumerate(books)
        for j, c in enumerate(book)
    ]
    (
        spark.createDataFrame(book_rows, "s int, j int, centroid array<double>")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path.rstrip("/") + ".pq")
    )


def load_pq_codebooks(spark, path: str) -> list[list[list[float]]]:
    rows = spark.read.parquet(path.rstrip("/") + ".pq").orderBy("s", "j").collect()
    books: list[list[list[float]]] = []
    for r in rows:
        while len(books) <= r["s"]:
            books.append([])
        books[r["s"]].append(list(r["centroid"]))
    return books


def ivf_pq_topk_indexed(
    spark,
    path: str,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 3,
    rerank: int = 50,
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe a build_ivf_pq_index index: rank coarse cells on the
    driver (k×dim floats, zero jobs), partition-pruned read of the
    nprobe cells, then ADC scoring — a literal m×ks lookup table
    built from the query, one element_at per subspace per candidate —
    and TakeOrderedAndProject.

    With a refine layout (build default) the ADC pass only SHORTLISTS
    ``rerank`` candidates; the final order comes from exact int8
    cosine over that shortlist (brute_force_topk_q — tens of rows), so
    PQ distortion costs recall only when a true neighbor misses the
    shortlist entirely. ``rerank=0`` (or a codes-only index) returns
    raw ADC order — measure its recall before trusting k."""
    from parsedmarc_go_spark.operators.similarity import brute_force_topk_q

    cents = load_ivf_centroids(spark, path)
    books = load_pq_codebooks(spark, path)
    (qrow,) = query.collect()
    qv = _unit(list(qrow.q))
    ranked = sorted(
        range(len(cents)),
        key=lambda i: (-sum(a * b for a, b in zip(cents[i], qv)), i),
    )
    probed = [int(i) for i in ranked[:nprobe]]
    m, ks = len(books), len(books[0])
    dsub = len(books[0][0])
    lut = [
        sum(a * b for a, b in zip(qv[s * dsub : (s + 1) * dsub], books[s][j]))
        for s in range(m)
        for j in range(ks)
    ]
    lut_col = F.array(*[F.lit(float(x)) for x in lut])
    corpus = spark.read.parquet(path).filter(F.col("cell").isin(probed))
    score = F.expr(
        f"aggregate(sequence(0, {m - 1}), 0D, "
        f"(acc, s) -> acc + element_at(__lut, s * {ks} + CAST(element_at(pq_codes, s + 1) AS INT) + 1))"
    )
    adc = corpus.withColumn("__lut", lut_col).withColumn("__adc", F.round(score, 4))
    if rerank and "embedding_q" in corpus.columns:
        shortlist = (
            adc.orderBy(F.desc("__adc"), F.asc(id_col))
            .limit(max(rerank, k))
            .select(id_col, "label", "embedding_q", "q_scale")
        )
        return brute_force_topk_q(shortlist, query, k, id_col)
    return (
        adc.select(id_col, "label", F.col("__adc").alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def append_to_ivf_pq_index(
    vectors: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Incremental maintenance for a build_ivf_pq_index index: assign
    and ENCODE the new vectors against the persisted coarse centroids
    and PQ codebooks (both quantizers frozen — the standard IVF
    maintenance contract, append_to_ivf_index's twin) and append under
    the same cell layout. The refine columns follow the existing
    layout automatically."""
    spark = vectors.sparkSession
    cents = load_ivf_centroids(spark, path)
    books = load_pq_codebooks(spark, path)
    assigned = pq_encode(
        assign_cells(vectors, cents, vec_col, "cell"), books, vec_col
    )
    existing = spark.read.parquet(path)
    cols = [id_col, "label", "pq_codes", "cell"]
    if "embedding_q" in existing.columns:
        from parsedmarc_go_spark.operators.similarity import quantize_embeddings

        assigned = quantize_embeddings(assigned, vec_col)
        cols += ["embedding_q", "q_scale"]
    assigned.select(*cols).write.mode("append").partitionBy("cell").parquet(path)


def compact_ivf_pq_index(
    spark, path: str, target_file_mb: int = 256
) -> tuple[int, int]:
    """Maintenance merge for an appended IVF-PQ index: collapse each
    cell's append spray back to chunky files (crash-safe directory
    swap, sidecars untouched). Same contract as compact_ivf_index."""
    from parsedmarc_go_spark.storage import compact_partitioned_index

    return compact_partitioned_index(spark, path, "cell", target_file_mb)
