"""Full-text retrieval primitives over the documents table: inverted
postings and BM25 ranking (Robertson & Zaragoza 2009, the Okapi BM25
formulation with the Lucene +1 idf floor — public references).

A training-data pipeline uses these for corpus exploration ("which
documents mention X"), targeted decontamination, and quality probes;
they are also the reference's missing text-search story re-expressed
Spark-first:

- ``inverted_postings``: the (term, doc_id, tf) relation — the
  scalable form of an inverted index (one row per posting, partitioned
  by term hash at write time if persisted; an array-of-doc_ids per
  term would concentrate a stopword's entire posting list in one row,
  which is exactly the skew a row-per-posting layout avoids);
- ``bm25_score``: rank documents against a bag of query terms.

Determinism contract (registry rules): idf is computed from exact
integer (N, df) counts and quantized to the 1e-4 grid; each
term-contribution is quantized BEFORE the per-document integer sum, so
scores are engine-exact and safe to value-hash. The per-contribution
arithmetic between quantizations is +,*,/ on identical doubles —
bit-identical on any IEEE engine.

Scale shape: one corpus scan + token explode; the query-term filter
prunes the explode to |terms| rows per doc BEFORE any shuffle; doc
lengths ride the same scan; ``avgdl`` and the per-term df/idf table
are broadcast 1-row / |terms|-row frames. One doc_id aggregation ends
the plan. No windows, no driver-side state beyond the query itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 10_000.0


def inverted_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, tf) postings over the lowercase single-space
    tokenization. Row-per-posting — the layout that stays skew-safe
    when a term appears in billions of documents."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
        )
        .groupBy("term", id_col)
        .agg(F.count("*").alias("tf"))
    )


def bm25_score(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 rank of every document containing at least one query term:

      score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
      idf(t) = ln( (N − df + 0.5) / (df + 0.5) + 1 )

    Returns ``doc_id, n_terms_matched, score`` (grid-exact; documents
    matching no term are omitted — at corpus scale "every document
    with score 0" is the whole corpus).

    Scale shape (round-17): doc length is the per-row
    ``size(split(...))`` PROJECTION of the corpus, not a second full
    explode + corpus-wide groupBy(doc) aggregate (the pre-r17 shape) —
    one whole tokenize-explode-aggregate pass gone, same doc-keyed
    join, row-identical output (explode drops null-text docs from the
    old lengths; the ``isNotNull`` filter drops them from the new
    one). Assumes ``id_col`` is unique in ``docs``: under duplicate
    ids the two shapes DIVERGE (the old groupBy(id) merged duplicates
    into one inflated dl row; the per-row projection multiplies join
    rows and counts each duplicate in n_docs), so the row-identical
    claim holds only under that uniqueness precondition.

    Rejected variants, measured (round-17): (a) ``dl`` as a SIBLING of
    the explode in one select — fastest at bench SFs but whole-stage
    codegen defers a Project column to first use, so every post-filter
    hit re-evaluates ``size(split(text))`` on its whole document:
    linear for selective query terms, O(hits x doc_bytes) for a
    stopword term (a stopword probe on the long-document stress corpus
    ran >8 min vs ~1 s for this shape — the deferred-evaluation
    sibling of the no-lambda-under-a-generator rule); (b) the array
    materialized in its own select below size/explode — hazard-free
    but pays an UnsafeRow array copy per row, 2x slower at sf2
    (4.2 s vs 2.1 s gate wall)."""
    terms = [t.lower() for t in terms]
    toks_arr = F.split(F.lower(F.col(text_col)), " ")
    toks = docs.select(
        F.col(id_col),
        F.explode(toks_arr).alias("term"),
    )
    lengths = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.size(toks_arr).alias("dl")
    )
    stats = lengths.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    )
    hits = toks.filter(F.col("term").isin(terms)).groupBy(id_col, "term").agg(
        F.count("*").alias("tf")
    )
    df_counts = hits.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    # idf from exact integer counts, quantized: floor(ln(...)·1e4 + .5)
    idf_fp = F.floor(
        F.log(
            (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
            / (F.col("df").cast("double") + F.lit(0.5))
            + F.lit(1.0)
        )
        * F.lit(_SCALE)
        + F.lit(0.5)
    ).cast("long")
    idf = df_counts.crossJoin(F.broadcast(stats)).select(
        "term", idf_fp.alias("idf_fp"), "n_docs", "total_len"
    )
    scored = hits.join(F.broadcast(idf), "term").join(lengths, id_col)
    avgdl = F.col("total_len").cast("double") / F.col("n_docs").cast("double")
    tfd = F.col("tf").cast("double")
    contrib = (
        (F.col("idf_fp").cast("double") / F.lit(_SCALE))
        * (tfd * F.lit(k1 + 1.0))
        / (
            tfd
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl)
        )
    )
    contrib_fp = F.floor(contrib * F.lit(_SCALE) + F.lit(0.5)).cast("long")
    return (
        scored.select(F.col(id_col), contrib_fp.alias("c_fp"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_terms_matched"),
            (F.sum("c_fp").cast("double") / F.lit(_SCALE)).alias("score"),
        )
    )


def build_vocab(
    docs: DataFrame,
    size: int,
    min_count: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Frequency vocabulary of the top ``size`` tokens — the
    tokenizer-prep primitive (vocab files for BPE/WordPiece training
    start exactly here). Returns ``token, cnt, token_id`` with ids
    assigned by (count desc, token) rank, 0-based.

    Scale shape: one corpus token aggregation, then the top-``size``
    cut is TakeOrderedAndProject (per-partition heaps). The id-rank
    window runs over the ALREADY-LIMITED frame — ``size`` rows, a
    bounded parameter, not the corpus — so the partition-less window
    is bounded by construction, unlike the global-ntile shape the
    semdedup fix removed."""
    from pyspark.sql import Window

    counts = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(size)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return top.withColumn(
        "token_id", (F.row_number().over(w) - 1).cast("int")
    )


def hybrid_rerank(
    docs: DataFrame,
    vectors: DataFrame,
    terms: list[str],
    query: DataFrame,
    n_candidates: int = 50,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Two-stage retrieval — the retrieve-then-rerank shape every RAG
    data pipeline runs: BM25 selects the lexical top ``n_candidates``
    (recall stage), then exact cosine against ``query`` (a single-row
    frame with column ``q`` — similarity.query_vector) reranks them
    (precision stage). Returns ``doc_id, bm25_score, cosine_sim``,
    the top ``k`` by (cosine desc, id).

    Determinism: the candidate cut orders by the grid-quantized BM25
    score with an id tie-break, so the ``n_candidates`` boundary is
    identical on any engine; the rerank reuses the 4-decimal-rounded
    cosine + id tie-break of brute_force_topk.

    Scale shape: stage 1 is the bm25_score plan ended by a
    TakeOrderedAndProject (bounded ``n_candidates`` rows — a driver-safe
    frame); stage 2 broadcasts those rows against ONE scan of the
    vector table (BroadcastHashJoin, no shuffle of the vectors), then
    ranks k of ``n_candidates``. On a corpus whose vectors already sit
    in a partitioned ANN store, the fetch could prune by the store's
    cells instead of scanning — this operator keeps the general
    any-table form."""
    cand = (
        bm25_score(docs, terms, id_col, text_col, k1, b)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(n_candidates)
        .withColumnRenamed("score", "bm25_score")
        .drop("n_terms_matched")
    )
    from parsedmarc_go_spark.operators.similarity import as_double_vec, cosine

    scored = (
        vectors.join(
            F.broadcast(cand), vectors[vec_id_col] == cand[id_col]
        )
        .select(id_col, "bm25_score", as_double_vec(vec_col))
        .crossJoin(F.broadcast(query))
        .select(
            id_col,
            "bm25_score",
            F.round(cosine("v", "q"), 4).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)
