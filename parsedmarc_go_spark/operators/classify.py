"""Bag-of-tokens Naive-Bayes document classifier — the
aggregation-shaped realization of the LLM-pipeline "quality
classifier" filter (GPT-3, Brown et al. 2020 §A / Llama: a linear
classifier separating a high-quality reference from raw crawl, used
to score and filter every document; public papers).

A logistic-regression classifier needs iterative optimization; the
Naive-Bayes log-linear form has the SAME inference shape (per-token
log-likelihood sums + prior) and trains in ONE aggregation pass, so
both training and scoring stay DataFrames end-to-end and the whole
operator carries an exact DuckDB oracle:

  score(doc, c) = log p(c) + Σ_tok log p(tok | c)

with add-alpha smoothing over a shared vocabulary. Per-token
log-probs are quantized to the 1e-4 grid BEFORE the integer sum (the
registry fixed-point rule, same as operators/lm.py), so scores and
argmax decisions are engine-exact.

Scale shape (100 TB contract): training is two aggregations over the
LABELED set (small by construction — classifier reference sets are
thousands-to-millions of docs, not the corpus); scoring is one corpus
scan: token explode (|doc| rows), a broadcast cross join against the
L-row label frame (L is 2 for the quality filter), one broadcast
probe of the (label, token) count table, one doc_id aggregation.
``broadcast_model=False`` switches the count probe to a shuffle hash
join keyed on (label, tok) for a model too large to broadcast. No
iterative state, no driver-side model, no global windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parsedmarc_go_spark.operators.lm import _LP_SCALE


def train_nb_classifier(
    labeled: DataFrame, label_col: str = "label", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Fit the NB count model on labeled documents. Returns
    ``(counts, totals, priors, vocab)``:

    - ``counts``: (label, tok, c) token counts per class,
    - ``totals``: (label, total) token totals per class — derived from
      ``counts`` so normalization can never drift,
    - ``priors``: (label, n_docs) document counts per class,
    - ``vocab``: 1-row (v) distinct-token count over ALL classes (the
      shared smoothing vocabulary).

    Everything stays DataFrames; nothing is collected."""
    toks = labeled.select(
        F.col(label_col).alias("label"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    )
    counts = toks.groupBy("label", "tok").agg(F.count("*").alias("c"))
    totals = counts.groupBy("label").agg(F.sum("c").alias("total"))
    priors = labeled.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_docs")
    )
    vocab = toks.agg(F.countDistinct("tok").alias("v"))
    return counts, totals, priors, vocab


def nb_score(
    corpus: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    broadcast_model: bool = True,
) -> DataFrame:
    """Score every document against every class. Returns the long form
    ``doc_id, label, n_tokens, score`` where ``score`` is the
    grid-exact NB log-posterior (up to the shared evidence constant):
    quantized prior + sum of quantized token log-likelihoods. A
    document with zero tokens scores prior-only with ``n_tokens = 0``.

    ``nb_classify`` reduces this to an argmax decision."""
    counts, totals, priors, vocab = model
    sc = corpus.sparkSession.sparkContext
    mark = F.broadcast if broadcast_model else (lambda df: df)

    # quantized log-prior per label: ln(n_docs / N) on the 1e-4 grid
    n_total = priors.agg(F.sum("n_docs").alias("nd"))
    prior_fp = (
        priors.crossJoin(F.broadcast(n_total))
        .select(
            "label",
            F.floor(
                F.log(F.col("n_docs").cast("double") / F.col("nd").cast("double"))
                * F.lit(_LP_SCALE)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("prior_fp"),
        )
    )
    labels = priors.select("label")

    toks = corpus.repartition(sc.defaultParallelism).select(
        F.col(id_col), F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
    )
    probed = (
        toks.crossJoin(F.broadcast(labels))
        .join(mark(counts), ["label", "tok"], "left")
        .join(F.broadcast(totals), "label")
        .crossJoin(F.broadcast(vocab))
    )
    num = F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(alpha)
    den = F.col("total").cast("double") + F.lit(alpha) * (
        F.col("v").cast("double") + F.lit(1.0)
    )
    lp_fp = F.floor(F.log(num / den) * F.lit(_LP_SCALE) + F.lit(0.5)).cast("long")
    per = probed.select(F.col(id_col), "label", lp_fp.alias("lp_fp")).groupBy(
        id_col, "label"
    ).agg(F.count("*").alias("n_tokens"), F.sum("lp_fp").alias("s"))
    # restore zero-token documents (split of '' yields [''] so they are
    # rare, but an empty-string token IS in-vocab math either way) and
    # add the prior
    base = corpus.select(id_col).crossJoin(F.broadcast(labels))
    return (
        base.join(per, [id_col, "label"], "left")
        .join(F.broadcast(prior_fp), "label")
        .select(
            id_col,
            "label",
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias("n_tokens"),
            (
                (F.coalesce(F.col("s"), F.lit(0).cast("long")) + F.col("prior_fp"))
                .cast("double")
                / F.lit(_LP_SCALE)
            ).alias("score"),
        )
    )


def nb_classify(
    corpus: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    broadcast_model: bool = True,
) -> DataFrame:
    """Argmax decision per document: ``doc_id, pred_label, score`` with
    the engine-independent tie-break "higher score wins, then
    lexicographically larger label" (a max over (score, label)
    structs — one aggregation, no window)."""
    scored = nb_score(corpus, model, id_col, text_col, alpha, broadcast_model)
    best = F.max(F.struct("score", "label")).alias("best")
    return (
        scored.groupBy(id_col)
        .agg(best)
        .select(
            id_col,
            F.col("best.label").alias("pred_label"),
            F.col("best.score").alias("score"),
        )
    )
