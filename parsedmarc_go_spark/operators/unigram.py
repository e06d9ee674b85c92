"""Unigram-LM tokenizer training (Kudo 2018, "Subword Regularization"
— the SentencePiece unigram model; public paper), as aggregation-shaped
hard-EM over the word-frequency table.

The other half of the tokenizer story started by operators/bpe.py: BPE
grows a vocab bottom-up by merges; the unigram model starts from an
over-complete substring seed and SHRINKS it, scoring pieces with a
unigram language model and segmenting by Viterbi. This implementation
is the hard-EM (Viterbi-count) variant: the E-step assigns each word
its single best segmentation under the current piece log-probs (the
paper's E-step uses full lattice expectations; Viterbi counts are the
standard hard-EM simplification and keep every step exactly
reproducible), the M-step re-estimates piece probabilities from the
frequency-weighted Viterbi counts, and pruning keeps the top
``vocab_size`` pieces (single chars are never dropped, so every word
stays segmentable — the paper's subword-fallback invariant).

Spark-first decomposition (the bpe_train playbook):

  1. one corpus scan aggregates ``(word, freq)``; everything after
     runs over the distinct-word frame,
  2. the seed is every substring of length 1..``max_piece_len``
     weighted by word frequency — a posexplode over (start, len) pairs
     into ONE hash aggregate, cut to ``seed_size`` by
     TakeOrderedAndProject (single chars always kept),
  3. each EM round attaches the current piece table as a broadcast
     one-row MAP column (piece → grid-quantized logp; the
     maxmunch_encode lookup idiom — O(1) ``element_at`` probes), runs
     Viterbi per distinct word as a per-row ``aggregate`` DP (below),
     explodes the winning segmentations into a frequency-weighted
     piece count, and re-estimates logp from exact integer counts
     quantized to the 1e-4 grid (the operators/lm.py determinism
     contract — every cross-row sum is over integers),
  4. the driver holds only the loop counter; piece tables live as
     DataFrames end to end (localCheckpoint per round so the
     iterative lineage never deepens).

Viterbi in pure column expressions, no Python: the forward pass folds
``sequence(1, length(word))`` with an ARRAY accumulator — element p+1
holds ``struct(score, backptr_len)`` for prefix length p, each step
maximizing over the ``max_piece_len`` fixed-length arms with
``array_max``'s total struct order (score first, then longer piece —
an engine-independent tie-break); the backward pass walks the backptr
chain with a cursor fold (the maxmunch_encode pattern, descending).
Work per word is O(len · max_piece_len) map probes.

Determinism: scores are sums of grid-quantized logps (1e-4 fixed
point) — bit-identical on any IEEE engine and to the pure-Python
reference in tests/test_unigram.py; ties break on the longer piece,
then the backtrace is fully determined by the stored backptrs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parsedmarc_go_spark.caching import tracked_local_checkpoint
from parsedmarc_go_spark.operators.bpe import word_freqs

_SCALE = 10_000.0
# "unreachable" forward score: far below any real sum of logps yet far
# from double overflow when a few arms add on top of it
_NEG_INF = -1.0e15


def unigram_seed(
    docs: DataFrame,
    seed_size: int = 4096,
    max_piece_len: int = 6,
    text_col: str = "text",
) -> DataFrame:
    """The over-complete candidate set: every substring of length
    1..``max_piece_len`` of every corpus word, weighted by word
    frequency — cut to the top ``seed_size`` by (count desc, piece),
    with every single char kept regardless of rank (the segmentability
    floor). Returns ``piece, cnt``."""
    words = word_freqs(docs, text_col)
    subs = words.select(
        "freq",
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(word)), i -> "
                f"transform(sequence(1, least({int(max_piece_len)}, "
                "length(word) - i + 1)), l -> substr(word, i, l))))"
            )
        ).alias("piece"),
    )
    counts = subs.groupBy("piece").agg(F.sum("freq").alias("cnt"))
    top = counts.orderBy(F.desc("cnt"), F.asc("piece")).limit(seed_size)
    chars = counts.filter(F.length("piece") == 1)
    return top.unionByName(chars).groupBy("piece").agg(
        F.max("cnt").alias("cnt")
    )


def _logp_fp(cnt_col: F.Column, total_col: F.Column) -> F.Column:
    """Grid-quantized log-probability (1e-4 fixed point, the
    operators/lm.py convention): floor(ln(cnt/total)·1e4 + 0.5)."""
    return F.floor(
        F.log(cnt_col.cast("double") / total_col.cast("double"))
        * F.lit(_SCALE)
        + F.lit(0.5)
    ).cast("long")


def _piece_map(pieces: DataFrame) -> DataFrame:
    """One-row frame with the piece table as a MAP column
    (piece → logp_fp), for broadcast attachment. Bounded by the
    seed/vocab size knobs — MBs, never the corpus."""
    return pieces.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("piece"), F.col("logp_fp")))
        ).alias("__pm")
    )


def _viterbi_forward_expr(max_piece_len: int) -> str:
    """Forward pass over columns ``word`` and ``__pm``: the DP table as
    ``array<struct<s double, l int>>`` — element p+1 holds the best
    prefix-p score and the winning piece length (0 = unreachable)."""
    L = int(max_piece_len)
    arms = (
        f"filter(transform(sequence(1, {L}), l -> "
        "CASE WHEN l <= i AND element_at(dp, i - l + 1).s > "
        f"{_NEG_INF / 2} AND element_at(__pm, substr(word, i - l + 1, l)) "
        "IS NOT NULL THEN named_struct("
        "'s', element_at(dp, i - l + 1).s + "
        "CAST(element_at(__pm, substr(word, i - l + 1, l)) AS DOUBLE), "
        "'l', l) END), x -> x IS NOT NULL)"
    )
    return (
        "aggregate(sequence(1, length(word)), "
        "array(named_struct('s', CAST(0.0 AS DOUBLE), 'l', 0)), "
        "(dp, i) -> array_append(dp, coalesce(array_max(" + arms + "), "
        f"named_struct('s', CAST({_NEG_INF} AS DOUBLE), 'l', 0))))"
    )


# backward pass over columns ``word`` and ``__dp`` (a materialized
# forward table): walk the backptr chain from the end with a cursor
# fold, reversed at the finish; empty array when the word is
# unsegmentable. Computed over a separate select so the forward DP is
# evaluated ONCE per word, not re-derived inside its own backtrace.
_VITERBI_BACKTRACE = """
    CASE WHEN element_at(__dp, length(word) + 1).l = 0
    THEN CAST(array() AS ARRAY<STRING>) ELSE
    reverse(aggregate(sequence(1, length(word)),
      named_struct('p', length(word),
                   'toks', CAST(array() AS ARRAY<STRING>)),
      (acc, i) -> CASE WHEN acc.p <= 0 THEN acc ELSE named_struct(
        'p', acc.p - element_at(__dp, acc.p + 1).l,
        'toks', array_append(acc.toks, substr(word,
          acc.p - element_at(__dp, acc.p + 1).l + 1,
          element_at(__dp, acc.p + 1).l))) END,
      acc -> acc.toks)) END
"""


def _viterbi_segs(frame: DataFrame, max_piece_len: int) -> DataFrame:
    """Attach the best segmentation (column ``syms``) to a frame
    carrying ``word`` and the broadcast ``__pm`` map column."""
    return frame.withColumn(
        "__dp", F.expr(_viterbi_forward_expr(max_piece_len))
    ).withColumn("syms", F.expr(_VITERBI_BACKTRACE)).drop("__dp", "__pm")


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 1024,
    seed_size: int = 4096,
    max_piece_len: int = 6,
    n_iters: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Train the unigram piece table: seed → ``n_iters`` × (Viterbi
    E-step, count M-step, prune to ``vocab_size``). Returns
    ``piece, cnt, logp_fp`` — counts are the final round's
    frequency-weighted Viterbi counts (single chars kept with a
    0-count floor of 1 so logp stays finite and every word remains
    segmentable). The driver holds only the loop counter; each round's
    piece table is localCheckpoint'd so lineage stays flat."""
    words = word_freqs(docs, text_col).transform(tracked_local_checkpoint)
    pieces = unigram_seed(docs, seed_size, max_piece_len, text_col)
    total = pieces.agg(F.sum("cnt").alias("t"))
    pieces = (
        pieces.crossJoin(F.broadcast(total))
        .select("piece", "cnt", _logp_fp(F.col("cnt"), F.col("t")).alias("logp_fp"))
        .transform(tracked_local_checkpoint)
    )
    for _ in range(n_iters):
        segs = _viterbi_segs(
            words.crossJoin(F.broadcast(_piece_map(pieces))), max_piece_len
        ).select("freq", F.explode("syms").alias("piece"))
        counts = segs.groupBy("piece").agg(F.sum("freq").alias("cnt"))
        # prune to vocab_size on used-count rank; single chars always
        # survive (floor count 1 when Viterbi never used them)
        top = counts.orderBy(F.desc("cnt"), F.asc("piece")).limit(vocab_size)
        chars = (
            pieces.filter(F.length("piece") == 1)
            .select("piece")
            .join(counts, "piece", "left")
            .select("piece", F.coalesce(F.col("cnt"), F.lit(1)).alias("cnt"))
        )
        kept = top.unionByName(chars).groupBy("piece").agg(
            F.max("cnt").alias("cnt")
        )
        total = kept.agg(F.sum("cnt").alias("t"))
        pieces = (
            kept.crossJoin(F.broadcast(total))
            .select(
                "piece", "cnt", _logp_fp(F.col("cnt"), F.col("t")).alias("logp_fp")
            )
            .transform(tracked_local_checkpoint)
        )
    return pieces


def unigram_segment(
    docs: DataFrame,
    pieces: DataFrame,
    max_piece_len: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Viterbi-encode every document with a trained piece table:
    ``doc_id, pieces (array<string>), n_pieces``. One corpus scan; the
    DP runs once per DISTINCT word against the broadcast piece map
    (the bpe_segment_corpus economics — occurrences outnumber distinct
    words by orders of magnitude), segmentations join back to the
    position stream (typically broadcast, left to AQE), re-assembled
    in position order. Unsegmentable words (a char outside the table —
    impossible for tables from unigram_train) contribute an empty
    segmentation."""
    words = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias(
            "pos", "word"
        ),
    ).filter(F.col("word") != "")
    seg = _viterbi_segs(
        words.select("word").distinct().crossJoin(
            F.broadcast(_piece_map(pieces))
        ),
        max_piece_len,
    ).select("word", "syms")
    enc = words.join(seg, "word").select(id_col, "pos", "syms")
    return (
        enc.groupBy(id_col)
        .agg(
            F.flatten(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, syms))),"
                    " x -> x.syms)"
                )
            ).alias("pieces")
        )
        .withColumn("n_pieces", F.size("pieces"))
    )
