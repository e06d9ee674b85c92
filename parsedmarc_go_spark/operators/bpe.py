"""BPE tokenizer training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public paper),
aggregation-shaped for Spark.

The reference pipeline has nothing comparable (its closest artifact is
a frequency vocabulary — build_vocab, operators/retrieval.py:123); this
completes the tokenizer story a training-data pipeline needs: learn a
merge table from the corpus, segment every word with it, and emit a
subword vocabulary.

Spark-first decomposition — BPE trains on the WORD-FREQUENCY table,
never the raw corpus:

  1. one corpus scan aggregates ``(word, freq)`` — after this the
     corpus is never touched again; every iteration runs over the
     distinct-word frame (vocab-sized: ~10⁷ rows for a 100 TB web
     corpus, versus ~10¹² token positions),
  2. each round counts adjacent symbol pairs weighted by word
     frequency (slice + arrays_zip + explode — the codegen'd shingle
     idiom from operators/dedup.py — into one hash aggregate), takes
     the single most frequent pair with a total-order tie-break
     (count desc, pair asc — engine-independent), and rewrites the
     symbol arrays with a left-to-right non-overlapping fold,
  3. the driver holds only the merge table (one (a, b, count) row per
     round — the kmeans_fit pattern of bounded driver state,
     operators/clustering.py:85); the word frame is localCheckpoint'd
     each round so the iterative lineage never deepens (old checkpoint
     blocks are dereferenced each round and reclaimed by the context
     cleaner).

Segmenting the corpus afterwards is a broadcast-join LOOKUP, not a
re-tokenization: the trained frame already carries every distinct
word's final symbol sequence, so encoding 100 TB costs one map-side
join on the word column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from parsedmarc_go_spark.caching import tracked_local_checkpoint

END_OF_WORD = "</w>"


def word_freqs(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """``(word, freq)`` over the corpus — lowercase single-space
    tokenization (the corpus-wide convention shared by chunking /
    dedup / vocab so every text operator agrees on token identity),
    empty tokens dropped. One scan + one hash aggregate."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols() -> F.Column:
    """chars + the end-of-word marker as its own trailing symbol."""
    return F.concat(F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD)))


def symbol_pair_counts(frame: DataFrame) -> DataFrame:
    """Adjacent-pair counts ``(a, b, cnt)`` over a ``(freq, syms)``
    frame, weighted by word frequency. slice + arrays_zip stays inside
    whole-stage codegen (the _shingle_stream lesson: transform/sequence
    HOF lambdas evaluate interpreted); one explode + one aggregate."""
    t = frame.select(
        "freq",
        F.expr("slice(syms, 1, size(syms) - 1)").alias("l"),
        F.expr("slice(syms, 2, size(syms) - 1)").alias("r"),
    )
    return (
        t.select("freq", F.explode(F.arrays_zip("l", "r")).alias("pr"))
        .select("freq", F.col("pr.l").alias("a"), F.col("pr.r").alias("b"))
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_pair(a: str, b: str) -> F.Column:
    """Rewrite ``syms`` with every adjacent (a, b) occurrence fused to
    ``a+b``, left-to-right non-overlapping (Sennrich's re.sub greedy
    semantics: 'aaa' under (a,a) becomes ['aa','a']). A single fold
    with a (out, carry) accumulator — per-row, no shuffle; the fold
    lambda is interpreted, but it runs over the vocab-sized word frame,
    not the corpus."""
    merged = F.lit(a + b)

    def step(acc, s):
        hit = (
            acc["carry"].isNotNull()
            & (acc["carry"] == F.lit(a))
            & (s == F.lit(b))
        )
        return F.when(
            hit,
            F.struct(
                F.concat(acc["out"], F.array(merged)).alias("out"),
                F.lit(None).cast("string").alias("carry"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["carry"].isNotNull(),
                    F.concat(acc["out"], F.array(acc["carry"])),
                )
                .otherwise(acc["out"])
                .alias("out"),
                s.alias("carry"),
            )
        )

    return F.aggregate(
        F.col("syms"),
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(None).cast("string").alias("carry"),
        ),
        step,
        lambda acc: F.when(
            acc["carry"].isNotNull(), F.concat(acc["out"], F.array(acc["carry"]))
        ).otherwise(acc["out"]),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    min_pair_count: int = 2,
    batch_merges: int = 8,
    train_stats: dict | None = None,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges from the corpus. Returns
    ``(merges, segmented)``: the ordered merge table as a driver-side
    list of ``(a, b, count)`` (bounded by n_merges — the only state
    the driver ever holds) and the final ``(word, freq, syms)`` frame,
    whose symbol arrays are each word's segmentation under the learned
    merges (the lookup table corpus encoding broadcast-joins against).

    Deterministic end to end: the winning pair per round is the
    (count desc, a asc, b asc) minimum — value-pinned against a pure
    Python Sennrich implementation in tests/test_bpe.py. Training
    stops early when the best remaining pair occurs fewer than
    ``min_pair_count`` times (a merge seen once generalizes to
    nothing).

    BATCHED rounds (round-16, VERDICT r15 task 6): serial single-merge
    training runs one Spark job pair per merge — job count ∝ vocab
    size, fine at 50 merges, hostile at 32k. Each round now collects
    the top-``batch_merges`` pairs and accepts the longest PREFIX that
    is provably identical to running Sennrich's one-at-a-time loop:

    - **count invariance**: a later batch pair p_j shares NO symbol
      with any earlier accepted p_i, so p_i's merge rewrites no
      adjacency involving p_j's symbols — p_j's count (the value the
      merge table records) is exactly what the sequential round would
      have counted.
    - **no overtaker**: existing pair counts only ever decrease under
      a merge, so the only pairs that could beat p_j in its sequential
      round are ones p_i's merge CREATES — (x, a_i b_i) and
      (a_i b_i, y), whose counts are bounded by cnt(x, a_i) and
      cnt(b_i, y) read from THIS round's pair table. The batch demands
      strictly cnt(p_j) > that bound for every earlier p_i, so no
      created pair can reach p_j's count (ties included — the bound is
      strict). Self-pairs (a_i == a_i b_i chains) keep themselves in
      their own bound, which automatically ends the batch after them.

    Whatever fails the guards waits for the next round, so the merge
    TABLE is bit-identical to the serial one (pinned in test_bpe
    against the pure-Python reference); only the number of Spark
    rounds changes. ``train_stats`` (optional dict) receives
    ``{"rounds": r, "merges": m}`` for measuring the reduction;
    ``batch_merges=1`` restores the serial loop exactly."""
    frame = (
        word_freqs(docs, text_col)
        .withColumn("syms", _initial_symbols())
        .transform(tracked_local_checkpoint)
    )
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        rounds += 1
        m = max(1, min(int(batch_merges), n_merges - len(merges)))
        counts = symbol_pair_counts(frame).persist()
        try:
            # bounded collect: at most batch_merges rows
            top = (
                counts.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .limit(m)
                .collect()
            )
            top = [r for r in top if int(r["cnt"]) >= min_pair_count]
            if not top:
                break
            overs: list[int | None] = [None] * len(top)
            if len(top) > 1:
                # one bounded aggregate: for each candidate (a_i, b_i),
                # the max count over pairs (x, a_i) / (b_i, y) — the
                # upper bound on any pair its merge can create. The
                # candidate itself is excluded unless a_i == b_i (a
                # self-merge creates (a_i b_i, a_i b_i) runs bounded by
                # its own count).
                aggs = []
                for i, r in enumerate(top):
                    comp = (F.col("b") == F.lit(r["a"])) | (
                        F.col("a") == F.lit(r["b"])
                    )
                    if r["a"] != r["b"]:
                        comp = comp & ~(
                            (F.col("a") == F.lit(r["a"]))
                            & (F.col("b") == F.lit(r["b"]))
                        )
                    aggs.append(
                        F.max(F.when(comp, F.col("cnt"))).alias(f"o{i}")
                    )
                over_row = counts.agg(*aggs).first()
                overs = [over_row[f"o{i}"] for i in range(len(top))]
        finally:
            counts.unpersist()
        accepted: list[tuple[str, str, int]] = []
        used: set[str] = set()
        live_overs: list[int] = []
        for i, r in enumerate(top):
            a, b, cnt = r["a"], r["b"], int(r["cnt"])
            if accepted:
                if a in used or b in used:
                    break
                if any(ov >= cnt for ov in live_overs):
                    break
            accepted.append((a, b, cnt))
            used |= {a, b}
            if overs[i] is not None:
                live_overs.append(int(overs[i]))
        merges.extend(accepted)
        # apply the accepted prefix in order as one rewrite + one
        # checkpoint (k nested folds over the vocab-sized frame)
        for a, b, _ in accepted:
            frame = frame.withColumn("syms", _merge_pair(a, b))
        frame = frame.transform(tracked_local_checkpoint)
    if train_stats is not None:
        train_stats["rounds"] = rounds
        train_stats["merges"] = len(merges)
    return merges, frame


def bpe_vocab(segmented: DataFrame, size: int = 32768) -> DataFrame:
    """Subword vocabulary from a trained ``(word, freq, syms)`` frame:
    ``token, cnt, token_id`` by (count desc, token asc) rank — the
    build_vocab contract (operators/retrieval.py) over BPE symbols
    instead of whitespace tokens. Top-``size`` cut is
    TakeOrderedAndProject; the id window runs over the already-limited
    frame (bounded by the ``size`` parameter, never the corpus)."""
    counts = (
        segmented.select("freq", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").alias("cnt"))
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(size)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return top.withColumn(
        "token_id", (F.row_number().over(w) - 1).cast("int")
    )


def bpe_segment_corpus(
    docs: DataFrame,
    segmented: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode every document as its BPE symbol sequence: explode words
    in position order, LOOK UP each word's trained segmentation (the
    scale move — segmentation was computed once per DISTINCT word at
    train time; encoding is a join, typically broadcast since the
    vocab frame is MBs against a TB corpus, left to AQE because a web
    vocab CAN outgrow a broadcast), re-assemble per document.
    Out-of-vocabulary words (absent from training) fall back to
    char + end-of-word symbols. Returns ``doc_id, bpe_tokens
    (array<string>), n_bpe_tokens``."""
    words = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias(
            "pos", "word"
        ),
    ).filter(F.col("word") != "")
    looked = words.join(
        segmented.select("word", "syms"), "word", "left"
    ).withColumn(
        "syms",
        F.coalesce(
            F.col("syms"),
            F.concat(F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))),
        ),
    )
    return (
        looked.groupBy(id_col)
        .agg(
            F.flatten(
                F.expr("transform(array_sort(collect_list(struct(pos, syms))), x -> x.syms)")
            ).alias("bpe_tokens")
        )
        .withColumn("n_bpe_tokens", F.size("bpe_tokens"))
    )


def maxmunch_encode(
    docs: DataFrame,
    vocab: DataFrame,
    max_piece_len: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    unk_token: str = "[UNK]",
    probe_lengths: list[int] | None = None,
) -> DataFrame:
    """Greedy longest-match (max-munch) subword encoding against an
    arbitrary piece vocabulary — the WordPiece inference rule (Schuster
    & Nakajima 2012; BERT's tokenizer applies exactly this loop, with
    the ``##`` continuation marking being a vocab-construction detail
    orthogonal to the matching): at each position take the LONGEST
    vocab piece that matches, and if no piece matches at some position
    the whole word becomes ``unk_token``. Unlike bpe_segment_corpus's
    lookup (which needs the word seen at train time) this segments
    arbitrary OOV words through their in-vocab substrings.

    Returns ``doc_id, pieces (array<string>), n_pieces, n_unk``.

    Spark shape: one corpus scan; the word loop is a per-row
    ``aggregate`` over ``sequence(1, length(word))`` whose accumulator
    carries (pos, pieces, failed) — each step either consumes the
    longest match (a ``coalesce`` over the ``max_piece_len``
    fixed-length probes, each an O(1) ``element_at`` against the
    vocab MAP attached as a broadcast one-row crossJoin) or no-ops
    when the cursor has already passed it, so the whole DP stays in
    codegen'd expressions — no Python, no UDF. The DP runs once per
    DISTINCT word — the bpe_segment_corpus economics: corpus word
    occurrences outnumber distinct words by orders of magnitude, so
    the expression work is vocab-sized and encoding the occurrences is
    a join (typically broadcast, left to AQE since a web corpus's
    distinct-word table can outgrow one) followed by the
    position-sorted per-document re-assembly. Measured at sf0.1:
    per-occurrence DP 6.4 s steady-state → distinct-word DP + join
    well under a second.

    ``max_piece_len`` bounds the probe fan-out; pieces longer than it
    are never matched (callers with longer vocab entries raise it —
    the trained-vocab max length is one bounded agg away)."""
    # unk_token is interpolated into a raw SQL aggregate expression
    # below; a quote or backslash would break parsing / allow
    # expression injection (ADVICE r10)
    if any(c in unk_token for c in "'\\\""):
        raise ValueError(
            "unk_token must not contain quotes or backslashes "
            f"(got {unk_token!r})"
        )
    # Probe-length pruning (round-18, VERDICT task 6): a probe of
    # length l can only ever match when some vocab piece HAS length l,
    # so a caller that knows the vocabulary's piece-length set (one
    # bounded agg over the vocab frame) passes it here and the DP
    # evaluates len(probe_lengths) arms per step instead of
    # max_piece_len. Contract: probe_lengths must cover every piece
    # length ≤ max_piece_len present in the vocab — lengths absent
    # from the vocab are free to omit because their element_at probe
    # is NULL on every word position by construction.
    if probe_lengths is None:
        lens = list(range(max_piece_len, 0, -1))
    else:
        lens = sorted({int(l) for l in probe_lengths}, reverse=True)
        if not lens or lens[0] > max_piece_len or lens[-1] < 1:
            raise ValueError(
                f"probe_lengths must lie in [1, {max_piece_len}], got {probe_lengths!r}"
            )
    vocab_map = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("token"), F.lit(1)))
        ).alias("__vm")
    )
    # the _shingle_stream parallelism guard (operators/dedup.py:64):
    # the occurrence join + per-doc re-assembly downstream inherit THIS
    # frame's partitioning, and a small parquet scan (one sf1 file → 2
    # partitions) serializes the 3M-row occurrence pipeline — measured
    # 6.4 → 2.6 s warm at sf1 after spreading the raw text first
    base = docs
    sc = docs.sparkSession.sparkContext
    if base.rdd.getNumPartitions() < sc.defaultParallelism:
        base = base.repartition(F.col(id_col))
    words = base.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias(
            "pos", "word"
        ),
    ).filter(F.col("word") != "")
    distinct_words = words.select("word").distinct().crossJoin(
        F.broadcast(vocab_map)
    )
    # longest in-vocab piece at cursor acc.pos: probe the pruned
    # lengths longest-first, first hit wins. The matched piece is
    # bound ONCE per step through a 1-element nested aggregate — the
    # pre-r18 form repeated coalesce({probes}) three times (the WHEN,
    # the pos advance, the append) and HOF lambdas evaluate
    # interpreted with no common-subexpression elimination, so every
    # consumed position paid the probe chain three times.
    probes = ", ".join(
        f"CASE WHEN element_at(__vm, substr(word, acc.pos, {l})) IS NOT NULL "
        f"AND acc.pos + {l} - 1 <= length(word) "
        f"THEN substr(word, acc.pos, {l}) END"
        for l in lens
    )
    step = f"""
    aggregate(
      sequence(1, length(word)),
      named_struct('pos', 1, 'pieces', CAST(array() AS ARRAY<STRING>),
                   'failed', false),
      (acc, i) -> CASE
        WHEN acc.failed OR acc.pos > length(word) OR i < acc.pos THEN acc
        ELSE aggregate(
          array(coalesce({probes})), acc,
          (a, m) -> CASE
            WHEN m IS NULL
            THEN named_struct('pos', a.pos, 'pieces', a.pieces,
                              'failed', true)
            ELSE named_struct(
              'pos', a.pos + length(m),
              'pieces', array_append(a.pieces, m),
              'failed', false)
          END) END,
      acc -> named_struct(
        'pieces', CASE WHEN acc.failed THEN array('{unk_token}')
                       ELSE acc.pieces END,
        'failed', acc.failed))
    """
    seg = distinct_words.select("word", F.expr(step).alias("res")).select(
        "word",
        F.col("res.pieces").alias("syms"),
        F.col("res.failed").alias("__failed"),
    )
    # shuffle_hash with seg as build side: seg is ≤ distinct-words
    # (bounded by vocabulary), words is the occurrence stream — but
    # Catalyst sizes the occurrence side from the compact parquet scan
    # underneath it and was observed BROADCASTING the 3M-row exploded
    # occurrence frame at sf1 (driver HashedRelation of the whole
    # corpus — the containment-join pathology, round 11). Building on
    # seg is safe at any scale, never broadcasts, and leaves AQE free
    # to skew-split the probe side's hot words (Zipf head).
    # (Round-18 measured and REJECTED a size-gated broadcast of seg —
    # scoped-persist the distinct-word table, count it, broadcast under
    # 200k words: the eager materialize+count serializes work that the
    # shuffle plan overlaps with the seg-build chain, and the word
    # exchange it removes was never on the critical path — gate wall
    # 1.29 → 1.46 s at sf0.1. The shuffle form stays.)
    enc = words.join(seg.hint("shuffle_hash"), "word").select(
        id_col, "pos", "syms", "__failed"
    )
    return (
        enc.groupBy(id_col)
        .agg(
            F.flatten(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, syms))),"
                    " x -> x.syms)"
                )
            ).alias("pieces"),
            # count of FAILED word occurrences (each contributes one
            # unk piece) — not of pieces textually equal to unk_token,
            # which would miscount when a legitimate vocab piece
            # happens to equal the unk string (ADVICE r10)
            F.sum(F.col("__failed").cast("int")).cast("int").alias("n_unk"),
        )
        .select(
            id_col,
            "pieces",
            F.size("pieces").alias("n_pieces"),
            F.col("n_unk"),
        )
    )
