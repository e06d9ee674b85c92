"""Exact duplicated-substring detection and removal (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better" — public
paper, the ExactSubstr operator).

The paper's single-machine form builds a corpus-wide suffix array; the
Spark-first decomposition used here is the standard rolling-window
equivalent deployed in large-pipeline practice: any duplicated
substring of >= k tokens necessarily contains a duplicated k-token
gram, so

  1. slide a k-token gram window over every document (codegen'd
     slice/arrays-zip expressions — the `_shingle_stream` lesson from
     operators/dedup.py applies: HOF lambdas evaluate interpreted),
  2. count gram occurrences corpus-wide keyed on the 32-byte sha256 of
     the gram (fixed-width shuffle key, never the text),
  3. keep-first: the occurrence with the smallest exact-int
     ``doc_id * 1e6 + pos`` key survives, every other occurrence of a
     duplicated gram is REMOVABLE (mirrors paragraph_dedup's winner
     rule, dedup.py:576),
  4. merge each document's removable gram positions into maximal
     duplicated SPANS with a gaps-and-islands pass (lag + running sum
     windows partitioned by doc_id — per-doc state only),
  5. optionally strip the spans' tokens from the text.

Scale shape (100 TB contract): the gram stream is one scan + explode
(k× row amplification, same as MinHash shingling); the occurrence
count + winner rule is ONE window keyed on the uniformly-distributed
digest (no null class, no agg+self-join subtree recompute — the
single-scan paragraph_dedup form); islands shuffle once on doc_id and
the per-doc window state is only that document's duplicated positions.
Nothing is ever |corpus|²; work scales with duplicated grams. Span
REMOVAL joins spans back to docs and rewrites tokens only for
documents that have at least one span (inner join + union of the
untouched remainder), so the interpreted-lambda rewrite cost is paid
solely on affected documents.

Reference parity note: the reference pipeline (parsedmarc-go) has no
sub-document dedup at all — this is an LLM-pipeline staple layered on
the dedup machinery, like paragraph_dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# keep-first ordering key: doc_id * _KEY_BASE + pos must be
# collision-free in an int64 (1e12 docs x 1e6 gram positions/doc)
_KEY_BASE = 1_000_000


def _gram_stream(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    ensure_parallelism: bool = True,
) -> DataFrame:
    """(doc_id, pos, gh) stream of k-token gram digests, one row per
    gram position, 0-based ``pos``. Tokenization is lowercase +
    single-space split (the text_chunking / decontamination convention,
    so the same tokens feed every sub-document operator). Documents
    shorter than k tokens emit nothing. All of split/slice/concat stays
    inside whole-stage codegen.

    ``ensure_parallelism`` is the _shingle_stream guard (dedup.py:64):
    the gram generation + sha256 is the CPU-heavy phase, and inheriting
    a small parquet scan's partitioning serializes it — measured at sf1
    (one scan file → 2 partitions): the gram stream alone cost 3.3 s of
    the 6.5 s gate wall; repartitioning the RAW text first spreads it
    over every core. Derived/joined inputs that already carry full
    parallelism pass False to skip the df.rdd partition probe."""
    base = docs
    sc = docs.sparkSession.sparkContext
    if ensure_parallelism and docs.rdd.getNumPartitions() < sc.defaultParallelism:
        # repartition the RAW text (before split/explode) so the serial
        # single-file scan stage only reads + shuffles compact strings
        base = base.repartition(F.col(id_col))
    toks = base.select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), " ").alias("toks")
    ).filter(F.size("toks") >= k)
    # < 1e6 grams/doc guard for the keep-first ``okey``, applied per
    # document on the pre-explode token array (one comparison per doc,
    # not per gram row) and over the FULL gram stream — not only emitted
    # spans: a giant document whose high positions are unique or
    # keep-first winners still collides its okey range into the next
    # doc_id's and can silently flip a min(okey) winner.
    toks = toks.withColumn(
        "toks",
        F.when(
            F.size("toks") - (k - 1) >= _KEY_BASE,
            F.raise_error(
                F.concat(
                    F.lit("_gram_stream: document "),
                    F.col(id_col).cast("string"),
                    F.lit(" has >= 1e6 gram positions; keep-first key overflows"),
                )
            ).cast("array<string>"),
        ).otherwise(F.col("toks")),
    )
    # Codegen'd arrays_zip-over-slices gram stream, NOT a transform
    # lambda under the generator (round-17, the decontamination
    # long-document finding — operators/curation.py::_ngram_stream):
    # projection collapse can inline the split() alias into a lambda
    # body, re-splitting the whole document per ELEMENT under the
    # generator's inferred size()>0 predicate — O(tokens²)/doc. This
    # site was protected only by ACCIDENT (the raise_error guard above
    # blocks the collapse); the zip shape is immune by construction.
    m = F.size("toks") - (k - 1)
    zipped = F.arrays_zip(*[F.slice("toks", 1 + j, m) for j in range(k)])
    return toks.select(
        F.col(id_col), F.posexplode(zipped).alias("pos", "z")
    ).select(
        id_col,
        "pos",
        F.sha2(
            F.concat_ws(" ", *[F.col(f"z.{j}") for j in range(k)]), 256
        ).alias("gh"),
    )


def duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    keep_first: bool = True,
    seen_keys: DataFrame | None = None,
    salted: bool = False,
    n_salts: int = 64,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    A k-token gram is *duplicated* when it occurs more than once
    corpus-wide (across documents or repeated within one). With
    ``keep_first=True`` (the ExactSubstr semantic) the first occurrence
    — smallest ``(doc_id, pos)`` — is exempt, so exactly one copy of
    every duplicated substring survives removal; ``keep_first=False``
    marks every occurrence (the "flag all duplicated text" audit view).

    ``seen_keys`` (a frame with a ``gh`` column of gram sha256 digests
    — the streaming fingerprint store, streaming/dedup.py) makes the
    pass INCREMENTAL: a gram whose digest appears there is removable
    even as a first-in-this-corpus occurrence (its true first
    occurrence lives in history), so stream-over-shards equals
    batch-over-the-union for ascending shards. Joined on the digest
    (shuffle keyed on gh), never collected.

    Overlapping / adjacent removable grams merge into islands: grams at
    positions p1 < p2 belong to one span when ``p2 - p1 <= k`` (their
    token coverage [p, p+k) overlaps or touches). Returns one row per
    span: ``doc_id, span_start, span_end, n_dup_grams`` with token
    indices, ``span_end`` exclusive.

    The < 1e6 grams/doc bound of the keep-first key is enforced in
    ``_gram_stream``, per document on the pre-explode token array —
    covering every gram position, not just those inside emitted spans,
    at one comparison per document (a per-row guard on the hot gram
    stream measured far worse in paragraph_dedup).
    """
    g = _gram_stream(docs, id_col, text_col, k).withColumn(
        "okey", F.col(id_col).cast("long") * _KEY_BASE + F.col("pos")
    )
    if salted:
        # Two-phase skew fallback (VERDICT r10 task 5; the salted_agg
        # idiom, operators/skew.py): a corpus-scale hot gram — site
        # boilerplate repeated 10⁸× — lands its ENTIRE occurrence list
        # in one window partition above, and window exchanges get no
        # help from AQE. Here the count+min fold first spreads over
        # (gh, salt) reducers (map-side combine bounds each partial),
        # merges S partials per digest, and rejoins the bounded
        # (gh, cnt, min_okey) stats to the gram stream — a shuffle
        # JOIN, which AQE's OptimizeSkewedJoin can split when the
        # probe side's hot partition exceeds the skew threshold.
        # Output is equality-pinned to the window path in
        # test_substring; default stays the single-window form (one
        # shuffle cheaper) for corpora without pathological grams.
        salt = F.pmod(F.xxhash64("okey"), F.lit(n_salts)).alias("__salt")
        partial = (
            g.withColumn("__salt", salt)
            .groupBy("gh", "__salt")
            .agg(F.count("*").alias("__c"), F.min("okey").alias("__m"))
        )
        stats = partial.groupBy("gh").agg(
            F.sum("__c").alias("__cnt"), F.min("__m").alias("__min_okey")
        )
        flagged = g.join(stats, "gh").select(
            id_col,
            "pos",
            "gh",
            (F.col("__cnt") >= 2).alias("is_dup"),
            (F.col("okey") == F.col("__min_okey")).alias("is_winner"),
        )
    else:
        # one digest-keyed window gives both the duplicate test and the
        # winner rule — no count-agg + self-join subtree recompute
        w = Window.partitionBy("gh")
        flagged = g.select(
            id_col,
            "pos",
            "gh",
            (F.count("*").over(w) >= 2).alias("is_dup"),
            (F.col("okey") == F.min("okey").over(w)).alias("is_winner"),
        )
    cond = F.col("is_dup") & (~F.col("is_winner") if keep_first else F.lit(True))
    if seen_keys is not None:
        # seen_keys must be gh-DISTINCT (contract — same as
        # paragraph_dedup's seen path): the membership join is a plain
        # left join, so duplicate digests would duplicate gram rows.
        # The streaming gram store is distinct by construction
        # (asserted in test_streaming_dedup, not recomputed per batch).
        seen = seen_keys.select("gh").withColumn("__seen", F.lit(True))
        flagged = flagged.join(seen, "gh", "left")
        cond = cond | F.col("__seen").isNotNull()
    removable = flagged.filter(cond)
    dw = Window.partitionBy(id_col).orderBy("pos")
    islands = removable.select(
        id_col,
        "pos",
        F.when(F.col("pos") - F.lag("pos").over(dw) <= k, 0)
        .otherwise(1)
        .alias("brk"),
    ).withColumn(
        "island", F.sum("brk").over(dw.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
            F.count("*").alias("n_dup_grams"),
        )
        .select(id_col, "span_start", "span_end", "n_dup_grams")
    )


def strip_duplicated_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rewrite each document with its duplicated spans' tokens removed.

    ``spans`` is the ``duplicated_spans`` output (token-index
    [span_start, span_end) intervals, disjoint per document by
    construction). Returns ``doc_id, dedup_text, n_tokens,
    n_tokens_removed`` for EVERY input document — untouched documents
    pass through without paying the rewrite.

    The rewrite joins the per-doc span list (collect_list of disjoint
    intervals — bounded by n_tokens/k per doc) onto only the AFFECTED
    documents and drops tokens whose position falls inside any span
    with a filter-over-positions expression; the untouched remainder
    unions back with zero rewrite cost. The ORIGINAL text is split —
    single-space token boundaries are case-independent, so span indices
    from the lowercased digest path line up exactly, and surviving
    tokens keep their original casing (lowercasing belongs only to the
    dedup KEYS; a training corpus must not be silently case-folded by
    its dedup pass — the reference ExactSubstr strips from the original
    text, and paragraph_dedup likewise preserves raw paragraph text)."""
    doc_spans = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans"),
        F.sum(F.col("span_end") - F.col("span_start")).alias("__span_tokens"),
    )
    toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("toks")
    )
    hit = toks.join(doc_spans, id_col, "inner")
    # spans never extend past the token count, so removed = span length;
    # the exists() lambda is interpreted, but runs only on affected docs
    rewritten = hit.select(
        id_col,
        F.array_join(
            F.transform(
                F.filter(
                    F.transform(
                        F.col("toks"),
                        lambda t, i: F.struct(t.alias("t"), i.alias("i")),
                    ),
                    lambda s: ~F.exists(
                        F.col("spans"),
                        lambda sp: (s["i"] >= sp["span_start"])
                        & (s["i"] < sp["span_end"]),
                    ),
                ),
                lambda s: s["t"],
            ),
            " ",
        ).alias("dedup_text"),
        F.size("toks").alias("n_tokens"),
        F.col("__span_tokens").cast("long").alias("n_tokens_removed"),
    )
    untouched = toks.join(doc_spans.select(id_col), id_col, "left_anti").select(
        id_col,
        F.array_join("toks", " ").alias("dedup_text"),
        F.size("toks").alias("n_tokens"),
        F.lit(0).cast("long").alias("n_tokens_removed"),
    )
    return rewritten.unionByName(untouched)


def substring_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    seen_keys: DataFrame | None = None,
) -> DataFrame:
    """ExactSubstr end-to-end: detect duplicated >= k-token spans with
    the keep-first rule and strip them, leaving exactly one occurrence
    of every duplicated substring corpus-wide. Composition of
    ``duplicated_spans`` + ``strip_duplicated_spans``; ``seen_keys``
    threads the streaming gram store through (incremental form)."""
    spans = duplicated_spans(
        docs, id_col, text_col, k=k, keep_first=True, seen_keys=seen_keys
    )
    return strip_duplicated_spans(docs, spans, id_col, text_col)


def gram_keys(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Distinct k-gram digests of a document frame — the unit the
    streaming gram store persists (streaming/dedup.py mode
    ``substring``). Must use the exact tokenize/gram/digest pipeline of
    ``duplicated_spans`` so store membership and dedup keys can never
    drift apart. Digests are of the ORIGINAL text (pre-strip): a later
    occurrence of any gram ever seen is by definition not the first,
    so it must probe removable."""
    return _gram_stream(docs, id_col, text_col, k).select("gh").distinct()
