"""Text-analysis + deduplication queries over the `documents` table,
with DuckDB oracles wherever the semantics are SQL-expressible.

LSH-family queries (MinHash banding, SimHash) depend on Spark-side hash
functions (xxhash64/murmur) DuckDB does not implement, so they register
rows-only; their recall against the exact operators is asserted in
tests/test_dedup.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parsedmarc_go_spark.functions.text import (
    STOPWORDS,
    distinct_token_count,
    fingerprint16,
    lang_id,
    normalized_text,
    quality_score,
    regex_token_count,
    stopword_hits,
    token_count,
)
from parsedmarc_go_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    paragraph_dedup,
    simhash_pairs,
)
from parsedmarc_go_spark.plans.registry import query
from parsedmarc_go_spark.tables import load

_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)


# ---------------------------------------------------------------------------
@query(
    "text_token_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, n_chars, string_split(lower(text), ' ') AS toks, lower(text) AS lt
               FROM documents)
    SELECT doc_id,
           n_chars,
           len(toks) AS n_tokens,
           len(regexp_extract_all(lt, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_regex_tokens,
           len(list_distinct(toks)) AS n_distinct,
           len(list_filter(toks, x -> x IN ({_STOP_IN}))) AS stop_hits
    FROM t
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").withColumn("toks", F.split(F.lower("text"), " "))
    return docs.select(
        "doc_id",
        "n_chars",
        token_count("text").alias("n_tokens"),
        regex_token_count("text").alias("n_regex_tokens"),
        distinct_token_count("toks").alias("n_distinct"),
        stopword_hits("toks").alias("stop_hits"),
    )


@query(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS nt,
             CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE) AS nd,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN ({_STOP_IN}))) AS DOUBLE) AS sh
      FROM documents)
    SELECT doc_id,
           0.4 * LEAST(nt / 80.0, 1.0) + 0.4 * (nd / nt) + 0.2 * (1.0 - sh / nt) AS quality
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .withColumn("toks", F.split(F.lower("text"), " "))
        .withColumn("nt", token_count("text"))
        .withColumn("nd", distinct_token_count("toks"))
        .withColumn("sh", stopword_hits("toks"))
    )
    return docs.select("doc_id", quality_score("nt", "nd", "sh").alias("quality"))


@query(
    "text_lang_id",
    oracle="""
    WITH t AS (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS p FROM documents)
    SELECT doc_id, lang,
           CASE WHEN contains(p, ' der ') THEN 'de'
                WHEN contains(p, ' und ') THEN 'de'
                WHEN contains(p, ' le ') THEN 'fr'
                WHEN contains(p, ' et ') THEN 'fr'
                WHEN contains(p, ' el ') THEN 'es'
                WHEN contains(p, ' que ') THEN 'es'
                WHEN contains(p, '的') THEN 'zh'
                ELSE 'en' END AS predicted_lang
    FROM t
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", lang_id("text").alias("predicted_lang"))


@query(
    "doc_fingerprint",
    oracle="""
    WITH t AS (SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm_text
               FROM documents)
    SELECT doc_id, norm_text,
           substr(sha256(norm_text), 1, 16) AS fp16,
           md5(norm_text) AS fp_md5
    FROM t
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").withColumn("norm_text", normalized_text("text"))
    return docs.select(
        "doc_id",
        "norm_text",
        fingerprint16(F.col("norm_text")).alias("fp16"),
        F.md5("norm_text").alias("fp_md5"),
    )


# ---------------------------------------------------------------------------
@query(
    "dedup_exact",
    # fingerprint output (keep_text=False): the digest IS the content
    # identity, the agg buffers stay fixed-width (HashAggregate, not the
    # SortAggregate a string buffer forces), and the gate checks the
    # exact sha256 bytes both engines compute from the normalized text
    oracle="""
    SELECT sha256(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS dup_count
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(
        load(spark, sf_dir, "documents"), "doc_id", "text", keep_text=False
    )


_NGRAM_JACCARD_ORACLE = """
    WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    sh AS MATERIALIZED (
      SELECT doc_id AS doc,
             unnest(list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(generate_series(1, len(toks) - 2),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [] END)) AS shingle
      FROM d),
    n AS MATERIALIZED (SELECT doc, COUNT(*) AS n_shingles FROM sh GROUP BY 1),
    p AS MATERIALIZED (SELECT a.doc AS da, b.doc AS db, COUNT(*) AS shared
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
          GROUP BY 1, 2)
    SELECT p.da AS doc_a, p.db AS doc_b,
           na.n_shingles AS n_a, nb.n_shingles AS n_b, p.shared AS shared,
           CAST(p.shared AS DOUBLE)
             / CAST(na.n_shingles + nb.n_shingles - p.shared AS DOUBLE) AS jaccard
    FROM p JOIN n na ON p.da = na.doc JOIN n nb ON p.db = nb.doc
    WHERE CAST(p.shared AS DOUBLE)
             / CAST(na.n_shingles + nb.n_shingles - p.shared AS DOUBLE) >= {thr}
"""


@query("dedup_ngram_jaccard", oracle=_NGRAM_JACCARD_ORACLE.format(thr=0.6))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(load(spark, sf_dir, "documents"), threshold=0.6)


# MinHash+LSH: the candidate generation is approximate (xxhash64
# signatures, not reproducible in DuckDB) but every candidate is
# verified with EXACT Jaccard, so the output equals the exact operator
# whenever LSH recall is complete — which tests/test_dedup.py asserts
# at both gate SFs (K=32, b=16, r=2 ⇒ P(miss | j≥0.7) ≤ 2e-5). The
# oracle is therefore the same exact-Jaccard SQL at the 0.7 threshold.
@query("dedup_minhash_lsh", oracle=_NGRAM_JACCARD_ORACLE.format(thr=0.7))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(load(spark, sf_dir, "documents"), threshold=0.7)


@query("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only gate, run with the hot-bucket guard ON (r11): the
    closed-vocabulary corpus drives near-identical 64-bit simhashes, so
    unguarded band buckets grow to thousands of members and the pair
    explosion is quadratic in the hottest bucket (measured ~3 min/run
    at sf1 unguarded vs seconds guarded). That is precisely the
    operator's documented production posture — exact dedup first, then
    simhash with max_bucket + stats so oversized buckets are dropped
    LOUDLY, never silently (operators/dedup.py::simhash_banded_pairs).
    Operator-level recall/equality semantics stay pinned on planted
    fixtures in tests/test_dedup.py with the guard off."""
    return simhash_pairs(
        load(spark, sf_dir, "documents"), max_hamming=6, max_bucket=256
    )


@query("doc_winnowing_fingerprints")
def doc_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash winnowing fingerprints (rows-only: xxhash64 grams
    are not reproducible in DuckDB; tests assert parity against a pure-
    Python winnowing reference)."""
    from parsedmarc_go_spark.functions.text import winnowing_fingerprints

    return winnowing_fingerprints(load(spark, sf_dir, "documents"))


# Paragraph-level dedup gate: the synthetic documents have no paragraph
# structure, so BOTH engines assemble the identical 4-paragraph text per
# document (the text_pii_redact injection template): two boilerplate
# paragraphs shared across doc_id % 5 / % 4 classes (so keep-first
# removes ~all of them) interleaved with two slices of the document's
# own text (mostly unique). Keep-first winner = min(doc_id*1e6 + pos),
# re-assembly order = pos — both exact-int, so the gate value-checks
# the re-assembled text cell-for-cell.
_PARAGRAPH_ORACLE = """
    WITH base AS (
      SELECT doc_id,
             'intro-' || CAST(doc_id % 5 AS VARCHAR) AS p0,
             substr(text, 1, 120) AS p1,
             'footer-' || CAST(doc_id % 4 AS VARCHAR) AS p2,
             substr(text, 121, 160) AS p3
      FROM documents),
    p AS (
      SELECT doc_id, pos, para FROM (
        SELECT doc_id, 0 AS pos, p0 AS para FROM base
        UNION ALL SELECT doc_id, 1, p1 FROM base
        UNION ALL SELECT doc_id, 2, p2 FROM base
        UNION ALL SELECT doc_id, 3, p3 FROM base)
      WHERE len(para) > 0),
    firsts AS (SELECT para, min(doc_id * 1000000 + pos) AS first_key
               FROM p GROUP BY para),
    kept AS (SELECT p.doc_id, p.pos, p.para
             FROM p JOIN firsts ON p.para = firsts.para
             WHERE p.doc_id * 1000000 + p.pos = firsts.first_key),
    tot AS (SELECT doc_id, count(*) AS n_paras FROM p GROUP BY doc_id),
    ka AS (SELECT doc_id, count(*) AS n_kept,
                  string_agg(para, '<P>' ORDER BY pos) AS dedup_text
           FROM kept GROUP BY doc_id)
    SELECT tot.doc_id, tot.n_paras,
           COALESCE(ka.n_kept, 0) AS n_kept,
           CAST(tot.n_paras - COALESCE(ka.n_kept, 0) AS DOUBLE)
             / CAST(tot.n_paras AS DOUBLE) AS para_frac_removed,
           COALESCE(ka.dedup_text, '') AS dedup_text
    FROM tot LEFT JOIN ka USING (doc_id)
"""


@query("dedup_paragraph", oracle=_PARAGRAPH_ORACLE)
def dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style paragraph-level exact dedup end-to-end: explode →
    keep-first corpus-wide on the paragraph sha256 → re-assemble in
    original order, plus the paragraph-fraction-removed stat (the CCNet
    shard-dedup signal). See operators/dedup.py:paragraph_dedup for the
    100 TB shape."""
    docs = load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    itext = F.concat_ws(
        "<P>",
        F.concat(F.lit("intro-"), (d % 5).cast("string")),
        F.substring("text", 1, 120),
        F.concat(F.lit("footer-"), (d % 4).cast("string")),
        F.substring("text", 121, 160),
    )
    t = docs.select("doc_id", itext.alias("text"))
    return paragraph_dedup(t, "doc_id", "text", sep="<P>")


# Fuzzy paragraph dedup gate (round 9): near-identical paragraphs —
# case/whitespace variants of a shared header planted per doc_id % 3
# class — must collapse under normalize=True. Both engines use the
# identical normalization (collapse \\s+ to one space, trim, lower), so
# the gate value-checks the surviving RAW text cell-for-cell. Born
# demoted: its machinery is dedup_paragraph (in-window) + the
# normalized_text expression family; pytest value-checks it at two SFs.
_PARAGRAPH_FUZZY_ORACLE = """
    WITH base AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0
                  THEN upper('common header ' || CAST(doc_id % 3 AS VARCHAR))
                  ELSE 'common  header ' || CAST(doc_id % 3 AS VARCHAR) END AS p0,
             substr(text, 1, 120) AS p1
      FROM documents),
    p AS (
      SELECT doc_id, pos, para FROM (
        SELECT doc_id, 0 AS pos, p0 AS para FROM base
        UNION ALL SELECT doc_id, 1, p1 FROM base)
      WHERE len(para) > 0),
    pn AS (SELECT doc_id, pos, para,
                  lower(trim(regexp_replace(para, '\\s+', ' ', 'g'))) AS nk
           FROM p),
    firsts AS (SELECT nk, min(doc_id * 1000000 + pos) AS first_key
               FROM pn GROUP BY nk),
    kept AS (SELECT pn.doc_id, pn.pos, pn.para
             FROM pn JOIN firsts ON pn.nk = firsts.nk
             WHERE pn.doc_id * 1000000 + pn.pos = firsts.first_key),
    tot AS (SELECT doc_id, count(*) AS n_paras FROM p GROUP BY doc_id),
    ka AS (SELECT doc_id, count(*) AS n_kept,
                  string_agg(para, '<P>' ORDER BY pos) AS dedup_text
           FROM kept GROUP BY doc_id)
    SELECT tot.doc_id, tot.n_paras,
           COALESCE(ka.n_kept, 0) AS n_kept,
           CAST(tot.n_paras - COALESCE(ka.n_kept, 0) AS DOUBLE)
             / CAST(tot.n_paras AS DOUBLE) AS para_frac_removed,
           COALESCE(ka.dedup_text, '') AS dedup_text
    FROM tot LEFT JOIN ka USING (doc_id)
"""


@query("dedup_paragraph_fuzzy", oracle=_PARAGRAPH_FUZZY_ORACLE)
def dedup_paragraph_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (normalized-key) paragraph dedup: spacing/case variants of
    the same paragraph collapse to the first RAW occurrence. See
    operators/dedup.py:paragraph_dedup(normalize=True)."""
    docs = load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    cls = (d % 3).cast("string")
    p0 = F.when(
        d % 2 == 0, F.upper(F.concat(F.lit("common header "), cls))
    ).otherwise(F.concat(F.lit("common  header "), cls))
    itext = F.concat_ws("<P>", p0, F.substring("text", 1, 120))
    t = docs.select("doc_id", itext.alias("text"))
    return paragraph_dedup(t, "doc_id", "text", sep="<P>", normalize=True)


# Exact-substring dedup gate (round 9, Lee et al. 2021 ExactSubstr):
# the synthetic documents share no natural >= 8-token runs, so both
# engines plant an identical 10-token run (class = doc_id % 7) between
# two slices of the document's own text. The duplicated-gram winner
# rule and island merge are exact-int, so the gate value-checks every
# span cell-for-cell. Born demoted: its machinery is hash-checked
# in-window piecewise — the slice/transform gram family by
# text_chunking + decontaminate_ngram, the keep-first winner key by
# dedup_paragraph, the lag/running-sum island windows by
# e1_sessionize + a19_running_total; pytest value-checks this gate
# whole at two SFs like every oracle-bearing query.
_SUBSTR_K = 8
_SUBSTR_ORACLE = f"""
    WITH base AS (
      SELECT doc_id,
             substr(text, 1, 100)
               || ' dupseg alpha bravo charlie delta echo foxtrot golf hotel class'
               || CAST(doc_id % 7 AS VARCHAR) || ' '
               || substr(text, 101, 100) AS text
      FROM documents),
    d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM base),
    g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                 array_to_string(toks[i : i + {_SUBSTR_K - 1}], ' ') AS gram
          FROM d, unnest(range(1, len(toks) - {_SUBSTR_K - 2})) AS t(i)
          WHERE len(toks) >= {_SUBSTR_K}),
    f AS (SELECT doc_id, pos,
                 count(*) OVER (PARTITION BY gram) AS cnt,
                 min(doc_id * 1000000 + pos) OVER (PARTITION BY gram) AS wk,
                 doc_id * 1000000 + pos AS okey
          FROM g),
    r AS (SELECT doc_id, pos FROM f WHERE cnt >= 2 AND okey <> wk),
    i AS (SELECT doc_id, pos,
                 CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                           <= {_SUBSTR_K}
                      THEN 0 ELSE 1 END AS brk
          FROM r),
    s AS (SELECT doc_id, pos,
                 SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
          FROM i)
    SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
           CAST(max(pos) + {_SUBSTR_K} AS INT) AS span_end,
           count(*) AS n_dup_grams
    FROM s GROUP BY doc_id, island
"""


@query("dedup_substring_spans", oracle=_SUBSTR_ORACLE)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr duplicated-span detection: corpus-wide duplicated
    k-token grams, keep-first winner exempt, overlapping grams merged
    into maximal spans. See operators/substring.py for the 100 TB
    shape (one digest-keyed window + one doc_id-keyed island pass)."""
    from parsedmarc_go_spark.operators.substring import duplicated_spans

    docs = load(spark, sf_dir, "documents")
    itext = F.concat(
        F.substring("text", 1, 100),
        F.lit(
            " dupseg alpha bravo charlie delta echo foxtrot golf hotel class"
        ),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(" "),
        F.substring("text", 101, 100),
    )
    t = docs.select("doc_id", itext.alias("text"))
    return duplicated_spans(t, "doc_id", "text", k=_SUBSTR_K)


# ---------------------------------------------------------------------------
# Training-data pipeline additions (round 2): chunking, TF-IDF, cluster
# components — each with a full DuckDB oracle.
# ---------------------------------------------------------------------------

_CHUNK_SIZE, _CHUNK_STRIDE = 32, 24  # 8-token overlap


@query(
    "text_chunking",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    s AS (SELECT doc_id, toks, unnest(range(0, len(toks), {_CHUNK_STRIDE})) AS start FROM d)
    SELECT doc_id,
           CAST(start / {_CHUNK_STRIDE} AS INT) AS chunk_idx,
           array_to_string(toks[start + 1 : start + {_CHUNK_SIZE}], ' ') AS chunk_text,
           len(toks[start + 1 : start + {_CHUNK_SIZE}]) AS n_chunk_tokens
    FROM s
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token windows with overlap (size 32, stride 24) — the
    standard LLM-pretraining chunker, as pure sequence/explode/slice
    column expressions (no shuffle: chunk rows inherit the scan
    partitioning)."""
    docs = load(spark, sf_dir, "documents").withColumn("toks", F.split(F.lower("text"), " "))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("toks") - 1, F.lit(0)), F.lit(_CHUNK_STRIDE)
    )
    return (
        docs.select("doc_id", "toks", F.explode(starts).alias("start"))
        .filter(F.col("start") < F.size("toks"))
        .select(
            "doc_id",
            (F.col("start") / _CHUNK_STRIDE).cast("int").alias("chunk_idx"),
            F.array_join(F.slice("toks", F.col("start") + 1, _CHUNK_SIZE), " ").alias(
                "chunk_text"
            ),
            F.size(F.slice("toks", F.col("start") + 1, _CHUNK_SIZE)).alias("n_chunk_tokens"),
        )
    )


@query(
    "text_tfidf_topk",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
             ROUND(tf.tf * (LN((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0), 4) AS tfidf,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, tf.token ASC) AS rn
      FROM tf JOIN dfreq USING (token) CROSS JOIN n)
    SELECT doc_id, token, tf, df, tfidf FROM scored WHERE rn <= 5
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document. Two hash aggregates (term
    frequency per doc, document frequency per term — the df side is a
    small dim, broadcast back), smoothed idf = ln((N+1)/(df+1)) + 1,
    per-doc top-k via row_number with a total-order tie-break (tf desc,
    token asc) so selection is engine-independent."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    # corpus size as a broadcast 1-row frame, NOT docs.count(): the
    # count() ran an eager extra job (a full scan of documents) inside
    # the query BUILDER; the crossJoin keeps the whole plan lazy and
    # Catalyst turns a broadcast 1-row cross join into a free
    # BroadcastNestedLoopJoin over a single row
    n_df = docs.agg(F.count("*").alias("__n_docs"))
    toks = docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_df))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * (F.log((F.col("__n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "token", "tf", "df", "tfidf")
    )


@query(
    "dedup_cluster_components",
    # pairs/edges are MATERIALIZED (r12 pipeline-oracle treatment,
    # VERDICT r12 task 3): DuckDB inlines multi-referenced CTEs, so the
    # un-hinted form re-ran the whole Σdf² pair computation once per
    # reference — edges alone reads pairs twice, and every recursive
    # iteration of reach re-touched the inlined edges subtree. The sf1
    # sweep paid 700 s for what is a ~bounded closure over a small
    # near-dup graph.
    oracle=f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({_NGRAM_JACCARD_ORACLE.format(thr=0.6)}),
    edges AS MATERIALIZED (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    lbl AS (SELECT a AS doc, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a)
    SELECT doc, cluster_id FROM lbl
    """,
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the exact-Jaccard
    pair graph (threshold 0.6), cluster id = smallest member. The
    DuckDB oracle computes the same components via a recursive-CTE
    transitive closure; Spark's default engine is large-star/small-star
    (operators.dedup.neardup_clusters → neardup_clusters_bigstar,
    O(log n) rounds — chain-safe; VERDICT r10 made it the default
    behind this gate, identical label table)."""
    from parsedmarc_go_spark.operators.dedup import neardup_clusters

    pairs = ngram_jaccard_pairs(load(spark, sf_dir, "documents"), threshold=0.6)
    return neardup_clusters(pairs)


@query("dedup_cluster_bigstar")
def dedup_cluster_bigstar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The O(log n)-round connected-components twin (large-star/
    small-star, operators/dedup.py::neardup_clusters_bigstar) over the
    same exact-Jaccard pair graph as `dedup_cluster_components`.
    Rows-only: its labels are pinned EQUAL to the recursive-CTE-oracled
    gate in tests/test_dedup.py, which is stronger than a second
    oracle; it exists for chain-shaped near-dup graphs where min-label
    propagation degrades to O(chain) rounds (measured: 10k chain in 15
    rounds, SCALE.md)."""
    from parsedmarc_go_spark.operators.dedup import neardup_clusters_bigstar

    pairs = ngram_jaccard_pairs(load(spark, sf_dir, "documents"), threshold=0.6)
    return neardup_clusters_bigstar(pairs)


# the keep-best output contract is pair-source-agnostic (see
# keep_best_per_cluster), and on the gate corpus the exact and minhash
# pair graphs yield IDENTICAL clusters (LSH S-curve at b=16,r=2 catches
# j>=0.6 with P~0.9992; pinned by test_keep_best_minhash_agrees_with_
# exact) — so one recursive-CTE oracle verifies both paths. Since r7 the
# 50-slot gate window hash-checks the PRODUCTION minhash path; the exact
# twin is value-compared against this same SQL in pytest instead
# (test_dedup.py::test_keep_best_exact_matches_oracle).
_KEEP_BEST_ORACLE = f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({_NGRAM_JACCARD_ORACLE.format(thr=0.6)}),
    edges AS MATERIALIZED (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    lbl AS MATERIALIZED (SELECT a AS doc, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a),
    q AS MATERIALIZED (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS nt,
             CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE) AS nd,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN ({_STOP_IN}))) AS DOUBLE) AS sh
      FROM documents),
    scored AS (
      SELECT q.doc_id,
             COALESCE(lbl.cluster_id, q.doc_id) AS cluster_id,
             0.4 * LEAST(nt / 80.0, 1.0) + 0.4 * (nd / nt) + 0.2 * (1.0 - sh / nt) AS quality
      FROM q LEFT JOIN lbl ON q.doc_id = lbl.doc),
    ranked AS (
      SELECT cluster_id, doc_id, quality,
             COUNT(*) OVER (PARTITION BY cluster_id) AS n_members,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY quality DESC, doc_id ASC) AS rn
      FROM scored)
    SELECT cluster_id, doc_id AS keep_doc, ROUND(quality, 4) AS quality, n_members
    FROM ranked WHERE rn = 1
    """


@query("dedup_keep_best")
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION step over the EXACT Jaccard pair graph — the
    Σfreq(shingle)² finder, fine at gate SF, factored out so the same
    decision runs over any pair source. Rows-only in the driver window
    since r7 (the production minhash twin below holds the hash slot);
    still value-anchored: pytest compares this output against
    _KEEP_BEST_ORACLE cell-for-cell."""
    docs = load(spark, sf_dir, "documents")
    return keep_best_per_cluster(docs, ngram_jaccard_pairs(docs, threshold=0.6))


@query("dedup_keep_best_minhash", oracle=_KEEP_BEST_ORACLE)
def dedup_keep_best_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB keep-best path: pairs from bucketed MinHash+LSH (work
    ∝ colliding docs) instead of the exact inverted index. Hash-checked
    against the recursive-CTE oracle since r7 — the S-curve argument
    (b=16, r=2 catches j≥0.6 with P≈0.9992, verify step keeps precision
    exact) makes its pair graph identical to the exact one on the gate
    corpus, so the oracle transfers verbatim; the exact/minhash
    agreement itself stays pinned in test_dedup."""
    docs = load(spark, sf_dir, "documents")
    return keep_best_per_cluster(docs, minhash_lsh_pairs(docs, threshold=0.6))


def keep_best_per_cluster(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Near-dup clusters (connected components over the pair graph) ×
    quality scores → keep the highest-quality member per cluster
    (singletons keep themselves). One equi-join on doc_id (NO broadcast
    hint: the cluster-label frame scales with the near-dup population —
    GBs at 100 TB — so AQE chooses broadcast only when it actually
    fits) + one window over the component labels; ordering carries a
    doc_id tie-break so the kept representative is engine-independent.
    `pairs` is any (doc_a, doc_b) frame: exact Jaccard, minhash, or
    simhash — the decision step is pair-source-agnostic."""
    from pyspark.sql import Window

    from parsedmarc_go_spark.operators.dedup import neardup_clusters

    clusters = neardup_clusters(pairs)
    q = (
        docs.withColumn("toks", F.split(F.lower("text"), " "))
        .withColumn("nt", token_count("text"))
        .withColumn("nd", distinct_token_count("toks"))
        .withColumn("sh", stopword_hits("toks"))
        .select("doc_id", quality_score("nt", "nd", "sh").alias("quality"))
    )
    scored = q.join(clusters, q["doc_id"] == clusters["doc"], "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        "quality",
    )
    w = Window.partitionBy("cluster_id")
    ranked = scored.withColumn("n_members", F.count("*").over(w)).withColumn(
        "rn",
        F.row_number().over(w.orderBy(F.desc("quality"), F.asc("doc_id"))),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("keep_doc"),
        F.round("quality", 4).alias("quality"),
        "n_members",
    )


# Containment gate (round 9): asymmetric near-dup — class d%5==2 docs
# are EXACTLY the shared quote their class's d%5==1 docs append to
# their own text, so (small ⊂ big) pairs with containment 1.0 exist at
# every SF while their Jaccard stays far below the jaccard gates'
# thresholds. The quote class key is the consecutive-id BLOCK
# floor(doc_id/10) (NOT a fixed modulus): each block holds exactly two
# quote docs and two carriers at ANY corpus size, so the identical-
# quote pair count — the quadratic term of any pair gate — stays O(N)
# instead of exploding at sf1 (a %4 class key measured minutes there).
# Class tokens are INTERLEAVED through the quote (qa<c> … qd<c>) so
# every shingle is class-specific — a single trailing class token left
# 4/5 shingles shared corpus-wide, which put every cross-class quote
# pair at exactly the 0.8 threshold (measured: ~15k pairs at sf0.001,
# quadratic at sf1).
# Both engines build identical text; the containment formula is
# exact-int shared / least(n_a, n_b). Born demoted: the shingle
# inverted-index join is dedup_minhash_lsh's hash-checked machinery
# (in-window via the r9 rotation); the only delta is the denominator.
# pytest value-checks it at two SFs.
_CONTAINMENT_CTES = """
    cls AS (
      SELECT doc_id, text,
             CAST(CAST(floor(doc_id / 10) AS BIGINT) AS VARCHAR) AS c
      FROM documents),
    base AS (
      SELECT doc_id,
             CASE CAST(doc_id % 5 AS INTEGER)
               WHEN 2 THEN 'qa' || c || ' alpha qb' || c || ' bravo qc' || c
                           || ' charlie qd' || c
               WHEN 1 THEN text || ' qa' || c || ' alpha qb' || c || ' bravo qc'
                           || c || ' charlie qd' || c
               ELSE text END AS text
      FROM cls),
    d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM base),
    sh AS MATERIALIZED (
      SELECT doc_id AS doc,
             unnest(list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(generate_series(1, len(toks) - 2),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [] END)) AS shingle
      FROM d),
    n AS MATERIALIZED (SELECT doc, COUNT(*) AS n_shingles FROM sh GROUP BY 1),
    p AS MATERIALIZED (SELECT a.doc AS da, b.doc AS db, COUNT(*) AS shared
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
          GROUP BY 1, 2)
"""

_CONTAINMENT_ORACLE = f"""
    WITH {_CONTAINMENT_CTES}
    SELECT p.da AS doc_a, p.db AS doc_b,
           na.n_shingles AS n_a, nb.n_shingles AS n_b, p.shared AS shared,
           CAST(p.shared AS DOUBLE)
             / CAST(least(na.n_shingles, nb.n_shingles) AS DOUBLE) AS containment
    FROM p JOIN n na ON p.da = na.doc JOIN n nb ON p.db = nb.doc
    WHERE CAST(p.shared AS DOUBLE)
             / CAST(least(na.n_shingles, nb.n_shingles) AS DOUBLE) >= 0.8
"""


def _containment_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planted quote/carrier corpus both containment gates share
    (and both engines rebuild identically — see the block comment
    above _CONTAINMENT_CTES)."""
    docs = load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    c = F.floor(d / 10).cast("string")
    quote = F.concat(
        F.lit("qa"), c, F.lit(" alpha qb"), c, F.lit(" bravo qc"), c,
        F.lit(" charlie qd"), c,
    )
    itext = (
        F.when(d % 5 == 2, quote)
        .when(d % 5 == 1, F.concat(F.col("text"), F.lit(" "), quote))
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", itext.alias("text"))


@query("dedup_containment", oracle=_CONTAINMENT_ORACLE)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup over planted quote/excerpt
    pairs. See operators/dedup.py::ngram_containment_pairs."""
    from parsedmarc_go_spark.operators.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        _containment_corpus(spark, sf_dir), threshold=0.8
    )


# Keep-rule composition over the containment pairs (round 10, VERDICT
# r9 task 8): the asymmetric decision is PER-PAIR (drop the contained
# side), NOT keep_best_per_cluster's component-keep-one — two distinct
# carriers embedding the same quote share a component through it, and
# a component rule would drop a carrier. The oracle is therefore plain
# aggregation SQL (loser/winner per pair, min winning container per
# loser, left join back to all docs) — no recursive CTE needed, which
# also keeps the sf1 oracle wall flat (the recursive reach() oracles
# are the two slowest gates in CORRECTNESS_SF1).
_KEEP_CONTAINMENT_ORACLE = f"""
    WITH {_CONTAINMENT_CTES},
    pairs AS (
      SELECT p.da AS doc_a, p.db AS doc_b,
             na.n_shingles AS n_a, nb.n_shingles AS n_b
      FROM p JOIN n na ON p.da = na.doc JOIN n nb ON p.db = nb.doc
      WHERE CAST(p.shared AS DOUBLE)
               / CAST(least(na.n_shingles, nb.n_shingles) AS DOUBLE) >= 0.8),
    lw AS (
      SELECT CASE WHEN n_a < n_b OR (n_a = n_b AND doc_a > doc_b)
                  THEN doc_a ELSE doc_b END AS loser,
             CASE WHEN n_a < n_b OR (n_a = n_b AND doc_a > doc_b)
                  THEN doc_b ELSE doc_a END AS winner
      FROM pairs),
    drops AS (SELECT loser, MIN(winner) AS dropped_by FROM lw GROUP BY loser)
    SELECT b.doc_id, dr.dropped_by IS NULL AS is_kept, dr.dropped_by
    FROM base b LEFT JOIN drops dr ON b.doc_id = dr.loser
"""


@query("dedup_keep_best_containment", oracle=_KEEP_CONTAINMENT_ORACLE)
def dedup_keep_best_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The asymmetric quote-in-document case RESOLVED: contained docs
    drop, containers survive. See operators/dedup.py::containment_keep
    for why this is a per-pair rule rather than the component keep-one
    of dedup_keep_best(_minhash)."""
    from parsedmarc_go_spark.operators.dedup import (
        containment_keep,
        ngram_containment_pairs,
    )

    t = _containment_corpus(spark, sf_dir)
    return containment_keep(t, ngram_containment_pairs(t, threshold=0.8))


@query("dedup_containment_prefix")
def dedup_containment_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The containment pair generator's SCALE path: PPJoin prefix +
    positional filtering (Bayardo 2007, Xiao 2008) — candidates from
    each doc's rarest ``⌊(1-t)·|S|⌋+1`` shingles joined against the
    index, exact verify on candidates only. Rows-only entry: output is
    pinned IDENTICAL to the hash-matched dedup_containment gate in
    tests/test_dedup.py (boundary pairs included), which is stronger
    than a second oracle — the dedup_embedding_cosine_chunked
    precedent. See operators/dedup.py::containment_pairs_prefix.
    broadcast_small_sides=True is the bench-scale posture (prefix rows
    and per-doc sets comfortably fit the 64 MB budget at every test
    SF); max_broadcast_docs=None skips the guard's probe job — the
    gate corpus is the test-SF documents table, known bounded (ADVICE
    r12)."""
    from parsedmarc_go_spark.operators.dedup import containment_pairs_prefix

    t = _containment_corpus(spark, sf_dir)
    return containment_pairs_prefix(
        t, threshold=0.8, broadcast_small_sides=True, max_broadcast_docs=None
    )


@query("dedup_keep_best_containment_prefix", oracle=_KEEP_CONTAINMENT_ORACLE)
def dedup_keep_best_containment_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_keep_best_containment with its pair stage on the PPJoin
    prefix generator instead of the exact Σfreq² self-join (VERDICT
    r10 task 1) — SAME full value oracle, because the generators are
    output-identical by the pigeonhole guarantee. This is the
    composition a 100 TB pipeline runs: candidate work rides the
    low-df prefix tail, the keep rule stays pair-population-sized.
    Measured at sf1 (quiet tuned session, warm median): 16.3 s (r10
    exact gate, broadcast-pathology included) → ~4.5 s here."""
    from parsedmarc_go_spark.operators.dedup import (
        containment_keep,
        containment_pairs_prefix,
    )

    t = _containment_corpus(spark, sf_dir)
    # max_broadcast_docs=None: known-bounded gate corpus — skip the
    # guard probe job the r12 bench paid +~0.08 s for (ADVICE r12)
    return containment_keep(
        t,
        containment_pairs_prefix(
            t, threshold=0.8, broadcast_small_sides=True, max_broadcast_docs=None
        ),
    )
