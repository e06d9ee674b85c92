"""Regression pin for the round-13 interpreted-HOF-lambda discovery.

Catalyst evaluates higher-order-function lambdas (transform / filter /
aggregate / zip_with bodies) INTERPRETED, outside whole-stage codegen —
round 13 found per-token and per-char lambdas over corpus text columns
three times (gopher stats, repetition stats, winnowing: 68 s / 68 s /
25 s for ~16 MB of sf1 text), each replaced with codegen forms
(arrays_zip/slice/explode, regexp_count, string-length identity) worth
60-65 s per gate (commit 6f3b099). VERDICT r13 task 7 encodes the
lesson as a plan audit: walk every registered gate's optimized plan and
fail on ANY lambdafunction node that is not in the recorded allowlist.

The allowlist is a per-gate count snapshot of the SANCTIONED lambda
uses — each bounded by something much smaller than corpus text:
dim-64 embedding vector math, per-DISTINCT-word DP (vocab-bounded, the
documented tokenizer design), per-URL segment transforms, array_sort
comparators over per-key collected sets, 8-segment IPv6 expansion, and
per-line C4 sentence predicates. A gate OUTSIDE the list acquiring any
lambda — e.g. reverting one of the r13 fixes on text_repetition_stats /
gopher_quality_filter / doc_winnowing_fingerprints, or writing a new
per-token HOF — fails the audit naming the gate; an allowed gate
growing MORE lambdas than recorded also fails. Counts are compared
exactly so a silent drop (a lambda replaced by codegen) is also
surfaced — update the snapshot deliberately, with the justification.

Plans are built at sf0.001; lambda structure is SF-independent (the
same expressions appear at every SF). The three eager pipeline gates
are excluded: they EXECUTE stages at plan-build time and their
machinery is the composition of stage functions audited here directly.
"""

from __future__ import annotations

from parsedmarc_go_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"

# gates that execute work eagerly when called (localCheckpoint stage
# boundaries / streaming triggers) — their internals are the audited
# stage functions below
EAGER_PIPELINE_GATES = {
    "curation_pipeline",
    "curation_pipeline_stream",
    "curation_pipeline_checkpoint",
}

# the r13 fixes: these MUST stay lambda-free (the revert trip-wire)
R13_FIXED_GATES = [
    "text_repetition_stats",
    "gopher_quality_filter",
    "doc_winnowing_fingerprints",
]

# snapshot of sanctioned lambdafunction counts per gate (see module
# docstring for the boundedness argument per family)
ALLOWED_LAMBDA_COUNTS = {
    # array_sort default comparator over per-user collect_set (small)
    "a10_collect_distinct": 1,
    # round-17: the n-gram side moved to the codegen'd zip-shape
    # stream (operators/curation.py::_ngram_stream) — zero lambdas;
    # kept in the snapshot so a lambda REAPPEARING here (the
    # long-document O(tokens²) regression class) trips the audit
    "decontaminate_ngram": 0,
    # bounded 8-segment IPv6 expansion of the dim table
    "j3c_geoip6_range_join": 1,
    # per-doc char-class token arrays (single project, no join fan-out)
    "text_token_stats": 1,
    "text_quality_score": 1,
    "dedup_keep_best_minhash": 1,
    "dedup_keep_best": 1,
    # per-paragraph split + position zip (paragraph count per doc)
    "dedup_paragraph": 2,
    "dedup_paragraph_fuzzy": 2,
    # per-URL segment/query-param transforms (bounded by URL length)
    "url_canonicalize": 4,
    "dedup_url_canonical": 4,
    # per-line C4 sentence predicate (line count per doc)
    "text_c4_clean": 2,
    # span assembly over collected per-doc token runs
    "span_corruption": 4,
    "dedup_substring_spans": 0,  # r17: zip-shaped gram stream
    # per-DISTINCT-word DP — vocab-bounded, the documented design.
    # r18: 4 → 6 — the probe match is bound once per step through a
    # 1-element nested aggregate (inner step + finish lambdas), which
    # REPLACES evaluating the 8-arm probe chain three times per
    # consumed position; still strictly per-distinct-word work
    "tokenize_maxmunch": 6,
    "vocab_unigram_seed": 4,
    # dim-64 embedding vector math (zip_with dot products, transforms)
    "ann_topk_bruteforce": 9,
    "retrieval_hybrid_rerank": 9,
    "ann_ivf_topk": 19,
    # r18: 19 → 44 — kmeans assignment now plans as an unrolled
    # argmax fold (one aggregate(zip_with) per centroid + the fold's
    # own zip_with/aggregate) instead of transform-over-centroids with
    # a duplicated sims tree; more lambda NODES, each dot product
    # evaluated ONCE per row instead of twice, all dim-64-bounded
    "ann_ivf_kmeans_topk": 44,
    "ann_lsh_topk": 34,
    "ann_lsh_multitable": 202,
    "emb_quantize_int8": 4,
    "ann_lsh_indexed": 9,
    # r18: 58 → 158 — same unrolled argmax-fold assignment as
    # ann_ivf_kmeans_topk, appearing in several plan branches (scored
    # projection + pair-stage input); node count up, per-row dot
    # products evaluated once instead of twice, all dim-64-bounded
    "semdedup_embeddings": 158,
    "ann_ivf_pq_topk": 10,
}


def _lambda_count(spark, name: str) -> int:
    # treeString elides operator argument lists past
    # spark.sql.debug.maxToStringFields (default 25) as "... N more
    # fields" — a lambda sitting past the cutoff in a wide select
    # would silently pass the audit (round-14 review); pin the limit
    # high for the duration of the count
    prev = spark.conf.get("spark.sql.debug.maxToStringFields")
    spark.conf.set("spark.sql.debug.maxToStringFields", "100000")
    try:
        df = QUERIES[name](spark, SF)
        return df._jdf.queryExecution().optimizedPlan().toString().count(
            "lambdafunction"
        )
    finally:
        spark.conf.set("spark.sql.debug.maxToStringFields", prev)


def test_no_unsanctioned_hof_lambdas(spark):
    spark.catalog.clearCache()
    violations = []
    for name in QUERIES:
        if name in EAGER_PIPELINE_GATES:
            continue
        try:
            got = _lambda_count(spark, name)
        except Exception as exc:  # a gate that cannot plan is its own bug
            violations.append(f"{name}: plan build failed: {exc!r:.200}")
            continue
        want = ALLOWED_LAMBDA_COUNTS.get(name, 0)
        if got != want:
            violations.append(
                f"{name}: {got} lambdafunction nodes in optimized plan, "
                f"allowlist records {want} — interpreted HOF lambdas over "
                "corpus arrays are the r13 regression class; replace with "
                "codegen forms or update the snapshot with justification"
            )
    assert violations == [], "\n".join(violations)


def test_r13_fixed_gates_stay_codegen(spark):
    """The explicit revert trip-wire for commit 6f3b099's three fixes."""
    spark.catalog.clearCache()
    for name in R13_FIXED_GATES:
        assert _lambda_count(spark, name) == 0, (
            f"{name} reacquired an interpreted HOF lambda (r13 fix reverted?)"
        )
