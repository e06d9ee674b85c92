"""Query plan library — SURVEY §2.4-2.7 analytics workload plus the
training-data-pipeline operators, each as a (PySpark builder, DuckDB
oracle SQL) pair registered for the driver's correctness gate."""

from parsedmarc_go_spark.plans.registry import ORACLES, QUERIES

# importing the modules populates the registry
from parsedmarc_go_spark.plans import analytics as _analytics  # noqa: E402,F401
from parsedmarc_go_spark.plans import curation as _curation  # noqa: E402,F401
from parsedmarc_go_spark.plans import enrichops as _enrichops  # noqa: E402,F401
from parsedmarc_go_spark.plans import eventops as _eventops  # noqa: E402,F401
from parsedmarc_go_spark.plans import textops as _textops  # noqa: E402,F401
from parsedmarc_go_spark.plans import vectorops as _vectorops  # noqa: E402,F401

# The driver hash-checks only the FIRST 50 registered queries, so
# oracle-bearing queries must never sit behind rows-only ones: reorder
# in place (preserving per-group registration order) so every query
# with an oracle precedes every query without one, regardless of module
# import order. In-place so existing imports of QUERIES keep working.
#
# len(ORACLES) oracle-bearing queries compete for the 50-slot driver
# window, so len(ORACLES) - 50 must sit outside it (the counts are
# asserted dynamically below and in test_plans — ADVICE r7 retired the
# hardcoded ones). _WINDOW_DEMOTED picks the outsiders explicitly:
# simple filter/CASE gates whose shapes are already hash-checked by
# siblings in the window (f9/f5 cover the filter family, a12/p16 cover
# multi-way CASE — p16 itself yields to a5's sibling argument), plus
# sample_token_budget, whose window shape is hash-checked by its
# in-window twin sample_stratified. They all keep their oracles —
# pytest (test_queries_vs_duckdb) value-checks ALL oracle-bearing
# queries at sf0.001 and sf0.01 every run — they just yield their
# driver slots to gates with no in-window sibling coverage (the r7
# curation family; r8's dedup_paragraph).
_WINDOW_DEMOTED = (
    "a5_case_bucket",
    "f10_exclude_category",
    "f11_flag_filter",
    "p16_contains_bucket",
    "sample_token_budget",
    # same md5-order membership machinery as in-window sample_stratified
    "sample_hash_threshold",
    # pure string-expression pipeline; the regexp/substring machinery is
    # hash-checked in-window by text_pii_redact
    "url_canonicalize",
    # explode→count→same-key-join shape hash-checked in-window by
    # decontaminate_ngram + text_tfidf_topk
    "boilerplate_chunks",
    # same exact-Jaccard oracle SQL as in-window dedup_minhash_lsh
    # (thresholds 0.6 vs 0.7; the minhash gate's candidate-verify step
    # computes the identical shingle+Jaccard machinery) — yields its
    # slot to r8's dedup_paragraph, which has no in-window sibling
    "dedup_ngram_jaccard",
    # a threshold layer OVER machinery hash-checked in-window twice:
    # text_repetition_stats (the bigram share it joins) and the
    # token/regex expression family (text_token_stats siblings) —
    # born demoted, pytest value-checks it at two SFs like the rest
    "gopher_quality_filter",
    # running-total window machinery hash-checked in-window by
    # a19_running_total; the hash-order key by sample_stratified —
    # born demoted (what the gate adds is the two-phase prefix-sum
    # decomposition, value-pinned against the one-window oracle here
    # and in pytest at two SFs)
    "pack_sequences",
    # normalize=True layer over dedup_paragraph (in-window), which
    # hash-checks the entire explode/keep-first/re-assemble machinery;
    # the only delta is the normalized_text key expression — born
    # demoted, value-checked by pytest at two SFs like the rest
    "dedup_paragraph_fuzzy",
    # ExactSubstr spans (round 9): machinery hash-checked in-window
    # piecewise — slice/transform grams by text_chunking +
    # decontaminate_ngram, keep-first winner key by dedup_paragraph,
    # lag/running-sum islands by e1_sessionize + a19_running_total —
    # born demoted, pytest value-checks the composed gate at two SFs
    "dedup_substring_spans",
    # CCNet bigram-LM scoring (round 9): pair explode + broadcast
    # probe hash-checked in-window by decontaminate_ngram, bigram
    # grouping by text_repetition_stats, fixed-point sums by the
    # a-family — born demoted, pytest value-checks it at two SFs
    "quality_lm_score",
    # DSIR Gumbel top-k (round 9): the LM probe is quality_lm_score's
    # machinery, the md5 hash-order uniform is sample_stratified's
    # (in-window), top-k is a7's TakeOrderedAndProject — born demoted,
    # pytest value-checks it at two SFs
    "dsir_sample",
    # NB quality classifier (round 9): same explode/broadcast-probe/
    # fixed-point machinery as the LM family — born demoted, pytest
    # value-checks it at two SFs
    "quality_nb_classifier",
    # temperature mixing (round 9): the count-agg + hash-order-window
    # machinery of the sampler family — born demoted, pytest
    # value-checks it at two SFs
    "sample_temperature",
    # C4 cleaning rules (round 9): pure string-expression machinery
    # (regexp/substring family in-window via text_pii_redact) — born
    # demoted, pytest value-checks it at two SFs
    "text_c4_clean",
    # T5 span corruption (round 9): posexplode + doc-keyed windows +
    # ordered re-assembly (dedup_paragraph / a18-a19 machinery) with
    # the sample_hash_threshold hash compare — born demoted, pytest
    # value-checks it at two SFs
    "span_corruption",
    # BM25 (round 9): explode/count/broadcast-probe machinery
    # in-window via decontaminate_ngram + text_tfidf_topk — born
    # demoted, pytest value-checks it at two SFs
    "text_bm25_rank",
    # URL dedup (round 9): canonical_url (url_canonicalize's sibling
    # rationale) + the dedup_exact keep-min groupBy (in-window) —
    # born demoted, pytest value-checks it at two SFs
    "dedup_url_canonical",
    # vocab builder (round 9): token explode/count (text_tfidf_topk)
    # + ordered-limit (a7) machinery — born demoted, pytest
    # value-checks it at two SFs
    "vocab_top_tokens",
    # containment pairs (round 9): the shingle inverted-index join of
    # dedup_minhash_lsh (in-window via rotation); only the denominator
    # differs — born demoted, pytest value-checks it at two SFs
    "dedup_containment",
    # corpus report (round 9): a-family exact-distinct/multi-agg
    # machinery (a9/a14 in-window) — born demoted, pytest value-checks
    # it at two SFs
    "corpus_report",
    # containment keep rule (round 10): dedup_containment's pair
    # machinery plus a CASE/group/left-join decision layer whose
    # shapes are hash-checked in-window by the a-family — born
    # demoted, pytest value-checks it at two SFs
    "dedup_keep_best_containment",
    # BPE round-1 pair counts (round 10): explode/count/ordered-limit
    # machinery hash-checked in-window by text_tfidf_topk + a7; the
    # rank window runs over the bounded 50-row frame (vocab_top_tokens'
    # rationale) — born demoted, pytest value-checks it at two SFs and
    # the full merge iteration against a pure-Python reference
    "vocab_bpe_pairs",
    # hybrid retrieve-then-rerank (round 10): a composition of two
    # machineries each hash-checkable in-window — text_bm25_rank's
    # (rotatable via WINDOW_SPEC) and ann_topk_bruteforce's cosine —
    # born demoted, pytest value-checks the composed gate at two SFs
    "retrieval_hybrid_rerank",
    # max-munch subword encoding (round 10): explode/count/limit vocab
    # build is text_tfidf_topk + a7 machinery, per-doc ordered
    # re-assembly span_corruption's (rotatable in-window), and the DP
    # itself is a per-row expression with no shuffle shape of its own
    # — born demoted, pytest value-checks it at two SFs
    "tokenize_maxmunch",
    # unigram seed candidates (round 10): substring explode + weighted
    # count + ordered-limit — vocab_bpe_pairs' rationale verbatim (the
    # machinery is text_tfidf_topk + a7, hash-checked in-window) —
    # born demoted, pytest value-checks it at two SFs
    "vocab_unigram_seed",
    # corpus snapshot diff (round 10): full-outer join + CASE counts —
    # the join shape is j2's (in-window) and the conditional-count agg
    # the a-family's — born demoted, pytest value-checks it at two SFs
    "corpus_delta_report",
    # Kneser-Ney bigram scoring (round 10): quality_lm_score's exact
    # pipeline shape (pair explode + broadcast probes + fixed-point
    # doc agg, rotatable in-window) with a different smoothing formula
    # — born demoted, pytest value-checks it at two SFs
    "quality_kn_score",
    # keep rule over PPJoin prefix pairs (round 11): its oracle is THE
    # SAME SQL text as dedup_keep_best_containment's (the generators
    # are output-identical by the pigeonhole guarantee, so one oracle
    # serves both), and the prefix generator itself is equality-pinned
    # to the hash-matched dedup_containment gate in test_dedup — born
    # demoted, pytest value-checks it at two SFs; it carries the bench
    # slot for the containment family instead (VERDICT r10 task 1)
    "dedup_keep_best_containment_prefix",
    # end-to-end curation pipeline (round 12): a COMPOSITION of five
    # stages whose machineries are each oracle-checked by their own
    # gates (gopher_quality_filter, dedup_exact, dedup_minhash_lsh,
    # decontaminate_ngram, sample_token_budget — all rotatable
    # in-window) — born demoted, pytest value-checks every document's
    # fate at two SFs
    "curation_pipeline",
    # streaming twin of the composed pipeline (round 14): the same
    # five-stage machinery as curation_pipeline (rotatable in-window)
    # driven through two real micro-batch triggers — born demoted per
    # the rotation protocol; WINDOW_SPEC r14 rotates it straight in
    # (VERDICT r13 task 3), and pytest value-checks it at two SFs
    "curation_pipeline_stream",
    # reliable-checkpoint resume mode of the composed pipeline (round
    # 14): identical values to curation_pipeline by the resume-parity
    # contract — born demoted per the rotation protocol; WINDOW_SPEC
    # r14 rotates it straight in (VERDICT r13 task 4), and pytest
    # value-checks it at two SFs
    "curation_pipeline_checkpoint",
    # label-cell IVF probe (rows-only until round 15, oracle-bearing
    # once the exact-decimal centroid reduction made the cell choice
    # engine-identical): its machinery is hash-checked in-window by
    # ann_topk_bruteforce (the cosine top-k it runs inside the probed
    # cells) and the a-family's grouped aggregates (the per-cell mean)
    # — born demoted, pytest value-checks it at two SFs
    "ann_ivf_topk",
)
assert all(n in ORACLES for n in _WINDOW_DEMOTED)

# External window selection (ADVICE r7: in-window coverage should not
# be permanently self-chosen). SPARK_GRAFT_WINDOW_SWAP="out1:in1,..."
# swaps a demoted gate INTO the window with a currently-in-window gate
# taking its place outside — both sides must be oracle-bearing, the
# "in" side currently demoted and the "out" side currently not, so any
# externally-chosen swap preserves the all-oracle-bearing window
# invariant. Default (unset) keeps the documented set above.
import os as _os  # noqa: E402

_swap_spec = _os.environ.get("SPARK_GRAFT_WINDOW_SWAP", "")
if _swap_spec:
    _demoted = list(_WINDOW_DEMOTED)
    for _pair in _swap_spec.split(","):
        _out, _in = (p.strip() for p in _pair.split(":"))
        if _in not in _demoted:
            raise ValueError(f"swap-in gate {_in!r} is not currently demoted")
        if _out in _demoted or _out not in ORACLES:
            raise ValueError(f"swap-out gate {_out!r} must be an in-window oracle gate")
        _demoted[_demoted.index(_in)] = _out
    _WINDOW_DEMOTED = tuple(_demoted)

_ordered = (
    [n for n in QUERIES if n in ORACLES and n not in _WINDOW_DEMOTED]
    + [n for n in QUERIES if n in ORACLES and n in _WINDOW_DEMOTED]
    + [n for n in QUERIES if n not in ORACLES]
)
_snapshot = dict(QUERIES)
QUERIES.clear()
QUERIES.update({n: _snapshot[n] for n in _ordered})
if len(ORACLES) - len(_WINDOW_DEMOTED) > 50:  # hard budget: slots 51+ are never hash-checked
    raise RuntimeError(
        f"{len(ORACLES) - len(_WINDOW_DEMOTED)} oracle-bearing queries exceed the "
        "driver's 50-slot check window; retire or merge a redundant gate "
        "(or demote one with explicit rationale) before adding more"
    )

__all__ = ["QUERIES", "ORACLES"]
