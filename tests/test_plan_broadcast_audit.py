"""Regression pin for the round-11 broadcast-pathology audit.

Catalyst sizes an exploded frame from the compact parquet scan
underneath it, so corpus × k frames (word occurrences, band
signatures, shingle indexes) can look broadcastable and become
driver-side HashedRelations rebuilt per action. The affected joins now
pin merge/shuffle_hash; this test re-runs the audit predicate —
no BroadcastExchange whose subtree contains a raw (un-aggregated,
un-limited) Generate — over the previously-pathological gates, at
sf0.001 (the hints pin the strategy at every SF, so the assertion is
SF-independent). The j3 gates are excluded by design: their
bucketed-dim broadcast intentionally explodes a BOUNDED dim.
"""

from __future__ import annotations

import re

import pytest

from parsedmarc_go_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"

BOUNDING = re.compile(
    r"HashAggregate|SortAggregate|ObjectHashAggregate|TakeOrdered"
    r"|CollectLimit|GlobalLimit|LocalLimit|BroadcastNestedLoopJoin"
)

FIXED_GATES = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "tokenize_maxmunch",
    "dedup_containment",
    "dedup_keep_best_containment",
]


def _indent(ln: str) -> int:
    return len(re.match(r"^[\s:+\-*()0-9]*", ln).group(0))


def raw_explode_broadcasts(plan: str) -> list[str]:
    """BroadcastExchange nodes with a Generate in their subtree and no
    bounding (aggregate/limit) node printed between them."""
    lines = plan.splitlines()
    hits = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        base = _indent(ln)
        bounded = False
        for j in range(i + 1, len(lines)):
            if _indent(lines[j]) <= base and lines[j].strip():
                break
            if BOUNDING.search(lines[j]):
                bounded = True
            if "Generate" in lines[j] and not bounded:
                hits.append(lines[j].strip()[:120])
                break
    return hits


@pytest.mark.parametrize("name", FIXED_GATES)
def test_no_raw_explode_under_broadcast(spark, name):
    # earlier tests may leave persisted subtrees (e.g. the containment
    # shingle index) whose ACCURATE small stats legitimately flip a
    # join to broadcast at sf0.001 — the audit is about fresh-plan
    # misestimates, so it must see an empty cache
    spark.catalog.clearCache()
    df = QUERIES[name](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert raw_explode_broadcasts(plan) == [], plan


def test_containment_prefix_shuffle_builds_on_bounded_sides(spark):
    """ADVICE r11 (medium): Spark builds the shuffled-hash table from
    the HINTED side, so the hints in containment_pairs_prefix's
    non-broadcast path must sit on the bounded frames — the prefix
    rows for the candidate join, the candidate stream for the verify
    joins — never on the corpus-sized index/sets. The code puts the
    bounded frame on the LEFT of each hinted join, so every
    ShuffledHashJoin in the plan must be BuildLeft; a BuildRight
    would mean a partition-local, hot-shingle-skewed corpus build."""
    spark.catalog.clearCache()
    from parsedmarc_go_spark.operators.dedup import containment_pairs_prefix

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = containment_pairs_prefix(docs, broadcast_small_sides=False)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    shj = [ln for ln in plan.splitlines() if "ShuffledHashJoin" in ln]
    assert len(shj) >= 3, plan
    assert all("BuildLeft" in ln for ln in shj), "\n".join(shj)


def test_containment_prefix_broadcast_guard_flips_to_shuffle(spark):
    """ADVICE r11 (low): broadcast_small_sides=True must not silently
    broadcast a corpus-scale per-doc set table (F.broadcast bypasses
    autoBroadcastJoinThreshold). Over max_broadcast_docs input docs
    the flag flips to the shuffle path — plan shows shuffled hash
    joins, no broadcast hash joins — and the output is unchanged."""
    spark.catalog.clearCache()
    from parsedmarc_go_spark.operators.dedup import containment_pairs_prefix

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    guarded = containment_pairs_prefix(
        docs, broadcast_small_sides=True, max_broadcast_docs=10
    )
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan and "BroadcastHashJoin" not in plan

    wanted = containment_pairs_prefix(docs, broadcast_small_sides=True)
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(guarded) == key(wanted) and len(key(wanted)) > 0


def test_containment_prefix_broadcast_guard_flips_on_bytes(spark):
    """ADVICE r12 (low): the guard must flip on estimated broadcast
    BYTES, not just doc count — a few very LONG documents pass a pure
    doc-count threshold while their verify-set table (one hash long
    per distinct shingle) can still OOM the driver. A 20-doc corpus
    of ~50k-token documents (≈ 20·50k·12 B ≈ 12 MB estimate) under a
    1 MB byte budget must take the shuffle path even though the doc
    count is far below max_broadcast_docs."""
    spark.catalog.clearCache()
    from parsedmarc_go_spark.operators.dedup import containment_pairs_prefix

    long_text = " ".join(f"tok{i % 997}x{i % 31}" for i in range(50_000))
    docs = spark.createDataFrame(
        [(i, f"doc {i} starts {long_text}") for i in range(20)],
        "doc_id long, text string",
    )
    guarded = containment_pairs_prefix(
        docs,
        broadcast_small_sides=True,
        max_broadcast_docs=1000,
        max_broadcast_bytes=1 << 20,
    )
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan and "BroadcastHashJoin" not in plan
    # under the default byte budget the same corpus broadcasts
    free = containment_pairs_prefix(
        docs, broadcast_small_sides=True, max_broadcast_docs=1000
    )
    assert "BroadcastHashJoin" in (
        free._jdf.queryExecution().executedPlan().toString()
    )
