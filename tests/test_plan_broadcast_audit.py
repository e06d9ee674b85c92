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
    df = QUERIES[name](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert raw_explode_broadcasts(plan) == [], plan
