"""Physical-plan audits: regression-pin the plan properties that keep
the workload scalable (SURVEY §4). These assert on the *final* executed
plan (after an action, so AQE has finalized) — catching a future change
that silently turns a broadcast join into a shuffle join or drops
column pruning is the point."""

from __future__ import annotations

import pytest

from parsedmarc_go_spark.plans import QUERIES
from tests.conftest import SF_CORRECT


def final_plan(df) -> str:
    df.collect()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark):
    return {
        name: final_plan(QUERIES[name](spark, SF_CORRECT))
        for name in [
            "a1_daily_volume",
            "a7_topk_users",
            "j1_fact_dim_join",
            "j2_enrichment_lookup",
            "j3_range_join",
            "j3b_geoip_range_join",
            "f9_time_range_filter",
            "ann_topk_bruteforce",
        ]
    }


def test_a1_prunes_columns(plans):
    # a 2-column aggregate must not read the whole events schema; the
    # generator has shipped events.ts as both TIMESTAMP(NANOS)→bigint
    # and TIMESTAMP(MICROS,ntz) — pruning matters, not the encoding
    import re

    assert re.search(
        r"ReadSchema: struct<ts:(bigint|timestamp_ntz),value:double>",
        plans["a1_daily_volume"],
    ), plans["a1_daily_volume"]


def test_a7_is_take_ordered(plans):
    # top-k compiles to TakeOrderedAndProject, not a global Sort
    assert "TakeOrderedAndProject" in plans["a7_topk_users"]


def test_j1_broadcasts_parent(plans):
    p = plans["j1_fact_dim_join"]
    assert "BroadcastHashJoin" in p, "parent/dim side must broadcast"
    assert "SortMergeJoin" not in p


def test_j2_broadcast_left(plans):
    p = plans["j2_enrichment_lookup"]
    assert "BroadcastHashJoin" in p and "LeftOuter" in p


def test_j3_broadcast_nested_loop(plans):
    # the non-equi bracket/GeoIP join must broadcast the tiny dim, never
    # shuffle the fact side
    p = plans["j3_range_join"]
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_j3b_geoip_is_bucketed_hash_join(plans):
    # the REAL GeoIP shape must be the bucketed equi-join (each interval
    # exploded to the /16 buckets it spans, range check residual) — a
    # BroadcastNestedLoopJoin here would be O(|fact| x |dim|) against
    # the ~3M-interval production dim
    p = plans["j3b_geoip_range_join"]
    assert "BroadcastHashJoin" in p, p
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_f9_scan_reads_needed_columns_only(plans):
    import re

    p = plans["f9_time_range_filter"]
    # column pruning must hold under either generator encoding of ts
    # (TIMESTAMP(NANOS)→bigint, or TIMESTAMP(MICROS,ntz) since round 6)
    assert re.search(
        r"ReadSchema: struct<event_id:bigint,ts:(bigint|timestamp_ntz),user_id:bigint",
        p,
    ), p
    if "ts:timestamp_ntz" in p:
        # with a native timestamp column the time-range predicate reaches
        # the parquet scan too (it could not push through the old nanos
        # long → timestamp conversion)
        assert "PushedFilters: [" in p and "GreaterThanOrEqual(ts" in p, p


def test_ann_no_shuffle_of_corpus(plans):
    # brute-force top-k = scan + broadcast query vector + TakeOrdered;
    # the embeddings corpus must not be exchanged by the join
    p = plans["ann_topk_bruteforce"]
    assert "BroadcastNestedLoopJoin" in p
    assert "TakeOrderedAndProject" in p


def test_whole_stage_codegen_everywhere(plans):
    # every audited plan should have codegen'd stages — rendered as
    # "*(n)" markers in the executed-plan string
    for name, p in plans.items():
        assert "*(" in p, f"{name} fell out of whole-stage codegen"


def test_keep_best_no_broadcast_hint(spark):
    # the cluster-label frame scales with the near-dup population (GBs
    # at 100 TB): the plan must carry NO explicit broadcast hint
    # anywhere — AQE alone decides the join strategy from runtime sizes
    df = QUERIES["dedup_keep_best"](spark, SF_CORRECT)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, "dedup_keep_best must not force a broadcast"


def test_tfidf_build_triggers_no_jobs(spark):
    # building the TF-IDF DataFrame must be fully lazy: the old builder
    # ran docs.count() eagerly — a full extra scan of documents per
    # invocation before the real pipeline even started
    sc = spark.sparkContext
    sc.setJobGroup("tfidf-build-audit", "laziness assertion")
    try:
        QUERIES["text_tfidf_topk"](spark, SF_CORRECT)
        jobs = sc.statusTracker().getJobIdsForGroup("tfidf-build-audit")
    finally:
        sc.setJobGroup(None, None)
    assert list(jobs) == [], f"builder ran eager jobs: {jobs}"


def test_minhash_verify_no_cartesian(spark):
    # round-4 verify shape: candidate pair joins against cached shingle
    # sets — no cartesian product, and the pair join must resolve to a
    # hash join (AQE broadcast from the cached frame's true size)
    df = QUERIES["dedup_minhash_lsh"](spark, SF_CORRECT)
    p = final_plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_j3_bracket_counts_cover_all_events(spark):
    # ADVICE r3: j3_range_join lost its oracle slot — pin its values
    # cheaply: the three brackets partition [0, 1e9), so n_events must
    # sum to the full events row count
    rows = QUERIES["j3_range_join"](spark, SF_CORRECT).collect()
    total = sum(r["n_events"] for r in rows)
    from parsedmarc_go_spark.tables import load

    assert total == load(spark, SF_CORRECT, "events").count()


def test_a9_approx_within_hll_error_bound(spark):
    # VERDICT r4 #5: a9_distinct_approx is the production-default A9 yet
    # had no value evidence. approx_count_distinct defaults to rsd=0.05;
    # assert every group's estimate lands within 5% of the exact count.
    exact = {
        r["event_type"]: r["uniq_users"]
        for r in QUERIES["a9_distinct_exact"](spark, SF_CORRECT).collect()
    }
    approx = {
        r["event_type"]: r["uniq_users_approx"]
        for r in QUERIES["a9_distinct_approx"](spark, SF_CORRECT).collect()
    }
    assert set(exact) == set(approx)
    for etype, n in exact.items():
        rel_err = abs(approx[etype] - n) / n
        assert rel_err <= 0.05, f"{etype}: approx {approx[etype]} vs exact {n}"


def test_a20_approx_median_within_bound(spark):
    # VERDICT r5 #4: a20_median_approx is the production-default A20 —
    # pin it to the exact window-sort gate. percentile_approx(accuracy=
    # 10000) guarantees rank error <= n/10000; at sf0.01 (~2k rows per
    # event_type) that is near-exact, so a tight 1% value bound holds
    # with margin while still catching a broken sketch or wrong key.
    exact = {
        r["event_type"]: r["median_value"]
        for r in QUERIES["a20_median"](spark, SF_CORRECT).collect()
    }
    approx = {
        r["event_type"]: r["median_value"]
        for r in QUERIES["a20_median_approx"](spark, SF_CORRECT).collect()
    }
    assert set(exact) == set(approx)
    for etype, m in exact.items():
        assert abs(approx[etype] - m) / abs(m) <= 0.01, (
            f"{etype}: approx {approx[etype]} vs exact {m}"
        )


def test_registry_oracles_form_checked_prefix():
    # the driver hash-checks only the FIRST 50 registered queries: every
    # oracle-bearing query must precede every rows-only one, the window
    # itself must be entirely oracle-bearing, and oracle-bearing
    # queries beyond the window must be explicitly demoted (ADVICE r3:
    # enforce outside import time so a late registration fails loudly)
    from parsedmarc_go_spark.plans import _WINDOW_DEMOTED, ORACLES, QUERIES as Q

    names = list(Q)
    assert names[: len(ORACLES)] == [n for n in names if n in ORACLES]
    assert all(n in ORACLES for n in names[: len(ORACLES) - len(_WINDOW_DEMOTED)])
    assert len(ORACLES) - len(_WINDOW_DEMOTED) <= 50
    # demoted gates sit at the END of the oracle-bearing prefix, before
    # rows-only (suffix form, not a hardcoded 50 — ADVICE r7: retiring
    # an in-window gate must not fail this with a confusing set-diff)
    assert set(names[len(ORACLES) - len(_WINDOW_DEMOTED) : len(ORACLES)]) == set(
        _WINDOW_DEMOTED
    )


def test_window_swap_env_rotates_demotions():
    # ADVICE r7: external (driver/judge-chosen) window selection. A
    # fresh interpreter re-imports the registry under the env var and
    # must land the swapped-in gate inside the 50-slot window with the
    # swapped-out gate demoted — and reject invalid swaps loudly.
    import subprocess
    import sys

    code = (
        "from parsedmarc_go_spark.plans import QUERIES, ORACLES, _WINDOW_DEMOTED\n"
        "names = list(QUERIES)\n"
        "w = names[:len(ORACLES) - len(_WINDOW_DEMOTED)]\n"
        "assert 'dedup_ngram_jaccard' in w and 'dedup_minhash_lsh' not in w\n"
        "assert 'dedup_minhash_lsh' in _WINDOW_DEMOTED\n"
        "assert all(n in ORACLES for n in w)\n"
        "print('SWAPOK')\n"
    )
    env = {
        "SPARK_GRAFT_WINDOW_SWAP": "dedup_minhash_lsh:dedup_ngram_jaccard",
        "PATH": "/usr/bin:/bin",
    }
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        cwd="/root/repo",
    )
    assert "SWAPOK" in r.stdout, r.stderr

    bad = subprocess.run(
        [sys.executable, "-c", "import parsedmarc_go_spark.plans"],
        capture_output=True, text=True,
        env={"SPARK_GRAFT_WINDOW_SWAP": "nope:also_nope", "PATH": "/usr/bin:/bin"},
        cwd="/root/repo",
    )
    assert bad.returncode != 0 and "not currently demoted" in bad.stderr


def test_hybrid_rerank_plan_broadcasts_candidates(spark):
    """The rerank stage must fetch candidates through a
    BroadcastHashJoin against ONE scan of the vector table — a shuffle
    of the vectors would make stage 2 O(corpus-shuffle) instead of
    O(scan)."""
    p = final_plan(QUERIES["retrieval_hybrid_rerank"](spark, SF_CORRECT))
    assert "BroadcastHashJoin" in p, p
    # the vector-side scan feeds the broadcast join directly: no
    # hash-exchange of the embeddings relation anywhere in the plan
    import re

    emb_exchanges = [
        seg for seg in p.split("Exchange")
        if "embeddings" in seg.split("\n")[0]
    ]
    assert not [s for s in emb_exchanges if "hashpartitioning" in s[:60]], p


def test_maxmunch_plan_runs_dp_on_distinct_words(spark):
    """The encoder's expression DP must run on the distinct-word frame
    (vocab-sized), not per word occurrence — the plan carries the
    aggregate expression AFTER a distinct aggregation, and the
    occurrence stream reaches it through a join."""
    p = final_plan(QUERIES["tokenize_maxmunch"](spark, SF_CORRECT))
    # the DP is a join probe, not an occurrence-side projection: the
    # projected DP expression (its accumulator struct) appears on the
    # build/result side of a join in the final plan
    assert "Join" in p, p
    assert p.count("aggregate(sequence") <= 2, (
        "DP expression duplicated across occurrence-side operators:\n" + p
    )


def test_spread_scan_is_size_gated(spark):
    """VERDICT r13 task 2: spread_scan skips both the shuffle and the
    partition probe for inputs under the byte floor, spreads above it,
    and honors the SPARK_GRAFT_SPREAD_SCAN override."""
    import os

    from parsedmarc_go_spark.tables import load, spread_scan

    small = load(spark, "/root/testdata/sf0.01", "events")
    prev = os.environ.pop("SPARK_GRAFT_SPREAD_SCAN", None)
    try:
        assert spread_scan(small, "event_id") is small  # under the floor
        assert spread_scan(small, "event_id", min_bytes=1) is not small
        os.environ["SPARK_GRAFT_SPREAD_SCAN"] = "never"
        assert spread_scan(small, "event_id", min_bytes=1) is small
        os.environ["SPARK_GRAFT_SPREAD_SCAN"] = "always"
        assert spread_scan(small, "event_id") is not small

        # ADVICE r14: an unrecognized value (a typo like 'alway') must
        # raise, not silently run auto while a bench A/B stamps the
        # numbers as the intended mode
        import pytest

        os.environ["SPARK_GRAFT_SPREAD_SCAN"] = "alway"
        with pytest.raises(ValueError, match="SPARK_GRAFT_SPREAD_SCAN"):
            spread_scan(small, "event_id")
        os.environ.pop("SPARK_GRAFT_SPREAD_SCAN", None)

        # round-14 review: the gate must read the LEAF scan bytes, not
        # the frame's root estimate — Catalyst scales a Project's
        # sizeInBytes by projected column widths (measured 0.43× on a
        # (doc_id, text) select over documents), which silently
        # disabled the spread for the maxmunch corpus at sf1. A narrow
        # projection over the same scan must gate identically to the
        # bare scan: floor between projected-root and leaf estimates
        # spreads only if the LEAF size is what's compared.
        from pyspark.sql import functions as F

        proj = small.select("event_id", F.lower(F.col("event_type")).alias("t"))
        root_est = int(
            str(proj._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
        leaves = proj._jdf.queryExecution().optimizedPlan().collectLeaves()
        leaf_est = int(str(leaves.apply(0).stats().sizeInBytes()))
        assert root_est < leaf_est, "projection no longer shrinks the estimate"
        mid = (root_est + leaf_est) // 2
        assert spread_scan(proj, "event_id", min_bytes=mid) is not proj
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_SPREAD_SCAN", None)
        else:
            os.environ["SPARK_GRAFT_SPREAD_SCAN"] = prev
