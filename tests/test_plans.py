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
            "f9_time_range_filter",
            "ann_topk_bruteforce",
        ]
    }


def test_a1_prunes_columns(plans):
    # a 2-column aggregate must not read the whole events schema
    assert "ReadSchema: struct<ts:bigint,value:double>" in plans["a1_daily_volume"]


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


def test_f9_scan_reads_needed_columns_only(plans):
    # ts arrives as nanos long (driver testdata), so the time predicate
    # itself cannot push past the conversion — but pruning must hold
    assert "ReadSchema: struct<event_id:bigint,ts:bigint,user_id:bigint" in plans["f9_time_range_filter"]


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
