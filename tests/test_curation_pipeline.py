"""The composed curation pipeline gate (round 12): every document gets
exactly one fate, every fate class is populated, and the planted
classes land where the plant says they must. The cell-level value
check against the DuckDB oracle runs in test_queries_vs_duckdb at both
SFs like every other gate."""

from __future__ import annotations

import pytest

from collections import Counter

from parsedmarc_go_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"

FATES = {
    "heldout", "exact_dup", "near_dup", "contaminated",
    "over_budget", "kept", "quality:word_count", "quality:mean_word_len",
}


def _fates(spark):
    return {r.doc_id: r.fate for r in QUERIES["curation_pipeline"](spark, SF).collect()}


def test_every_doc_exactly_one_fate_all_classes_reachable(spark):
    fates = _fates(spark)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert len(fates) == docs.count()  # one row per doc — stages are disjoint
    by_fate = Counter(fates.values())
    for f in FATES:
        assert by_fate[f] > 0, f"fate {f} unreachable: {by_fate}"


def test_planted_classes_land_where_planted(spark):
    fates = _fates(spark)
    # held-out benchmark docs
    assert all(fates[d] == "heldout" for d in fates if d % 50 == 0)
    # boilerplate class: exactly one survivor (min id), rest exact_dup
    boiler = {d: f for d, f in fates.items() if d % 10 == 1}
    dups = [d for d, f in boiler.items() if f == "exact_dup"]
    non_dups = sorted(set(boiler) - set(dups))
    assert len(non_dups) == 1 and non_dups[0] == min(boiler)
    # planted near-dup class: per disjoint token class (block % 15),
    # the min-id 'ua' doc and min-id 'ub' doc survive the exact stage
    # (every other class member is their exact dup); the surviving
    # pair then resolves at the near-dup stage — 'ub' keeper (higher
    # id) drops, 'ua' keeper survives past it
    cls2 = [d for d in fates if d % 10 == 2]
    by_class: dict[tuple, list[int]] = {}
    for d in cls2:
        by_class.setdefault(((d // 20) % 15, d % 20), []).append(d)
    for (cls, tag), ids in sorted(by_class.items()):
        keeper, rest = min(ids), sorted(ids)[1:]
        assert all(fates[d] == "exact_dup" for d in rest), (cls, tag)
        if tag == 12:
            assert fates[keeper] == "near_dup", (cls, tag, fates[keeper])
        else:
            assert fates[keeper] in {"kept", "over_budget", "contaminated"}, (
                cls, tag, fates[keeper],
            )
    # eval-phrase class: every one that reaches the decontamination
    # stage is contaminated — none may ever be 'kept' or 'over_budget'
    tagged = {d: f for d, f in fates.items() if d % 10 == 3}
    assert "contaminated" in set(tagged.values())
    assert not {f for f in tagged.values()} & {"kept", "over_budget"}


def test_pipeline_oracle_materializes_stage_ctes():
    """DuckDB 1.0 inlines multi-referenced CTEs; without MATERIALIZED
    the fate union re-expands the corpus-wide quality aggregations
    once per branch and the sf1 oracle spills past the disk (70+ GB
    observed). Pin the keyword so an oracle edit can't silently
    reintroduce the blowup."""
    from parsedmarc_go_spark.plans import ORACLES

    sql = ORACLES["curation_pipeline"]
    assert sql.count("AS MATERIALIZED") >= 15


def _pipeline_inputs(spark):
    from pyspark.sql import functions as F

    from parsedmarc_go_spark.plans.curation import _pipeline_corpus

    t = _pipeline_corpus(spark, SF)
    return (
        t.filter(F.col("doc_id") % 50 != 0),
        t.filter(F.col("doc_id") % 50 == 0),
    )


_PIPE_KW = dict(budget=2000, quality_thresholds={"max_mean_word_len": 4.5})

_STAGES = [
    "s0_corpus", "q1_quality_fp", "s2_exact", "s3_decontam",
    "s4_neardup", "d5_budget",
]


@pytest.mark.slow  # >10 s wall: excluded from the default lane (run -m "")
def test_checkpoint_dir_resume_equals_single_shot(spark, tmp_path):
    """VERDICT r12 task 4: the reliable-checkpoint mode. A run killed
    between stages and rerun over the same checkpoint_dir must (a)
    REUSE every completed stage boundary — the parquet bytes on disk
    stay untouched — and (b) produce fates byte-equal to a
    single-shot run with no checkpointing at all."""
    import os

    from parsedmarc_go_spark.operators.curation import curation_pipeline

    corpus, bench = _pipeline_inputs(spark)
    fate_key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731

    single_shot = fate_key(curation_pipeline(corpus, bench, **_PIPE_KW))

    ckpt = str(tmp_path / "ckpt")
    full = fate_key(
        curation_pipeline(corpus, bench, checkpoint_dir=ckpt, **_PIPE_KW)
    )
    assert full == single_shot
    for stage in _STAGES:
        assert os.path.exists(f"{ckpt}/{stage}/_SUCCESS"), stage

    # simulate a kill between the decontamination and near-dup stages:
    # later boundaries vanish (or, equivalently, never got _SUCCESS)
    import shutil

    for stage in ("s4_neardup", "d5_budget"):
        shutil.rmtree(f"{ckpt}/{stage}")
    # a mid-flight write with no _SUCCESS must be treated as absent
    os.makedirs(f"{ckpt}/d5_budget")
    open(f"{ckpt}/d5_budget/part-00000.parquet", "w").close()

    def mtimes(stage):
        d = f"{ckpt}/{stage}"
        return {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}

    before = {s: mtimes(s) for s in _STAGES[:4]}
    resumed = fate_key(
        curation_pipeline(corpus, bench, checkpoint_dir=ckpt, **_PIPE_KW)
    )
    assert resumed == single_shot
    # completed boundaries were READ, not recomputed/rewritten
    assert {s: mtimes(s) for s in _STAGES[:4]} == before
    assert os.path.exists(f"{ckpt}/s4_neardup/_SUCCESS")
    assert os.path.exists(f"{ckpt}/d5_budget/_SUCCESS")


def test_checkpoint_dir_refuses_parameter_drift(spark, tmp_path):
    """Resuming a checkpoint directory with different pipeline
    parameters would splice two configurations — must raise."""
    import pytest

    from parsedmarc_go_spark.operators.curation import curation_pipeline

    corpus, bench = _pipeline_inputs(spark)
    ckpt = str(tmp_path / "ckpt2")
    curation_pipeline(corpus, bench, checkpoint_dir=ckpt, **_PIPE_KW).collect()
    with pytest.raises(ValueError, match="different pipeline parameters"):
        curation_pipeline(
            corpus, bench, checkpoint_dir=ckpt, budget=999,
            quality_thresholds={"max_mean_word_len": 4.5},
        )


def test_corrupt_manifest_names_the_recovery(spark, tmp_path):
    """ADVICE r13: a truncated manifest (crash between create and
    write in pre-tmp-rename layouts) must raise the descriptive
    'corrupt manifest' ValueError, not an opaque JSONDecodeError."""
    import os

    import pytest

    from parsedmarc_go_spark.operators.curation import curation_pipeline

    corpus, bench = _pipeline_inputs(spark)
    ckpt = str(tmp_path / "ckpt3")
    os.makedirs(ckpt)
    with open(os.path.join(ckpt, "manifest.json"), "w"):
        pass  # zero-byte manifest — the crash artifact
    with pytest.raises(ValueError, match="corrupt manifest"):
        curation_pipeline(corpus, bench, checkpoint_dir=ckpt, **_PIPE_KW)


def test_manifest_write_is_tmp_plus_rename(spark, tmp_path):
    """ADVICE r13: the manifest lands via tmp+rename — after a normal
    run the validated path holds complete JSON and no .tmp remains."""
    import json
    import os

    from parsedmarc_go_spark.operators.curation import curation_pipeline

    corpus, bench = _pipeline_inputs(spark)
    ckpt = str(tmp_path / "ckpt4")
    curation_pipeline(corpus, bench, checkpoint_dir=ckpt, **_PIPE_KW).collect()
    with open(os.path.join(ckpt, "manifest.json")) as f:
        assert json.load(f)["budget"] == 2000
    assert not os.path.exists(os.path.join(ckpt, "manifest.json.tmp"))
