"""Gate-boundary release of scoped-persisted operator intermediates.

Round-15 fix: operators that persist mid-plan frames (minhash candidate
pairs/sets, the PPJoin ranked index, the exact-Jaccard shingle index)
used to leave one CacheManager entry per distinct plan alive for the
whole session; across a 28-gate bench session running every gate 6+
times, the stale entries crowded the unified pool's protected storage
half until late-session gates spilled (end-of-session medians measured
2-5x fresh walls at a 2x-sf1 corpus). Intermediates now register
through caching.scoped_persist and every registered gate builder
releases the previous gate's on entry.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from parsedmarc_go_spark.caching import release_intermediates, scoped_persist

SF = "/root/testdata/sf0.001"


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_scoped_persist_registers_and_release_unpersists(spark):
    release_intermediates()  # clean slate from earlier tests
    base = _n_cached(spark)
    df = scoped_persist(spark.range(100).withColumn("x", F.col("id") * 2))
    df.count()
    assert _n_cached(spark) == base + 1
    assert release_intermediates() == 1
    assert _n_cached(spark) == base


def test_gate_boundary_releases_previous_gates_intermediates(spark):
    from parsedmarc_go_spark.plans import QUERIES

    release_intermediates()
    base = _n_cached(spark)
    # minhash persists two candidate-scoped frames through scoped_persist
    QUERIES["dedup_minhash_lsh"](spark, SF).collect()
    assert _n_cached(spark) > base, "minhash should persist intermediates"
    # the NEXT gate call (any gate; a1 itself persists nothing) releases them
    QUERIES["a1_daily_volume"](spark, SF).collect()
    assert _n_cached(spark) == base
    release_intermediates()


def test_release_survives_frames_from_multiple_operators(spark):
    from parsedmarc_go_spark.plans import QUERIES

    release_intermediates()
    base = _n_cached(spark)
    # two persisting gates back to back: the second's entry releases the
    # first's frames, the second's own frames stay for its consumer
    QUERIES["dedup_minhash_lsh"](spark, SF).collect()
    QUERIES["dedup_keep_best_containment_prefix"](spark, SF).collect()
    QUERIES["a1_daily_volume"](spark, SF).collect()
    assert _n_cached(spark) == base
