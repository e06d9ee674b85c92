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

Assertions use the captured frames' own ``storageLevel`` (NONE after
release) rather than session-global ``getPersistentRDDs`` counts: the
global count also includes OTHER tests' localCheckpoint blocks, which
the release path's gc.collect makes the ContextCleaner reclaim
asynchronously — a moving baseline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.storagelevel import StorageLevel

from parsedmarc_go_spark import caching
from parsedmarc_go_spark.caching import release_intermediates, scoped_persist

SF = "/root/testdata/sf0.001"


def _is_cached(df) -> bool:
    lvl = df.storageLevel
    return lvl.useMemory or lvl.useDisk


def test_scoped_persist_registers_and_release_unpersists(spark):
    release_intermediates()
    df = scoped_persist(spark.range(100).withColumn("x", F.col("id") * 2))
    df.count()
    assert _is_cached(df)
    assert any(x is df for x in caching._LIVE)  # NB: DataFrame __eq__ builds a Column
    assert release_intermediates() == 1
    assert not _is_cached(df)
    assert not caching._LIVE


def test_scoped_persist_honors_storage_level(spark):
    release_intermediates()
    df = scoped_persist(spark.range(10), StorageLevel.DISK_ONLY)
    df.count()
    assert df.storageLevel.useDisk and not df.storageLevel.useMemory
    release_intermediates()


def test_gate_boundary_releases_previous_gates_intermediates(spark):
    from parsedmarc_go_spark.plans import QUERIES

    release_intermediates()
    # minhash persists two candidate-scoped frames through scoped_persist
    QUERIES["dedup_minhash_lsh"](spark, SF).collect()
    held = list(caching._LIVE)
    assert held, "minhash should register intermediates"
    assert all(_is_cached(df) for df in held)
    # the NEXT gate call (any gate; a1 itself persists nothing) releases them
    QUERIES["a1_daily_volume"](spark, SF).collect()
    assert not caching._LIVE
    assert all(not _is_cached(df) for df in held)


def test_scope_releases_only_its_own_frames(spark):
    # the streaming-microbatch contract (ADVICE r15): operators called
    # inside a caching.scope() block get their intermediates released at
    # block exit, while frames scoped OUTSIDE the block are untouched
    release_intermediates()
    outer = scoped_persist(spark.range(50))
    outer.count()
    with caching.scope():
        inner = scoped_persist(spark.range(60).withColumn("y", F.col("id") + 1))
        inner.count()
        assert _is_cached(inner)
        # the scope captures inner, not the thread-level registry
        assert not any(x is inner for x in caching._LIVE)
    assert not _is_cached(inner)
    assert _is_cached(outer)
    assert any(x is outer for x in caching._LIVE)
    release_intermediates()
    assert not _is_cached(outer)


def test_scope_nested_and_exception_safe(spark):
    release_intermediates()
    try:
        with caching.scope():
            a = scoped_persist(spark.range(10))
            a.count()
            with caching.scope():
                b = scoped_persist(spark.range(20))
                b.count()
            assert not _is_cached(b)
            assert _is_cached(a)
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not _is_cached(a)


def test_registry_is_thread_local(spark):
    # a concurrent gate on another thread must not be able to release
    # this thread's in-flight intermediates (ADVICE r15)
    import threading

    release_intermediates()
    mine = scoped_persist(spark.range(30))
    mine.count()
    released_elsewhere = []

    def other_thread():
        # the other thread's registry is empty — releasing there frees 0
        released_elsewhere.append(release_intermediates())

    t = threading.Thread(target=other_thread)
    t.start()
    t.join()
    assert released_elsewhere == [0]
    assert _is_cached(mine)
    assert release_intermediates() == 1


def test_release_survives_frames_from_multiple_operators(spark):
    from parsedmarc_go_spark.plans import QUERIES

    release_intermediates()
    # two persisting gates back to back: the second's entry releases the
    # first's frames, the second's own frames stay for its consumer
    QUERIES["dedup_minhash_lsh"](spark, SF).collect()
    first = list(caching._LIVE)
    QUERIES["dedup_keep_best_containment_prefix"](spark, SF).collect()
    second = [df for df in caching._LIVE if not any(df is f for f in first)]
    assert all(not _is_cached(df) for df in first)
    assert second and all(_is_cached(df) for df in second)
    QUERIES["a1_daily_volume"](spark, SF).collect()
    assert not caching._LIVE
    assert all(not _is_cached(df) for df in second)


def test_dead_thread_frames_swept_at_next_release(spark):
    """ADVICE r16: a frame scoped_persist()ed on a short-lived thread
    that never re-enters a gate must not leak for the session — the
    next release_intermediates() on ANY thread sweeps dead threads'
    registries."""
    import threading

    df = spark.range(10).withColumn("x", F.col("id") * 2)

    def worker():
        scoped_persist(df)

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    # the worker is dead and its frame is still registered under its ident
    assert any(v for k, v in caching._REGISTRY.items()), "frame registered"
    released = release_intermediates()
    assert released >= 1
    assert df.storageLevel == StorageLevel.NONE
    alive = {th.ident for th in threading.enumerate()}
    assert all(k in alive for k in caching._REGISTRY)


def test_boundary_gc_skipped_when_nothing_released(spark):
    """VERDICT r16 task 5: the gate-boundary full gc.collect() (~0.9 s
    on a large heap) runs only when frames were actually unpersisted or
    a tracked_local_checkpoint() was taken — an empty boundary is free."""
    import gc
    from unittest import mock

    release_intermediates()  # drain
    caching._CKPT_PENDING = False
    with mock.patch.object(gc, "collect") as collected:
        assert release_intermediates() == 0
        collected.assert_not_called()
        # a released frame triggers the collect
        scoped_persist(spark.range(5))
        assert release_intermediates() == 1
        assert collected.call_count == 1
        # a checkpoint alone (no persists) also triggers it, once
        caching.tracked_local_checkpoint(spark.range(5))
        assert caching._CKPT_PENDING
        assert release_intermediates() == 0
        assert collected.call_count == 2
        assert not caching._CKPT_PENDING
        assert release_intermediates() == 0
        assert collected.call_count == 2
