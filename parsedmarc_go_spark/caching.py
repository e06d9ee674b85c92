"""Scoped persistence for operator intermediates.

Several batch operators persist a mid-plan frame that two or more
downstream joins consume (the minhash candidate pairs, the PPJoin
ranked index, …). ``DataFrame.persist`` registers the plan in Spark's
CacheManager, which holds it until an explicit ``unpersist`` or session
end — a lazily-built operator cannot know when its caller is done, so
operators used to leak one cache entry per distinct plan into the
session. Within one gate that is exactly the reuse we want; across a
long session (the 28-gate bench runs every gate 6+ times, a library
user runs thousands of corpora) the stale entries pile into the unified
memory pool's protected storage half, shrinking execution memory for
every later job until it spills — measured round 15 as end-of-session
gate medians 2-5x their fresh-session walls at a 2x-sf1 corpus.

The contract here: operators persist through :func:`scoped_persist`,
and every registered gate builder (plans/registry.py wraps them)
releases ALL intermediates persisted by PREVIOUS builder calls before
building its own plan. Intermediates therefore live exactly from their
operator call until the next gate begins — long enough for the
caller's action to consume them, never longer than one gate. Callers
composing several operator frames and collecting them later lose only
the cache reuse (the plans recompute), never correctness; such callers
can hold their own ``.persist()`` instead.

``release_intermediates()`` is also public for library users driving
operators directly in long-lived sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def scoped_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() + register for release at the next gate boundary."""
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    _LIVE.append(df)
    return df


def release_intermediates() -> int:
    """Unpersist every scoped intermediate; returns how many."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # a stopped session invalidates the handle; nothing to free
            pass
    # localCheckpoint()ed frames (components rounds, BPE/unigram EM
    # rounds, pipeline stage boundaries) pin their materialized blocks
    # until Spark's ContextCleaner sees the RDD unreferenced — which
    # needs the PYTHON reference dropped first, and py4j only drops it
    # on collection. A generation-0-heavy collect here is ~ms and lets
    # whatever JVM GC happens next actually reclaim the blocks, instead
    # of stale checkpoint storage surviving a whole session because the
    # cleaner's periodic System.gc() (30 min default) never fired.
    import gc

    gc.collect()
    return n
