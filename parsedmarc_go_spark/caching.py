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

The contract: operators persist through :func:`scoped_persist`, and
every registered gate builder (plans/registry.py wraps them) releases
ALL intermediates persisted by PREVIOUS builder calls **on the same
thread** before building its own plan. Intermediates therefore live
exactly from their operator call until the next gate begins — long
enough for the caller's action to consume them, never longer than one
gate. Callers composing several operator frames and collecting them
later lose only the cache reuse (the plans recompute), never
correctness; such callers can hold their own ``.persist()`` instead.

Concurrency (round-16 fix, ADVICE r15): the registry is **per-thread**
— a streaming microbatch (foreachBatch runs on a py4j callback thread)
or a concurrent gate on another thread can no longer have its
still-in-flight intermediates dropped by whichever thread enters a gate
next, and there is no shared mutable list to race on. Code that drives
operators outside the gate protocol (streaming foreachBatch bodies,
library pipelines) should instead wrap the consuming block in
:func:`scope`, which releases exactly the frames persisted inside it
at block exit — bounding cache growth per microbatch instead of per
session lifetime.

``release_intermediates()`` is also public for library users driving
operators directly in long-lived sessions.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_TL = threading.local()


def _live_list() -> list[DataFrame]:
    lst = getattr(_TL, "live", None)
    if lst is None:
        lst = _TL.live = []
    return lst


def _scope_stack() -> list[list[DataFrame]]:
    stack = getattr(_TL, "scopes", None)
    if stack is None:
        stack = _TL.scopes = []
    return stack


class _ThreadLocalFrames:
    """List-like view of the CURRENT thread's gate-scoped frames.

    Exists so ``caching._LIVE`` keeps its historical list interface
    (tests and introspection iterate it) while the storage is
    per-thread: each thread sees only its own registry.
    """

    def append(self, df: DataFrame) -> None:
        _live_list().append(df)

    def pop(self) -> DataFrame:
        return _live_list().pop()

    def __iter__(self):
        return iter(_live_list())

    def __len__(self) -> int:
        return len(_live_list())

    def __bool__(self) -> bool:
        return bool(_live_list())


_LIVE = _ThreadLocalFrames()


def scoped_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() + register for release at the nearest boundary.

    Inside a :func:`scope` block the frame is released at block exit;
    otherwise it is released when the next gate builder runs on this
    thread (or on an explicit :func:`release_intermediates`).
    """
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    stack = _scope_stack()
    (stack[-1] if stack else _live_list()).append(df)
    return df


def _unpersist_all(frames: list[DataFrame]) -> int:
    n = 0
    while frames:
        df = frames.pop()
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


def release_intermediates() -> int:
    """Unpersist this thread's gate-scoped intermediates; returns how many."""
    return _unpersist_all(_live_list())


@contextmanager
def scope():
    """Release every frame scoped_persist()ed inside the block at exit.

    For consumers that fully drain their operator plans within a known
    block — a streaming foreachBatch body, a library pipeline step —
    where waiting for "the next gate" would leak one cache entry per
    call for the session lifetime (a streaming session never enters a
    gate builder at all). Nested scopes release innermost-first; frames
    scoped outside the block are untouched.
    """
    frames: list[DataFrame] = []
    _scope_stack().append(frames)
    try:
        yield frames
    finally:
        _scope_stack().pop()
        _unpersist_all(frames)
