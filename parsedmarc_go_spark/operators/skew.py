"""Skew handling for hot keys (100 TB posture).

AQE's skew-join splitting (on by default in session.py) covers joins;
these utilities cover the cases AQE does not:

- `salted_agg`: two-phase aggregation for skewed group keys — partial
  aggregate on (key, salt), final aggregate on key. Map-side combine
  already bounds shuffle volume for algebraic aggregates, but a single
  hot key still lands every partial row in one reducer; salting spreads
  the partials over `n_salts` reducers first. Worth it only for truly
  pathological keys (one org emitting most of the reports).
- `salted_join`: replicate-dim join for a skewed fact key against a
  dim too big to broadcast — the dim explodes × n_salts, the fact side
  salts deterministically from a row hash, and the equi-join on
  (key, salt) spreads each hot key over n_salts reducers instead of
  one. Results proven equal to the plain join in test_skew.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AggSpec = tuple[Callable[[str], Column], Callable[[str], Column]]

# aggregate name → (partial expr builder, final merge builder)
MERGEABLE: dict[str, AggSpec] = {
    "sum": (lambda c: F.sum(c), lambda c: F.sum(c)),
    "count": (lambda c: F.count(c), lambda c: F.sum(c)),
    "min": (lambda c: F.min(c), lambda c: F.min(c)),
    "max": (lambda c: F.max(c), lambda c: F.max(c)),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: output_col → (agg_name in MERGEABLE, input_col).
    Phase 1 groups by (keys…, salt) where salt = crc32(whole-row rand
    surrogate) — here a deterministic spread over a row hash — and
    phase 2 merges partials by the real keys."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts)).alias("__salt")
    partial_exprs = []
    final_exprs = []
    for out, (agg_name, in_col) in aggs.items():
        partial_fn, final_fn = MERGEABLE[agg_name]
        partial_exprs.append(partial_fn(in_col).alias(f"__p_{out}"))
        final_exprs.append(final_fn(f"__p_{out}").alias(out))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join for a dim too large to broadcast: every dim
    row replicates to n_salts (key, salt) copies, every fact row takes
    ONE deterministic salt from its row hash, and the shuffle keys on
    (key, salt) — a hot fact key's rows now land on n_salts reducers
    instead of one, at the price of shuffling the dim n_salts×. Use
    when AQE's skew splitting can't help (e.g. the skew is in the
    partition the OptimizeSkewedJoin rule can't subdivide further) and
    the dim side is the smaller one. Supports 'inner' and 'left'
    (every fact row has exactly one salt, so left semantics are
    preserved verbatim); output columns = fact ∪ (dim minus key),
    matching a plain equi-join."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    f = fact.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    )
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, [key, "__salt"], how).drop("__salt")
