"""Skew handling for hot keys (100 TB posture).

AQE's skew-join splitting (on by default in session.py) covers joins;
these utilities cover the cases AQE does not:

- `salted_agg`: two-phase aggregation for skewed group keys — partial
  aggregate on (key, salt), final aggregate on key. Map-side combine
  already bounds shuffle volume for algebraic aggregates, but a single
  hot key still lands every partial row in one reducer; salting spreads
  the partials over `n_salts` reducers first. Worth it only for truly
  pathological keys (one org emitting most of the reports).
- `salted_broadcast_left`: replicate-broadcast join for a skewed fact
  key against a small dim (the dim is broadcast anyway, so skew cannot
  hurt — included to document the pattern where the dim is NOT small:
  explode dim rows × n_salts, salt the fact side, equi-join on
  (key, salt)).
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
