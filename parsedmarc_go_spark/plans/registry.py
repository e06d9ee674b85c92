"""Registry pairing every PySpark query with its DuckDB oracle SQL.

The driver (``__spark_entry__.py``) runs each ``QUERIES[name]`` on Spark
and ``ORACLES[name]`` on DuckDB over the same parquet tables and
compares row-count + schema + order-insensitive value-hash. Queries
whose semantics are not SQL-expressible (LSH-family approximations with
hash functions DuckDB lacks) register with ``oracle=None`` and get the
driver's weaker rows-only check.

Determinism rules used throughout the library (so value-hashes match):

- Sums over double columns go through fixed-point cents:
  ``SUM(CAST(FLOOR(x * 100 + 0.5) AS BIGINT)) / 100.0`` — Spark's
  partial-aggregate ordering differs from DuckDB's single-node fold, so
  raw double sums would drift in the low bits; the per-row rounding is
  pure IEEE double math (bit-identical on both engines), the long sum
  is associative-exact, and the final division is one shared rounding.
  (This replaced DECIMAL(18,2) casts in round 5: same values on every
  gate, ~2× faster — the double→BigDecimal conversion was the single
  hottest expression in the bench mix.)
- Per-row scalar float math is left unrounded: identical IEEE ops give
  bit-identical results on both engines.
- Array-valued outputs are sorted then joined to strings (collect_set
  order is undefined).
- Every LIMIT carries a total-order tie-break key.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # gate boundary: intermediates scoped-persisted by operator
            # calls inside PREVIOUS gates are consumed by now (the
            # driver/bench/sweep collect each gate before building the
            # next) — release them so a long session's cache can't
            # crowd execution memory (see caching.py)
            from parsedmarc_go_spark.caching import release_intermediates

            release_intermediates()
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco
