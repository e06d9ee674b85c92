"""Registry pairing every PySpark query with its DuckDB oracle SQL.

The driver (``__spark_entry__.py``) runs each ``QUERIES[name]`` on Spark
and ``ORACLES[name]`` on DuckDB over the same parquet tables and
compares row-count + schema + order-insensitive value-hash. Queries
whose semantics are not SQL-expressible (LSH-family approximations with
hash functions DuckDB lacks) register with ``oracle=None`` and get the
driver's weaker rows-only check.

Determinism rules used throughout the library (so value-hashes match):

- Sums over double columns go through ``DECIMAL(18,2)`` (exact, order
  independent) and are cast back to double — Spark's partial-aggregate
  ordering differs from DuckDB's single-node fold, so raw double sums
  would drift in the low bits.
- Per-row scalar float math is left unrounded: identical IEEE ops give
  bit-identical results on both engines.
- Array-valued outputs are sorted then joined to strings (collect_set
  order is undefined).
- Every LIMIT carries a total-order tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
