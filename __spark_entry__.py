"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (A4 compliance-rate shape — the
  reference's headline dashboard panel) at sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 plus the
  training-data-pipeline operators, keyed by name.
- ``oracle_sql()``: equivalent DuckDB ANSI SQL for each SQL-expressible
  query (same column names; see plans/registry.py for the determinism
  rules that make the value-hashes match).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may load this file by path from any CWD; make the package
# importable regardless
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from parsedmarc_go_spark.plans import QUERIES

    return QUERIES["a4_compliance_rate"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from parsedmarc_go_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from parsedmarc_go_spark.plans import ORACLES

    return dict(ORACLES)
