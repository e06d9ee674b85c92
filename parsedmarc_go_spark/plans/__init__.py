"""Query plan library — SURVEY §2.4-2.7 analytics workload plus the
training-data-pipeline operators, each as a (PySpark builder, DuckDB
oracle SQL) pair registered for the driver's correctness gate."""

from parsedmarc_go_spark.plans.registry import ORACLES, QUERIES

# importing the modules populates the registry
from parsedmarc_go_spark.plans import analytics as _analytics  # noqa: E402,F401
from parsedmarc_go_spark.plans import enrichops as _enrichops  # noqa: E402,F401
from parsedmarc_go_spark.plans import eventops as _eventops  # noqa: E402,F401
from parsedmarc_go_spark.plans import textops as _textops  # noqa: E402,F401
from parsedmarc_go_spark.plans import vectorops as _vectorops  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES"]
