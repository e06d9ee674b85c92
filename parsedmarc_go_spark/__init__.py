"""parsedmarc_go_spark — a from-scratch, PySpark-native analytics engine
with the query and data-processing capabilities of the reference
``ZenProjects/parsedmarc-go`` (DMARC / SMTP-TLS report analytics), plus
the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) a 100 TB Spark deployment
needs.

Layout
------
- ``session``    : SparkSession factory with scale-oriented defaults.
- ``schemas``    : explicit StructTypes for the three report families and
                   the five flat analytic tables (SURVEY §1.3-1.5).
- ``sources``    : ingest operators S1-S14 (binary scan, magic-byte
                   detection, zip/gzip extraction, MIME, XML/JSON parse).
- ``functions``  : scalar/derived-column layer P1-P22 + text analysis.
- ``operators``  : dedup, similarity search, multimodal plumbing.
- ``plans``      : the analytics query library (SURVEY §2.4-2.7) with
                   DuckDB oracle SQL for every SQL-expressible operator.
- ``sinks``      : JSON/CSV/directory writers K1-K3 (+ gated Kafka K5).
- ``streaming``  : Structured Streaming daemon mode (SURVEY §2.10).
"""

__version__ = "0.1.0"
