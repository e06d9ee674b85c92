"""Streaming rollups + stateful operators (SURVEY §2.10 "Spark
mapping" column, beyond reference parity):

- `streaming_daily_rollup`: the A14 daily-summary materialized view as
  a live watermarked windowed aggregation — late rows inside the
  watermark still land in their day window; append mode emits each
  window once, when it finalizes.
- `dedupe_stream`: exactly-once-per-key across micro-batches via
  applyInPandasWithState — the report_id dedup the reference never had
  (its inserts are at-least-once, SURVEY §2.10), off by default in the
  daemon for parity, available for pipelines that want it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_daily_rollup(
    records_stream: DataFrame,
    watermark: str = "1 day",
) -> DataFrame:
    """Tumbling 1-day windows over begin_date per org_name: total,
    aligned, reject, quarantine sums (docs/clickhouse.md:241-259 shape).
    Returns the aggregated stream; caller attaches the sink."""
    return (
        records_stream.withWatermark("begin_date", watermark)
        .groupBy(F.window("begin_date", "1 day").alias("w"), "org_name")
        .agg(
            F.sum("count").alias("total_messages"),
            F.sum(F.when(F.col("dmarc_aligned"), F.col("count")).otherwise(0)).alias(
                "aligned_messages"
            ),
            F.sum(F.when(F.col("disposition") == "reject", F.col("count")).otherwise(0)).alias(
                "rejected_messages"
            ),
            F.sum(
                F.when(F.col("disposition") == "quarantine", F.col("count")).otherwise(0)
            ).alias("quarantined_messages"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "org_name",
            "total_messages",
            "aligned_messages",
            "rejected_messages",
            "quarantined_messages",
        )
    )


_DEDUP_STATE = T.StructType([T.StructField("seen", T.IntegerType(), True)])


def dedupe_stream(stream: DataFrame, key_col: str) -> DataFrame:
    """Keep the first occurrence of each key across the stream's entire
    lifetime (state-store backed, so it survives restarts with the
    checkpoint). Emits rows verbatim; duplicates are dropped."""
    out_schema = stream.schema

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.head(1)
        if first is not None:
            state.update((1,))
            yield first

    return stream.groupBy(key_col).applyInPandasWithState(
        dedup, out_schema, _DEDUP_STATE, "append", GroupStateTimeout.NoTimeout
    )
