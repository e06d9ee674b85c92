"""Event-pipeline operators over the `events` table: as-of join,
gap-based sessionization, hopping windows, running totals, JSON
property extraction, and exact quantiles.

These extend the reference's analytics surface (SURVEY §2.5-2.7 is
daily/grouped aggregation; the reference has no as-of, session, or
sliding-window operator) with the event-sequence shapes a behavioural /
training-data pipeline needs. Every query keeps the library's
determinism rules (registry docstring): decimal-exact sums, string
date buckets, total-order tie-breaks.

Scale notes (100 TB posture):

- as-of join and sessionization are ONE hash exchange on user_id each
  (window partitioning); no inequality join, no per-key buffering;
- the hopping window explodes each event into exactly size/slide
  windows *before* the aggregation, so the shuffle carries
  (window, partial-agg) pairs — the map-side combine absorbs the 2×
  row expansion;
- running totals use a window frame that Spark evaluates streamingly
  per partition (no whole-partition materialization);
- exact quantiles go through one sort-free hash aggregate per group
  plus a row_number window over groups (two exchanges total; at
  100 TB swap in approx_percentile — same query shape, documented
  in a9's exact/approx pairing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parsedmarc_go_spark.operators.asof import asof_join
from parsedmarc_go_spark.plans.analytics import _cents, _dsum
from parsedmarc_go_spark.plans.registry import query
from parsedmarc_go_spark.tables import load


# ---------------------------------------------------------------------------
# J4 — as-of join: every click gets the most recent prior (or same
# instant) view by the same user. Oracle is the correlated-subquery
# formulation with the same (ts, event_id) tie-break the operator uses.
@query(
    "j4_asof_join",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts,
           (SELECT r.value FROM events r
             WHERE r.user_id = l.user_id AND r.event_type = 'view'
               AND r.ts <= l.ts
             ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS asof_value,
           (SELECT r.event_id FROM events r
             WHERE r.user_id = l.user_id AND r.event_type = 'view'
               AND r.ts <= l.ts
             ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS asof_event_id
    FROM events l WHERE l.event_type = 'click'
    """,
)
def j4_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value", "event_id")
    return asof_join(
        clicks,
        views,
        on="ts",
        by=["user_id"],
        value_cols=["value", "event_id"],
        right_order="event_id",
    )


# ---------------------------------------------------------------------------
# E1 — gap-based sessionization: a session breaks after >4 h of user
# inactivity. lag → boundary flag → running sum = session number, then
# one aggregate per (user, session). Identical SQL runs on both engines.
#
# Determinism: events.ts carries sub-second precision, so every epoch
# comparison/subtraction is done in WHOLE MICROSECONDS on both engines
# (Spark unix_micros / DuckDB epoch_us) — second-floored unix_timestamp
# differs by ±1 from fractional epoch() subtraction. The oracle's window
# SUM is cast to BIGINT because DuckDB returns HUGEINT (→ float64 in
# pandas) which the driver's type-aware hash distinguishes from bigint.
_SESSION_GAP_SEC = 4 * 3600
_SESSION_GAP_US = _SESSION_GAP_SEC * 1_000_000

@query(
    "e1_sessionize",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_no
      FROM flagged)
    SELECT user_id, sess_no,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
           CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS BIGINT) AS duration_sec
    FROM numbered GROUP BY user_id, sess_no
    """,
)
def e1_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > _SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "sess_no", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return numbered.groupBy("user_id", "sess_no").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("sess_start"),
        F.floor(
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / F.lit(1_000_000)
        ).alias("duration_sec"),
    )


# ---------------------------------------------------------------------------
# A18 — hopping (sliding) window aggregation: 1-day windows every 12 h,
# so each event lands in exactly 2 windows. Spark's F.window() does the
# expansion natively; the oracle reproduces the same epoch-aligned grid
# with an explicit 2-row expansion join.
@query(
    "a18_hopping_window",
    oracle="""
    SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 43200) AS BIGINT) * 43200
                                 - k.k * 43200), '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) / 100.0 AS total_value
    FROM events, (VALUES (0), (1)) k(k)
    GROUP BY 1
    """,
)
def a18_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "12 hours").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            _dsum("value", "total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# A19 — per-user running total, decimal-exact so the sequential fold
# matches DuckDB bit-for-bit regardless of partial-agg order (there is
# none: a window frame folds in ORDER BY order on both engines).
@query(
    "a19_running_total",
    oracle="""
    SELECT event_id, user_id,
           SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) / 100.0 AS running_value
    FROM events
    """,
)
def a19_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        (F.sum(_cents("value")).over(w) / 100.0).alias("running_value"),
    )


# ---------------------------------------------------------------------------
# P23 — JSON property extraction (events.props is a JSON object string;
# the reference parses report JSON with typed schemas, S7 — this is the
# schemaless path for ad-hoc properties).
@query(
    "p23_json_extract",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
    FROM events
    """,
)
def p23_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("prop_k")
    )


# ---------------------------------------------------------------------------
# A20 — exact median per event_type WITHOUT an engine quantile
# function: engines interpolate quantiles with different FP expression
# trees, so both sides compute the same explicit middle-rows formula —
# rank by value, average the middle one/two as decimals. Exact and
# order-independent. (At 100 TB use approx_percentile; this is the
# exact gate, paired like a9_distinct_exact/approx.)
@query(
    "a20_median",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS r,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events)
    SELECT event_type,
           AVG(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) / 100.0 AS median_value
    FROM ranked
    WHERE r IN ((n + 1) // 2, (n + 2) // 2)
    GROUP BY event_type
    """,
)
def a20_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w.orderBy("value")).alias("r"),
        F.count("*").over(w).alias("n"),
    )
    mid = ranked.filter(
        (F.col("r") == F.floor((F.col("n") + 1) / 2)) | (F.col("r") == F.floor((F.col("n") + 2) / 2))
    )
    return mid.groupBy("event_type").agg(
        (F.avg(_cents("value")) / 100.0).alias("median_value")
    )


@query("a20_median_approx")
def a20_median_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20 production default (paired with the exact gate above the way
    a9_distinct_exact/approx are): percentile_approx's KLL-style sketch
    is a partial-aggregable AGGREGATE — map-side combine, one shuffle of
    k sketches per event_type, no per-key ROW_NUMBER sort. The exact
    twin's window partitions the whole corpus by event_type, which at
    100 TB means a handful of executor-crushing sort partitions; this
    one's memory is O(accuracy) per key regardless of row count.
    Rows-only gate (DuckDB's approx sketch differs); the error bound vs
    the exact gate is pinned in tests/test_plans.py."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("median_value")
    )
