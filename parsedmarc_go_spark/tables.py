"""Loaders for the driver's synthetic star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# All synthetic timestamps live in a 30-day window ending 2024-01-30
# (TESTDATA.md, seed=42). Time-relative dashboard filters (SURVEY F9,
# `begin_date >= now() - interval N day`) take this injected anchor so
# Spark and the DuckDB oracle see identical, reproducible predicates
# (SURVEY §7 hard part 5).
AS_OF = "2024-01-31 00:00:00"


def _ensure_runtime_confs(spark: SparkSession) -> None:
    """The driver calls us with its own SparkSession; these SQL confs are
    runtime-settable and required for correct reads regardless of how
    that session was built: events.ts is parquet TIMESTAMP(NANOS) (which
    the reader otherwise rejects), and all report timestamps are UTC."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# (session id, sf_dir, table) → DataFrame. spark.read.parquet lists
# files + reads footers on the DRIVER every call (~70 ms/table); the
# relation is immutable for a given path, so memoize it — repeated
# queries over the same tables then skip the re-listing entirely.
_scan_cache: dict[tuple[int, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir, name)
    cached = _scan_cache.get(key)
    if cached is not None:
        return cached
    _ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            # events.ts as parquet TIMESTAMP(NANOS), read as a nanos long
            # via spark.sql.legacy.parquet.nanosAsLong; truncate to micros
            # (same as DuckDB's ns→µs conversion). `div` keeps int64
            # precision — `/` would round-trip through double and lose
            # low bits.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            # events.ts as TIMESTAMP(MICROS, isAdjustedToUTC=false) →
            # TIMESTAMP_NTZ, which Spark 4 rejects in instant functions
            # (unix_micros, F.window). The session TZ is UTC (above), so
            # the cast reinterprets the same wall-clock as the same
            # instant DuckDB sees — and downstream code keeps one
            # timestamp type regardless of how the generator wrote the
            # file.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _scan_cache[key] = df
    return df


# Below this input size the spread is pure overhead: the serial CPU
# phase it parallelizes is sub-100 ms, while the added exchange costs
# a fixed ~0.2-0.3 s per gate (BENCH_r12→r13: j3b 0.635→0.883 s, w1
# 0.288→0.336 s at sf0.1 — the slot-count-only guard fired on every
# small corpus). 4 MiB of compressed parquet splits into ≥128 KiB of
# raw-row work per slot on 32 slots — enough for the CPU-heavy string
# pipelines this helper serves (at sf1, events = 16 MiB and documents
# = 6.5 MiB both clear it; every sf0.1 table stays under).
SPREAD_SCAN_MIN_BYTES = 4 * 1024 * 1024


def spread_scan(
    df: DataFrame, key_col: str, min_bytes: int = SPREAD_SCAN_MIN_BYTES
) -> DataFrame:
    """Repartition a scan-rooted frame to full parallelism when the
    file layout under-partitions it (one sf1 parquet file → 2
    partitions) — the `_shingle_stream ensure_parallelism` guard
    (operators/dedup.py:64) as a shared helper for CPU-heavy
    explode/expression pipelines that would otherwise inherit the
    scan's partitioning. The shuffle moves the RAW rows (compact —
    before any explode amplification); consumers whose work is scan-
    or IO-bound should NOT pay it, which is why this is opt-in per
    pipeline rather than part of load().

    SIZE-gated, then slot-gated (VERDICT r13 task 2): inputs under
    ``min_bytes`` skip both the shuffle AND the plan-converting
    ``df.rdd`` partition probe; the r13 slot-only guard taxed every
    small corpus ~0.25 s/gate for a serial phase worth less than
    that. The size read is the MAX over the optimized plan's LEAF
    relations (the parquet file bytes, no job run) — NOT the frame's
    own root estimate: Catalyst scales a Project's sizeInBytes by the
    projected columns' default widths, so a narrow projection over a
    big scan (the maxmunch corpus select) reported ~0.43× the file
    size and silently skipped the spread the call exists to apply.
    ``SPARK_GRAFT_SPREAD_SCAN`` ∈ {auto (default), never, always}
    overrides the gate — bench.py's spread A/B uses it to stamp both
    sides in the artifact."""
    import os

    mode = os.environ.get("SPARK_GRAFT_SPREAD_SCAN", "auto")
    if mode not in ("auto", "never", "always"):
        # a typo ('alway') must not silently run auto while a bench A/B
        # stamps the numbers as the intended mode (ADVICE r14)
        raise ValueError(
            f"SPARK_GRAFT_SPREAD_SCAN={mode!r} is not one of "
            "{'auto', 'never', 'always'}"
        )
    if mode == "never":
        return df
    if mode != "always":
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        scan_bytes = max(
            (
                int(str(leaves.apply(i).stats().sizeInBytes()))
                for i in range(leaves.size())
            ),
            default=0,
        )
        if scan_bytes < min_bytes:
            return df
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        # deliberately COALESCIBLE (no explicit count): AQE right-sizes
        # the exchange per query, and an A/B at sf0.1 measured the
        # forced-defaultParallelism variant 1.5-3× SLOWER on every
        # consumer gate (w1 0.33→0.92 s, maxmunch 1.20→2.33 s) — tiny
        # corpora don't want 32 tasks. The ONE place the coalescer is
        # wrong is a checkpoint/materialization boundary, where the
        # exchange output IS the stored partitioning (the curation
        # pipeline's corpus folded to 1 partition and every CPU stage
        # ran serial) — such callers must pin their own explicit-count
        # repartition instead of using this helper.
        return df.repartition(F.col(key_col))
    return df
