"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks
natively, expressed as a composition of built-in ops.

For every left row, attach the value columns of the most recent right
row with the same key whose timestamp is <= (backward) or >= (forward)
the left timestamp. The classic uses: trade→latest-quote, event→most
recent dimension state, click→last prior impression.

Formulation — union + partitioned window, NOT a range join:

    left  rows → (key, ts, side=1, payload_left,  null)
    right rows → (key, ts, side=0, null,          payload_right)
    window PARTITION BY key ORDER BY ts, side, tiebreak
    asof = last(payload_right IGNORE NULLS) over rows unbounded..current
    keep side=1 rows

This is ONE shuffle (the window's hash exchange on key) and one
per-partition sort — O(n log n) in partition size, independent of how
many right rows precede each left row. The naive alternatives both die
at scale: an inequality join (`l.ts >= r.ts`) is a
BroadcastNestedLoop/cartesian O(|L|×|R|) plan, and a
groupBy(key).collect_list + UDF buffers whole keys in Python. The
union-window shape is also skew-tolerant via AQE because the exchange
is a plain hash partitioning on the by-key.

`side` orders right rows BEFORE left rows at equal timestamps, so a
right row at exactly the left row's timestamp is visible (ts <= ts,
matching DuckDB/pandas ASOF backward semantics). `right_order`
deterministically tie-breaks multiple right rows sharing (key, ts):
the LAST row in that order wins, mirroring
`ORDER BY ts DESC, right_order DESC LIMIT 1`.

The reference engine has no as-of operator (its joins are the equi /
range shapes in SURVEY §2.6); this module is part of the
beyond-reference event-pipeline family, like operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    right_order: str | None = None,
    direction: str = "backward",
    suffix: str = "asof_",
) -> DataFrame:
    """Left as-of join: all columns of ``left`` plus, for each of
    ``value_cols`` from ``right``, a ``{suffix}{col}`` column holding
    the as-of match (null when no right row qualifies).

    ``direction="backward"`` (default) matches the latest right row
    with ``right.on <= left.on``; ``"forward"`` the earliest with
    ``right.on >= left.on`` (implemented by reversing the sort order,
    same single-shuffle plan).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = by or []
    value_cols = value_cols or [c for c in right.columns if c != on and c not in by]

    payload = F.struct(*[F.col(c) for c in value_cols])
    rv_type = right.select(payload.alias("_p")).schema["_p"].dataType
    order_col = F.col(right_order) if right_order else F.lit(0)

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.lit(None).cast(rv_type).alias("__rv"),
        F.lit(None).cast("long").alias("__ro"),
    )
    rhs = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in by and c != on else F.col(c) for c in left.columns],
        F.lit(0).alias("__side"),
        payload.alias("__rv"),
        order_col.cast("long").alias("__ro"),
    )
    u = lhs.unionByName(rhs)

    if direction == "backward":
        w = Window.partitionBy(*by).orderBy(F.asc(on), F.asc("__side"), F.asc("__ro"))
    else:
        w = Window.partitionBy(*by).orderBy(F.desc(on), F.asc("__side"), F.asc("__ro"))
    matched = u.withColumn(
        "__asof",
        F.last("__rv", ignorenulls=True).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    out_cols: list[Column] = [F.col(c) for c in left.columns]
    out_cols += [F.col(f"__asof.{c}").alias(f"{suffix}{c}") for c in value_cols]
    return matched.filter(F.col("__side") == 1).select(*out_cols)
