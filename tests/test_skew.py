"""Salted two-phase aggregation equals plain aggregation (skew safety
must never change results)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parsedmarc_go_spark.operators.skew import salted_agg
from parsedmarc_go_spark.tables import load
from tests.conftest import SF_CORRECT


def test_salted_agg_equals_plain(spark):
    ev = load(spark, SF_CORRECT, "events")
    plain = {
        (r.event_type,): (r.n, r.total, r.mx)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.event_type,): (r.n, r.total, r.mx)
        for r in salted_agg(
            ev.withColumn("value_dec", F.col("value").cast("decimal(18,2)")),
            keys=["event_type"],
            aggs={
                "n": ("count", "value"),
                "total": ("sum", "value_dec"),
                "mx": ("max", "value"),
            },
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_agg_spreads_hot_key(spark):
    # a single hot key must produce n_salts partial groups in phase 1
    df = spark.range(0, 10000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    out = salted_agg(df, ["k"], {"total": ("sum", "v"), "n": ("count", "v")}, n_salts=8)
    [row] = out.collect()
    assert row.total == sum(range(10000)) and row.n == 10000
