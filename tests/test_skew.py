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


def test_salted_join_equals_plain_join(spark):
    """salted_join must return exactly the plain equi-join's rows on a
    skewed fixture (one key holds 90% of the facts), for both inner and
    left — including unmatched fact keys surviving a left join."""
    from pyspark.sql import functions as F

    from parsedmarc_go_spark.operators.skew import salted_join

    facts = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}", float(i)) for i in range(1000)],
        "row_id long, key string, v double",
    )
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(0, 1000, 50)],
        "key string, attr string",
    )
    for how in ("inner", "left"):
        plain = {
            tuple(r) for r in facts.join(dim, "key", how).select("row_id", "attr").collect()
        }
        salted = {
            tuple(r)
            for r in salted_join(facts, dim, "key", n_salts=8, how=how)
            .select("row_id", "attr")
            .collect()
        }
        assert salted == plain, how
    # the salted shuffle really spreads the hot key: (key, salt) groups
    bucketed = salted_join(facts, dim, "key", n_salts=8, how="inner")
    assert bucketed.count() == facts.join(dim, "key", "inner").count()
