"""Salting utilities: equivalence with unsalted results on skewed data."""

from pyspark.sql import functions as F

from etl_schema_spark.operators import skew
from etl_schema_spark.sources.catalog import load_table


def _skewed_events(spark, sf_dir):
    """events with 90% of rows forced onto one hot key."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return ev.withColumn(
        "k", F.when(F.col("event_id") % 10 != 0, F.lit(0)).otherwise(F.col("user_id"))
    )


def test_salted_join_equals_plain_join(spark, sf_dir):
    big = _skewed_events(spark, sf_dir)
    small = (
        big.select("k").distinct().withColumn("k_name", F.concat(F.lit("key_"), "k"))
    )
    plain = {
        (r.event_id, r.k_name)
        for r in big.join(small, ["k"]).select("event_id", "k_name").collect()
    }
    salted = {
        (r.event_id, r.k_name)
        for r in skew.salted_join(big, small, ["k"], salt=8)
        .select("event_id", "k_name")
        .collect()
    }
    assert salted == plain


def test_salted_join_left_outer(spark, sf_dir):
    big = _skewed_events(spark, sf_dir)
    small = spark.createDataFrame([(0, "hot")], "k long, k_name string")
    out = skew.salted_join(big, small, ["k"], salt=4, how="left")
    assert out.count() == big.count()
    assert out.filter(F.col("k_name").isNull()).count() == big.filter(F.col("k") != 0).count()


def test_salted_collect_equals_plain_collect(spark, sf_dir):
    df = _skewed_events(spark, sf_dir)
    plain = {
        r.k: sorted(r.items)
        for r in df.groupBy("k").agg(F.collect_list("event_id").alias("items")).collect()
    }
    salted = {
        r.k: list(r.items)
        for r in skew.salted_collect(df, ["k"], "event_id", salt=8).collect()
    }
    assert salted == plain
