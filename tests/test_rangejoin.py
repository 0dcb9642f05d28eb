"""Range (interval) join: bucketed equi-join plan vs declarative non-equi oracle."""

from pyspark.sql import functions as F

from etl_schema_spark.operators import rangejoin

from .conftest import assert_matches_oracle


def test_range_interval_join_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        rangejoin.range_interval_join(spark, sf_dir),
        duck,
        rangejoin.range_interval_join_oracle(),
    )


def test_range_join_window_invariants(spark, sf_dir):
    df = rangejoin.range_interval_join(spark, sf_dir).cache()
    # Empty window <=> no gap; a matched window's gap lies within the hour.
    assert df.filter((F.col("n_clicks_1h") == 0) & F.col("last_click_gap_s").isNotNull()).count() == 0
    assert df.filter((F.col("n_clicks_1h") > 0) & F.col("last_click_gap_s").isNull()).count() == 0
    matched = df.filter(F.col("n_clicks_1h") > 0)
    assert matched.count() > 0  # the window is real, not vacuous
    assert matched.filter(
        (F.col("last_click_gap_s") < 0) | (F.col("last_click_gap_s") >= 3600)
    ).count() == 0


def test_range_join_no_nested_loop(spark, sf_dir):
    plan = (
        rangejoin.range_interval_join(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_point_join_bucket_edges(spark):
    # Points exactly on lo are excluded, on hi included; pairs spanning a
    # bucket boundary are found exactly once.
    iv = spark.createDataFrame(
        [(1, 3500, 7100)], "k int, lo long, hi long"
    ).select("k", F.col("lo").cast("timestamp").alias("lo"), F.col("hi").cast("timestamp").alias("hi"))
    pts = spark.createDataFrame(
        [(1, 3500), (1, 3600), (1, 7100), (1, 7101)], "k int, ts long"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    got = sorted(
        r["ts"].timestamp()
        for r in rangejoin.interval_point_join(
            iv, pts, on="k", bucket_seconds=3600
        ).collect()
    )
    assert got == [3600.0, 7100.0]
