"""OLAP analytics shapes (rollup/pivot/corr/funnel/tw-avg/churn)."""

from etl_schema_spark.operators import analytics

from .conftest import assert_matches_oracle


def test_rollup_revenue(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.rollup_revenue(spark, sf_dir), duck, analytics.rollup_revenue_oracle()
    )


def test_pivot_event_counts(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.pivot_event_counts(spark, sf_dir),
        duck,
        analytics.pivot_event_counts_oracle(),
    )


def test_corr_value_hour(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.corr_value_hour(spark, sf_dir), duck, analytics.corr_value_hour_oracle()
    )


def test_corr_bounds(spark, sf_dir):
    rows = analytics.corr_value_hour(spark, sf_dir).collect()
    assert rows
    assert all(-1.0 <= r["corr_value_hour"] <= 1.0 for r in rows)


def test_funnel_conversion(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.funnel_conversion(spark, sf_dir), duck, analytics.funnel_conversion_oracle()
    )


def test_funnel_monotone(spark, sf_dir):
    r = analytics.funnel_conversion(spark, sf_dir).collect()[0]
    assert r["n_view"] >= r["n_click_after_view"] >= r["n_purchase_after_click"]
    assert r["n_view"] > 0


def test_time_weighted_value(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.time_weighted_value(spark, sf_dir),
        duck,
        analytics.time_weighted_value_oracle(),
    )


def test_churned_users(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.churned_users(spark, sf_dir), duck, analytics.churned_users_oracle()
    )


def test_rollup_single_expand_no_reread(spark, sf_dir):
    plan = (
        analytics.rollup_revenue(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") <= 4  # 4 tables, each read once
    assert "Expand" in plan  # rollup = one Expand, not three scans
