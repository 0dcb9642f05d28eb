"""Relational core tests (SURVEY §2B) + plan-shape assertions for scale."""

from etl_schema_spark.operators import relational

from .conftest import assert_matches_oracle


def test_q1(spark, sf_dir, duck):
    assert_matches_oracle(relational.q1_pricing_summary(spark, sf_dir), duck, relational.q1_oracle())


def test_q3(spark, sf_dir, duck):
    assert_matches_oracle(relational.q3_shipping_priority(spark, sf_dir), duck, relational.q3_oracle())


def test_q5(spark, sf_dir, duck):
    assert_matches_oracle(relational.q5_local_supplier(spark, sf_dir), duck, relational.q5_oracle())


def test_q4(spark, sf_dir, duck):
    assert_matches_oracle(relational.q4_order_priority(spark, sf_dir), duck, relational.q4_oracle())


def test_q6(spark, sf_dir, duck):
    assert_matches_oracle(relational.q6_forecast_revenue(spark, sf_dir), duck, relational.q6_oracle())


def test_q7(spark, sf_dir, duck):
    assert_matches_oracle(relational.q7_volume_shipping(spark, sf_dir), duck, relational.q7_oracle())


def test_q10(spark, sf_dir, duck):
    assert_matches_oracle(relational.q10_returned_items(spark, sf_dir), duck, relational.q10_oracle())


def test_q14(spark, sf_dir, duck):
    assert_matches_oracle(relational.q14_promo_revenue(spark, sf_dir), duck, relational.q14_oracle())


def test_q19(spark, sf_dir, duck):
    assert_matches_oracle(
        relational.q19_disjunctive_predicate(spark, sf_dir), duck, relational.q19_oracle()
    )


def test_q6_predicates_pushed(spark, sf_dir):
    plan = (
        relational.q6_forecast_revenue(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan, plan


def test_q19_no_cartesian(spark, sf_dir):
    plan = (
        relational.q19_disjunctive_predicate(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = (
        relational.q1_pricing_summary(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "PushedFilters: [" in plan, plan


def test_q5_broadcasts_dimensions(spark, sf_dir):
    plan = (
        relational.q5_local_supplier(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q2(spark, sf_dir, duck):
    assert_matches_oracle(
        relational.q2_min_cost_supplier(spark, sf_dir), duck, relational.q2_oracle()
    )


def test_q8(spark, sf_dir, duck):
    assert_matches_oracle(relational.q8_market_share(spark, sf_dir), duck, relational.q8_oracle())
