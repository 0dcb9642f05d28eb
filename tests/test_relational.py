"""Relational core tests (SURVEY §2B) + plan-shape assertions for scale."""

from etl_schema_spark.operators import relational

from .conftest import assert_matches_oracle


def test_q1(spark, sf_dir, duck):
    assert_matches_oracle(relational.q1_pricing_summary(spark, sf_dir), duck, relational.q1_oracle())


def test_q3(spark, sf_dir, duck):
    assert_matches_oracle(relational.q3_shipping_priority(spark, sf_dir), duck, relational.q3_oracle())


def test_q5(spark, sf_dir, duck):
    assert_matches_oracle(relational.q5_local_supplier(spark, sf_dir), duck, relational.q5_oracle())


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
