"""Static-mapping + subquery-shape tests (SURVEY §2B)."""

from etl_schema_spark.operators import transforms

from .conftest import assert_matches_oracle


def test_static_mapping(spark, sf_dir, duck):
    assert_matches_oracle(
        transforms.static_mapping(spark, sf_dir), duck, transforms.static_mapping_oracle()
    )


def test_static_mapping_broadcasts(spark, sf_dir):
    plan = (
        transforms.static_mapping(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_q18(spark, sf_dir, duck):
    assert_matches_oracle(transforms.q18_big_orders(spark, sf_dir), duck, transforms.q18_oracle())


def test_q22(spark, sf_dir, duck):
    assert_matches_oracle(
        transforms.q22_inactive_customers(spark, sf_dir), duck, transforms.q22_oracle()
    )


def test_q22_uses_anti_join(spark, sf_dir):
    plan = (
        transforms.q22_inactive_customers(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan, plan
