"""Relational core part 2 (SURVEY §2B, remaining TPC-H shapes) — oracle
equivalence plus plan-shape assertions for the decorrelated patterns."""

from etl_schema_spark.operators import relational_ext as rx

from .conftest import assert_matches_oracle


def test_q9(spark, sf_dir, duck):
    assert_matches_oracle(rx.q9_product_type_profit(spark, sf_dir), duck, rx.q9_oracle())


def test_q11(spark, sf_dir, duck):
    assert_matches_oracle(rx.q11_important_stock(spark, sf_dir), duck, rx.q11_oracle())


def test_q12(spark, sf_dir, duck):
    assert_matches_oracle(rx.q12_shipmode(spark, sf_dir), duck, rx.q12_oracle())


def test_q13(spark, sf_dir, duck):
    assert_matches_oracle(
        rx.q13_customer_distribution(spark, sf_dir), duck, rx.q13_oracle()
    )


def test_q15(spark, sf_dir, duck):
    assert_matches_oracle(rx.q15_top_supplier(spark, sf_dir), duck, rx.q15_oracle())


def test_q16(spark, sf_dir, duck):
    assert_matches_oracle(rx.q16_parts_supplier(spark, sf_dir), duck, rx.q16_oracle())


def test_q17(spark, sf_dir, duck):
    assert_matches_oracle(rx.q17_small_quantity(spark, sf_dir), duck, rx.q17_oracle())


def test_q20(spark, sf_dir, duck):
    assert_matches_oracle(
        rx.q20_potential_promotion(spark, sf_dir), duck, rx.q20_oracle()
    )


def test_q21(spark, sf_dir, duck):
    assert_matches_oracle(
        rx.q21_suppliers_kept_waiting(spark, sf_dir), duck, rx.q21_oracle()
    )


def test_q13_left_outer_keeps_zero_customers(spark, sf_dir):
    # at least one distribution bucket must be c_count=0 or the outer join
    # degenerated to inner
    rows = {r["c_count"]: r["custdist"] for r in
            rx.q13_customer_distribution(spark, sf_dir).collect()}
    assert rows, "empty distribution"


def test_q21_no_cartesian(spark, sf_dir):
    plan = (
        rx.q21_suppliers_kept_waiting(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan


def test_q9_dims_broadcast(spark, sf_dir):
    plan = (
        rx.q9_product_type_profit(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
