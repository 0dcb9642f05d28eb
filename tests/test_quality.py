"""Data-quality expectation suite (etl_schema_spark.quality): the
single-pass constraint framework a scheduled ingest gates its publish
on. Semantics tests on constructed frames + the standing PK contract
over every testdata table."""

import pytest

from etl_schema_spark.quality import Check, table_contract
from etl_schema_spark.sources.catalog import TABLES


def _report_dict(report):
    return {r.name: r for r in report.results}


def test_row_rules_one_pass_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "view", "u1"),
            (2, None, "click", "u2"),
            (3, -5.0, "zap", None),
            (4, float("nan"), "view", "u3"),
            (5, 1e15, "view", "u4"),
        ],
        "id long, value double, event_type string, user_id string",
    )
    rep = (
        Check("t")
        .not_null("value", "user_id")
        .in_range("value", -10.0, 100.0, allow_null=True)
        .non_negative("value")
        .accepted_values("event_type", ["view", "click"])
        .matches_regex("user_id", r"^u\d+$")
        .satisfies("id_small", df["id"] <= 4)
        .run(df)
    )
    r = _report_dict(rep)
    assert r["not_null(value)"].violations == 1
    assert r["not_null(user_id)"].violations == 1
    # NaN and 1e15 are out of range; NULL allowed
    assert r["in_range(value)"].violations == 2
    assert r["non_negative(value)"].violations == 1  # only -5.0 (NaN<0 false)
    assert r["accepted_values(event_type)"].violations == 1  # 'zap'
    assert r["matches_regex(user_id)"].violations == 0  # NULL outside domain
    assert r["id_small"].violations == 1
    assert all(res.checked == 5 for res in rep.results)
    assert not rep.passed and len(rep.failures()) == 6


def test_unique_and_foreign_key(spark):
    child = spark.createDataFrame(
        [(1, 100), (2, 100), (2, 200), (3, None), (4, 999)],
        "id long, ref long",
    )
    parent = spark.createDataFrame([(100,), (200,)], "pid long")
    rep = (
        Check("child")
        .unique("id")
        .unique("id", "ref")
        .foreign_key("ref", parent, "pid")
        .run(child)
    )
    r = _report_dict(rep)
    # id=2 appears twice -> 1 extra row beyond one-per-key
    assert r["unique(id)"].violations == 1
    assert r["unique(id,ref)"].violations == 0
    # ref=999 orphaned; NULL ref outside the checked domain
    assert r["foreign_key(ref)"].violations == 1
    assert not rep.passed


def test_satisfies_null_predicate_is_violation(spark):
    """An undecidable row (NULL predicate) must not silently pass a
    gate — the same degrade-visibly posture as the value contracts."""
    df = spark.createDataFrame([(1, 5.0), (2, None)], "id long, v double")
    from pyspark.sql import functions as F

    rep = Check("t").satisfies("v_positive", F.col("v") > 0).run(df)
    assert rep.results[0].violations == 1  # the NULL-v row


def test_empty_frame_passes(spark):
    df = spark.createDataFrame([], "id long, v double")
    rep = Check("t").not_null("id").unique("id").in_range("v", 0, 1).run(df)
    assert rep.passed
    assert all(r.checked == 0 for r in rep.results)


@pytest.mark.parametrize("name", sorted(TABLES))
def test_testdata_pk_contract(spark, sf_dir, name):
    """The wave-9 ingest precondition, CHECKED rather than assumed: every
    keyed testdata table satisfies non-null + unique primary keys.
    lineitem is declared PK-less (the suite's own first real find: the
    generator draws l_linenumber randomly — 1401 duplicate
    (l_orderkey, l_linenumber) pairs at sf0.001, and no column
    combination is unique) — its contract is the empty report."""
    rep = table_contract(spark, sf_dir, name)
    assert rep.passed, rep.as_rows()
    if name == "lineitem":
        assert rep.results == []


def test_pkless_table_refuses_unique_restore(spark, sf_dir):
    """load_table_unique must REFUSE a PK-less fact rather than dedupe on
    a fictitious key (silently dropping real line items)."""
    from etl_schema_spark.sources.catalog import load_table_unique, unique_scan_sql

    with pytest.raises(ValueError, match="no primary key"):
        load_table_unique(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="no primary key"):
        unique_scan_sql("lineitem")


def test_star_schema_referential_integrity(spark, sf_dir):
    """The TPC-H-ish star relations hold: orders.o_custkey -> customer,
    lineitem.(l_orderkey) -> orders, nation.n_regionkey -> region."""
    from etl_schema_spark.sources.catalog import load_table

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    lineitem = load_table(spark, sf_dir, "lineitem")
    assert Check("orders").foreign_key("o_custkey", cust, "c_custkey").run(orders).passed
    assert (
        Check("lineitem").foreign_key("l_orderkey", orders, "o_orderkey").run(lineitem).passed
    )
    assert Check("nation").foreign_key("n_regionkey", region, "r_regionkey").run(nation).passed


def test_single_pass_plan_shape(spark, sf_dir):
    """All row-level rules must compile into ONE aggregate over one scan:
    the suite's agg frame shows a single events scan however many rules
    ride it."""
    from etl_schema_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, "events")
    chk = (
        Check("events")
        .not_null("event_id", "ts", "user_id", "event_type")
        .non_negative("user_id")
        .accepted_values("event_type", ["view", "click", "purchase", "error", "login"])
    )
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(v, 1).otherwise(0)).alias(f"__v{i}")
        for i, (_, _, v) in enumerate(chk._row_rules)
    ]
    plan = df.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
