"""Generated view families: tiered validity chain, trailing window,
templated joined view (parity: schema/views_standardsql/ + make_views.sh,
views/wehe/scamper1_hopannotation2.sql, autoload_v2_ndt templates)."""

from etl_schema_spark.operators import view_families as vf

from .conftest import assert_matches_oracle


def test_tiered_views_oracle(spark, sf_dir, duck):
    assert_matches_oracle(vf.tiered_views(spark, sf_dir), duck, vf.tiered_views_oracle())


def test_tiered_views_monotone_and_catalog_equivalent(spark, sf_dir):
    """Tiers must shrink monotonically down the chain, and the single-pass
    conditional aggregate must agree with materializing the generated
    catalog DAG and counting each view."""
    rows = {r["tier"]: r["n_rows"] for r in vf.tiered_views(spark, sf_dir).collect()}
    assert rows["exhaustive"] >= rows["all"] >= rows["sensible"]
    assert rows["sensible"] >= rows["downloads"]
    assert rows["sensible"] >= rows["uploads"]
    via_catalog = vf.tier_counts_via_catalog(spark, sf_dir)
    assert via_catalog == rows


def test_tier_catalog_dependency_order(spark):
    cat = vf.tier_catalog()
    order = cat.dependency_order()
    # parents strictly precede children
    idx = {n: i for i, n in enumerate(order)}
    assert idx["etl.common_events"] < idx["rc.ndt_exhaustive"]
    assert idx["rc.ndt_exhaustive"] < idx["rc.ndt_all"]
    assert idx["rc.ndt_all"] < idx["rc.ndt_sensible"]
    assert idx["rc.ndt_sensible"] < idx["rc.ndt_downloads"]
    assert idx["rc.ndt_sensible"] < idx["rc.ndt_uploads"]


def test_trailing_window_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        vf.trailing_window_view(spark, sf_dir), duck, vf.trailing_window_view_oracle()
    )


def test_trailing_window_bounds(spark, sf_dir):
    rows = vf.trailing_window_view(spark, sf_dir).collect()
    assert rows, "window must overlap the testdata date range"
    days = {r["partition_date"].isoformat() for r in rows}
    assert max(days) <= "2024-01-24" and min(days) >= "2024-01-17"
    assert len(days) <= vf.WINDOW_DAYS


def test_joined_view_template_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        vf.joined_view_template(spark, sf_dir), duck, vf.joined_view_template_oracle()
    )


def test_joined_view_annotations_present(spark, sf_dir):
    out = vf.joined_view_template(spark, sf_dir)
    # every event's user exists in the annotation dim, so LEFT JOIN misses 0
    assert out.filter(out.client_name.isNull()).count() == 0


def test_autojoin_tiered_counts_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        vf.autojoin_tiered_counts(spark, sf_dir),
        duck,
        vf.autojoin_tiered_counts_oracle(),
    )


def test_autojoin_catalog_composes_tier_dag(spark, sf_dir):
    """The composed catalog resolves joined views THROUGH the tier DAG:
    every tier's joined view depends on its rc tier view, which chains up
    to etl.common_events; counts agree with the single-pass tiered_views."""
    cat = vf.autojoin_catalog()
    order = cat.dependency_order()
    for tier in ["exhaustive", "all", "sensible", "downloads", "uploads"]:
        joined = f"autojoin.ndt7_{tier}_joined"
        assert order.index(f"rc.ndt_{tier}") < order.index(joined)
        assert order.index(joined) < order.index("autojoin.summary")
    assert order.index("etl.common_events") < order.index("rc.ndt_exhaustive")

    summary = {
        r["tier"]: r["n_rows"]
        for r in vf.autojoin_tiered_counts(spark, sf_dir).collect()
    }
    single_pass = {
        r["tier"]: r["n_rows"] for r in vf.tiered_views(spark, sf_dir).collect()
    }
    assert summary == single_pass
