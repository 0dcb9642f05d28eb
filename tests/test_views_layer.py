"""View-layer engine tests (SURVEY §2A).

Mirrors the reference's test strategy (SURVEY §5): every view layer is
checked against its ANSI-SQL oracle, plus plan-shape assertions so the
Spark plans stay scale-worthy (pushdown reaches the scan, no shuffles in
pure projections).
"""

from etl_schema_spark.operators import views_layer

from .conftest import assert_matches_oracle


def test_raw_view(spark, sf_dir, duck):
    assert_matches_oracle(views_layer.raw_view(spark, sf_dir), duck, views_layer.raw_view_oracle())


def test_extended_view(spark, sf_dir, duck):
    assert_matches_oracle(
        views_layer.extended_view(spark, sf_dir), duck, views_layer.extended_view_oracle()
    )


def test_unified_view(spark, sf_dir, duck):
    assert_matches_oracle(
        views_layer.unified_view(spark, sf_dir), duck, views_layer.unified_view_oracle()
    )


def test_unified_view_filters_invalid(spark, sf_dir):
    df = views_layer.unified_view(spark, sf_dir)
    # no error events and no OAM users survive IsValidBest
    assert df.filter(df.event_type == "error").count() == 0
    assert df.filter(df.user_id.isin(*views_layer.OAM_USER_IDS)).count() == 0
    # direction split is exhaustive
    assert set(r.direction for r in df.select("direction").distinct().collect()) <= {
        "Download",
        "Upload",
    }


def test_view_layers_collapse_to_single_stage(spark, sf_dir):
    """The 3-layer view stack must not introduce a shuffle (parity with the
    reference where views are logical only — BigQuery inlines them)."""
    plan = views_layer.unified_view(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_annotate_renest(spark, sf_dir, duck):
    from etl_schema_spark.operators import views_layer

    assert_matches_oracle(
        views_layer.annotate_renest(spark, sf_dir), duck, views_layer.annotate_renest_oracle()
    )


def test_annotate_renest_map_path_equals_exploded_path(spark, sf_dir):
    """The zero-shuffle broadcast-map plan and the generic explode+join+
    re-group plan must produce identical renested fingerprints."""
    fast = views_layer.annotate_renest(spark, sf_dir).collect()
    generic = views_layer.annotate_renest_exploded(spark, sf_dir).collect()
    assert fast == generic


def test_annotate_renest_map_path_is_shuffle_free(spark, sf_dir):
    """The broadcast-map path must not exchange anything before the final
    presentation sort — the annotate+renest itself is map-side only."""
    plan = (
        views_layer.annotate_renest(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # allowed: cpu_parallel's round-robin split + orderBy's range exchange.
    # forbidden: any hashpartitioning exchange — that would mean the
    # annotate/renest itself regrouped (the explode+join plan's cost).
    assert "hashpartitioning" not in plan, plan
