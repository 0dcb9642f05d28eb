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


def test_multigrain_stats_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.multigrain_stats(spark, sf_dir),
        duck,
        analytics.multigrain_stats_oracle(),
    )


def test_gapfill_locf_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.gapfill_locf(spark, sf_dir),
        duck,
        analytics.gapfill_locf_oracle(),
    )


def test_gapfill_locf_dense_spine(spark, sf_dir):
    from pyspark.sql import functions as F

    df = analytics.gapfill_locf(spark, sf_dir).cache()
    # Every event_type covers the same dense hourly spine: |types| x hours.
    per_type = df.groupBy("event_type").count().collect()
    assert len({r["count"] for r in per_type}) == 1
    # Gap rows carry forward a value whenever any prior hour was observed,
    # and never invent events.
    gaps = df.filter(F.col("is_gap"))
    assert gaps.filter(F.col("n_events") != 0).count() == 0


def test_multigrain_grains_reconcile(spark, sf_dir):
    from pyspark.sql import functions as F

    df = analytics.multigrain_stats(spark, sf_dir).cache()
    # gid bits: grouping(r)*4 + grouping(n)*2 + grouping(p);
    # () -> 7 (global), (r_name) -> 3 (region grain)
    assert {r["gid"] for r in df.select("gid").distinct().collect()} == {0, 1, 2, 3, 6, 7}
    total = df.filter(F.col("gid") == 7).collect()
    per_region = df.filter(F.col("gid") == 3)
    assert len(total) == 1
    assert (
        per_region.agg(F.sum("n_orders")).collect()[0][0] == total[0]["n_orders"]
    )


def test_zscore_outliers_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.zscore_outliers(spark, sf_dir),
        duck,
        analytics.zscore_outliers_oracle(),
    )


def test_zscore_outliers_are_tail(spark, sf_dir):
    """Outliers sit strictly outside the per-type 3-sigma band, and removing
    them shrinks each type's spread."""
    from pyspark.sql import functions as F

    out = analytics.zscore_outliers(spark, sf_dir).cache()
    assert out.count() > 0
    assert out.filter(F.abs("zscore") < 3.0).count() == 0


def test_retention_cohorts_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.retention_cohorts(spark, sf_dir),
        duck,
        analytics.retention_cohorts_oracle(),
    )


def test_retention_cohorts_triangle(spark, sf_dir):
    """Week 0 retains every cohort member; later weeks never exceed the
    cohort size."""
    from pyspark.sql import functions as F

    df = analytics.retention_cohorts(spark, sf_dir).cache()
    wk0 = df.filter(F.col("weeks_since") == 0)
    assert wk0.count() > 0
    assert wk0.filter(F.col("active_users") != F.col("cohort_users")).count() == 0
    assert df.filter(F.col("active_users") > F.col("cohort_users")).count() == 0


def test_linear_trend_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.linear_trend(spark, sf_dir),
        duck,
        analytics.linear_trend_oracle(),
    )


def test_linear_trend_matches_numpy(spark, sf_dir):
    """Closed-form slopes agree with numpy's lstsq on the same (truncated)
    inputs — the estimator is real OLS, not merely self-consistent."""
    import numpy as np
    from pyspark.sql import functions as F

    from etl_schema_spark.sources.catalog import load_table

    got = {r["event_type"]: r for r in analytics.linear_trend(spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.floor(F.col("ts").cast("long") / 86400).alias("x"),
            (F.floor(F.col("value") * 1e6) / 1e6).alias("y"),
        )
        .collect()
    )
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append((r["x"], r["y"]))
    for etype, pts in by_type.items():
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(got[etype]["slope_per_day"] - slope) < 1e-4, etype
        assert abs(got[etype]["intercept"] - intercept) < 1e-2, etype


def test_seasonal_baseline_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.seasonal_baseline(spark, sf_dir),
        duck,
        analytics.seasonal_baseline_oracle(),
    )


def test_seasonal_baseline_ratio_centers_on_one(spark, sf_dir):
    """Expected sums are built from the global per-hod means, so across all
    days the actual/expected ratio must average near 1."""
    rows = analytics.seasonal_baseline(spark, sf_dir).collect()
    assert rows
    mean_ratio = sum(r["seasonal_ratio"] for r in rows) / len(rows)
    assert 0.8 < mean_ratio < 1.2
    for r in rows:
        assert r["expected_sum"] > 0


def test_mad_outliers_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.mad_outliers(spark, sf_dir), duck, analytics.mad_outliers_oracle()
    )


def test_mad_outliers_median_is_order_statistic(spark, sf_dir):
    """The reported median must be an actual data value of its group
    (lower median — no interpolation), and MAD-flagged counts must match
    a driver-side recomputation."""
    from etl_schema_spark.sources.catalog import load_table

    rows = {r.event_type: r for r in analytics.mad_outliers(spark, sf_dir).collect()}
    data = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    )
    by_type = {}
    for r in data:
        by_type.setdefault(r.event_type, []).append(r.value)
    for t, vals in by_type.items():
        vals.sort()
        med = vals[(len(vals) + 1) // 2 - 1]
        import math

        assert math.floor(med * 1e6) / 1e6 == rows[t].median
        devs = sorted(abs(v - med) for v in vals)
        mad = devs[(len(devs) + 1) // 2 - 1]
        n_out = sum(1 for v in vals if abs(v - med) > analytics.MAD_SIGMA * mad)
        assert n_out == rows[t].n_outliers


def test_tail_latency_percentiles_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.tail_latency_percentiles(spark, sf_dir),
        duck,
        analytics.tail_latency_percentiles_oracle(),
    )


def test_tail_percentiles_are_order_statistics(spark, sf_dir):
    """Each reported value is the exact nearest-rank element of its group."""
    import math

    from etl_schema_spark.sources.catalog import load_table

    rows = analytics.tail_latency_percentiles(spark, sf_dir).collect()
    data = {}
    for r in load_table(spark, sf_dir, "events").select("event_type", "value").collect():
        data.setdefault(r.event_type, []).append(r.value)
    for r in rows:
        vals = sorted(data[r.event_type])
        want = vals[math.ceil(r.pct / 100 * len(vals)) - 1]
        assert math.floor(want * 1e6) / 1e6 == r.value_at_pct, (r.event_type, r.pct)


def test_user_activity_gini_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.user_activity_gini(spark, sf_dir),
        duck,
        analytics.user_activity_gini_oracle(),
    )


def test_gini_bounds_and_uniform_case(spark, sf_dir):
    r = analytics.user_activity_gini(spark, sf_dir).collect()[0]
    assert 0.0 <= r.gini < 1.0


def test_new_vs_returning_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.new_vs_returning(spark, sf_dir),
        duck,
        analytics.new_vs_returning_oracle(),
    )


def test_new_vs_returning_invariants(spark, sf_dir):
    """cum_users is a monotone running sum of n_new; day-1 has no
    returning users; total new across days == distinct users."""
    rows = analytics.new_vs_returning(spark, sf_dir).collect()
    assert rows[0].n_returning == 0
    running = 0
    for r in rows:
        running += r.n_new
        assert r.cum_users == running
    from etl_schema_spark.sources.catalog import load_table

    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert running == n_users


def test_windowed_funnel_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.windowed_funnel(spark, sf_dir),
        duck,
        analytics.windowed_funnel_oracle(),
    )


def test_windowed_funnel_bounded_by_unbounded(spark, sf_dir):
    """The 24h-window funnel can never convert MORE users than the
    unbounded funnel_conversion at each stage, and levels partition the
    active-user set."""
    lv = {r.level: r.n_users for r in analytics.windowed_funnel(spark, sf_dir).collect()}
    fc = analytics.funnel_conversion(spark, sf_dir).collect()[0]
    assert sum(lv.values()) > 0
    assert lv.get(3, 0) <= fc.n_purchase_after_click
    assert lv.get(2, 0) + lv.get(3, 0) <= fc.n_click_after_view
    assert lv.get(1, 0) + lv.get(2, 0) + lv.get(3, 0) == fc.n_view


def test_daily_modal_event_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.daily_modal_event(spark, sf_dir),
        duck,
        analytics.daily_modal_event_oracle(),
    )


def test_daily_modal_event_partitions_users(spark, sf_dir):
    """Each (user, day) contributes to exactly one modal row, so per-day
    user counts sum to the day's active-user count."""
    from pyspark.sql import functions as F

    from etl_schema_spark.sources.catalog import load_table

    modal = {
        r.day: r.total
        for r in analytics.daily_modal_event(spark, sf_dir)
        .groupBy("day")
        .agg(F.sum("n_users").alias("total"))
        .collect()
    }
    active = {
        r.day: r.total
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("total"))
        .collect()
    }
    assert modal == active


def test_gapfill_interp_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.gapfill_interp(spark, sf_dir),
        duck,
        analytics.gapfill_interp_oracle(),
    )


def test_gapfill_interp_between_neighbors(spark, sf_dir):
    """Interpolated fills lie within [min, max] of the surrounding
    observed values, and observed hours pass through untouched; spine
    shape matches gapfill_locf exactly."""
    interp = analytics.gapfill_interp(spark, sf_dir).collect()
    locf = {(r.event_type, r.hour): r for r in analytics.gapfill_locf(spark, sf_dir).collect()}
    assert len(interp) == len(locf)
    by_series = {}
    for r in interp:
        by_series.setdefault(r.event_type, []).append(r)
    for rows in by_series.values():
        rows.sort(key=lambda r: r.hour)
        obs = [(i, r.value_interp) for i, r in enumerate(rows) if not r.is_gap]
        for i, r in enumerate(rows):
            if r.is_gap and r.value_interp is not None:
                prev = max((v for j, v in obs if j < i), default=None)
                lo_hi = [v for j, v in obs if abs(j - i) >= 0]
                before = [v for j, v in obs if j < i]
                after = [v for j, v in obs if j > i]
                assert before and after  # no extrapolation by contract
                lo = min(max(before, default=None), min(after))
                hi = max(max(before), min(after))
                # the fill sits on the segment between its two neighbors
                nb = before[-1]
                na = after[0]
                assert min(nb, na) - 1e-9 <= r.value_interp <= max(nb, na) + 1e-9


def test_scd2_history_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.scd2_history(spark, sf_dir), duck, analytics.scd2_history_oracle()
    )


def test_scd2_history_tiles_timeline(spark, sf_dir):
    """Versions tile each user's timeline: valid_to of version v equals
    valid_from of v+1, exactly one current row per user, consecutive
    versions change type, and event counts reconcile."""
    from etl_schema_spark.sources.catalog import load_table

    rows = analytics.scd2_history(spark, sf_dir).collect()
    total = sum(r.n_events for r in rows)
    assert total == load_table(spark, sf_dir, "events").count()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.version)
        assert [r.version for r in rs] == list(range(1, len(rs) + 1))
        assert sum(1 for r in rs if r.is_current) == 1
        for prev, cur in zip(rs, rs[1:]):
            assert prev.valid_to == cur.valid_from
            assert prev.event_type != cur.event_type


def test_rfm_features_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.rfm_features(spark, sf_dir), duck, analytics.rfm_features_oracle()
    )


def test_rfm_features_sanity(spark, sf_dir):
    """One row per user; the most recent user corpus-wide has recency 0;
    gaps only exist for repeat users."""
    rows = analytics.rfm_features(spark, sf_dir).collect()
    assert min(r.recency_days for r in rows) == 0
    for r in rows:
        assert r.frequency >= 1
        assert r.tenure_days >= 0
        if r.frequency == 1:
            assert r.mean_gap_micros is None


def test_late_arrival_audit_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        analytics.late_arrival_audit(spark, sf_dir),
        duck,
        analytics.late_arrival_audit_oracle(),
    )


def test_late_arrival_audit_bounds(spark, sf_dir):
    """Backward steps are bounded by adjacent pairs; a max jump exists
    iff some step went backward; single-event users report clean."""
    for r in analytics.late_arrival_audit(spark, sf_dir).collect():
        assert 0 <= r.n_backward <= max(r.n_events - 1, 0)
        assert (r.max_backward_micros > 0) == (r.n_backward > 0)
        assert 0 <= r.backward_ppm <= 1_000_000
