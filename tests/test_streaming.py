"""Structured Streaming twins validated against their batch operators
(SURVEY §2D)."""

from pyspark.sql import functions as F

from etl_schema_spark import streaming
from etl_schema_spark.operators import sessions
from etl_schema_spark.sources.catalog import load_table


def test_hourly_counts_stream_matches_batch(spark, sf_dir):
    out = streaming.run_available_now(
        streaming.hourly_counts_stream(spark, sf_dir), "t_hourly"
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r.hour, r.event_type): r.n for r in out.collect()}
    want = {(r.hour, r.event_type): r.n for r in batch.collect()}
    assert got == want


def test_session_window_stream_matches_batch(spark, sf_dir):
    out = streaming.run_available_now(
        streaming.session_window_stream(spark, sf_dir), "t_sessions"
    )
    batch = sessions.sessionized_events(spark, sf_dir)
    got = {(r.user_id, r.session_start): r.n_events for r in out.collect()}
    want = {(r.user_id, r.session_start): r.n_events for r in batch.collect()}
    assert got == want
