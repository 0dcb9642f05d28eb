"""Range (interval) join — the second classic custom operator Spark lacks
as a primitive (the first being the as-of join, `asof.py`).

Semantics: each *interval* row [lo, hi] on the left collects the *point*
rows whose timestamp falls inside it, per key. The naive plan is a non-equi
theta join — Spark falls back to BroadcastNestedLoopJoin (O(n·m) per key)
or, with an equi key, to a hash join whose residual range predicate still
materializes every same-key pair before filtering. Neither survives a hot
key at 100 TB.

The Spark-first formulation here is *bucketing on the time axis*: pick a
bucket width equal to the maximum interval width, so every interval spans
at most 2 buckets and every point exactly 1. Explode each interval into its
(≤2) covered buckets, equi-join on (key, bucket) — a plain hash join
Catalyst can shuffle or broadcast — and apply the range predicate as a
residual. Each (interval, point) pair meets in exactly one bucket, so no
dedup pass is needed. Cost: O(n + m) rows shuffled, 2× interval-side
fan-out, zero pair explosion. This is the bin/bucket strategy range-join
optimizers (e.g. the Databricks range-join hint, DuckDB's IEJoin) pick for
the same reason, expressed with vanilla DataFrame ops.

Parity: views/website/entry07_* attribute measurements to surrounding
client activity windows; the reference leans on BigQuery's range support.
The oracle is the plain declarative non-equi join (DuckDB plans it as
IEJoin), so correctness is checked against the textbook semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    on: str,
    lo: str = "lo",
    hi: str = "hi",
    point_ts: str = "ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Generic range-join core: inner-join `points` into `intervals` where
    `lo < point_ts <= hi` within the same `on` key.

    `bucket_seconds` must be >= the maximum interval width (hi - lo); with
    that invariant each interval covers at most 2 buckets, each point 1,
    and every qualifying pair meets in exactly one bucket — the join is a
    plain equi hash join on (key, bucket) plus a residual filter.
    Output: every `intervals` column + every `points` column (caller
    disambiguates names).
    """
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(F.col(lo).cast("long") / bucket_seconds),
                    F.floor(F.col(hi).cast("long") / bucket_seconds),
                )
            )
        ),
    )
    pt = points.withColumn(
        "_bucket", F.floor(F.col(point_ts).cast("long") / bucket_seconds)
    )
    return (
        iv.join(pt, ["_bucket", on] if on else ["_bucket"], "inner")
        .filter((F.col(point_ts) > F.col(lo)) & (F.col(point_ts) <= F.col(hi)))
        .drop("_bucket")
    )


def range_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window attribution via range join: for each purchase, the
    clicks by the same user in the hour before it — count, and seconds
    since the latest such click (NULL = no click in window).

    Complements `asof_attribution` (latest click at any distance): here the
    window is bounded, so a purchase can have zero qualifying clicks and
    the per-pair state is the interval's own fan-in, not history size.
    Left-join semantics recovered by aggregating the inner range join and
    right-joining back onto the purchase set (no pair row for empty
    windows — the aggregate, not the join, carries the zero).

    Ingest precondition: PK-unique event_id scan — a replayed purchase
    row duplicates its window aggregate nondeterministically across
    engines. Front door: the exactly-once restore
    (catalog.load_table_unique); observable via
    quality_expectation_report's unique rules (SURVEY §7 item 23).
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("lo"),
        F.col("ts").alias("hi"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    pairs = interval_point_join(
        purchases, clicks, on="user_id", point_ts="click_ts", bucket_seconds=3600
    )
    per_purchase = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_clicks_1h"),
        F.max("click_ts").alias("last_click_ts"),
    )
    return purchases.join(per_purchase, "event_id", "left").select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce("n_clicks_1h", F.lit(0)).cast("bigint").alias("n_clicks_1h"),
        (F.col("ts").cast("long") - F.col("last_click_ts").cast("long"))
        .cast("bigint")
        .alias("last_click_gap_s"),
    )


def range_interval_join_oracle() -> str:
    return """
        SELECT p.event_id,
               p.user_id,
               p.ts,
               CAST(COUNT(c.ts) AS BIGINT) AS n_clicks_1h,
               CAST(FLOOR(epoch(p.ts)) AS BIGINT)
                 - CAST(FLOOR(epoch(MAX(c.ts))) AS BIGINT) AS last_click_gap_s
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.ts > p.ts - INTERVAL 1 HOUR
         AND c.ts <= p.ts
        GROUP BY p.event_id, p.user_id, p.ts
    """
