"""As-of (point-in-time) join — the classic custom operator Spark's built-in
join strategies don't provide as a primitive.

For each left-side event, attach the most recent right-side event at or
before it (per key). The naive formulation is a range join (left ⋈ right on
key AND r.ts <= l.ts, then max-per-left) — O(n·m) pairs per key before the
reduction. The Spark-first formulation used here is union + tag + running
`last(..., ignoreNulls)` window: ONE shuffle on the key, O(n+m) rows total,
no intermediate pair explosion — this is the plan that survives 100 TB with
a hot key, because a key's cost is its own row count, not clicks×purchases.

Tie semantics: a right row at exactly l.ts counts (at-or-before) — ties sort
right-before-left inside the window frame, matching DuckDB's ASOF JOIN
(`ON l.ts >= r.ts`), which the oracle uses natively.

Parity: views/website/entry07_* attribute each test to prior client state
the same way (latest-before-measurement); the reference leans on BigQuery
windows for it (entry07_platform_decile_2.sql's ROW_NUMBER pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: str = "r_ts",
) -> DataFrame:
    """Generic as-of join core: every `left` row gains `payload` = the
    greatest `right_ts` <= its own timestamp within the same `on` key
    (NULL when no prior right row exists).

    Union + running-last window: one hash shuffle on `on`, linear state.
    """
    l_tag = left.select(
        F.col(on), F.col(left_ts).alias("_ts"), F.lit(1).alias("_tag"), F.struct("*").alias("_row")
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row"),
    ).withColumn("_r_ts", F.col("_ts"))
    unioned = l_tag.withColumn("_r_ts", F.lit(None).cast(r_tag.schema["_r_ts"].dataType)).unionByName(
        r_tag
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn(payload, F.last("_r_ts", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
        .select(F.col("_row.*"), F.col(payload))
    )


def asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution: each purchase event joined to the user's most recent
    click at or before it, with the gap in seconds (NULL = organic)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, on="user_id", payload="click_ts")
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "click_ts",
        (F.col("ts").cast("long") - F.col("click_ts").cast("long")).alias("gap_seconds"),
    ).orderBy("event_id")


def asof_attribution_oracle() -> str:
    return """
        SELECT p.event_id,
               p.user_id,
               p.ts,
               c.ts AS click_ts,
               CAST(FLOOR(epoch(p.ts)) AS BIGINT) - CAST(FLOOR(epoch(c.ts)) AS BIGINT) AS gap_seconds
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
    """


def asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of variant (pandas ``merge_asof
    direction='nearest'``): each purchase attaches the click closest in
    time in EITHER direction — the backward match at-or-before, the
    forward match strictly after, whichever gap is smaller (ties ->
    backward). NULL only when the user never clicked.

    Same union + tag single-shuffle shape as :func:`asof_join` — one hash
    exchange on user_id carries both directions: a running
    ``last(ignoreNulls)`` looks back, a ``first(ignoreNulls)`` over the
    following frame looks forward. O(n+m) state per key, no pair
    explosion, so a hot user costs its own row count at 100 TB.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.unix_micros("ts").alias("_click_us"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("_ts"),
        F.lit(1).alias("_tag"),
        "event_id",
        F.lit(None).cast("bigint").alias("_click_us"),
    )
    # clicks sort before purchases at equal ts => a same-ts click is the
    # backward match with gap 0, matching asof_attribution's at-or-before
    w = Window.partitionBy("user_id").orderBy("_ts", "_tag")
    back = F.last("_click_us", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = F.first("_click_us", ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    marked = (
        clicks.unionByName(purchases)
        .withColumn("_back_us", back)
        .withColumn("_fwd_us", fwd)
        .filter(F.col("_tag") == 1)
    )
    p_us = F.unix_micros("_ts")
    use_back = F.col("_back_us").isNotNull() & (
        F.col("_fwd_us").isNull()
        | ((p_us - F.col("_back_us")) <= (F.col("_fwd_us") - p_us))
    )
    nearest_us = (
        F.when(use_back, F.col("_back_us"))
        .when(F.col("_fwd_us").isNotNull(), F.col("_fwd_us"))
        .otherwise(F.lit(None).cast("bigint"))
    )
    return (
        marked.select(
            "event_id",
            "user_id",
            F.col("_ts").alias("ts"),
            F.timestamp_micros(nearest_us).alias("nearest_click_ts"),
            (p_us - nearest_us).cast("bigint").alias("gap_micros"),
            F.when(nearest_us.isNull(), F.lit(None).cast("string"))
            .when(use_back, F.lit("backward"))
            .otherwise(F.lit("forward"))
            .alias("direction"),
        )
        .orderBy("event_id")
    )


def asof_nearest_oracle() -> str:
    return """
        WITH tagged AS (
          SELECT user_id, ts AS _ts, 0 AS _tag,
                 CAST(NULL AS BIGINT) AS event_id,
                 epoch_us(ts) AS _click_us
          FROM events WHERE event_type = 'click'
          UNION ALL
          SELECT user_id, ts AS _ts, 1 AS _tag, event_id,
                 CAST(NULL AS BIGINT) AS _click_us
          FROM events WHERE event_type = 'purchase'
        ),
        marked AS (
          SELECT *,
                 LAST_VALUE(_click_us IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY _ts, _tag
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _back_us,
                 FIRST_VALUE(_click_us IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY _ts, _tag
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS _fwd_us
          FROM tagged
        )
        SELECT event_id, user_id, _ts AS ts,
               make_timestamp(CASE
                 WHEN _back_us IS NOT NULL AND (_fwd_us IS NULL
                      OR epoch_us(_ts) - _back_us <= _fwd_us - epoch_us(_ts))
                 THEN _back_us ELSE _fwd_us END) AS nearest_click_ts,
               CAST(epoch_us(_ts) - (CASE
                 WHEN _back_us IS NOT NULL AND (_fwd_us IS NULL
                      OR epoch_us(_ts) - _back_us <= _fwd_us - epoch_us(_ts))
                 THEN _back_us ELSE _fwd_us END) AS BIGINT) AS gap_micros,
               CASE
                 WHEN _back_us IS NULL AND _fwd_us IS NULL THEN NULL
                 WHEN _back_us IS NOT NULL AND (_fwd_us IS NULL
                      OR epoch_us(_ts) - _back_us <= _fwd_us - epoch_us(_ts))
                 THEN 'backward' ELSE 'forward'
               END AS direction
        FROM marked WHERE _tag = 1
        ORDER BY event_id
    """
