"""Sessionization + stateful-window operators over `events` (SURVEY §2B).

Batch twins of the Structured Streaming jobs in
``etl_schema_spark.streaming`` — same semantics, so the streaming output can
be validated against these.

  sessionized_events   gap-based sessions (30-min inactivity), the batch
                       equivalent of a session window with watermarking.
  running_totals       per-user cumulative value over time.
  top_clients_per_type top-K users by exact total value within event_type.

Scale: all three shuffle once on user_id (or event_type); the windows are
per-user — high cardinality, naturally parallel. Session assignment is the
classic lag/cumsum formulation: no iterative driver loop, one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .contracts import PLAUSIBLE_TS_SQL, VDEC4_SQL, plausible_ts, vdec4

SESSION_GAP_MIN = 30
TOP_K_CLIENTS = 5


def sessionized_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign gap-based sessions and aggregate one row per session.

    Event-time admission (fuzz wave 13): a row without a plausible event
    time has no position in a session timeline — a NULL ts even sorts
    differently per engine (Spark ASC puts NULL first, DuckDB last) — so
    the operator's time domain is contracts.plausible_ts on both sides.
    """
    ev = load_table(spark, sf_dir, "events").filter(plausible_ts("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    with_flag = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0),
    )
    with_id = with_flag.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_id.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
                "duration_sec"
            ),
            # guarded decimal lift (contracts.py, fuzz wave 5): a corrupt
            # value leaves the session sum, not the session
            F.round(F.sum(vdec4("value")).cast("double"), 4).alias("total_value"),
        )
    )


def sessionized_events_oracle() -> str:
    # VDEC4_SQL mirrors the guarded total_value lift
    return f"""
        WITH flagged AS (
          SELECT *,
                 CASE WHEN FLOOR(epoch(ts)) - LAG(FLOOR(epoch(ts))) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id)
                          > {SESSION_GAP_MIN * 60}
                      OR LAG(FLOOR(epoch(ts))) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WHERE {PLAUSIBLE_TS_SQL}
        ),
        numbered AS (
          -- new_session DESC rides the cumsum order (r11): DuckDB sorts
          -- the flag pass and the cumsum pass INDEPENDENTLY, so two
          -- fully-tied replay copies can interleave differently between
          -- passes and flip a session boundary run-to-run; ordering the
          -- flagged copy first reproduces Spark's single-sort semantics
          SELECT *, CAST(SUM(new_session) OVER (
              PARTITION BY user_id ORDER BY ts, event_id, new_session DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
          FROM flagged
        )
        SELECT user_id, session_seq,
               COUNT(*) AS n_events,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               CAST(MAX(FLOOR(epoch(ts))) - MIN(FLOOR(epoch(ts))) AS BIGINT) AS duration_sec,
               ROUND(CAST(SUM({VDEC4_SQL}) AS DOUBLE), 4) AS total_value
        FROM numbered
        GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
    """


def running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user cumulative value ordered by time (exact decimal cumsum).

    The raw `value` passes through untouched (NaN/Inf render identically
    in both engines); only the cumulative sum goes through the guarded
    decimal lift — a corrupt row shows itself but cannot poison every
    subsequent running total (fuzz wave 5). Event-time admission (fuzz
    wave 13): a NULL ts has no position in the cumulative ordering (and
    the engines disagree on one — Spark ASC sorts NULL first, DuckDB
    last), so the time domain is contracts.plausible_ts on both sides.

    Replay determinism (r11, VERDICT r10 item 6): a CONFLICTING event_id
    replay (same key and ts, different payload) ties on both primary
    sort keys, which left the cumulative sequence through the tie
    partition-layout-dependent (run-to-run flaky in the r10 --wave9
    battery). The window order therefore extends to the FULL ROW in
    ascending NULLS-LAST order — the streaming_ingest_restore tie-break
    device, identical on both engines — so a violated PK-unique
    precondition now degrades to a DETERMINISTIC cumulative sequence
    instead of a flaky one. On a PK-unique scan the extra keys are inert
    ((ts, event_id) is already total). Front door for the replay class
    itself: the exactly-once restore (catalog.load_table_unique);
    observable via quality_expectation_report's unique rules (SURVEY §7
    item 23).
    """
    ev = load_table(spark, sf_dir, "events").filter(plausible_ts("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            "ts",
            "event_id",
            F.asc_nulls_last("event_type"),
            F.asc_nulls_last("value"),
            F.asc_nulls_last("props"),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.sum(vdec4("value")).over(w).cast("double").alias("cum_value"),
    )


def running_totals_oracle() -> str:
    return f"""
        SELECT event_id, user_id, ts, value,
               CAST(SUM({VDEC4_SQL}) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id,
                       event_type ASC NULLS LAST, value ASC NULLS LAST,
                       props ASC NULLS LAST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS cum_value
        FROM events
        WHERE {PLAUSIBLE_TS_SQL}
        ORDER BY user_id, ts, event_id
    """


def top_clients_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K users by exact total value within each event_type."""
    ev = load_table(spark, sf_dir, "events")
    totals = ev.groupBy("event_type", "user_id").agg(
        F.sum(vdec4("value")).alias("_total"),
        F.count(F.lit(1)).alias("n_events"),
    )
    # desc NULLS LAST in both engines: an all-corrupt user (guarded sum
    # -> NULL) ranks behind every measurable total, tie-broken by user_id
    w = Window.partitionBy("event_type").orderBy(F.desc("_total"), F.asc("user_id"))
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K_CLIENTS)
        .select(
            "event_type",
            "user_id",
            F.col("_total").cast("double").alias("total_value"),
            "n_events",
            "rank",
        )
        .orderBy("event_type", "rank")
    )


def top_clients_per_type_oracle() -> str:
    return f"""
        WITH totals AS (
          SELECT event_type, user_id,
                 SUM({VDEC4_SQL}) AS _total,
                 COUNT(*) AS n_events
          FROM events GROUP BY 1, 2
        ),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (
              PARTITION BY event_type ORDER BY _total DESC, user_id ASC) AS rank
          FROM totals
        )
        SELECT event_type, user_id, CAST(_total AS DOUBLE) AS total_value,
               n_events, rank
        FROM ranked WHERE rank <= {TOP_K_CLIENTS}
        ORDER BY event_type, rank
    """


TOP_PATHS = 20
PATH_MAX_EVENTS = 8


def session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K session journeys: the ordered event-type path of each session
    (first PATH_MAX_EVENTS events, '>'-joined), counted corpus-wide and
    ranked — the "what do users actually do" report over the sessionized
    stream.

    Plan: the same gap-sessionization window as sessionized_events, then
    one per-session sort_array(collect_list(struct)) — deterministic order
    without a second window — a narrow path projection, a partial-agg
    count by path, and a TakeOrdered top-K. Session arrays are bounded by
    the gap (no hot-group risk: a session is one user's burst, not a
    corpus-wide key).

    Event-time admission (fuzz wave 13): a NULL ts would shift every
    session boundary (Spark ASC sorts NULLs first, DuckDB last), so the
    operator's time domain is contracts.plausible_ts on both sides.
    """
    ev = load_table(spark, sf_dir, "events").filter(plausible_ts("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    with_id = (
        ev.withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0),
        )
        .withColumn(
            "session_seq",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    paths = (
        with_id.groupBy("user_id", "session_seq")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            F.array_join(
                F.slice(F.transform("evs", lambda e: e["event_type"]), 1, PATH_MAX_EVENTS),
                ">",
            ).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    # TakeOrdered top-K before ranking: distinct-path cardinality grows
    # with the corpus, so the global rank window runs over K rows, never
    # the full path table
    top = counts.orderBy(F.desc("n_sessions"), F.asc("path")).limit(TOP_PATHS)
    w_rank = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return top.withColumn("rank", F.row_number().over(w_rank).cast("bigint")).orderBy(
        "rank"
    )


def session_top_paths_oracle() -> str:
    return f"""
        WITH flagged AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN FLOOR(epoch(ts)) - LAG(FLOOR(epoch(ts))) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id)
                          > {SESSION_GAP_MIN * 60}
                      OR LAG(FLOOR(epoch(ts))) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WHERE {PLAUSIBLE_TS_SQL}
        ),
        numbered AS (
          -- new_session DESC: the two-pass tie-interleaving guard, see
          -- sessionized_events_oracle (observed flaky here in the r11
          -- --wave9 battery: a replayed pair flipped 'click>purchase'
          -- into 'click' + 'purchase' on the oracle side only)
          SELECT *, SUM(new_session) OVER (
              PARTITION BY user_id ORDER BY ts, event_id, new_session DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
          FROM flagged
        ),
        paths AS (
          SELECT array_to_string(
                   list_slice(list(event_type ORDER BY ts, event_id),
                              1, {PATH_MAX_EVENTS}), '>') AS path
          FROM numbered GROUP BY user_id, session_seq
        ),
        counts AS (
          SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
          FROM paths GROUP BY path
        )
        SELECT path, n_sessions,
               CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path ASC)
                    AS BIGINT) AS rank
        FROM counts
        QUALIFY rank <= {TOP_PATHS}
        ORDER BY rank
    """


INTERVAL_WIDTH_US = 300 * 1_000_000  # each event covers [ts, ts + 5 min)


def interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user union length of overlapping activity intervals: each event
    covers [ts, ts+5min); overlapping/adjacent covers merge, and the
    output is the merged-island count plus total covered time — the
    "actual active wall-clock" metric that naive per-event sums
    double-count (parity: the utilization views' busy-time semantics,
    views/utilization/switch.sql, without the fixed bucketing).

    Classic sweep, one shuffle: per user (high-cardinality key, naturally
    parallel) order by start; an island opens where start exceeds the
    running max of all previous ends; island id = running sum of opens;
    per-island min(start)/max(end) then per-user rollup. All integer
    microsecond arithmetic (unix_micros) — no float accumulation.

    Event-time admission (fuzz wave 13): a NULL ts sorts first in Spark
    and last in DuckDB, scrambling the sweep's island boundaries, so the
    interval domain is contracts.plausible_ts on both sides.
    """
    ev = load_table(spark, sf_dir, "events").filter(plausible_ts("ts")).select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + INTERVAL_WIDTH_US).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_end = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    opens = F.when(prev_max_end.isNull() | (F.col("s") > prev_max_end), 1).otherwise(0)
    islands = (
        ev.withColumn("open", opens)
        .withColumn(
            "island",
            F.sum("open").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "island")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("s").alias("start"),
            F.max("e").alias("end"),
        )
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.sum(F.col("end") - F.col("start")).cast("bigint").alias("covered_micros"),
        )
        .orderBy("user_id")
    )


def interval_coverage_oracle() -> str:
    return f"""
        WITH iv AS (
          SELECT user_id,
                 epoch_us(ts) AS s,
                 epoch_us(ts) + {INTERVAL_WIDTH_US} AS e
          FROM events
          WHERE {PLAUSIBLE_TS_SQL}
        ),
        marked AS (
          SELECT user_id, s, e,
                 CASE WHEN MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ) IS NULL
                      OR s > MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      )
                 THEN 1 ELSE 0 END AS open
          FROM iv
        ),
        islands AS (
          -- open DESC: the two-pass tie-interleaving guard (r11, see
          -- sessionized_events_oracle) for fully-tied replayed intervals
          SELECT user_id, s, e,
                 SUM(open) OVER (
                   PARTITION BY user_id ORDER BY s, e, open DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS island
          FROM marked
        ),
        agg AS (
          SELECT user_id, island, COUNT(*) AS n_events,
                 MIN(s) AS start, MAX(e) AS "end"
          FROM islands GROUP BY user_id, island
        )
        SELECT user_id,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM("end" - start) AS BIGINT) AS covered_micros
        FROM agg GROUP BY user_id
        ORDER BY user_id
    """


def concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval-overlap depth per user: with each event covering
    [ts, ts+5min) (the same half-open intervals as
    :func:`interval_coverage`), the maximum number of simultaneously open
    intervals and the first instant that depth is reached — the
    "max concurrent streams" metric of the utilization views
    (views/utilization/switch.sql's busy-depth semantics, unbucketed).

    Classic sweep line in ONE shuffle on user_id: union of (+1 at start,
    -1 at end) deltas, running sum ordered by (t, delta) — the delta
    tie-break processes closes before opens at the same instant, which is
    exactly half-open-interval semantics. Peak + first-peak-time come from
    windows over the same partition; integer microseconds throughout.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("s")
    )
    starts = ev.select("user_id", F.col("s").alias("t"), F.lit(1).alias("delta"))
    ends = ev.select(
        "user_id", (F.col("s") + INTERVAL_WIDTH_US).alias("t"), F.lit(-1).alias("delta")
    )
    w = Window.partitionBy("user_id").orderBy("t", "delta")
    sweep = (
        starts.unionByName(ends)
        .withColumn(
            "running",
            F.sum("delta").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("peak", F.max("running").over(Window.partitionBy("user_id")))
    )
    return (
        sweep.filter(F.col("running") == F.col("peak"))
        .groupBy("user_id")
        .agg(
            F.max("peak").cast("int").alias("peak_overlap"),
            F.min("t").cast("bigint").alias("t_first_peak_micros"),
        )
        .orderBy("user_id")
    )


def concurrency_peak_oracle() -> str:
    return f"""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS s FROM events
        ),
        sweep AS (
          SELECT user_id, t, delta FROM (
            SELECT user_id, s AS t, 1 AS delta FROM ev
            UNION ALL
            SELECT user_id, s + {INTERVAL_WIDTH_US} AS t, -1 AS delta FROM ev
          )
        ),
        run AS (
          SELECT user_id, t,
                 SUM(delta) OVER (PARTITION BY user_id ORDER BY t, delta
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
          FROM sweep
        ),
        peaked AS (
          SELECT user_id, t, running,
                 MAX(running) OVER (PARTITION BY user_id) AS peak
          FROM run
        )
        SELECT user_id,
               CAST(MAX(peak) AS INT) AS peak_overlap,
               CAST(MIN(t) AS BIGINT) AS t_first_peak_micros
        FROM peaked WHERE running = peak
        GROUP BY user_id
        ORDER BY user_id
    """
