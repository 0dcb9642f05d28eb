"""Skew-mitigation utilities (SURVEY §4).

AQE's skew-join splitting (on in session.py) covers sort-merge joins whose
skew is visible in shuffle statistics. Two cases remain for explicit
salting, both used at 100 TB:

  salted_join       A shuffled equi-join where one key holds a large share
                    of the big side and the small side can't broadcast.
                    The small side replicates SALT times (tiny: |small| x
                    SALT rows); the big side gets a deterministic per-row
                    salt, so the hot key spreads over SALT reducers.
  salted_collect    Non-algebraic aggregates (collect_list/collect_set)
                    have NO map-side partial aggregation — a hot group's
                    every row lands on one reducer. Two-phase salting
                    bounds per-reducer fan-in to group_size / SALT, then
                    flattens the per-salt chunks.

Algebraic aggregates (sum/count/min/max/avg) do NOT need this: Spark
already partial-aggregates map-side, so a hot group costs one row per map
task in the shuffle. Salting those would add a shuffle for nothing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def _row_salt(n: int) -> Column:
    """Deterministic pseudo-random per-row salt (seeded rand keeps runs
    reproducible; any spread works — correctness never depends on it)."""
    return F.floor(F.rand(seed=42) * n).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over `salt` reducers.

    `small` is replicated `salt` times via explode (rows = |small| x salt —
    use only when broadcast is infeasible but replication still fits);
    `big` rows get one salt each, so every big row still meets every
    matching small row exactly once.
    """
    salts = F.array(*[F.lit(i) for i in range(salt)])
    small_rep = small.withColumn("_salt", F.explode(salts))
    big_s = big.withColumn("_salt", _row_salt(salt))
    joined = big_s.join(small_rep, [*on, "_salt"], how)
    return joined.drop("_salt")


def salted_collect(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    salt: int = DEFAULT_SALT,
    out: str = "items",
    sort: bool = True,
) -> DataFrame:
    """collect_list(col) by keys with bounded per-reducer fan-in.

    Phase 1 collects per (keys, salt) — each reducer sees at most
    group_size / salt rows of a hot group; phase 2 merges the salt chunks
    (at most `salt` small arrays per group). With sort=True the merged
    array is sorted, making the result deterministic (a plain
    collect_list's order is partition-dependent anyway).
    """
    phase1 = (
        df.withColumn("_salt", _row_salt(salt))
        .groupBy(*keys, "_salt")
        .agg(F.collect_list(col).alias("_chunk"))
    )
    merged = phase1.groupBy(*keys).agg(
        F.flatten(F.collect_list("_chunk")).alias(out)
    )
    if sort:
        merged = merged.withColumn(out, F.array_sort(out))
    return merged


def skew_salted_daily_users(spark, sf_dir: str) -> DataFrame:
    """Registry entry for the salting machinery: per (event_type, date),
    the sorted distinct-user list assembled with bounded-fan-in two-phase
    collection. event_type is the canonical skewed key (~4 values over the
    whole corpus); a plain collect_list would funnel every row of a hot
    type-day through ONE reducer — salted_collect caps fan-in at
    group_size / SALT and merges |SALT| chunks.

    Oracle-checked: the sorted list is deterministic, and it is emitted as
    a '|'-joined STRING (plus n_users) rather than an ARRAY — the driver's
    pandas canonicalizer sorts on every output column and cannot hash
    list-typed cells (CORRECTNESS_r04: TypeError unhashable type 'list').
    tests/test_skew.py keeps the array-form assertion on salted_collect
    itself. (Non-algebraic aggregates are exactly the ones where salting
    earns its keep; sum/count partial-aggregate map-side and never need it.)
    """
    from ..sources.catalog import load_table

    # NULL-user contract (edge fuzz wave 6): Spark's collect_list drops
    # NULL elements while SQL COUNT(*) over the pair set keeps the row,
    # so a NULL user inflates n_users on one side only — a NULL user is
    # not a user; exclude it from the pair domain on both sides.
    pairs = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_type", F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    collected = salted_collect(pairs, ["event_type", "day"], "user_id", out="users")
    return collected.select(
        "event_type",
        "day",
        F.size("users").alias("n_users"),
        F.array_join(F.col("users").cast("array<string>"), "|").alias("users"),
    )


def skew_salted_daily_users_oracle() -> str:
    return """
        WITH pairs AS (
          SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
          FROM events WHERE user_id IS NOT NULL
        )
        SELECT event_type, day,
               COUNT(*) AS n_users,
               array_to_string(list_sort(list(user_id)), '|') AS users
        FROM pairs GROUP BY event_type, day
        ORDER BY event_type, day
    """
