"""Distributed window primitives (SURVEY §4).

``Window.partitionBy(k)`` puts EVERY row of one key in ONE task. For a
low-cardinality key (``source``: ~10 values at 100 TB) that is a
single-reducer sort over terabytes — the one window shape that cannot
scale. These helpers compute the same results with bounded per-task state,
generalizing the two-phase distributed-rank pattern proven in
``corpus.epoch_shuffle``:

  grouped_running_sum   SUM(v) OVER (PARTITION BY g ORDER BY o ROWS
                        UNBOUNDED PRECEDING) — range-partition by
                        (g, o), aggregate per-(partition, g) subtotals
                        (a metadata-sized table: |partitions| × |groups|
                        rows), prefix-sum those into broadcast offsets,
                        then add a (partition, g)-local running sum.
                        No task ever sorts more than one range
                        partition's worth of one group.

The local window keys on (_pid, g) — cardinality |partitions| × |groups|
— so its exchange hash-distributes evenly even when ``g`` alone is hot.
Correctness does not depend on where the sampled range boundaries land:
offsets are computed from the partitioning actually materialized (the
ranged frame is scratch-materialized to parquet so both consumers read
the same immutable split, exactly as in epoch_shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def grouped_running_sum(
    df: DataFrame,
    group_col: str,
    order_col: Column | str,
    value_col: Column | str,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group running sum (inclusive of the current row) in
    ``order_col`` order, without ever placing a whole group in one task.

    Equivalent to ``SUM(value) OVER (PARTITION BY group ORDER BY order
    ROWS UNBOUNDED PRECEDING)`` for unique ``(group, order)`` keys.
    Adds ``out_col``; preserves every input column.

    ``num_partitions`` defaults to the session's
    ``spark.sql.shuffle.partitions`` (VERDICT r11 item 5 — a constant 32
    pinned LOCAL-mode parallelism into every consumer: on a 1000-executor
    cluster where shuffle.partitions is ~8000, the range split must scale
    with the session, and the per-partition offset table stays
    metadata-sized — |partitions| x |groups| rows — either way).
    """
    if num_partitions is None:
        from ..session import shuffle_partitions

        num_partitions = shuffle_partitions(df.sparkSession)
    order_c = F.col(order_col) if isinstance(order_col, str) else order_col
    value_c = F.col(value_col) if isinstance(value_col, str) else value_col

    # Temp columns must not clobber caller columns; escalate with leading
    # underscores until free (plan-audit regexes match `_+pid`).
    def tmp(base: str) -> str:
        name = base
        while name in df.columns:
            name = "_" + name
        return name

    c_ord, c_val, c_pid, c_goff, c_psum = (
        tmp("_ord"), tmp("_val"), tmp("_pid"), tmp("_goff"), tmp("_psum")
    )
    keyed = df.withColumn(c_ord, order_c).withColumn(c_val, value_c)
    # Range partition on (group, order): each group's rows split across
    # many partitions but stay contiguous-and-ordered across the split.
    #
    # DETERMINISM: correctness requires the offsets branch and the final
    # join to observe the IDENTICAL partition assignment. A lost partition
    # that recomputes through the range shuffle could re-split differently
    # (boundary sampling over a nondeterministically-ordered upstream) and
    # silently corrupt the sums. VERDICT r12 item 4: the previous
    # MEMORY_AND_DISK_2 persist guarded that, but was UNRELEASABLE — not
    # in cachereg, so release_pins() never saw it, and unpersisting would
    # re-open the recompute hazard; each invocation pinned a fresh
    # CacheManager entry for the session (the r11 GC-pressure class).
    # The materialize seam freezes the partition assignment in immutable
    # bytes (recompute is impossible, not merely replicated-against) AND
    # the frame is reclaimed by the same release_scratch() hook the
    # streaming drains use. r13: the seam is an eager DISK_ONLY local
    # checkpoint (one job, no commit/re-read) instead of a parquet round
    # trip — same guarantees, ~0.3-0.7 s per call cheaper at sf0.1 (see
    # scratch.materialize). The range shuffle lives in the checkpoint
    # job's plan; tests/test_plan_audit.py asserts it at the seam.
    from ..streaming.scratch import materialize

    ranged = materialize(
        keyed.repartitionByRange(num_partitions, F.col(group_col), F.col(c_ord))
        .withColumn(c_pid, F.spark_partition_id()),
        "grsum_",
    )
    per = ranged.groupBy(c_pid, group_col).agg(F.sum(c_val).alias(c_psum))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy(c_pid)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per.select(
        c_pid,
        group_col,
        F.coalesce(F.sum(c_psum).over(w_off), F.lit(0)).alias(c_goff),
    )
    w_local = (
        Window.partitionBy(c_pid, group_col)
        .orderBy(c_ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.join(F.broadcast(offsets), [c_pid, group_col])
        .withColumn(out_col, F.col(c_goff) + F.sum(c_val).over(w_local))
        .drop(c_pid, c_goff, c_ord, c_val)
    )
