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
ranged frame is persisted so both consumers see the same split, exactly
as in epoch_shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RUNNING_SUM_PARTITIONS = 32


def grouped_running_sum(
    df: DataFrame,
    group_col: str,
    order_col: Column | str,
    value_col: Column | str,
    out_col: str,
    num_partitions: int = RUNNING_SUM_PARTITIONS,
) -> DataFrame:
    """Per-group running sum (inclusive of the current row) in
    ``order_col`` order, without ever placing a whole group in one task.

    Equivalent to ``SUM(value) OVER (PARTITION BY group ORDER BY order
    ROWS UNBOUNDED PRECEDING)`` for unique ``(group, order)`` keys.
    Adds ``out_col``; preserves every input column.
    """
    order_c = F.col(order_col) if isinstance(order_col, str) else order_col
    value_c = F.col(value_col) if isinstance(value_col, str) else value_col
    keyed = df.withColumn("_ord", order_c).withColumn("_val", value_c)
    # Range partition on (group, order): each group's rows split across
    # many partitions but stay contiguous-and-ordered across the split.
    ranged = (
        keyed.repartitionByRange(num_partitions, F.col(group_col), F.col("_ord"))
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    per = ranged.groupBy("_pid", group_col).agg(F.sum("_val").alias("_psum"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per.select(
        "_pid",
        group_col,
        F.coalesce(F.sum("_psum").over(w_off), F.lit(0)).alias("_goff"),
    )
    w_local = (
        Window.partitionBy("_pid", group_col)
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.join(F.broadcast(offsets), ["_pid", group_col])
        .withColumn(out_col, F.col("_goff") + F.sum("_val").over(w_local))
        .drop("_pid", "_goff", "_ord", "_val")
    )
