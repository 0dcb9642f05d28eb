"""In-process alternating A/B: r13 grouped_rank_pick (explode targets,
(pid,group,lt) window, chunk replicated per target) vs r14 (per-chunk
local-rank array, single (pid,group) window). One session, alternating
rounds, min-of-N; host drift hits both sides equally."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window, functions as F
from etl_schema_spark.session import get_spark
from etl_schema_spark.operators import distributed as D
from etl_schema_spark.operators import analytics, text
from etl_schema_spark.operators.cachereg import release_pins
from etl_schema_spark.streaming.scratch import release_scratch

SF = "/root/testdata/sf0.1"
new_pick = D.grouped_rank_pick


def old_pick(df, group_col, order_col, targets_of_n, rank_col="rk", num_partitions=None):
    if num_partitions is None:
        from etl_schema_spark.session import shuffle_partitions
        num_partitions = shuffle_partitions(df.sparkSession)
    assert group_col != "n"
    order_c = F.col(order_col) if isinstance(order_col, str) else order_col

    def tmp(base):
        name = base
        while name in df.columns:
            name = "_" + name
        return name

    ranged, chunk, c_ord, c_pid, c_off, c_cnt = D._ranged_chunks(
        df, group_col, order_c, num_partitions, tmp
    )
    c_lt = tmp("_lt")
    sel = (
        chunk.select(
            c_pid, group_col, c_off, c_cnt,
            F.explode(F.array_distinct(targets_of_n)).alias(rank_col),
        )
        .filter(
            (F.col(rank_col) > F.col(c_off))
            & (F.col(rank_col) <= F.col(c_off) + F.col(c_cnt))
        )
        .select(c_pid, group_col, (F.col(rank_col) - F.col(c_off)).alias(c_lt), rank_col)
    )
    w_local = Window.partitionBy(c_pid, group_col, c_lt).orderBy(c_ord)
    c_lrn = tmp("_lrn")
    picked = (
        ranged.join(F.broadcast(sel), [c_pid, group_col])
        .withColumn(c_lrn, F.row_number().over(w_local))
        .filter(F.col(c_lrn) == F.col(c_lt))
        .drop(c_lrn, c_lt, c_pid, c_ord)
    )
    counts = chunk.select(group_col, "n").dropDuplicates([group_col])
    return D._RankedSplit(rows=ranged.drop(c_ord, c_pid), counts=counts, picked=picked)


spark = get_spark("ab_pick", master="local[32]")
qs = {
    "mad_outliers": analytics.mad_outliers,
    "tail_latency_percentiles": analytics.tail_latency_percentiles,
    "perplexity_buckets": text.perplexity_buckets,
}
# warm
qs["mad_outliers"](spark, SF).write.format("noop").mode("overwrite").save()

import collections
times = collections.defaultdict(list)
ROUNDS = 5
for r in range(ROUNDS):
    for label, impl in (("old", old_pick), ("new", new_pick)):
        D.grouped_rank_pick = impl
        for qname, fn in qs.items():
            t0 = time.perf_counter()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            times[(label, qname)].append(round(time.perf_counter() - t0, 3))
D.grouped_rank_pick = new_pick
release_pins(); release_scratch()
for qname in qs:
    o, n = times[("old", qname)], times[("new", qname)]
    print(f"{qname:26s} old min={min(o):.3f} med={sorted(o)[len(o)//2]:.3f} {o}")
    print(f"{'':26s} new min={min(n):.3f} med={sorted(n)[len(n)//2]:.3f} {n}")
