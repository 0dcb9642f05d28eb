"""In-process alternating A/B: seam-form grouped_running_sum (forced by
ignoring bucket_of) vs r14 deterministic-bucket form, for the three
md5-keyed running-sum consumers. One session, alternating rounds."""
import sys, time, collections
sys.path.insert(0, "/root/repo")
from etl_schema_spark.session import get_spark
from etl_schema_spark.operators import distributed as D
from etl_schema_spark.operators import similarity, corpus
from etl_schema_spark.operators.cachereg import release_pins
from etl_schema_spark.streaming.scratch import release_scratch

SF = "/root/testdata/sf0.1"
real = D.grouped_running_sum

def seam_forced(df, group_col, order_col, value_col, out_col, num_partitions=None, bucket_of=None):
    return real(df, group_col, order_col, value_col, out_col, num_partitions)

spark = get_spark("ab_bucket", master="local[32]")
qs = {
    "triplet_mining": similarity.triplet_mining,
    "label_balance_sample": similarity.label_balance_sample,
    "source_token_budget": corpus.source_token_budget,
}
qs["label_balance_sample"](spark, SF).write.format("noop").mode("overwrite").save()

times = collections.defaultdict(list)
for r in range(5):
    for label, impl in (("seam", seam_forced), ("bucket", real)):
        D.grouped_running_sum = impl
        # consumers import grouped_running_sum at module top in similarity?
        # check: similarity imports inside function ('from .distributed
        # import grouped_running_sum') -> call-time attr; corpus imports at
        # module top! patch corpus reference too.
        corpus.grouped_running_sum = impl
        for qname, fn in qs.items():
            t0 = time.perf_counter()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            times[(label, qname)].append(round(time.perf_counter() - t0, 3))
D.grouped_running_sum = real
corpus.grouped_running_sum = real
release_pins(); release_scratch()
for qname in qs:
    s, b = times[("seam", qname)], times[("bucket", qname)]
    print(f"{qname:24s} seam   min={min(s):.3f} med={sorted(s)[len(s)//2]:.3f} {s}")
    print(f"{'':24s} bucket min={min(b):.3f} med={sorted(b)[len(b)//2]:.3f} {b}")
