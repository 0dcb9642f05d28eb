"""Host-speed canary: two fixed, data-independent micro-benchmarks that
calibrate the machine a bench snapshot ran on, so cross-round wall-clock
comparisons can be normalized for host drift (the r8/r9/r10 "every query
moved together" adjudications).

  cpu_loop_s    single-core: sum of 20M Python ints (interpreter-bound,
                no allocation churn) — tracks per-core clock/steal.
  spark_agg_s   32-thread JVM: one fixed groupBy over a generated
                10M-row range (no disk, no parquet) — tracks the
                codegen/shuffle path the bench actually exercises.

Print-once JSON; record the line next to each bench snapshot in
BENCH_NOTES. A snapshot whose canary is 1.6x another snapshot's canary
explains a fleet-wide 1.6x without touching a single plan.

Usage: python tools/host_canary.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cpu_loop() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i
    assert s == 199999990000000
    return time.perf_counter() - t0


def spark_agg() -> float:
    from etl_schema_spark.session import get_spark

    spark = get_spark("host-canary")
    df = spark.range(10_000_000)
    # warm the codegen/session path once, then measure
    df.selectExpr("id % 1024 AS k").groupBy("k").count().count()
    t0 = time.perf_counter()
    df.selectExpr("id % 1024 AS k", "id AS v").groupBy("k").sum("v").count()
    return time.perf_counter() - t0


def main() -> None:
    loops = sorted(cpu_loop() for _ in range(3))
    aggs = sorted(spark_agg() for _ in range(3))
    print(
        json.dumps(
            {
                "cpu_loop_s": round(loops[1], 3),
                "spark_agg_s": round(aggs[1], 3),
                "load_1m": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
