"""Heavy-set scale sweep with shuffle/spill accounting (VERDICT r5 item 3).

Runs the eight most expensive registry operators against a scale corpus in
ONE SparkSession (the r5 pre-fix sweep OOMed at query 8 from a memory-sink
drain leak — surviving the full set in one session is itself the test),
and records per-query wall time plus shuffle read/write and spill bytes
pulled from the Spark UI REST API (diffed across /api/v1 stage totals).

Usage: python tools/sweep_heavy.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_schema_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10eq"

HEAVY = [
    "embedding_cosine_dup",
    "embedding_decontaminate",
    "triplet_mining",
    "containment_dup",
    "template_communities",
    "dup_pagerank",
    "minhash_pr_eval",
    "ndcg_eval",
]


def _ui_stage_totals(ui: str) -> dict[str, int]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    tot = {"shuffle_read": 0, "shuffle_write": 0, "mem_spill": 0, "disk_spill": 0}
    for s in stages:
        tot["shuffle_read"] += s.get("shuffleReadBytes", 0)
        tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        tot["mem_spill"] += s.get("memoryBytesSpilled", 0)
        tot["disk_spill"] += s.get("diskBytesSpilled", 0)
    return tot


def main() -> None:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("sweep-heavy")
    ui = f"http://127.0.0.1:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
    names = sys.argv[2:] or HEAVY
    print(f"| query | wall s | shuffle write | shuffle read | spill (mem/disk) |")
    print("| --- | --- | --- | --- | --- |")
    mb = 1 << 20
    for name in names:
        before = _ui_stage_totals(ui)
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        after = _ui_stage_totals(ui)
        d = {k: after[k] - before[k] for k in after}
        print(
            f"| {name} | {wall:.1f} | {d['shuffle_write'] / mb:.1f} MiB "
            f"| {d['shuffle_read'] / mb:.1f} MiB "
            f"| {d['mem_spill'] / mb:.0f} / {d['disk_spill'] / mb:.0f} MiB |",
            flush=True,
        )
    # leak audit: the whole point of the one-session requirement.
    # Registry-pinned frames (cachereg) release here — the sweep's
    # end-state must read zero pins, proving nothing leaks past an
    # explicit release point.
    from etl_schema_spark.operators.cachereg import release_pins

    release_pins()
    jsc = spark.sparkContext._jsc.sc()
    print(
        f"\nend-of-sweep: persistentRDDs={jsc.getPersistentRDDs().size()} "
        f"catalogViews={len(spark.catalog.listTables())}"
    )


if __name__ == "__main__":
    main()
