"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query is forced through the noop sink (`format("noop")`) so the full
plan executes — a bare .count() would let Catalyst prune the projections and
under-report the work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_schema_spark.session import get_spark  # noqa: E402

# FROZEN as of round 6 (VERDICT r5 item 5): this 56-query set is the
# cross-round comparability baseline — do NOT add per-round entries
# (rounds 2-5 each appended ~5, eroding the common set). New operators
# get scale evidence via tools/bench_scale.py / tools/sweep_heavy.py
# instead. Pinned by tests/test_plan_audit.py::test_headline_set_frozen.
HEADLINE = [
    "unified_view_events",
    "dedup_best_per_user",
    "hourly_rollup",
    "daily_deciles",
    "log_pdf_cdf",
    "geomean_by_type",
    "switch_utilization",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q7_volume_shipping",
    "q10_returned_items",
    "q18_big_orders",
    "sessionized_events",
    "annotate_renest",
    "dedup_ngram_jaccard",
    "simhash_fingerprint",
    "tfidf_top_terms",
    "ann_bruteforce_topk",
    "knn_classify",
    "token_count",
    "multimodal_meta",
    # round-2 additions
    "tiered_views",
    "joined_view_template",
    "embedding_cosine_dup",
    "cms_frequency_estimate",
    "multimodal_decode_ppm",
    "pack_sequences",
    "doc_chunks",
    "chunk_dedup",
    "domain_mix_weights",
    "kmv_set_ops",
    # late round-2 additions
    "range_interval_join",
    "gapfill_locf",
    "dedup_minhash_portable",
    "histogram_quantile_sketch",
    "pii_scrub",
    "epoch_shuffle",
    "sliding_window_stats",
    "zscore_outliers",
    "rolling_active_users",
    "retention_cohorts",
    # round-4 additions
    "quality_logreg_score",
    "embedding_decontaminate",
    "mix_epoch_plan",
    "streaming_hourly_counts",
    # round-5 additions
    "perplexity_buckets",
    "mad_outliers",
    "interval_coverage",
    "reservoir_sample_per_key",
    "pmi_cooccur_terms",
    # late round-5 additions
    "winnowing_fingerprint",
    "dup_pagerank",
    "triplet_mining",
    "dataset_card",
    "concurrency_peak",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("bench")
    # warm the JVM + parquet footers + Python/Arrow worker pool with one
    # throwaway pass each (worker startup is deployment cost, not query cost)
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    import pandas as _pd  # noqa: F401

    spark.range(0, 64, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    def canary() -> tuple[float, float]:
        # Host-speed canary (VERDICT r11 item 1): the same two fixed,
        # data-independent micro-benchmarks as tools/host_canary.py,
        # embedded so every bench ARTIFACT carries its own host
        # calibration — r8-r11 all needed out-of-band canary lines to
        # adjudicate fleet-wide drift. Medians of 3. Quiet r11 baseline:
        # {cpu 0.834, agg 0.426}; a 1.5x canary explains a 1.5x bench.
        def cpu_once() -> float:
            t0 = time.perf_counter()
            s = 0
            for i in range(20_000_000):
                s += i
            assert s == 199999990000000
            return time.perf_counter() - t0

        def agg_once() -> float:
            df = spark.range(10_000_000)
            t0 = time.perf_counter()
            df.selectExpr("id % 1024 AS k", "id AS v").groupBy("k").sum(
                "v"
            ).count()
            return time.perf_counter() - t0

        agg_once()  # compile the canary plan once; measure steady-state
        return (
            sorted(cpu_once() for _ in range(3))[1],
            sorted(agg_once() for _ in range(3))[1],
        )

    canary_start = canary()

    def one_pass() -> tuple[dict[str, float], float]:
        timings: dict[str, float] = {}
        total = 0.0
        for name in HEADLINE:
            if name not in qs:
                continue
            fn = qs[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            timings[name] = round(dt, 4)
            total += dt
        return timings, total

    # Methodology (pinned in round 5): one cold pass (metric unchanged
    # since round 1, so cross-round totals stay comparable — it includes
    # one-time JVM/whole-stage-codegen compilation, ~60% of the total at
    # sf0.1), then WARM_PASSES warm re-runs per query reported as the
    # per-query MEDIAN (and min), so single-run environment drift can no
    # longer masquerade as a plan regression (the r3 "dedup_ngram_jaccard
    # regression" was exactly that).
    WARM_PASSES = int(os.environ.get("SPARK_GRAFT_WARM_PASSES", "3"))
    timings, total = one_pass()

    def canary_once() -> tuple[float, float]:
        # single-shot per-pass canary (VERDICT r12 item 1a): one cpu + one
        # agg sample after EACH warm pass, so host elevation DURING the
        # warm passes is visible in the artifact itself (r12's warm 2.05x
        # was adjudicated host-shaped only via out-of-band runs). Start/end
        # canaries stay median-of-3; these are cheap drift probes.
        t0 = time.perf_counter()
        s = 0
        for i in range(20_000_000):
            s += i
        assert s == 199999990000000
        cpu = time.perf_counter() - t0
        df = spark.range(10_000_000)
        t0 = time.perf_counter()
        df.selectExpr("id % 1024 AS k", "id AS v").groupBy("k").sum("v").count()
        return cpu, time.perf_counter() - t0

    warm_runs = []
    canary_passes = []
    for _ in range(WARM_PASSES):
        warm_runs.append(one_pass()[0])
        canary_passes.append(canary_once())
    # release registry-pinned frames (cachereg) so a bench run leaves the
    # session with zero cache pins — the persist-leak audit's release point
    from etl_schema_spark.operators.cachereg import release_pins
    from etl_schema_spark.streaming.scratch import release_scratch

    release_pins()
    release_scratch()
    canary_end = canary()
    warm_med = {
        k: sorted(run[k] for run in warm_runs)[WARM_PASSES // 2] for k in timings
    }
    warm_min = {k: min(run[k] for run in warm_runs) for k in timings}
    warm_total = round(sum(warm_med.values()), 4)
    warm_min_total = round(sum(warm_min.values()), 4)

    # Verbose detail first (cold + all warm stats) — a diagnostic line.
    print(
        json.dumps(
            {
                "detail": "cold_and_warm",
                "warm_passes": WARM_PASSES,
                "queries_cold": timings,
                "queries_warm_median": warm_med,
                "queries_warm_min": warm_min,
                "value_cold": round(total, 4),
                "value_warm_median": warm_total,
                "value_warm_min": warm_min_total,
                "canary_start": [round(x, 3) for x in canary_start],
                "canary_passes": [
                    [round(x, 3) for x in c] for c in canary_passes
                ],
                "canary_end": [round(x, 3) for x in canary_end],
                "sf": sf,
            }
        )
    )
    # The FINAL stdout line is the driver contract and must survive the
    # driver's bounded tail capture — 2000 chars (r2/r3 recorded
    # "parsed": null because one long line with both passes was truncated
    # mid-JSON). Keep it compact. KEY STABILITY (ADVICE r4): "queries"
    # carries COLD per-query timings, the same meaning as rounds 1-3.
    # VERDICT r12 item 1a: the per-query WARM array is now the MIN-of-3
    # ("queries_warm_min" — the standard noise-robust statistic; it
    # previously died in the truncated verbose line while the artifact
    # carried only medians, so r12's host-elevated warm passes breached
    # the 2x gate unadjudicatable). The per-query MEDIANS still ride the
    # verbose line above; the parsed line keeps both TOTALS (value_warm
    # median + value_warm_min) and gains per-warm-pass canaries — the
    # 2000-char budget fits exactly one per-query warm array, and min
    # is the one that survives host noise (measured line ~1930 chars).
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 2),
                "unit": "sec",
                "queries": {k: round(v, 2) for k, v in timings.items()},
                "queries_warm_min": [round(warm_min[k], 2) for k in timings],
                "value_warm": round(warm_total, 2),
                "value_warm_min": round(warm_min_total, 2),
                # [cpu_start, agg_start, cpu_end, agg_end] — quiet ref
                # {cpu 0.834, agg 0.426}; see canary() above.
                "canary": [
                    round(canary_start[0], 2),
                    round(canary_start[1], 2),
                    round(canary_end[0], 2),
                    round(canary_end[1], 2),
                ],
                # one [cpu, agg] single-shot probe taken right after each
                # warm pass — host elevation DURING the passes, in-artifact
                "canary_w": [[round(x, 2) for x in c] for c in canary_passes],
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
