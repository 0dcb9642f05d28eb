"""Availability probe: degenerate-SIZE rows that both engines agree on.

The oracle compare cannot flag availability hazards — a quadratic
per-document pass or a hot-key pair blowup produces the SAME (eventual)
answer in both engines; it just stops finishing at real-corpus shapes.
This probe plants size outliers the sf generators never produce and
times every requested entry with a wall-clock budget:

  documents: one multi-MB varied-vocabulary doc (positional-substring /
             per-doc-pair blowups), one 200 KB single-token repeat
             (pathological runs for repetition/BPE/compression passes)
  events:    one HOT USER carrying `--hot-events` rows across 30 days
             (per-user window/sessionization/sequence state), plus one
             hot (user, day) burst at a single hour (salting target)

Found so far (BENCH_NOTES "Long-document availability"):
  substring_repeat_ladder  super-quadratic expression form -> rewritten
                           to a linear Arrow pass in r6 (18 s vs 20+ min)
  substring_dup_spans      quadratic positional substring  -> r7
  pmi_cooccur_terms        distinct-tokens^2 pair blowup    -> r7

Usage: python tools/probe_availability.py [base_sf_dir] [entry ...]
       (default: the text/dedup + events families most exposed;
        BUDGET_S=60 per entry, exceeded = FLAG, not failure)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_BASE = "/root/testdata/sf0.001"
BUDGET_S = float(os.environ.get("PROBE_BUDGET_S", "60"))
HOT_EVENTS = int(os.environ.get("PROBE_HOT_EVENTS", "50000"))
# opt-in templated-cluster axis: N IDENTICAL docs collide in every LSH
# band bucket — the adversarial shape behind the LSH_BUCKET_CAP
# (ADVICE r6). Set above the 1024 cap (e.g. 2200) to prove the ids-only
# candidate paths complete with bounded single-task cost; 0 = off so the
# default probe numbers stay comparable round-over-round.
TEMPLATE_DOCS = int(os.environ.get("PROBE_TEMPLATE_DOCS", "0"))
# opt-in embedding twin: N IDENTICAL vectors collide in every hyperplane
# band bucket — the shape behind similarity.COSINE_BUCKET_CAP. Above the
# cap (e.g. 2200) the pair output must flatten at C(CAP, 2) per bucket
# instead of growing C(N, 2); 0 = off.
TEMPLATE_VECS = int(os.environ.get("PROBE_TEMPLATE_VECS", "0"))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

DOC_ENTRIES = [
    "token_count", "text_quality", "doc_entropy", "repetition_stats",
    "substring_dup_spans", "substring_repeat_ladder", "winnowing_fingerprint",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_minhash_portable",
    "doc_chunks", "chunk_dedup", "tfidf_top_terms", "containment_dup",
    "boundary_templates", "perplexity_buckets", "token_count_bpe",
    "bpe_merge_candidates", "langid_heuristic", "doc_fingerprint",
    "pii_scrub", "incremental_dedup", "dedup_exact", "pack_sequences",
    "bigram_surprisal", "pmi_cooccur_terms", "code_detect",
    "dedup_editdistance", "minhash_jaccard_estimate", "curation_pipeline",
    "gopher_quality_flags", "ngram_novelty_score", "hashing_trick_features",
    "vocab_growth_curve", "zipf_term_stats",
    # round-8 additions (doc-bound)
    "repeat_profile_automaton", "unigram_lm_pieces",
    "dsir_importance_weights", "cross_source_dup_leakage",
    "length_filter_sweep", "weighted_sample_ares", "restore_unique_docs",
    "lsh_tuning_curve",
    # round-9 additions (doc-bound)
    "ccnet_source_split", "lm_domain_perplexity",
    # round-10 additions (doc-bound)
    "pii_risk_profile", "quality_score_calibration",
    "doremi_excess_reweight", "near_dup_keep_plan", "dedup_aware_split",
    "doc_length_drift",
]
EMB_ENTRIES = [
    "embedding_cosine_dup", "semdedup_clusters", "embedding_outliers",
    "embedding_decontaminate", "knn_classify", "kmeans_clusters",
    "ann_bruteforce_topk", "ann_ivf_topk", "ann_lsh_topk", "ann_pq_topk",
    "jl_projection", "embedding_quantize", "centroid_per_label",
    "triplet_mining",
    # round-9 additions (embedding-bound)
    "embedding_domain_profile", "ivf_recall_eval", "label_balance_sample",
    # round-10 addition (embedding-bound)
    "centroid_shift_drift",
]
EVENT_ENTRIES = [
    "bloom_membership", "gapfill_locf", "gapfill_interp",
    "seasonal_baseline", "pivot_event_counts", "multigrain_stats",
    "hourly_rollup", "switch_utilization", "histogram_quantile_sketch",
    "log_pdf_cdf", "geomean_by_type", "hll_distinct_estimate",
    "cms_frequency_estimate", "kmv_distinct_estimate", "zscore_outliers",
    "sessionized_events", "session_top_paths", "running_totals",
    "user_transition_matrix", "windowed_funnel", "concurrency_peak",
    "new_vs_returning", "rolling_active_users", "daily_modal_event",
    "rfm_features", "scd2_history", "late_arrival_audit",
    "time_weighted_value",
    "skew_salted_daily_users", "interval_coverage", "asof_attribution",
    "asof_nearest", "range_interval_join", "funnel_conversion",
    "retention_cohorts", "user_activity_gini", "tail_latency_percentiles",
    # round-8 addition (events-bound)
    "trimmed_mean_value",
    # round-9 additions (events-bound)
    "quality_expectation_report", "streaming_quality_gated_publish",
    "psi_value_drift", "topk_drift_weekly",
    # round-10 additions (events-bound)
    "key_skew_profile", "streaming_ingest_restore",
]


def build_corpus(out: str, base: str = DEFAULT_BASE) -> None:
    import duckdb

    os.makedirs(out, exist_ok=True)
    skip = {"documents", "events"} | ({"embeddings"} if TEMPLATE_VECS else set())
    for t in TABLES:
        if t not in skip:
            shutil.copyfile(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    con = duckdb.connect()
    if TEMPLATE_VECS:
        # one fixed finite vector replicated TEMPLATE_VECS times: every
        # replica shares every band key, the worst collision shape
        con.sql(
            f"""
            COPY (
              SELECT * FROM read_parquet('{base}/embeddings.parquet')
              UNION ALL
              SELECT 980000 + i,
                     [CAST(0.125 + 0.001 * (j % 8) AS FLOAT)
                      for j in range(0, 64)],
                     0
              FROM (SELECT unnest(range(0, {TEMPLATE_VECS})) AS i)
            ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
            """
        )
    template_rows = (
        f"""
          UNION ALL
          SELECT 941000 + i,
                 'one shared template body repeated verbatim across'
                 || ' every replica of the cluster alpha beta gamma delta'
                 || ' epsilon zeta eta theta',
                 'en', 'edge', 0
          FROM (SELECT unnest(range(0, {TEMPLATE_DOCS})) AS i)"""
        if TEMPLATE_DOCS
        else ""
    )
    con.sql(
        f"""
        COPY (
          SELECT * FROM read_parquet('{base}/documents.parquet')
          UNION ALL
          SELECT 940001,
                 array_to_string([concat('tok', CAST(i % 7919 AS VARCHAR),
                                         ' w', CAST(i % 131 AS VARCHAR))
                                  for i in range(1, 150000)], ' '),
                 'en', 'edge', 0
          UNION ALL
          SELECT 940002, repeat('spam ', 40000), 'en', 'edge', 0{template_rows}
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    # hot user 950001: HOT_EVENTS rows spread over 30 days; hot burst:
    # user 950002 fires 5000 rows inside one hour of one day
    con.sql(
        f"""
        COPY (
          SELECT * FROM read_parquet('{base}/events.parquet')
          UNION ALL
          SELECT 950000000 + i,
                 TIMESTAMP '2024-01-01 00:00:00'
                   + INTERVAL (i * 51) SECOND,
                 950001,
                 ['view', 'click', 'purchase'][1 + i % 3],
                 CAST(1 + i % 97 AS DOUBLE),
                 '{{"k": 1}}'
          FROM (SELECT unnest(range(0, {HOT_EVENTS})) AS i)
          UNION ALL
          SELECT 960000000 + i,
                 TIMESTAMP '2024-01-15 12:00:00' + INTERVAL (i % 3600) SECOND,
                 950002,
                 'view',
                 CAST(1 + i % 13 AS DOUBLE),
                 '{{"k": 2}}'
          FROM (SELECT unnest(range(0, 5000)) AS i)
          UNION ALL
          -- cardinality axis: 10k distinct event_types (per-type state,
          -- |types|-proportional spines/profiles, and the bloom probe
          -- universe |types| x |users| at its auto-sampling condition)
          SELECT 970000000 + i,
                 TIMESTAMP '2024-01-20 00:00:00' + INTERVAL (i * 97) SECOND,
                 950003 + i % 7,
                 concat('etype_', CAST(i % 10000 AS VARCHAR)),
                 CAST(1 + i % 31 AS DOUBLE),
                 '{{"k": 3}}'
          FROM (SELECT unnest(range(0, 20000)) AS i)
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
        """
    )


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_BASE
    only = sys.argv[2:]
    out = tempfile.mkdtemp(prefix="availprobe_")
    build_corpus(out, base)

    from etl_schema_spark.session import get_spark  # noqa: E402

    import __spark_entry__ as e  # noqa: E402

    spark = get_spark()
    qs = e.queries()
    names = only or (DOC_ENTRIES + EMB_ENTRIES + EVENT_ENTRIES)
    flagged = []
    for name in names:
        t0 = time.time()
        try:
            n = qs[name](spark, out).count()
            dt = time.time() - t0
            mark = "  <-- OVER BUDGET" if dt > BUDGET_S else ""
            print(f"{name:28s} {dt:7.1f}s  rows={n}{mark}", flush=True)
            if dt > BUDGET_S:
                flagged.append(name)
        except Exception as ex:
            print(f"{name:28s} {time.time() - t0:7.1f}s  ERROR {str(ex)[:140]}", flush=True)
            flagged.append(name)
    print(f"\n{len(names) - len(flagged)}/{len(names)} within budget "
          f"({BUDGET_S:.0f}s); flagged: {flagged or 'none'}")
    shutil.rmtree(out, ignore_errors=True)
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
