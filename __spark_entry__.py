"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every operator in SURVEY.md §2 to a callable
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the DuckDB twin.
Column names are aliased identically on both sides (driver hash-compares
sorted columns). Rows-only operators (hash-family / ANN internals that are
not SQL-portable) intentionally have no oracle entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_schema_spark import functions as table_functions
from etl_schema_spark import quality, streaming
from etl_schema_spark.operators import (
    analytics,
    asof,
    corpus,
    curation,
    dedup,
    drift,
    graph,
    multimodal,
    packing,
    rangejoin,
    relational,
    relational_ext,
    rollups,
    sessions,
    similarity,
    sketches,
    skew,
    text,
    transforms,
    view_families,
    views_layer,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the unified-view pipeline (raw → extended → unified),
    the reference's headline surface (views/ndt/unified_downloads.sql)."""
    return views_layer.unified_view(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ROTATION POLICY (pinned — rounds 1 and 2 both lost verdicts to this):
    # the driver scores only the FIRST 50 entries each round. Order as:
    #   1. entries with NO driver verdict yet (new this round or never
    #      scored because they landed past the cap),
    #   2. entries whose implementation changed since their last verdict
    #      (mechanically: tools/verdict_freshness.py — AST fingerprint of
    #      the implementing function + transitive in-package helpers +
    #      referenced constants, HEAD vs the entry's verdict-round commit),
    #   3. everything else, OLDEST verdict first (re-verification rotation).
    # When adding an operator, insert it in group 1 — an entry appended at
    # the tail will NOT be scored this round. Enforced by
    # tests/test_plan_audit.py::test_stale_entries_sort_into_scored_window.
    return {
        # -- group 0: NEW this round (r13), never scored -------------------
        # The streaming twin of ingest_front_door (VERDICT r12 items 5+6):
        # per-micro-batch three-tier admission with admit-then-append
        # index maintenance behind the batch-id-scoped overwrite ledger.
        "streaming_ingest_front_door": streaming.streaming_ingest_front_door,
        # -- r12 additions, scored r12 -------------------------------------
        # r12 additions: the near-dup-at-ingest front door (batch +
        # streaming twins over the session-pinned MinHash band-bucket
        # index), the per-batch rule-drift gate, and the graph-expanded
        # ANN recall eval (VERDICT r11 items 4 and 7).
        "incremental_neardup": dedup.incremental_neardup,
        "streaming_neardup": streaming.streaming_neardup,
        "streaming_rule_drift_gate": streaming.streaming_rule_drift_gate,
        "ann_graph_expand_eval": similarity.ann_graph_expand_eval,
        # + ingest_front_door (joined late-round): the composed
        # per-document admission pipeline — exact tier, banding tier,
        # quality tier, admitted — in production order, one verdict row
        # per arriving doc.
        "ingest_front_door": dedup.ingest_front_door,
        # -- group 1: implementation changed since the entry's last green
        # verdict (33, tools/verdict_freshness.py): the r12 work set —
        # the two-join broadcast restructure (incremental_dedup + its
        # streaming twin), rare_shared_pairs' phase-A fanout +
        # containment_dup's pin lifecycle, grouped_running_sum sized from
        # the session (all its consumers), the _psi_report cells split
        # (psi trio), the distributed streaming drains, key_skew_profile's
        # nk reuse — PLUS the latent local-import tail the freshness tool
        # could not see before r12 (helpers reached only through
        # function-local imports now join the fingerprint closure, so
        # every past consumer of those helpers re-rotates once). --------
        "ccnet_source_split": curation.ccnet_source_split,  # r10
        "containment_dup": dedup.containment_dup,  # r11
        "dedup_aware_split": graph.dedup_aware_split,  # r11
        "dedup_impact_curve": dedup.dedup_impact_curve,  # r08
        "dedup_ngram_jaccard": dedup.dedup_ngram_jaccard,  # r07
        "doc_length_drift": drift.doc_length_drift,  # r10
        "dup_cluster_stats": graph.dup_cluster_stats,  # r11
        "dup_components": graph.dup_components,  # r11
        "dup_pagerank": graph.dup_pagerank,  # r11
        "embedding_outliers": similarity.embedding_outliers,  # r09
        "incremental_dedup": dedup.incremental_dedup,  # r08
        "key_skew_profile": skew.key_skew_profile,  # r11
        "label_balance_sample": similarity.label_balance_sample,  # r09
        "lsh_tuning_curve": dedup.lsh_tuning_curve,  # r08
        "mad_outliers": analytics.mad_outliers,  # r07
        "minhash_jaccard_estimate": dedup.minhash_jaccard_estimate,  # r07
        "minhash_pr_eval": dedup.minhash_pr_eval,  # r11
        "near_dup_keep_plan": graph.near_dup_keep_plan,  # r11
        "pack_efficiency_sweep": packing.pack_efficiency_sweep,  # r07
        "pack_fill_audit": packing.pack_fill_audit,  # r11
        "pack_sequences": packing.pack_sequences,  # r07
        "perplexity_buckets": text.perplexity_buckets,  # r06
        "psi_value_drift": drift.psi_value_drift,  # r10
        "quality_rule_drift": drift.quality_rule_drift,  # r11
        # + semdedup_clusters (joined mid-round): its bare .persist()
        # converted to swap_pin, the last ADVICE-r5 leak-class site
        "semdedup_clusters": similarity.semdedup_clusters,  # r09
        "source_token_budget": corpus.source_token_budget,  # r09
        "streaming_incremental_dedup": streaming.streaming_incremental_dedup,  # r11
        "streaming_quality_gated_publish": streaming.streaming_quality_gated_publish,  # r10
        "tail_latency_percentiles": analytics.tail_latency_percentiles,  # r06
        "template_communities": graph.template_communities,  # r11
        "trimmed_mean_value": analytics.trimmed_mean_value,  # r08
        "triplet_mining": similarity.triplet_mining,  # r09
        "user_activity_gini": analytics.user_activity_gini,  # r11
        "vocab_growth_curve": corpus.vocab_growth_curve,  # r06
        # -- group 2: re-verification rotation, oldest verdict first —
        # the ENTIRE remaining r6 cohort (9, retiring round 6 from the
        # freshness histogram) then the r7 cohort head (4) --------------
        "multimodal_meta": multimodal.multimodal_meta,  # r06
        "multimodal_resize": multimodal.multimodal_resize,  # r06
        "q12_shipmode": relational_ext.q12_shipmode,  # r06
        "repetition_stats": curation.repetition_stats,  # r06
        "stratified_sample": corpus.stratified_sample,  # r06
        "streaming_attribution_join": streaming.streaming_attribution_join,  # r06
        "substring_repeat_ladder": dedup.substring_repeat_ladder,  # r06
        "text_quality": text.text_quality,  # r06
        "tfidf_top_terms": text.tfidf_top_terms,  # r06
        "annotate_renest": views_layer.annotate_renest,  # r07
        "churned_users": analytics.churned_users,  # r07
        # ---------------- 50-entry scoring cap lands here ----------------
        # -- re-verification rotation: fresh entries, oldest verdict
        # first (r7 cohort remainder, then r8+) --------------------------
        # -- fresh, last scored r7 --
        "corr_value_hour": analytics.corr_value_hour,
        "daily_deciles": rollups.daily_deciles,
        "dedup_editdistance": dedup.dedup_editdistance,
        "gapfill_interp": analytics.gapfill_interp,
        "gapfill_locf": analytics.gapfill_locf,
        "geomean_by_type": rollups.geomean_by_type,
        "histogram_quantile_sketch": sketches.histogram_quantile_sketch,
        "image_ahash_dup": multimodal.image_ahash_dup,
        "json_extract_props": corpus.json_extract_props,
        "linear_trend": analytics.linear_trend,
        "log_pdf_cdf": rollups.log_pdf_cdf,
        "multigrain_stats": analytics.multigrain_stats,
        "multimodal_wav_energy": multimodal.multimodal_wav_energy,
        "multistream_throughput": rollups.multistream_throughput,
        "pmi_cooccur_terms": text.pmi_cooccur_terms,
        "reservoir_sample_per_key": corpus.reservoir_sample_per_key,
        "rfm_features": analytics.rfm_features,
        "rollup_revenue": analytics.rollup_revenue,
        "seasonal_baseline": analytics.seasonal_baseline,
        "sidestream_view": rollups.sidestream_view,
        "skew_salted_daily_users": skew.skew_salted_daily_users,
        "sliding_window_stats": rollups.sliding_window_stats,
        "source_quality_profile": curation.source_quality_profile,
        "static_mapping": transforms.static_mapping,
        "streaming_distinct_keys": streaming.streaming_distinct_keys,
        "substring_dup_spans": dedup.substring_dup_spans,
        "switch_utilization": rollups.switch_utilization,
        "tiered_views": view_families.tiered_views,
        "top_clients_per_type": sessions.top_clients_per_type,
        # -- fresh, last scored r8 --
        "autojoin_tiered_counts": view_families.autojoin_tiered_counts,
        "cross_source_dup_leakage": corpus.cross_source_dup_leakage,
        "dedup_best_per_user": rollups.dedup_best_per_user,
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh,
        "dedup_minhash_portable": dedup.dedup_minhash_portable,
        "dsir_importance_weights": curation.dsir_importance_weights,
        "fn_geomean_download_complete": lambda s, d: table_functions.metric_geomean( s, d, direction="download", fleet="complete" ),
        "fn_pdf_upload_2021": lambda s, d: table_functions.metric_pdf( s, d, direction="upload", fleet="2021" ),
        "hourly_rollup": rollups.hourly_rollup,
        "length_filter_sweep": curation.length_filter_sweep,
        "new_vs_returning": analytics.new_vs_returning,
        "restore_unique_docs": corpus.restore_unique_docs,
        "streaming_hopping_counts": streaming.streaming_hopping_counts,
        "streaming_hourly_counts": streaming.streaming_hourly_counts,
        "streaming_topk_keys": streaming.streaming_topk_keys,
        "unified_view_events": views_layer.unified_view,
        "unigram_lm_pieces": text.unigram_lm_pieces,
        "user_transition_matrix": analytics.user_transition_matrix,
        "weighted_sample_ares": corpus.weighted_sample_ares,
        "zscore_outliers": analytics.zscore_outliers,
        # -- fresh, last scored r9 --
        "ann_bruteforce_topk": similarity.ann_bruteforce_topk,
        "ann_ivf_topk": similarity.ann_ivf_topk,
        "ann_lsh_topk": similarity.ann_lsh_topk,
        "centroid_per_label": corpus.centroid_per_label,
        "curation_pipeline": curation.curation_pipeline,
        "embedding_domain_profile": similarity.embedding_domain_profile,
        "embedding_quantize": similarity.embedding_quantize,
        "epoch_shuffle": corpus.epoch_shuffle,
        "hll_distinct_estimate": sketches.hll_distinct_estimate,
        "ivf_recall_eval": similarity.ivf_recall_eval,
        "jl_projection": similarity.jl_projection,
        "kmeans_clusters": similarity.kmeans_clusters,
        "knn_classify": similarity.knn_classify,
        "ndcg_eval": similarity.ndcg_eval,
        "pii_scrub": text.pii_scrub,
        "q10_returned_items": relational.q10_returned_items,
        "q11_important_stock": relational_ext.q11_important_stock,
        "q13_customer_distribution": relational_ext.q13_customer_distribution,
        "q14_promo_revenue": relational.q14_promo_revenue,
        "q15_top_supplier": relational_ext.q15_top_supplier,
        "q19_disjunctive_predicate": relational.q19_disjunctive_predicate,
        "q1_pricing_summary": relational.q1_pricing_summary,
        "q2_min_cost_supplier": relational.q2_min_cost_supplier,
        "q3_shipping_priority": relational.q3_shipping_priority,
        "q4_order_priority": relational.q4_order_priority,
        "q5_local_supplier": relational.q5_local_supplier,
        "q6_forecast_revenue": relational.q6_forecast_revenue,
        "q7_volume_shipping": relational.q7_volume_shipping,
        "q8_market_share": relational.q8_market_share,
        "q9_product_type_profit": relational_ext.q9_product_type_profit,
        "quality_expectation_report": quality.expectation_report,
        "range_interval_join": rangejoin.range_interval_join,
        "repeat_profile_automaton": dedup.repeat_profile_automaton,
        "retention_cohorts": analytics.retention_cohorts,
        "rolling_active_users": rollups.rolling_active_users,
        "vocab_coverage": text.vocab_coverage,
        "wildcard_union": rollups.wildcard_union,
        # -- fresh, last scored r10 --
        "ann_pq_topk": similarity.ann_pq_topk,
        "asof_attribution": asof.asof_attribution,
        "asof_nearest": asof.asof_nearest,
        "bm25_retrieval": text.bm25_retrieval,
        "boundary_templates": dedup.boundary_templates,
        "bpe_merge_candidates": text.bpe_merge_candidates,
        "centroid_shift_drift": similarity.centroid_shift_drift,
        "code_detect": text.code_detect,
        "concurrency_peak": sessions.concurrency_peak,
        "cross_source_overlap": corpus.cross_source_overlap,
        "dedup_exact": dedup.dedup_exact,
        "doc_fingerprint": text.doc_fingerprint,
        "embedding_cosine_dup": similarity.embedding_cosine_dup,
        "embedding_decontaminate": similarity.embedding_decontaminate,
        "funnel_conversion": analytics.funnel_conversion,
        "gopher_quality_flags": curation.gopher_quality_flags,
        "joined_view_template": view_families.joined_view_template,
        "kmv_distinct_estimate": sketches.kmv_distinct_estimate,
        "lm_domain_perplexity": curation.lm_domain_perplexity,
        "mix_epoch_plan": packing.mix_epoch_plan,
        "pii_risk_profile": text.pii_risk_profile,
        "pivot_event_counts": analytics.pivot_event_counts,
        "q16_parts_supplier": relational_ext.q16_parts_supplier,
        "q17_small_quantity": relational_ext.q17_small_quantity,
        "q18_big_orders": transforms.q18_big_orders,
        "q20_potential_promotion": relational_ext.q20_potential_promotion,
        "q21_suppliers_kept_waiting": relational_ext.q21_suppliers_kept_waiting,
        "q22_inactive_customers": transforms.q22_inactive_customers,
        "quality_logreg_score": curation.quality_logreg_score,
        "quality_score_calibration": curation.quality_score_calibration,
        "raw_view_events": views_layer.raw_view,
        "simhash_fingerprint": dedup.simhash_fingerprint,
        "streaming_ingest_restore": streaming.streaming_ingest_restore,
        "token_count": text.token_count,
        "trailing_window_view": view_families.trailing_window_view,
        # -- fresh, last scored r11 --
        "audio_vad_segments": multimodal.audio_vad_segments,
        "bigram_surprisal": text.bigram_surprisal,
        "bloom_membership": sketches.bloom_membership,
        "canonical_pick": corpus.canonical_pick,
        "chunk_dedup": packing.chunk_dedup,
        "cms_frequency_estimate": sketches.cms_frequency_estimate,
        "daily_modal_event": analytics.daily_modal_event,
        "dataset_card": corpus.dataset_card,
        "decontaminate_ngram_overlap": curation.decontaminate_ngram_overlap,
        "doc_chunks": packing.doc_chunks,
        "doc_entropy": text.doc_entropy,
        "domain_mix_weights": packing.domain_mix_weights,
        "doremi_excess_reweight": curation.doremi_excess_reweight,
        "extended_view_events": views_layer.extended_view,
        "hashing_trick_features": text.hashing_trick_features,
        "hll_daily_merge": sketches.hll_daily_merge,
        "interval_coverage": sessions.interval_coverage,
        "kmv_set_ops": sketches.kmv_set_ops,
        "langid_heuristic": text.langid_heuristic,
        "late_arrival_audit": analytics.late_arrival_audit,
        "multimodal_bmp_meta": multimodal.multimodal_bmp_meta,
        "multimodal_decode_ppm": multimodal.multimodal_decode_ppm,
        "multimodal_frame_sample": multimodal.multimodal_frame_sample,
        "ngram_novelty_score": curation.ngram_novelty_score,
        "running_totals": sessions.running_totals,
        "scd2_history": analytics.scd2_history,
        "session_top_paths": sessions.session_top_paths,
        "sessionized_events": sessions.sessionized_events,
        "streaming_ewma_flags": streaming.streaming_ewma_flags,
        "streaming_session_windows": streaming.streaming_session_windows,
        "time_weighted_value": analytics.time_weighted_value,
        "token_count_bpe": text.token_count_bpe,
        "tokenizer_fertility": text.tokenizer_fertility,
        "topk_drift_weekly": drift.topk_drift_weekly,
        "windowed_funnel": analytics.windowed_funnel,
        "winnowing_fingerprint": dedup.winnowing_fingerprint,
        "zipf_term_stats": corpus.zipf_term_stats,
        # -- fresh, last scored r10 --
        "cross_lang_contamination": curation.cross_lang_contamination,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "incremental_neardup": dedup.incremental_neardup_oracle(),
        "ingest_front_door": dedup.ingest_front_door_oracle(),
        "streaming_neardup": streaming.streaming_neardup_oracle(),
        "streaming_ingest_front_door": (
            streaming.streaming_ingest_front_door_oracle()
        ),
        "streaming_rule_drift_gate": streaming.streaming_rule_drift_gate_oracle(),
        "ann_graph_expand_eval": similarity.ann_graph_expand_eval_oracle(),
        "pack_fill_audit": packing.pack_fill_audit_oracle(),
        "quality_rule_drift": drift.quality_rule_drift_oracle(),
        "streaming_incremental_dedup": streaming.streaming_incremental_dedup_oracle(),
        "centroid_shift_drift": similarity.centroid_shift_drift_oracle(),
        "dedup_aware_split": graph.dedup_aware_split_oracle(),
        "doc_length_drift": drift.doc_length_drift_oracle(),
        "doremi_excess_reweight": curation.doremi_excess_reweight_oracle(),
        "key_skew_profile": skew.key_skew_profile_oracle(),
        "near_dup_keep_plan": graph.near_dup_keep_plan_oracle(),
        "pii_risk_profile": text.pii_risk_profile_oracle(),
        "quality_score_calibration": curation.quality_score_calibration_oracle(),
        "streaming_ingest_restore": streaming.streaming_ingest_restore_oracle(),
        "ccnet_source_split": curation.ccnet_source_split_oracle(),
        "psi_value_drift": drift.psi_value_drift_oracle(),
        "topk_drift_weekly": drift.topk_drift_weekly_oracle(),
        "embedding_domain_profile": similarity.embedding_domain_profile_oracle(),
        "ivf_recall_eval": similarity.ivf_recall_eval_oracle(),
        "label_balance_sample": similarity.label_balance_sample_oracle(),
        "lm_domain_perplexity": curation.lm_domain_perplexity_oracle(),
        "quality_expectation_report": quality.expectation_report_oracle(),
        "streaming_quality_gated_publish": streaming.streaming_quality_gated_publish_oracle(),
        "substring_repeat_ladder": dedup.substring_repeat_ladder_oracle(),
        "ann_pq_topk": similarity.ann_pq_topk_oracle(),
        "streaming_hourly_counts": streaming.streaming_hourly_counts_oracle(),
        "streaming_session_windows": streaming.streaming_session_windows_oracle(),
        "quality_logreg_score": curation.quality_logreg_score_oracle(),
        "embedding_decontaminate": similarity.embedding_decontaminate_oracle(),
        "mix_epoch_plan": packing.mix_epoch_plan_oracle(),
        "dup_cluster_stats": graph.dup_cluster_stats_oracle(),
        "skew_salted_daily_users": skew.skew_salted_daily_users_oracle(),
        "bpe_merge_candidates": text.bpe_merge_candidates_oracle(),
        "user_transition_matrix": analytics.user_transition_matrix_oracle(),
        "session_top_paths": sessions.session_top_paths_oracle(),
        "streaming_distinct_keys": streaming.streaming_distinct_keys_oracle(),
        "substring_dup_spans": dedup.substring_dup_spans_oracle(),
        "streaming_hopping_counts": streaming.streaming_hopping_counts_oracle(),
        "streaming_attribution_join": streaming.streaming_attribution_join_oracle(),
        "image_ahash_dup": multimodal.image_ahash_dup_oracle(),
        "audio_vad_segments": multimodal.audio_vad_segments_oracle(),
        "minhash_jaccard_estimate": dedup.minhash_jaccard_estimate_oracle(),
        "raw_view_events": views_layer.raw_view_oracle(),
        "extended_view_events": views_layer.extended_view_oracle(),
        "unified_view_events": views_layer.unified_view_oracle(),
        "annotate_renest": views_layer.annotate_renest_oracle(),
        "dedup_best_per_user": rollups.dedup_best_per_user_oracle(),
        "hourly_rollup": rollups.hourly_rollup_oracle(),
        "daily_deciles": rollups.daily_deciles_oracle(),
        "log_pdf_cdf": rollups.log_pdf_cdf_oracle(),
        "geomean_by_type": rollups.geomean_by_type_oracle(),
        "switch_utilization": rollups.switch_utilization_oracle(),
        "sidestream_view": rollups.sidestream_view_oracle(),
        "wildcard_union": rollups.wildcard_union_oracle(),
        "multistream_throughput": rollups.multistream_throughput_oracle(),
        "fn_pdf_upload_2021": table_functions.metric_pdf_oracle(
            direction="upload", fleet="2021"
        ),
        "fn_geomean_download_complete": table_functions.metric_geomean_oracle(
            direction="download", fleet="complete"
        ),
        "source_quality_profile": curation.source_quality_profile_oracle(),
        "tokenizer_fertility": text.tokenizer_fertility_oracle(),
        "pmi_cooccur_terms": text.pmi_cooccur_terms_oracle(),
        "interval_coverage": sessions.interval_coverage_oracle(),
        "reservoir_sample_per_key": corpus.reservoir_sample_per_key_oracle(),
        "restore_unique_docs": corpus.restore_unique_docs_oracle(),
        "repeat_profile_automaton": dedup.repeat_profile_automaton_oracle(),
        "unigram_lm_pieces": text.unigram_lm_pieces_oracle(),
        "dsir_importance_weights": curation.dsir_importance_weights_oracle(),
        "cross_source_dup_leakage": corpus.cross_source_dup_leakage_oracle(),
        "length_filter_sweep": curation.length_filter_sweep_oracle(),
        "trimmed_mean_value": analytics.trimmed_mean_value_oracle(),
        "weighted_sample_ares": corpus.weighted_sample_ares_oracle(),
        "lsh_tuning_curve": dedup.lsh_tuning_curve_oracle(),
        "mad_outliers": analytics.mad_outliers_oracle(),
        "boundary_templates": dedup.boundary_templates_oracle(),
        "perplexity_buckets": text.perplexity_buckets_oracle(),
        "semdedup_clusters": similarity.semdedup_clusters_oracle(),
        "doc_entropy": text.doc_entropy_oracle(),
        "ngram_novelty_score": curation.ngram_novelty_score_oracle(),
        "cross_lang_contamination": curation.cross_lang_contamination_oracle(),
        "tail_latency_percentiles": analytics.tail_latency_percentiles_oracle(),
        "user_activity_gini": analytics.user_activity_gini_oracle(),
        "embedding_outliers": similarity.embedding_outliers_oracle(),
        "dedup_impact_curve": dedup.dedup_impact_curve_oracle(),
        "streaming_ewma_flags": streaming.streaming_ewma_flags_oracle(),
        "bm25_retrieval": text.bm25_retrieval_oracle(),
        "pack_efficiency_sweep": packing.pack_efficiency_sweep_oracle(),
        "hll_daily_merge": sketches.hll_daily_merge_oracle(),
        "new_vs_returning": analytics.new_vs_returning_oracle(),
        "windowed_funnel": analytics.windowed_funnel_oracle(),
        "daily_modal_event": analytics.daily_modal_event_oracle(),
        "concurrency_peak": sessions.concurrency_peak_oracle(),
        "asof_nearest": asof.asof_nearest_oracle(),
        "dataset_card": corpus.dataset_card_oracle(),
        "winnowing_fingerprint": dedup.winnowing_fingerprint_oracle(),
        "dup_pagerank": graph.dup_pagerank_oracle(),
        "triplet_mining": similarity.triplet_mining_oracle(),
        "streaming_topk_keys": streaming.streaming_topk_keys_oracle(),
        "gapfill_interp": analytics.gapfill_interp_oracle(),
        "template_communities": graph.template_communities_oracle(),
        "ndcg_eval": similarity.ndcg_eval_oracle(),
        "code_detect": text.code_detect_oracle(),
        "hashing_trick_features": text.hashing_trick_features_oracle(),
        "containment_dup": dedup.containment_dup_oracle(),
        "scd2_history": analytics.scd2_history_oracle(),
        "rfm_features": analytics.rfm_features_oracle(),
        "jl_projection": similarity.jl_projection_oracle(),
        "minhash_pr_eval": dedup.minhash_pr_eval_oracle(),
        "late_arrival_audit": analytics.late_arrival_audit_oracle(),
        "vocab_growth_curve": corpus.vocab_growth_curve_oracle(),
        "q1_pricing_summary": relational.q1_oracle(),
        "q3_shipping_priority": relational.q3_oracle(),
        "q5_local_supplier": relational.q5_oracle(),
        "q2_min_cost_supplier": relational.q2_oracle(),
        "q4_order_priority": relational.q4_oracle(),
        "q8_market_share": relational.q8_oracle(),
        "q6_forecast_revenue": relational.q6_oracle(),
        "q7_volume_shipping": relational.q7_oracle(),
        "q10_returned_items": relational.q10_oracle(),
        "q14_promo_revenue": relational.q14_oracle(),
        "q19_disjunctive_predicate": relational.q19_oracle(),
        "q9_product_type_profit": relational_ext.q9_oracle(),
        "q11_important_stock": relational_ext.q11_oracle(),
        "cms_frequency_estimate": sketches.cms_frequency_estimate_oracle(),
        "kmv_set_ops": sketches.kmv_set_ops_oracle(),
        "hll_distinct_estimate": sketches.hll_distinct_estimate_oracle(),
        "cross_source_overlap": corpus.cross_source_overlap_oracle(),
        "vocab_coverage": text.vocab_coverage_oracle(),
        "seasonal_baseline": analytics.seasonal_baseline_oracle(),
        "decontaminate_ngram_overlap": curation.decontaminate_ngram_overlap_oracle(),
        "repetition_stats": curation.repetition_stats_oracle(),
        "gopher_quality_flags": curation.gopher_quality_flags_oracle(),
        "pack_sequences": packing.pack_sequences_oracle(),
        "doc_chunks": packing.doc_chunks_oracle(),
        "chunk_dedup": packing.chunk_dedup_oracle(),
        "domain_mix_weights": packing.domain_mix_weights_oracle(),
        "embedding_quantize": similarity.embedding_quantize_oracle(),
        "multigrain_stats": analytics.multigrain_stats_oracle(),
        "incremental_dedup": dedup.incremental_dedup_oracle(),
        "gapfill_locf": analytics.gapfill_locf_oracle(),
        "multimodal_decode_ppm": multimodal.multimodal_decode_ppm_oracle(),
        "multimodal_bmp_meta": multimodal.multimodal_bmp_meta_oracle(),
        "tiered_views": view_families.tiered_views_oracle(),
        "autojoin_tiered_counts": view_families.autojoin_tiered_counts_oracle(),
        "trailing_window_view": view_families.trailing_window_view_oracle(),
        "joined_view_template": view_families.joined_view_template_oracle(),
        "q12_shipmode": relational_ext.q12_oracle(),
        "q13_customer_distribution": relational_ext.q13_oracle(),
        "q15_top_supplier": relational_ext.q15_oracle(),
        "q16_parts_supplier": relational_ext.q16_oracle(),
        "q17_small_quantity": relational_ext.q17_oracle(),
        "q20_potential_promotion": relational_ext.q20_oracle(),
        "q21_suppliers_kept_waiting": relational_ext.q21_oracle(),
        "static_mapping": transforms.static_mapping_oracle(),
        "q18_big_orders": transforms.q18_oracle(),
        "q22_inactive_customers": transforms.q22_oracle(),
        "asof_attribution": asof.asof_attribution_oracle(),
        "rollup_revenue": analytics.rollup_revenue_oracle(),
        "pivot_event_counts": analytics.pivot_event_counts_oracle(),
        "corr_value_hour": analytics.corr_value_hour_oracle(),
        "funnel_conversion": analytics.funnel_conversion_oracle(),
        "time_weighted_value": analytics.time_weighted_value_oracle(),
        "churned_users": analytics.churned_users_oracle(),
        "sessionized_events": sessions.sessionized_events_oracle(),
        "running_totals": sessions.running_totals_oracle(),
        "top_clients_per_type": sessions.top_clients_per_type_oracle(),
        "range_interval_join": rangejoin.range_interval_join_oracle(),
        "dedup_minhash_portable": dedup.dedup_minhash_portable_oracle(),
        "histogram_quantile_sketch": sketches.histogram_quantile_sketch_oracle(),
        "pii_scrub": text.pii_scrub_oracle(),
        "epoch_shuffle": corpus.epoch_shuffle_oracle(),
        "sliding_window_stats": rollups.sliding_window_stats_oracle(),
        "source_token_budget": corpus.source_token_budget_oracle(),
        "zscore_outliers": analytics.zscore_outliers_oracle(),
        "rolling_active_users": rollups.rolling_active_users_oracle(),
        "retention_cohorts": analytics.retention_cohorts_oracle(),
        "bloom_membership": sketches.bloom_membership_oracle(),
        "linear_trend": analytics.linear_trend_oracle(),
        "multimodal_wav_energy": multimodal.multimodal_wav_energy_oracle(),
        "curation_pipeline": curation.curation_pipeline_oracle(),
        "dedup_exact": dedup.dedup_exact_oracle(),
        "dedup_ngram_jaccard": dedup.dedup_ngram_jaccard_oracle(),
        "dedup_editdistance": dedup.dedup_editdistance_oracle(),
        "dup_components": graph.dup_components_oracle(),
        "kmv_distinct_estimate": sketches.kmv_distinct_estimate_oracle(),
        # dedup_minhash_lsh: self-consistency oracle since r5 — the
        # verified pair set re-derived through the portable md5 family at
        # the same banding (see dedup.dedup_minhash_lsh_oracle docstring)
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh_oracle(),
        "simhash_fingerprint": dedup.simhash_fingerprint_oracle(),
        "doc_fingerprint": text.doc_fingerprint_oracle(),
        "token_count": text.token_count_oracle(),
        "token_count_bpe": text.token_count_bpe_oracle(),
        "text_quality": text.text_quality_oracle(),
        "langid_heuristic": text.langid_heuristic_oracle(),
        "tfidf_top_terms": text.tfidf_top_terms_oracle(),
        "bigram_surprisal": text.bigram_surprisal_oracle(),
        "ann_bruteforce_topk": similarity.ann_bruteforce_topk_oracle(),
        "embedding_cosine_dup": similarity.embedding_cosine_dup_oracle(),
        # ann_ivf upgraded from rows-only in round 2: decimal-exact codebook
        # means make the probe and in-bucket ranking bit-portable
        "ann_ivf_topk": similarity.ann_ivf_topk_oracle(),
        "ann_lsh_topk": similarity.ann_lsh_topk_oracle(),
        "knn_classify": similarity.knn_classify_oracle(),
        # kmeans upgraded from rows-only in round 2: decimal-exact centroid
        # means + exact inertia sums make every round bit-portable, so the
        # oracle unrolls the fixed Lloyd rounds as CTEs
        "kmeans_clusters": similarity.kmeans_clusters_oracle(),
        "multimodal_meta": multimodal.multimodal_meta_oracle(),
        "multimodal_frame_sample": multimodal.multimodal_frame_sample_oracle(),
        "multimodal_resize": multimodal.multimodal_resize_oracle(),
        "json_extract_props": corpus.json_extract_props_oracle(),
        "stratified_sample": corpus.stratified_sample_oracle(),
        "zipf_term_stats": corpus.zipf_term_stats_oracle(),
        "centroid_per_label": corpus.centroid_per_label_oracle(),
        "canonical_pick": corpus.canonical_pick_oracle(),
    }
