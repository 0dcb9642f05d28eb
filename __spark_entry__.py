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
from etl_schema_spark import streaming
from etl_schema_spark.operators import (
    analytics,
    asof,
    corpus,
    curation,
    dedup,
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
        # -- group 1: OWN function (or oracle twin) changed since the
        # entry's last green verdict — result-affecting, must re-score
        # (two-level AST fingerprint, tools/verdict_freshness.py). The
        # r7 rotation: the wave-5 central finite-value contract (18
        # events.value consumers), the wave-6 NULL-key/payload domain
        # contracts, the wave-7 multibyte fixes (wav/vad int16 recenter,
        # byte-true oracles, ASCII levenshtein domain), the
        # substring_dup_spans linear-Arrow rewrite + pmi pair-domain cap
        # (the two r6 scale-killers), the LSH bucket-occupancy cap, the
        # cachereg pin-registry lifecycle sweep, and the wave-10
        # empty-partition observed-rows contract (rollup_revenue,
        # multigrain_stats: oracle HAVING COUNT(*) > 0 pins Spark's
        # zero-rows-on-zero-input rollup semantics) -------------------
        "annotate_renest": views_layer.annotate_renest,
        "audio_vad_segments": multimodal.audio_vad_segments,
        "churned_users": analytics.churned_users,
        "corr_value_hour": analytics.corr_value_hour,
        "dedup_editdistance": dedup.dedup_editdistance,
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh,
        "dedup_minhash_portable": dedup.dedup_minhash_portable,
        "dedup_ngram_jaccard": dedup.dedup_ngram_jaccard,
        "embedding_cosine_dup": similarity.embedding_cosine_dup,
        "embedding_decontaminate": similarity.embedding_decontaminate,
        "gapfill_interp": analytics.gapfill_interp,
        "gapfill_locf": analytics.gapfill_locf,
        "histogram_quantile_sketch": sketches.histogram_quantile_sketch,
        "image_ahash_dup": multimodal.image_ahash_dup,
        "json_extract_props": corpus.json_extract_props,
        "linear_trend": analytics.linear_trend,
        "mad_outliers": analytics.mad_outliers,
        "minhash_jaccard_estimate": dedup.minhash_jaccard_estimate,
        "minhash_pr_eval": dedup.minhash_pr_eval,
        "multigrain_stats": analytics.multigrain_stats,
        "multimodal_wav_energy": multimodal.multimodal_wav_energy,
        "multistream_throughput": rollups.multistream_throughput,
        "pack_efficiency_sweep": packing.pack_efficiency_sweep,
        "pack_sequences": packing.pack_sequences,
        "pmi_cooccur_terms": text.pmi_cooccur_terms,
        "reservoir_sample_per_key": corpus.reservoir_sample_per_key,
        "rfm_features": analytics.rfm_features,
        "rollup_revenue": analytics.rollup_revenue,
        "running_totals": sessions.running_totals,
        "seasonal_baseline": analytics.seasonal_baseline,
        "sessionized_events": sessions.sessionized_events,
        "sidestream_view": rollups.sidestream_view,
        "skew_salted_daily_users": skew.skew_salted_daily_users,
        "sliding_window_stats": rollups.sliding_window_stats,
        "source_quality_profile": curation.source_quality_profile,
        "source_token_budget": corpus.source_token_budget,
        "static_mapping": transforms.static_mapping,
        "streaming_ewma_flags": streaming.streaming_ewma_flags,
        "streaming_topk_keys": streaming.streaming_topk_keys,
        "substring_dup_spans": dedup.substring_dup_spans,
        "switch_utilization": rollups.switch_utilization,
        "top_clients_per_type": sessions.top_clients_per_type,
        "zscore_outliers": analytics.zscore_outliers,
        # -- group 2: a transitively-referenced helper changed since the
        # entry's verdict (result-neutral per the local gate + edge
        # fuzz); these 7 include every r6-deferred entry still
        # helper-stale — the r6 allowlist retires scored, not exempted --
        "curation_pipeline": curation.curation_pipeline,
        "daily_deciles": rollups.daily_deciles,
        "geomean_by_type": rollups.geomean_by_type,
        "log_pdf_cdf": rollups.log_pdf_cdf,
        "streaming_distinct_keys": streaming.streaming_distinct_keys,
        "streaming_hopping_counts": streaming.streaming_hopping_counts,
        "tiered_views": view_families.tiered_views,
        # ---------------- 50-entry scoring cap lands here ----------------
        # deferred helper-only entries lead the r8 rotation (window
        # holds 50 = 43 own-changed + 7 helper-changed; the
        # embedding_cosine_dup occupancy cap displaced hourly_rollup,
        # the embedding_decontaminate witness/eval-bucket caps displaced
        # autojoin_tiered_counts, and the wave-10 observed-rows oracle
        # contract (rollup_revenue, multigrain_stats own-changed)
        # displaced dedup_best_per_user + unified_view_events). Each
        # deferral keeps newly-scored in-window owners of the SAME
        # change class: fn_pdf/fn_geomean are thin parameterizations of
        # log_pdf_cdf/geomean_by_type (in-window); streaming
        # hourly/session share the drain helper with
        # distinct_keys/hopping_counts (in-window); the dup-graph
        # family consumes dedup pair frames whose producers
        # (ngram_jaccard, jaccard_estimate, dup_spans) are in-window
        # own-changed; time_weighted_value shares the _vdec contract
        # with 17 in-window wave-5 owners; the extended_view /
        # _EXTENDED_SQL helper class (hourly_rollup, dedup_best_per_user,
        # unified_view_events) keeps 3 in-window owners (daily_deciles,
        # geomean_by_type, log_pdf_cdf); autojoin_tiered_counts' helper
        # class (_kval_sql) keeps tiered_views in-window. Pinned in
        # tests/test_plan_audit.py -------------------------------------
        "autojoin_tiered_counts": view_families.autojoin_tiered_counts,
        "dedup_best_per_user": rollups.dedup_best_per_user,
        "dedup_impact_curve": dedup.dedup_impact_curve,
        "dup_cluster_stats": graph.dup_cluster_stats,
        "dup_components": graph.dup_components,
        "dup_pagerank": graph.dup_pagerank,
        "fn_geomean_download_complete": lambda s, d: table_functions.metric_geomean( s, d, direction="download", fleet="complete" ),
        "fn_pdf_upload_2021": lambda s, d: table_functions.metric_pdf( s, d, direction="upload", fleet="2021" ),
        "hourly_rollup": rollups.hourly_rollup,
        "streaming_hourly_counts": streaming.streaming_hourly_counts,
        "streaming_session_windows": streaming.streaming_session_windows,
        "time_weighted_value": analytics.time_weighted_value,
        "unified_view_events": views_layer.unified_view,
        # -- re-verification rotation: fresh entries, oldest verdict
        # first ---------------------------------------------------------
        # fresh, last scored r3 --
        "epoch_shuffle": corpus.epoch_shuffle,
        "hll_distinct_estimate": sketches.hll_distinct_estimate,
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
        "range_interval_join": rangejoin.range_interval_join,
        "retention_cohorts": analytics.retention_cohorts,
        "rolling_active_users": rollups.rolling_active_users,
        "vocab_coverage": text.vocab_coverage,
        "wildcard_union": rollups.wildcard_union,
        # fresh, last scored r4 --
        "asof_attribution": asof.asof_attribution,
        "bpe_merge_candidates": text.bpe_merge_candidates,
        "cross_source_overlap": corpus.cross_source_overlap,
        "dedup_exact": dedup.dedup_exact,
        "doc_fingerprint": text.doc_fingerprint,
        "funnel_conversion": analytics.funnel_conversion,
        "joined_view_template": view_families.joined_view_template,
        "kmv_distinct_estimate": sketches.kmv_distinct_estimate,
        "mix_epoch_plan": packing.mix_epoch_plan,
        "pivot_event_counts": analytics.pivot_event_counts,
        "q16_parts_supplier": relational_ext.q16_parts_supplier,
        "q17_small_quantity": relational_ext.q17_small_quantity,
        "q18_big_orders": transforms.q18_big_orders,
        "q20_potential_promotion": relational_ext.q20_potential_promotion,
        "q21_suppliers_kept_waiting": relational_ext.q21_suppliers_kept_waiting,
        "q22_inactive_customers": transforms.q22_inactive_customers,
        "quality_logreg_score": curation.quality_logreg_score,
        "raw_view_events": views_layer.raw_view,
        "session_top_paths": sessions.session_top_paths,
        "simhash_fingerprint": dedup.simhash_fingerprint,
        "token_count": text.token_count,
        "trailing_window_view": view_families.trailing_window_view,
        "user_transition_matrix": analytics.user_transition_matrix,
        # fresh, last scored r5 --
        "asof_nearest": asof.asof_nearest,
        "bm25_retrieval": text.bm25_retrieval,
        "boundary_templates": dedup.boundary_templates,
        "code_detect": text.code_detect,
        "concurrency_peak": sessions.concurrency_peak,
        "containment_dup": dedup.containment_dup,
        "cross_lang_contamination": curation.cross_lang_contamination,
        "daily_modal_event": analytics.daily_modal_event,
        "dataset_card": corpus.dataset_card,
        "hashing_trick_features": text.hashing_trick_features,
        "hll_daily_merge": sketches.hll_daily_merge,
        "interval_coverage": sessions.interval_coverage,
        "langid_heuristic": text.langid_heuristic,
        "late_arrival_audit": analytics.late_arrival_audit,
        "new_vs_returning": analytics.new_vs_returning,
        "ngram_novelty_score": curation.ngram_novelty_score,
        "scd2_history": analytics.scd2_history,
        "template_communities": graph.template_communities,
        "token_count_bpe": text.token_count_bpe,
        "tokenizer_fertility": text.tokenizer_fertility,
        "user_activity_gini": analytics.user_activity_gini,
        "windowed_funnel": analytics.windowed_funnel,
        "winnowing_fingerprint": dedup.winnowing_fingerprint,
        "zipf_term_stats": corpus.zipf_term_stats,
        # fresh, last scored r6 --
        "ann_bruteforce_topk": similarity.ann_bruteforce_topk,
        "ann_ivf_topk": similarity.ann_ivf_topk,
        "ann_lsh_topk": similarity.ann_lsh_topk,
        "ann_pq_topk": similarity.ann_pq_topk,
        "bigram_surprisal": text.bigram_surprisal,
        "bloom_membership": sketches.bloom_membership,
        "canonical_pick": corpus.canonical_pick,
        "centroid_per_label": corpus.centroid_per_label,
        "chunk_dedup": packing.chunk_dedup,
        "cms_frequency_estimate": sketches.cms_frequency_estimate,
        "decontaminate_ngram_overlap": curation.decontaminate_ngram_overlap,
        "doc_chunks": packing.doc_chunks,
        "doc_entropy": text.doc_entropy,
        "domain_mix_weights": packing.domain_mix_weights,
        "embedding_outliers": similarity.embedding_outliers,
        "embedding_quantize": similarity.embedding_quantize,
        "extended_view_events": views_layer.extended_view,
        "gopher_quality_flags": curation.gopher_quality_flags,
        "incremental_dedup": dedup.incremental_dedup,
        "jl_projection": similarity.jl_projection,
        "kmeans_clusters": similarity.kmeans_clusters,
        "kmv_set_ops": sketches.kmv_set_ops,
        "knn_classify": similarity.knn_classify,
        "multimodal_bmp_meta": multimodal.multimodal_bmp_meta,
        "multimodal_decode_ppm": multimodal.multimodal_decode_ppm,
        "multimodal_frame_sample": multimodal.multimodal_frame_sample,
        "multimodal_meta": multimodal.multimodal_meta,
        "multimodal_resize": multimodal.multimodal_resize,
        "ndcg_eval": similarity.ndcg_eval,
        "perplexity_buckets": text.perplexity_buckets,
        "q12_shipmode": relational_ext.q12_shipmode,
        "repetition_stats": curation.repetition_stats,
        "semdedup_clusters": similarity.semdedup_clusters,
        "stratified_sample": corpus.stratified_sample,
        "streaming_attribution_join": streaming.streaming_attribution_join,
        "substring_repeat_ladder": dedup.substring_repeat_ladder,
        "tail_latency_percentiles": analytics.tail_latency_percentiles,
        "text_quality": text.text_quality,
        "tfidf_top_terms": text.tfidf_top_terms,
        "triplet_mining": similarity.triplet_mining,
        "vocab_growth_curve": corpus.vocab_growth_curve,
    }


def oracle_sql() -> dict[str, str]:
    return {
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
