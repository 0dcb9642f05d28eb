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
    #   2. entries whose implementation changed since their last verdict,
    #   3. everything else, OLDEST verdict first (re-verification rotation).
    # When adding an operator, insert it in group 1 — an entry appended at
    # the tail will NOT be scored this round.
    return {
        # -- group 1: new round-4 operators (no driver verdict yet) -------
        "streaming_hourly_counts": streaming.streaming_hourly_counts,
        "streaming_session_windows": streaming.streaming_session_windows,
        "quality_logreg_score": curation.quality_logreg_score,
        "embedding_decontaminate": similarity.embedding_decontaminate,
        "mix_epoch_plan": packing.mix_epoch_plan,
        "dup_cluster_stats": graph.dup_cluster_stats,
        "skew_salted_daily_users": skew.skew_salted_daily_users,
        "bpe_merge_candidates": text.bpe_merge_candidates,
        "user_transition_matrix": analytics.user_transition_matrix,
        "session_top_paths": sessions.session_top_paths,
        "streaming_distinct_keys": streaming.streaming_distinct_keys,
        "substring_dup_spans": dedup.substring_dup_spans,
        "streaming_hopping_counts": streaming.streaming_hopping_counts,
        "streaming_attribution_join": streaming.streaming_attribution_join,
        # -- group 2: implementation changed since last verdict ----------
        # (cross_source_overlap: totals pairing rebuilt join-free in r4 to
        # clear the no-nested-loop plan audit)
        "cross_source_overlap": corpus.cross_source_overlap,
        # -- group 2 (cont.): the events *read path* changed in r4 (scan
        # yields TIMESTAMP directly, NTZ inference off) — re-stamp three
        # representative events readers against the new path
        "raw_view_events": views_layer.raw_view,
        "unified_view_events": views_layer.unified_view,
        "hourly_rollup": rollups.hourly_rollup,
        # -- group 3: oldest (round-1) verdicts — all predate the events
        #    testdata regeneration, so they rotate in first ----------------
        "q16_parts_supplier": relational_ext.q16_parts_supplier,
        "q17_small_quantity": relational_ext.q17_small_quantity,
        "q20_potential_promotion": relational_ext.q20_potential_promotion,
        "q21_suppliers_kept_waiting": relational_ext.q21_suppliers_kept_waiting,
        "static_mapping": transforms.static_mapping,
        "q18_big_orders": transforms.q18_big_orders,
        "q22_inactive_customers": transforms.q22_inactive_customers,
        "asof_attribution": asof.asof_attribution,
        "rollup_revenue": analytics.rollup_revenue,
        "corr_value_hour": analytics.corr_value_hour,
        "funnel_conversion": analytics.funnel_conversion,
        "churned_users": analytics.churned_users,
        "running_totals": sessions.running_totals,
        "top_clients_per_type": sessions.top_clients_per_type,
        # -- group 3 (cont.): round-2 verdicts, events readers first ------
        "sessionized_events": sessions.sessionized_events,
        "time_weighted_value": analytics.time_weighted_value,
        "pivot_event_counts": analytics.pivot_event_counts,
        "tiered_views": view_families.tiered_views,
        "trailing_window_view": view_families.trailing_window_view,
        "joined_view_template": view_families.joined_view_template,
        "dedup_exact": dedup.dedup_exact,
        "dedup_ngram_jaccard": dedup.dedup_ngram_jaccard,
        "dedup_editdistance": dedup.dedup_editdistance,
        "dup_components": graph.dup_components,
        "kmv_distinct_estimate": sketches.kmv_distinct_estimate,
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh,  # rows-only
        "simhash_fingerprint": dedup.simhash_fingerprint,
        "doc_fingerprint": text.doc_fingerprint,
        "token_count": text.token_count,
        "token_count_bpe": text.token_count_bpe,
        "text_quality": text.text_quality,
        "langid_heuristic": text.langid_heuristic,
        "tfidf_top_terms": text.tfidf_top_terms,
        "bigram_surprisal": text.bigram_surprisal,
        "ann_bruteforce_topk": similarity.ann_bruteforce_topk,
        "embedding_cosine_dup": similarity.embedding_cosine_dup,
        "ann_ivf_topk": similarity.ann_ivf_topk,
        "ann_lsh_topk": similarity.ann_lsh_topk,
        "knn_classify": similarity.knn_classify,
        "kmeans_clusters": similarity.kmeans_clusters,
        "multimodal_meta": multimodal.multimodal_meta,
        "multimodal_frame_sample": multimodal.multimodal_frame_sample,
        "multimodal_resize": multimodal.multimodal_resize,
        "json_extract_props": corpus.json_extract_props,
        "stratified_sample": corpus.stratified_sample,
        "zipf_term_stats": corpus.zipf_term_stats,
        # ---------------- 50-entry scoring cap lands here ----------------
        # -- group 3 (cont.): remaining round-2 verdicts ------------------
        "centroid_per_label": corpus.centroid_per_label,
        "canonical_pick": corpus.canonical_pick,
        "q12_shipmode": relational_ext.q12_shipmode,
        "multimodal_decode_ppm": multimodal.multimodal_decode_ppm,
        "multimodal_bmp_meta": multimodal.multimodal_bmp_meta,
        "cms_frequency_estimate": sketches.cms_frequency_estimate,
        "kmv_set_ops": sketches.kmv_set_ops,
        "decontaminate_ngram_overlap": curation.decontaminate_ngram_overlap,
        "repetition_stats": curation.repetition_stats,
        "gopher_quality_flags": curation.gopher_quality_flags,
        "doc_chunks": packing.doc_chunks,
        "chunk_dedup": packing.chunk_dedup,
        "domain_mix_weights": packing.domain_mix_weights,
        "embedding_quantize": similarity.embedding_quantize,
        "multigrain_stats": analytics.multigrain_stats,
        "incremental_dedup": dedup.incremental_dedup,
        "gapfill_locf": analytics.gapfill_locf,
        # -- group 3 (cont.): round-3 verdicts (newest, rotate last) ------
        "range_interval_join": rangejoin.range_interval_join,
        "dedup_minhash_portable": dedup.dedup_minhash_portable,
        "histogram_quantile_sketch": sketches.histogram_quantile_sketch,
        "pii_scrub": text.pii_scrub,
        "epoch_shuffle": corpus.epoch_shuffle,
        "sliding_window_stats": rollups.sliding_window_stats,
        "source_token_budget": corpus.source_token_budget,
        "zscore_outliers": analytics.zscore_outliers,
        "rolling_active_users": rollups.rolling_active_users,
        "retention_cohorts": analytics.retention_cohorts,
        "bloom_membership": sketches.bloom_membership,
        "linear_trend": analytics.linear_trend,
        "multimodal_wav_energy": multimodal.multimodal_wav_energy,
        "curation_pipeline": curation.curation_pipeline,
        "autojoin_tiered_counts": view_families.autojoin_tiered_counts,
        "hll_distinct_estimate": sketches.hll_distinct_estimate,
        "vocab_coverage": text.vocab_coverage,
        "seasonal_baseline": analytics.seasonal_baseline,
        "pack_sequences": packing.pack_sequences,
        "extended_view_events": views_layer.extended_view,
        "annotate_renest": views_layer.annotate_renest,
        "dedup_best_per_user": rollups.dedup_best_per_user,
        "daily_deciles": rollups.daily_deciles,
        "log_pdf_cdf": rollups.log_pdf_cdf,
        "geomean_by_type": rollups.geomean_by_type,
        "switch_utilization": rollups.switch_utilization,
        "sidestream_view": rollups.sidestream_view,
        "wildcard_union": rollups.wildcard_union,
        "multistream_throughput": rollups.multistream_throughput,
        "fn_pdf_upload_2021": lambda s, d: table_functions.metric_pdf(
            s, d, direction="upload", fleet="2021"
        ),
        "fn_geomean_download_complete": lambda s, d: table_functions.metric_geomean(
            s, d, direction="download", fleet="complete"
        ),
        "q1_pricing_summary": relational.q1_pricing_summary,
        "q3_shipping_priority": relational.q3_shipping_priority,
        "q5_local_supplier": relational.q5_local_supplier,
        "q2_min_cost_supplier": relational.q2_min_cost_supplier,
        "q4_order_priority": relational.q4_order_priority,
        "q8_market_share": relational.q8_market_share,
        "q6_forecast_revenue": relational.q6_forecast_revenue,
        "q7_volume_shipping": relational.q7_volume_shipping,
        "q10_returned_items": relational.q10_returned_items,
        "q14_promo_revenue": relational.q14_promo_revenue,
        "q19_disjunctive_predicate": relational.q19_disjunctive_predicate,
        "q9_product_type_profit": relational_ext.q9_product_type_profit,
        "q11_important_stock": relational_ext.q11_important_stock,
        "q13_customer_distribution": relational_ext.q13_customer_distribution,
        "q15_top_supplier": relational_ext.q15_top_supplier,
    }


def oracle_sql() -> dict[str, str]:
    return {
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
        # dedup_minhash_lsh: rows-only (hash family not SQL-portable)
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
