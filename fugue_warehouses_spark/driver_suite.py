"""Driver-facing query registry: 50-slot curated coverage.

The correctness driver records rows for (at most) the FIRST 50 entries
of ``__spark_entry__.queries()``. The facet-level registry
(queries.py) is larger than that, so this module curates what the
driver sees: the headline operators keep their own full-row-hash
slots, and every remaining facet is folded into a family "suite"
query whose single driver row checksums ALL member results.

A suite row is ``(facet, n_rows, sig)`` per member query, where

- ``n_rows``  = the member's full result cardinality, and
- ``sig``     = an order-independent sum over result rows of
  ``md5(canonical_row) mod 1e9+7`` — the same value-hash idea the
  driver itself applies, computed identically by Spark and by the
  DuckDB oracle twin.

``canonical_row`` renders every output column to a byte-identical
string on both engines: integers/booleans via BIGINT, strings as-is,
doubles as ``round(round(x, 6) * 1e6)`` micro-units (rounding FIRST at
6 decimals — the registry-wide comparison granularity — makes the
subsequent scale-to-integer bit-deterministic on both engines; NaN and
±Inf get literal sentinels), NULLs as a sentinel. So a suite row is a
near-full-strength content check of the member query — not a row
count: any changed value in any member row moves ``sig``.

Membership is exhaustive by construction: tests/test_driver_suite.py
asserts every facet-registry query is either a driver keep or a member
of exactly one suite, and that the driver registry fits the 50-row
window. The two inherently nondeterministic natives
(orders_sample_fraction, orders_approx_distinct) are represented by
their deterministic twins (orders_sample_hash_fraction,
orders_approx_distinct_check) and stay pytest-checked themselves.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fugue_warehouses_spark.queries import ORACLE, QUERIES, QueryFn

_MOD = 1_000_000_007
_NULL = "<N>"

# facet -> ((column, kind), ...); kind: i=integer-exact, f=double
# (6-dp canonical), s=string. Generated from the queries' output
# schemas; test_driver_suite.py re-derives and cross-checks this.
SPEC: dict[str, tuple[tuple[str, str], ...]] = {
    "anti_customers_without_orders": (("c_custkey", "i"), ("c_name", "s"), ("c_mktsegment", "s"),),
    "cube_lineitem_flags": (("l_returnflag", "s"), ("l_linestatus", "s"), ("n", "i"), ("qty", "f"),),
    "customer_balance_upsert": (("action", "s"), ("n", "i"), ("total_bal", "f"),),
    "doc_bigram_lift": (("bigram", "s"), ("n_pair", "i"), ("lift", "f"),),
    "doc_bigram_logprob": (("source", "s"), ("n_docs", "i"), ("avg_logprob", "f"), ("min_logprob", "f"), ("max_logprob", "f"),),
    "doc_bpe_token_budget": (("source", "s"), ("est_tokens", "i"), ("n_docs", "i"),),
    "doc_curriculum_schedule": (("schedule_pos", "i"), ("bucket", "i"), ("doc_id", "i"), ("quality", "f"),),
    "doc_cdc_dedup": (("source", "s"), ("n_chunks", "i"), ("n_distinct_chunks", "i"), ("total_chunk_chars", "i"), ("distinct_chunk_chars", "i"),),
    "doc_incremental_dedup": (("doc_id", "i"), ("source", "s"),),
    "doc_retrieval_eval": (("query", "s"), ("mrr", "f"), ("ndcg", "f"), ("best_at_k", "f"), ("max_rel", "i"), ("n_matched", "i"),),
    "doc_bpe_train": (("step", "i"), ("pair", "s"), ("pair_freq", "i"),),
    "doc_bpe_encode": (("source", "s"), ("n_docs", "i"), ("total_ws_tokens", "i"), ("total_bpe_tokens", "i"), ("bpe_per_word", "f"),),
    "embedding_decontaminate": (("vec_id", "i"), ("label", "i"), ("nearest_benchmark", "i"), ("max_sim", "f"),),
    "doc_datacard_diff": (("source", "s"), ("n_old", "i"), ("n_new", "i"), ("old_tokens", "i"), ("new_tokens", "i"), ("n_dup_vs_old", "i"), ("dup_tokens_vs_old", "i"), ("n_dup_within_new", "i"), ("n_novel_fp", "i"), ("novel_ratio", "f"),),
    "doc_incremental_dedup_bloom": (("doc_id", "i"), ("source", "s"),),
    "doc_incremental_dedup_bloom_persisted": (("doc_id", "i"), ("source", "s"),),
    "doc_incremental_near_dedup": (("id_new", "i"), ("id_match", "i"), ("jaccard_sim", "f"),),
    "doc_incremental_near_dedup_persisted": (("id_new", "i"), ("id_match", "i"), ("jaccard_sim", "f"),),
    "doc_near_dup_signature_estimate": (("id_new", "i"), ("id_match", "i"), ("est_sim", "f"),),
    "doc_export_manifest": (("shard", "i"), ("n_rows", "i"), ("id_checksum", "i"),),
    "doc_webdataset_export": (("shard", "i"), ("n_members", "i"), ("total_bytes", "i"), ("id_checksum", "i"),),
    "orders_profile": (("column", "s"), ("dtype", "s"), ("n_rows", "i"), ("n_null", "i"), ("n_distinct", "i"), ("min_num", "f"), ("max_num", "f"), ("min_str", "s"), ("max_str", "s"),),
    "doc_chunks": (("doc_id", "i"), ("chunk_idx", "i"), ("chunk_md5", "s"), ("n_tokens", "i"),),
    "doc_context_windows": (("doc_id", "i"), ("win_idx", "i"), ("n_tokens", "i"), ("win_md5", "s"),),
    "events_variant_props": (("event_type", "s"), ("n", "i"), ("sum_k", "i"), ("max_k", "i"),),
    "doc_clean_normalize": (("source", "s"), ("n_docs", "i"), ("clean_chars", "i"), ("distinct_cleaned", "i"),),
    "doc_contamination": (("source", "s"), ("n_docs", "i"), ("n_contaminated", "i"),),
    "doc_decontaminate_spans": (("doc_id", "i"), ("source", "s"), ("n_tokens", "i"), ("removed_tokens", "i"), ("clean_md5", "s"),),
    "doc_near_dedup_canonical": (("doc_id", "i"), ("source", "s"), ("cluster_size", "i"),),
    "doc_dup_cluster_sizes": (("cluster_size", "i"), ("n_clusters", "i"), ("n_docs", "i"), ("dropped_tokens", "i"),),
    "doc_token_balanced_shards": (("shard", "i"), ("n_docs", "i"), ("shard_tokens", "i"), ("id_checksum", "i"),),
    "doc_corpus_datacard": (("source", "s"), ("n_docs", "i"), ("total_tokens", "i"), ("n_langs", "i"), ("top_lang", "s"), ("top_lang_tokens", "i"), ("top_lang_token_share", "f"), ("n_exact_dup_docs", "i"), ("distinct_fps", "i"), ("p50_tokens", "f"), ("p90_tokens", "f"), ("p99_tokens", "f"),),
    "doc_alpha_mixture": (("lang", "s"), ("n_docs", "i"), ("id_sum", "i"),),
    "orders_kmv_set_ops": (("op", "s"), ("est_distinct", "i"), ("sample_size", "i"), ("theta", "i"),),
    "events_sliding_distinct_users": (("bucket", "i"), ("est_distinct", "i"), ("sketch_size", "i"), ("kth_min_hash", "i"),),
    "doc_domain_mixture": (("lang", "s"), ("n_docs", "i"), ("id_sum", "i"),),
    "doc_lang_confusion": (("lang_label", "s"), ("lang_pred", "s"), ("n", "i"),),
    "doc_pack_sequences": (("source", "s"), ("seq_id", "i"), ("n_docs", "i"), ("seq_tokens", "i"), ("first_doc", "i"),),
    "doc_pii_redaction": (("source", "s"), ("n_docs", "i"), ("emails_redacted", "i"), ("phones_redacted", "i"), ("redacted_chars", "i"), ("chars_removed", "i"),),
    "doc_quality_by_source": (("source", "s"), ("avg_quality", "f"),),
    "doc_quality_token_budget": (("source", "s"), ("n_docs", "i"), ("sel_tokens", "i"),),
    "doc_quality_logit": (("source", "s"), ("n_docs", "i"), ("n_pass", "i"), ("avg_prob", "f"),),
    "doc_repetition_filter": (("source", "s"), ("n_docs", "i"), ("n_flagged", "i"), ("avg_dup_frac", "f"), ("avg_top_frac", "f"),),
    "doc_dsir_select": (("doc_id", "i"), ("source", "s"), ("dsir_logw", "f"), ("sel_key", "f"),),
    "doc_dsir_select_bigram": (("doc_id", "i"), ("source", "s"), ("dsir_logw", "f"), ("sel_key", "f"),),
    "doc_stratified_sample": (("lang", "s"), ("doc_id", "i"),),
    "doc_epoch_shuffle": (("epoch", "i"), ("position", "i"), ("doc_id", "i"),),
    "doc_token_stats": (("lang", "s"), ("n_docs", "i"), ("total_tokens", "i"), ("avg_tokens", "f"), ("avg_chars", "f"),),
    "doc_top_tokens": (("token", "s"), ("n", "i"),),
    "doc_train_test_split": (("split", "s"), ("lang", "s"), ("n_docs", "i"), ("total_chars", "i"),),
    "doc_training_pipeline": (("source", "s"), ("n_docs", "i"), ("est_tokens", "i"),),
    "doc_unigram_surprisal": (("source", "s"), ("n_docs", "i"), ("avg_surprisal", "f"), ("min_surprisal", "f"), ("max_surprisal", "f"),),
    "dropna_events": (("event_id", "i"), ("v", "f"),),
    "embedding_norms_by_label": (("label", "i"), ("n", "i"), ("avg_norm", "f"),),
    "embedding_outliers": (("label", "i"), ("n_vecs", "i"), ("n_outliers", "i"), ("avg_cos_centroid", "f"),),
    "doc_tfidf_keywords": (("source", "s"), ("token", "s"), ("tf", "i"), ("score", "f"),),
    "doc_hybrid_search": (("doc_id", "i"), ("rrf_score", "f"), ("r_lex", "i"), ("r_sem", "i"),),
    "embedding_ivf_persisted_topk": (("query_id", "i"), ("match_id", "i"), ("cosine_sim", "f"),),
    "embedding_incremental_dedup": (("vec_id", "i"), ("label", "i"),),
    "embedding_incremental_dedup_indexed": (("vec_id", "i"), ("label", "i"),),
    "embedding_semantic_dedup": (("label", "i"), ("n_vecs", "i"), ("n_kept", "i"), ("n_dropped", "i"),),
    "events_ewma": (("user_id", "i"), ("n_events", "i"), ("ewma_value", "f"),),
    "events_anomaly_mad": (("user_id", "i"), ("n_values", "i"), ("n_anomalies", "i"), ("median_value", "f"), ("mad_value", "f"),),
    "events_cms_user_counts": (("user_id", "i"), ("est_count", "i"),),
    "events_cohort_retention": (("cohort", "s"), ("day_offset", "i"), ("active_users", "i"),),
    "events_first_per_user_type": (("user_id", "i"), ("event_type", "s"), ("event_id", "i"), ("ts_str", "s"),),
    "events_funnel_stages": (("stage", "i"), ("n_users", "i"),),
    "events_gapfill_5m": (("user_id", "i"), ("bucket_5m", "i"), ("n_events", "i"), ("locf_sum", "f"),),
    "events_hourly_stats": (("hour", "s"), ("event_type", "s"), ("n", "i"), ("total_value", "f"),),
    "events_impute_value": (("user_id", "i"), ("n_events", "i"), ("n_imputed", "i"), ("total_imputed", "f"),),
    "events_in_error_hours": (("window_start", "s"), ("n_events", "i"), ("total_value", "f"),),
    "events_json_props": (("k_bucket", "i"), ("n", "i"), ("avg_value", "f"),),
    "events_props_map": (("key", "s"), ("n", "i"), ("total", "i"),),
    "events_rollup_cascade": (("grain", "s"), ("bucket_start_us", "i"), ("n_events", "i"), ("sum_value", "f"),),
    "events_running_totals": (("user_id", "i"), ("n_events", "i"), ("total_value", "f"),),
    "events_session_windows": (("user_id", "i"), ("session_start", "s"), ("session_end", "s"), ("n", "i"), ("total_value", "f"),),
    "events_sliding_30m_15m": (("window_start", "s"), ("n", "i"), ("total_value", "f"),),
    "events_tumbling_15m": (("window_start", "s"), ("event_type", "s"), ("n", "i"), ("total_value", "f"),),
    "except_non_machinery": (("c_custkey", "i"),),
    "fillna_low_values": (("event_id", "i"), ("value_clean", "f"),),
    "intersect_segment_buyers": (("c_custkey", "i"),),
    "lineitem_bag_setops": (("op", "s"), ("n", "i"),),
    "lineitem_weighted_discount": (("l_returnflag", "s"), ("wavg_disc", "f"), ("n", "i"),),
    "lineitem_grouping_sets": (("rf", "s"), ("ls", "s"), ("gid", "i"), ("n", "i"), ("qty", "f"),),
    "lineitem_percentiles": (("l_returnflag", "s"), ("p50", "f"), ("p90", "f"), ("p99", "f"),),
    "lineitem_stats_suite": (("l_returnflag", "s"), ("n", "i"), ("qty_price_corr", "f"), ("qty_price_covar", "f"), ("qty_disc_covar_pop", "f"), ("price_stddev", "f"), ("qty_stddev_pop", "f"), ("disc_var", "f"), ("qty_median", "f"),),
    "lineitem_unpivot_charges": (("l_returnflag", "s"), ("measure", "s"), ("amount", "f"),),
    "lineitem_winsorized": (("l_returnflag", "s"), ("n", "i"), ("n_clipped_low", "i"), ("n_clipped_high", "i"), ("mean_raw", "f"), ("mean_winsorized", "f"),),
    "multimodal_audio_features": (("id", "i"), ("sample_rate", "i"), ("n_samples", "i"), ("n_frames", "i"), ("sumsq", "i"), ("zero_crossings", "i"), ("peak", "i"), ("max_frame_sumsq", "i"), ("n_bytes", "i"),),
    "multimodal_audio_segments": (("id", "i"), ("seg_idx", "i"), ("start_frame", "i"), ("end_frame", "i"), ("n_frames", "i"), ("seg_sumsq", "i"), ("seg_peak", "i"),),
    "nation_customer_roster": (("nation", "s"), ("roster", "s"), ("n_customers", "i"),),
    "orders_approx_distinct": (("approx_custkeys", "i"), ("n_orders", "i"),),
    "orders_approx_distinct_check": (("o_orderstatus", "s"), ("exact_custkeys", "i"), ("approx_within_5pct", "i"),),
    "orders_calendar_heatmap": (("dow_idx", "i"), ("week_idx", "i"), ("n_orders", "i"), ("total", "f"),),
    "orders_interval_arithmetic": (("due_month", "s"), ("n", "i"),),
    "orders_kmv_distinct": (("est_distinct", "i"), ("sketch_size", "i"), ("kth_min_hash", "i"),),
    "orders_kmv_rollup": (("scope", "s"), ("est_distinct", "i"), ("sketch_size", "i"), ("kth_min_hash", "i"),),
    "orders_moving_avg": (("o_custkey", "i"), ("o_orderkey", "i"), ("ma4", "f"),),
    "orders_price_histogram": (("bucket", "i"), ("n", "i"), ("total", "f"), ("cum_share", "f"),),
    "orders_priority_pivot": (("o_year", "i"), ("urgent", "f"), ("high", "f"), ("medium", "f"), ("other", "f"),),
    "orders_recursive_month_spine": (("month", "s"), ("n_orders", "i"), ("total", "f"),),
    "orders_sample_hash_fraction": (("o_orderkey", "i"), ("o_custkey", "i"), ("o_totalprice", "f"),),
    "orders_snapshot_diff": (("change_type", "s"), ("n", "i"), ("key_sum", "i"), ("price_delta", "f"),),
    "events_scd2_user_state": (("user_id", "i"), ("state", "s"), ("valid_from", "s"), ("valid_to", "s"), ("n_obs", "i"), ("is_current", "i"),),
    "events_latest_state": (("user_id", "i"), ("event_id", "i"), ("event_type", "s"), ("ts_str", "s"), ("value", "f"),),
    "events_time_weighted_avg": (("user_id", "i"), ("n_events", "i"), ("twa", "f"),),
    "orders_equidepth_histogram": (("bucket", "i"), ("n", "i"), ("lo", "f"), ("hi", "f"), ("total", "f"),),
    "orders_equidepth_histogram_approx": (("bucket", "i"), ("n", "i"), ("lo", "f"), ("hi", "f"), ("total", "f"),),
    "embedding_matryoshka_topk": (("query_id", "i"), ("match_id", "i"), ("cosine_sim", "f"),),
    "orders_sample_n_exact": (("n", "i"),),
    "orders_scalar_subquery": (("o_orderkey", "i"), ("o_totalprice", "f"), ("n_items", "i"),),
    "orders_status_islands": (("o_custkey", "i"), ("o_orderstatus", "s"), ("n_runs", "i"), ("longest_run", "i"), ("first_run_start", "i"),),
    "orders_trailing_90d_avg": (("o_orderkey", "i"), ("avg_90d", "f"),),
    "orders_weighted_sample": (("o_orderkey", "i"), ("o_totalprice", "f"),),
    "orders_window_suite": (("o_custkey", "i"), ("o_orderkey", "i"), ("order_day", "s"), ("prev_price", "f"), ("next_price", "f"), ("rk", "i"), ("drk", "i"), ("prk", "f"), ("cd", "f"), ("quartile", "i"), ("first_key", "i"), ("last_key", "i"),),
    "q10_returned_items": (("c_custkey", "i"), ("c_name", "s"), ("revenue", "f"), ("n_name", "s"),),
    "q11_important_parts": (("l_partkey", "i"), ("part_value", "f"),),
    "q12_priority_class_by_status": (("l_linestatus", "s"), ("high_line_count", "i"), ("low_line_count", "i"),),
    "q13_order_count_distribution": (("c_count", "i"), ("custdist", "i"),),
    "q14_promo_revenue_ratio": (("promo_revenue_pct", "f"),),
    "q15_top_supplier": (("s_suppkey", "i"), ("s_name", "s"), ("total_revenue", "f"),),
    "q16_supplier_part_counts": (("p_brand", "s"), ("p_type", "s"), ("p_size", "i"), ("supplier_cnt", "i"),),
    "q17_small_quantity_revenue": (("avg_yearly", "f"),),
    "q18_large_volume_orders": (("o_orderkey", "i"), ("o_totalprice", "f"), ("total_qty", "f"),),
    "q19_disjunctive_predicates": (("revenue", "f"),),
    "q20_excess_supply_suppliers": (("s_name", "s"), ("n_name", "s"),),
    "q21_waiting_suppliers": (("s_name", "s"), ("numwait", "i"),),
    "q22_lapsed_customers": (("cntrycode", "i"), ("numcust", "i"), ("totacctbal", "f"),),
    "q2_min_cost_supplier": (("p_partkey", "i"), ("p_name", "s"), ("s_name", "s"), ("s_acctbal", "f"), ("n_name", "s"),),
    "q4_priority_late_ships": (("o_orderpriority", "s"), ("order_count", "i"),),
    "q5_local_supplier_volume": (("n_name", "s"), ("revenue", "f"),),
    "q6_revenue_forecast": (("revenue", "f"), ("n_items", "i"),),
    "q7_nation_volume": (("supp_nation", "s"), ("cust_nation", "s"), ("l_year", "i"), ("revenue", "f"),),
    "q8_market_share": (("o_year", "i"), ("mkt_share", "f"),),
    "q9_profit_by_nation": (("nation", "s"), ("o_year", "i"), ("profit", "f"),),
    "rollup_order_stats": (("o_orderstatus", "s"), ("o_orderpriority", "s"), ("n_orders", "i"), ("total_price", "f"),),
    "salted_join_revenue": (("o_orderpriority", "s"), ("revenue", "f"),),
    "semi_customers_with_orders": (("c_custkey", "i"), ("c_name", "s"), ("c_mktsegment", "s"),),
    "star_quality_checks": (("rule", "s"), ("violations", "i"),),
    "take_nulls_first_events": (("event_type", "s"), ("event_id", "i"), ("value", "f"),),
    "take_top2_per_order": (("l_orderkey", "i"), ("l_linenumber", "i"), ("l_extendedprice", "f"),),
    "union_high_value_keys": (("c_custkey", "i"),),
}

# ---------------------------------------------------------------------
# suite membership
# ---------------------------------------------------------------------

SUITES: dict[str, tuple[str, ...]] = {
    # reference TPC-H-style core: joins, grouped aggs, subqueries
    "tpch_suite_a": (
        "q2_min_cost_supplier", "q4_priority_late_ships",
        "q5_local_supplier_volume", "q6_revenue_forecast",
        "q7_nation_volume", "q8_market_share",
    ),
    "tpch_suite_b": (
        "q9_profit_by_nation", "q10_returned_items",
        "q11_important_parts", "q12_priority_class_by_status",
        "q13_order_count_distribution", "q14_promo_revenue_ratio",
    ),
    "tpch_suite_c": (
        "q15_top_supplier", "q16_supplier_part_counts",
        "q17_small_quantity_revenue", "q18_large_volume_orders",
        "q19_disjunctive_predicates", "q20_excess_supply_suppliers",
        "q21_waiting_suppliers", "q22_lapsed_customers",
        "orders_scalar_subquery",
    ),
    # B5-B7 set semantics incl. bag variants + semi/anti (A10)
    "setops_suite": (
        "union_high_value_keys", "intersect_segment_buyers",
        "except_non_machinery", "lineitem_bag_setops",
        "semi_customers_with_orders", "anti_customers_without_orders",
    ),
    # B8/B9
    "null_handling_suite": ("fillna_low_values", "dropna_events"),
    # B11 grouping extensions
    "grouping_suite": (
        "rollup_order_stats", "cube_lineitem_flags",
        "lineitem_grouping_sets", "lineitem_weighted_discount",
    ),
    # §2.C window-function surface (rank/lag/rolling/range/islands)
    "window_functions_suite": (
        "orders_window_suite", "orders_moving_avg",
        "orders_trailing_90d_avg", "events_first_per_user_type",
        "orders_status_islands", "events_running_totals",
    ),
    # §2.C SQL surface: pivot/unpivot, intervals, listagg, JSON, maps,
    # approx aggregates, recursive CTE
    "sql_surface_suite": (
        "orders_priority_pivot", "lineitem_unpivot_charges",
        "orders_interval_arithmetic", "nation_customer_roster",
        "events_json_props", "events_props_map",
        "orders_approx_distinct_check", "orders_recursive_month_spine",
        "events_variant_props",
    ),
    # hypertable family: bucketing, gapfill/LOCF, imputation, anomaly,
    # rollup cascade
    "events_timeseries_suite": (
        "events_hourly_stats", "events_in_error_hours",
        "events_gapfill_5m", "events_impute_value",
        "events_anomaly_mad", "events_rollup_cascade", "events_ewma",
        "events_time_weighted_avg",
    ),
    # §2.D batch twins of the streaming window shapes
    "streaming_window_shapes": (
        "events_tumbling_15m", "events_sliding_30m_15m",
        "events_session_windows",
    ),
    # text analysis family
    "doc_text_analysis_suite": (
        "doc_token_stats", "doc_bpe_token_budget", "doc_bpe_train",
        "doc_bpe_encode", "doc_top_tokens",
        "doc_bigram_lift", "doc_unigram_surprisal", "doc_lang_confusion",
        "doc_tfidf_keywords", "doc_hybrid_search", "doc_retrieval_eval",
    ),
    # corpus-quality family
    "doc_quality_suite": (
        "doc_quality_by_source", "doc_repetition_filter",
        "doc_pii_redaction", "doc_clean_normalize",
        "doc_quality_logit", "doc_bigram_logprob",
    ),
    # end-to-end pipeline hygiene: packing/chunking/decontamination
    "doc_pipeline_suite": (
        "doc_training_pipeline", "doc_contamination", "doc_corpus_datacard",
        "doc_datacard_diff",
        "doc_train_test_split", "doc_chunks", "doc_cdc_dedup",
        "doc_incremental_dedup", "doc_incremental_dedup_bloom",
        "doc_incremental_dedup_bloom_persisted",
        "doc_incremental_near_dedup",
        "doc_incremental_near_dedup_persisted",
        "doc_near_dup_signature_estimate",
        "doc_context_windows", "doc_webdataset_export",
        "doc_decontaminate_spans", "doc_near_dedup_canonical",
        "doc_dup_cluster_sizes",
    ),
    # A12/A13 + deterministic sampling/mixture family
    "sampling_suite": (
        "orders_sample_n_exact", "orders_sample_hash_fraction",
        "orders_weighted_sample", "doc_stratified_sample",
        "doc_domain_mixture", "doc_alpha_mixture", "doc_pack_sequences",
        "doc_epoch_shuffle", "doc_dsir_select", "doc_dsir_select_bigram",
        "doc_quality_token_budget", "doc_curriculum_schedule",
    ),
    # mergeable sketches
    "sketch_suite": (
        "orders_kmv_distinct", "orders_kmv_rollup",
        "events_cms_user_counts", "orders_kmv_set_ops",
        "events_sliding_distinct_users",
    ),
    # distribution statistics family
    "stats_suite": (
        "lineitem_percentiles", "lineitem_stats_suite",
        "orders_price_histogram", "orders_calendar_heatmap",
        "lineitem_winsorized", "orders_equidepth_histogram",
        "orders_equidepth_histogram_approx",
    ),
    "embedding_misc_suite": (
        "embedding_norms_by_label", "embedding_semantic_dedup",
        "embedding_outliers", "embedding_matryoshka_topk",
        "embedding_ivf_persisted_topk", "embedding_incremental_dedup",
        "embedding_incremental_dedup_indexed", "embedding_decontaminate",
    ),
    # funnel/cohort analytics
    "behavior_suite": ("events_cohort_retention", "events_funnel_stages"),
    # skew-salted join, MERGE upsert, data-quality checks
    "warehouse_ops_suite": (
        "salted_join_revenue", "customer_balance_upsert",
        "star_quality_checks", "doc_export_manifest",
        "doc_token_balanced_shards", "orders_profile",
        "orders_snapshot_diff", "events_scd2_user_state",
        "events_latest_state",
    ),
    # B10 take with presort + NULL position
    "take_suite": ("take_top2_per_order", "take_nulls_first_events"),
    # §2.E audio leg: REAL WAV decode -> integer features / VAD islands
    "multimodal_audio_suite": (
        "multimodal_audio_features", "multimodal_audio_segments",
    ),
}

# queries that keep their own driver slot (full-row hash check)
KEEPS: tuple[str, ...] = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "top_customer_per_nation",
    "sql_on_frames_revenue",
    "transform_charge_stats",
    "cotransform_customer_orders",
    "orders_zscore",
    "alter_columns_casts",
    "events_sessionization",
    "events_asof_last_signup",
    "doc_exact_dedup",
    "doc_ngram_jaccard_pairs",
    "doc_minhash_near_dups",
    "doc_simhash_near_dups",
    "doc_near_dedup_resolved",
    "embedding_topk",
    "embedding_quantized_topk",
    "embedding_similar_pairs",
    "embedding_near_dedup",
    "embedding_lsh_topk",
    "embedding_ivf_topk",
    "embedding_kmeans",
    "multimodal_features",
    "part_pagerank",
    "customer_fuzzy_match",
    "doc_bm25_search",
    "doc_duplicate_spans",
    "embedding_hard_negatives",
)

# natives whose determinism-free semantics are represented by a
# deterministic twin in a suite (and pytest-checked themselves)
TWINNED: dict[str, str] = {
    "orders_sample_fraction": "orders_sample_hash_fraction",
    "orders_approx_distinct": "orders_approx_distinct_check",
}


# ---------------------------------------------------------------------
# canonicalization + checksum
# ---------------------------------------------------------------------


def _canon_spark(col: str, kind: str) -> F.Column:
    c = F.col(col)
    if kind == "i":
        v = c.cast("bigint").cast("string")
    elif kind == "f":
        micro = F.round(F.round(c, 6) * F.lit(1_000_000.0)).cast("bigint")
        v = (
            F.when(F.isnan(c), F.lit("NaN"))
            .when(c == F.lit(float("inf")), F.lit("Inf"))
            .when(c == F.lit(float("-inf")), F.lit("-Inf"))
            .otherwise(micro.cast("string"))
        )
    else:
        v = c.cast("string")
    return F.coalesce(v, F.lit(_NULL))


def _canon_sql(col: str, kind: str) -> str:
    col = f'"{col}"'  # quote: member outputs may use reserved words (column)
    if kind == "i":
        v = f"CAST(CAST({col} AS BIGINT) AS VARCHAR)"
    elif kind == "f":
        micro = f"CAST(round(round({col}, 6) * 1000000.0) AS BIGINT)"
        v = (
            f"CASE WHEN isnan(CAST({col} AS DOUBLE)) THEN 'NaN' "
            f"WHEN isinf(CAST({col} AS DOUBLE)) AND {col} > 0 THEN 'Inf' "
            f"WHEN isinf(CAST({col} AS DOUBLE)) THEN '-Inf' "
            f"ELSE CAST({micro} AS VARCHAR) END"
        )
    else:
        v = f"CAST({col} AS VARCHAR)"
    return f"coalesce({v}, '{_NULL}')"


def facet_checksum(df: DataFrame, facet: str) -> DataFrame:
    """One-row frame (facet, n_rows, sig) checksumming ``df``."""
    spec = SPEC[facet]
    row = F.concat_ws("|", *[_canon_spark(c, k) for c, k in spec])
    h = F.pmod(
        F.conv(F.substring(F.md5(row), 1, 12), 16, 10).cast("bigint"),
        F.lit(_MOD),
    )
    return df.select(h.alias("__h")).agg(
        F.lit(facet).alias("facet"),
        F.count("*").cast("long").alias("n_rows"),
        F.coalesce(F.sum("__h"), F.lit(0)).cast("long").alias("sig"),
    )


def facet_checksum_sql(facet: str) -> str:
    spec = SPEC[facet]
    parts = ", ".join(_canon_sql(c, k) for c, k in spec)
    row = f"concat_ws('|', {parts})"
    h = f"(('0x' || substr(md5({row}), 1, 12))::UBIGINT % {_MOD})"
    return (
        f"SELECT '{facet}' AS facet, count(*)::BIGINT AS n_rows, "
        f"coalesce(sum({h}), 0)::BIGINT AS sig "
        f"FROM ({ORACLE[facet]}) __facet_src"
    )


def _make_suite_fn(members: tuple[str, ...]) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        out = None
        for m in members:
            part = facet_checksum(QUERIES[m](spark, sf_dir), m)
            out = part if out is None else out.unionByName(part)
        return out

    return fn


def suite_oracle_sql(members: tuple[str, ...]) -> str:
    return " UNION ALL ".join(facet_checksum_sql(m) for m in members)


# ---------------------------------------------------------------------
# driver registry assembly
# ---------------------------------------------------------------------


def driver_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for name in KEEPS:
        out[name] = QUERIES[name]
    for suite, members in SUITES.items():
        out[suite] = _make_suite_fn(members)
    return out


def driver_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for name in KEEPS:
        out[name] = ORACLE[name]
    for suite, members in SUITES.items():
        out[suite] = suite_oracle_sql(members)
    return out
