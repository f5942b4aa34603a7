"""Regenerate docs/PLANS.md — physical plans of the headline queries at
sf0.1, the evidence artifact for the plan-shape guarantees the engine makes
(pushdown, pruning, broadcast policy, top-k operators).

Run: python scripts/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOW = [
    "flagship_partition_rollup",
    "tpch_q3_shipping_priority",
    "tpch_q6_forecast_revenue",
    "a3_count_validation_join",
    "dedup_minhash_lsh_pairs",
    "knn_bruteforce_topk",
    "ev_sessionization",
    "window_topn_orders_per_customer",
    "tpch_q8_market_share",
    "tpch_q21_waiting_suppliers",
    "ann_lsh_topk",
    "text_contamination_ngram_overlap",
    "ev_funnel_steps",
    "ev_topk_types_per_day",
    "ev_locf_daily_value",
    "doc_chunk_overlap",
    "embedding_quantize_int8",
    "ev_sequence_match",
    "scd2_customer_price_history",
    "asof_join_next_view_after_purchase",
    "dedup_embedding_lsh_pairs",
    "skew_hotkey_salted_agg",
    "skew_hotkey_salted_join",
    "ev_window_funnel_sliding",
    "mm_feature_extract",
    "moving_agg_per_user",
    "entropy_event_type_daily",
    "topk_weighted_sources",
    "grouped_linear_trend_per_user",
    "kmeans_lloyd_clusters",
    "dedup_quality_retained",
    "counter_analytics_per_user",
    "groupingsets_distinct_users",
    "ev_peak_concurrency_hourly",
    "window_ratio_to_report",
    "ann_pq_adc_topk",
    "ev_window_funnel_strict_order",
    "ev_interval_length_sum",
    "weighted_median_price_per_flag",
    "scd2_point_in_time_join",
    "grouped_zscore_per_lang",
    "ch_replacing_final",
    "ch_group_bitmap_weekly_users",
    "ch_any_left_join_first_order",
    "ch_dict_get_nation_name",
    "ch_limit_by_recent",
    "dedup_repeated_spans",
    "dedup_winnowing_fingerprints",
    "dedup_winnowing_pairs",
    "ev_lttb_downsample_daily",
    "window_time_range_1h_per_user",
    "stats_poisson_bootstrap_mean_ci",
    "ev_rfm_segmentation",
    "semdedup_cluster_prune",
    "geo_nearest_anchor",
    "text_blocklist_filter",
    "text_ngram_distance_probe",
    "semdedup_prune_trained",
    "ccnet_bigram_perplexity",
    "dsir_importance_weights",
    "gopher_quality_gate",
    "ch_skew_kurt_pop",
    "ch_bounding_ratio",
    "embedding_hard_negatives",
    "chsql_prewhere_rollup",
    "chsql_array_join_tokens",
    "chsql_with_fill_days",
    "chsql_with_fill_interpolate",
    "dedup_cluster_representatives",
    "split_by_cluster",
    "ml_roc_auc_daily",
    "ml_avg_precision_daily",
    "ml_calibration_bins",
    "ml_langid_prf",
    "ev_segment_overlap_hll",
    # round-8 additions
    "logreg_train_weights",
    "text_bm25_topk",
    "hybrid_rrf_topk",
    "mm_resize",
    "chsql_running_difference",
    "chsql_running_accumulate",
    "logreg_train_bow",
    "bow_quality_retained",
    "mm_audio_resample",
    # round-10 sync (verdict #4): every bench.py HEADLINE query plus the
    # round-9 modality additions — check_evidence.py now fails when a
    # headline query lacks a PLANS.md section, so these lists can't drift.
    "a3_checksum_validation",
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier_volume",
    "text_quality_scores",
    "ev_wau_sliding_7d",
    "dedup_substring_pairs",
    "dedup_substring_retained",
    "dedup_substring_coverage",
    "chsql_delta_sum",
    "mm_video_frame_sample",
    # round-10 additions
    "dedup_substring_incremental_retained",
    "chsql_summap_daily",
    "chsql_minmax_map_weekday",
    "chsql_topk_event_types",
    "chsql_sum_foreach_lineitem",
    "chsql_moving_sum_grouped",
    "chsql_uniq_upto_topk_weighted",
    # round-11 additions: the GROUP BY modifier translation and the
    # count-combinator two-level restructure (entropy = pure
    # HashAggregates; topK+siblings = O(distinct) collect + partial merge)
    "chsql_rollup_status_priority",
    "chsql_totals_bucket",
    "chsql_entropy_event_types",
    "chsql_topk_with_siblings",
    # round-11b: the translator's zip_with/map-HOF wave and the ANY JOIN
    # strictness rewrite (WindowGroupLimit partial before the exchange,
    # join-key filter inferred into the right-side scan)
    "chsql_two_array_hofs",
    "chsql_map_hofs",
    "chsql_any_join_latest_order",
    # round-11c: the constant-memory Bloom decontamination gate — what to
    # look for: the 2048-word filter under BroadcastExchange (probe and
    # final anti-join both map-side), corpus-side exchanges limited to the
    # gram distinct + the hit aggregation
    "text_decontamination_bloom_retained",
    # round-12: count(DISTINCT shared-value) riding the combinator
    # restructure (two-level HashAggregate, no Expand), ROLLUP … WITH
    # TOTALS deduping into native Expand, and the TOTALS+LIMIT two-branch
    # union (LIMITed plain rows + unlimited totals aggregate)
    "chsql_topk_with_uniq",
    "chsql_rollup_with_totals",
    "chsql_totals_limit",
    # round-12b: LIMIT WITH TIES = rank window over the ordered input (a
    # global top-n-with-ties is single-partition by nature — what to look
    # for is the pushed filter and the one final sort, no extra shuffle);
    # -Array combinators = aggregate() lambda folds inside a plain
    # HashAggregate pair, never an explode shuffle
    "chsql_limit_with_ties",
    "chsql_array_combinators",
    # round-13: ternary → CASE (row-local project, pushed scan filter);
    # column matchers (the EXPANSION happens pre-translation — the plan is
    # a plain two-phase HashAggregate over the explicit columns, proof the
    # probe analyzed rather than executed); ANY RIGHT mirror (what to look
    # for: WindowGroupLimit partial on the LEFT input feeding the join);
    # multi-array fold (zip_with structs inside one project — no explode,
    # no extra shuffle); firstSignificantSubdomain (row-local CASE over
    # one split, pushed filter intact)
    "chsql_ternary_bands",
    "chsql_ternary_agg",
    "chsql_column_matchers",
    "chsql_columns_regex",
    "chsql_untuple_agg",
    "chsql_any_right_join_first_order",
    "chsql_multi_array_fold",
    "chsql_first_significant_subdomain",
    # round-14: FROM t FINAL (row_number window dedup — what to look for:
    # map-side WindowGroupLimit PARTIAL before the key exchange, the WHERE
    # pushed into the parquet scan below the window); SAMPLE (the hash
    # range as a row-local Filter inside the scan's stage — no shuffle,
    # no sampling operator); windowFunnel/retention/sequenceMatch (one
    # two-phase ObjectHashAggregate over the entry lists — no join, no
    # explode, no Python); tz date functions (row-local project over a
    # pushed scan); bare ARRAY JOIN (one Generate, header preserved);
    # neighbor type-default (lead window over the pinned order)
    "chsql_final_replacing",
    "chsql_final_versioned_collapsing",
    "chsql_sample",
    "chsql_window_funnel",
    "chsql_retention",
    "chsql_sequence_match",
    "chsql_tz_date_functions",
    "chsql_bare_array_join",
    "chsql_neighbor_type_default",
]

HEADER = """# Physical plans — headline queries at sf0.1

Generated by `python scripts/dump_plans.py`; regenerate after
plan-affecting changes. What to look for: `PushedFilters` / `ReadSchema`
on every scan (pushdown + column pruning), `BroadcastHashJoin` only on
bounded sides, `TakeOrderedAndProject` for global top-k, `WindowGroupLimit`
for per-group top-k, `AdaptiveSparkPlan` wrapping every query.
"""


def main() -> None:
    from clickhousemigrators3_spark.registry import load_all
    from clickhousemigrators3_spark.session import get_spark

    reg = load_all()
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    sf = "/root/testdata/sf0.1"
    parts = [HEADER]
    for name in SHOW:
        df = reg[name].fn(spark, sf)
        plan = df._jdf.queryExecution().explainString(mode)
        parts.append(f"## {name}\n\n```\n{plan.strip()[:4000]}\n```\n")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "PLANS.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
