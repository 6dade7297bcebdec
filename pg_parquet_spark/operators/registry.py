"""Central registry merging every query group the engine implements.

The driver's correctness gate iterates this (via __spark_entry__).
Groups register themselves here so adding an operator module doesn't
touch the entry file.

Ordering matters: the driver's per-round correctness run covers a prefix
of the registry (round 1 recorded exactly the first 50 names). GATE_ORDER
front-loads (a) queries that have never received a driver correctness row
and (b) queries whose round-1 hash failed and were fixed, so every
registry entry accumulates ≥1 hard verification across rounds
(VERDICT.md "Next round" #2); long-green queries rotate to the back.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Verification-priority prefix, rotated per round (VERDICT r2 #2: no
#: entry's newest green row should be older than 2 rounds). r6 front,
#: from folding CORRECTNESS_r01..r05: group 0 = the 20 queries NEW in
#: r6 (first-ever driver row takes precedence over freshness); group 1
#: = the 12 entries whose newest green row is still r3 (most stale,
#: lead the rest); group 2 = the 44 r4-green entries (VERDICT r5
#: next-round #2). 20+12+44 = 76 > the 50-query window, so the last 26
#: of group 2 spill past position 50 and MUST lead r7's window (they
#: will be 3 rounds old by then — the unavoidable cost of 20 new
#: queries in one round; r7's rotation pays it down first). The 50
#: r5-verified entries rotate to the back.
GATE_ORDER = [
    # -- group 0: new this round (first-ever driver row needed) -------------
    "q_stream_join",  # r6 new: stream-static enrichment join
    "q_io_partitioned_roundtrip",  # r6 new: hive-partitioned write + pruned read
    "q_stream_stream_join",  # r6 new: watermarked stream-stream interval join
    "q_text_quality_gopher",  # r6 new: Gopher quality-rule filter
    "q_io_zorder_read",  # r6 new: z-order clustered write + 2-D skipping read
    "q_io_merge_upsert",  # r6 new: partition-scoped MERGE upsert
    "q_text_decontaminate",  # r6 new: benchmark n-gram decontamination
    "q_text_c4_clean",  # r6 new: C4 line-level cleaning rules
    "q_stream_sink_partitioned",  # r6 new: foreachBatch partitioned sink
    "q_embed_centroids",  # r6 new: per-label embedding centroids
    "q_io_schema_evolution",  # r6 new: mergeSchema evolving-dataset read
    "q_text_tfidf",  # r6 new: TF-IDF top-terms keyword extraction
    "q_sample_cap_per_source",  # r6 new: deterministic per-group cap
    "q_pipeline_end_to_end",  # r6 new: composed corpus-recipe pipeline
    "q_stream_sliding_window",  # r6 new: overlapping sliding windows
    "q_profile_histogram",  # r6 new: equal-width histogram profiling
    "q_profile_corr",  # r6 new: correlation from exact decimal sums
    "q_feature_winsorize",  # r6 new: exact-percentile winsorization
    "q_skew_salted_agg",  # r6 new: salted two-phase aggregation
    "q_skew_salted_join",  # r6 new: salted replicated join
    # -- group 1: newest green row is r3 (missed both r4 and r5 windows) ----
    "q_join_cross",
    "q_join_left",
    "q_join_semi",
    "q_projection_filter",
    "q_scalar_json",
    "q_scalar_math",
    "q_scalar_string",
    "q_text_lang_id",
    "q_text_token_count",
    "q_topk",
    "q_union_all",
    "q_window_lag_lead",
    # -- group 2: r4-green, rotated to the front per VERDICT r5 #2 ----------
    "q_stream_stateful",
    "q_io_geo_roundtrip",
    "q_io_csv_roundtrip",
    "q_io_match_position",
    "q_io_coercion_read",
    "q_grouping_sets",
    "q_subquery_scalar",
    "q_subquery_in",
    "q_exists_correlated",
    "q_pandas_udf_scalar",
    "q_pandas_udf_grouped_agg",
    "q_python_udtf",
    "q_asof_join",
    "q_sessionize_batch",
    "q_window_ntile_dist",
    "q_window_range_frame",
    "q_scalar_array",
    "q_scalar_map",
    "q_agg_percentile_collect",
    "q_scalar_string_extra",
    "q_scalar_date_arith",
    "q_min_max_by",
    "q_sim_cosine_topk",
    "q_sim_ann_lsh",
    "q_sample_deterministic",
    "q_data_mixture",
    "q_profile_columns",
    "q_multimodal_metadata",
    "q_dedup_simhash",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "q18_large_volume",
    "q22_prospective_customers",
    "q15_top_supplier",
    "q17_small_quantity",
    "q_text_fingerprint_rolling",
    "q1_pricing_summary",
    # window cut is at 50 entries: the 6 below spill to r7's front
    "q3_shipping_priority",
    "q_join_inner_broadcast",
    "q_agg_rollup",
    "q_window_frame",
    "q5_local_supplier_volume",
    "q10_returned_items",
    # -- group 3: r5-green, rotate back (front again in r7/r8) --------------
    "q_io_http_read",
    "q_text_repetition",
    "q_stream_window",
    "q_stream_session",
    "q_stream_dedup",
    "q_sim_ann_pq",
    "q_dedup_winnow",
    "q_dedup_clusters",
    "q_text_entropy",
    "q_text_chunk",
    "q_pack_sequences",
    "q_text_pii_scrub",
    "q21_suppliers_kept_waiting",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q12_shipping_modes",
    "q16_parts_supplier",
    "q20_potential_promotion",
    "q_sim_ann_ivf",
    "q_multimodal_decode",
    "q_funnel",
    "q_io_copy_from_table",
    "q_dedup_ngram_jaccard",
    "q_io_glob_read",
    "q_join_full",
    "q_window_rank",
    "q_dedup_minhash_lsh",
    "q_dedup_embedding_cosine",
    "q_text_features",
    "q_scalar_date",
    "q_io_where_filter",
    "q_io_schema",
    "q_agg_cube",
    "q14_promo_effect",
    "q19_discounted_revenue",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q_agg_distinct",
    "q_agg_filtered",
    "q_case_when",
    "q_dedup_exact",
    "q_dedup_normalized",
    "q_except",
    "q_intersect",
    "q_io_column_stats",
    "q_io_file_metadata",
    "q_io_json_roundtrip",
    "q_io_list",
    "q_join_anti",
]


def _ordered(merged: dict) -> dict:
    rank = {}
    for i, name in enumerate(GATE_ORDER):
        rank.setdefault(name, i)
    names = sorted(merged, key=lambda n: (rank.get(n, len(GATE_ORDER)), n))
    return {n: merged[n] for n in names}


def all_queries() -> dict[str, QueryFn]:
    from pg_parquet_spark.operators import queries as core

    out: dict[str, QueryFn] = {}
    out.update(core.QUERIES)
    for loader in _OPTIONAL:
        try:
            q, _ = loader()
            out.update(q)
        except ImportError:
            continue
    return _ordered(out)


def all_oracles() -> dict[str, str]:
    from pg_parquet_spark.operators import queries as core

    out: dict[str, str] = {}
    out.update(core.ORACLES)
    for loader in _OPTIONAL:
        try:
            _, o = loader()
            out.update(o)
        except ImportError:
            continue
    return _ordered(out)


def _load_io():
    from pg_parquet_spark.operators import io_queries

    return io_queries.QUERIES, io_queries.ORACLES


def _load_pipeline():
    from pg_parquet_spark.operators import pipeline_queries

    return pipeline_queries.QUERIES, pipeline_queries.ORACLES


def _load_advanced():
    from pg_parquet_spark.operators import advanced_queries

    return advanced_queries.QUERIES, advanced_queries.ORACLES


def _load_tpch_extra():
    from pg_parquet_spark.operators import tpch_extra

    return tpch_extra.QUERIES, tpch_extra.ORACLES


_OPTIONAL = [_load_io, _load_pipeline, _load_advanced, _load_tpch_extra]
