"""Scaling check: run the headline queries at sf0.001 / sf0.01 / sf0.1 and
report the runtime growth factor per 10x data growth. A well-planned query
grows sublinearly in local mode (fixed per-action overhead amortizes; scans
and shuffles parallelize); anything growing >=10x per decade is flagged —
that's the shape that will not survive a 100 TB cluster.

Usage: python scripts/scaling_check.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import BENCH_EXTRA, HEADLINE, time_query  # noqa: E402
from etl_backend_spark.registry import QUERIES  # noqa: E402
from etl_backend_spark.session import get_spark  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# fourth decade: synthetic sf1 (scripts/make_sf1.py). V2 adds documents
# (per-replica disjoint vocab) and embeddings (per-replica isometry), so the
# dedup/text family extends to sf1 alongside the relational/events queries.
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/etlbs-sf1")
SF1_QUERIES = [
    "ads_search", "agg_sum_group", "join_self_roles", "join_two_hop",
    "agg_relation_count", "window_latest_per_group", "stream_sessionize",
    "join_asof", "tpch_q3_shape", "tpch_q5_shape", "paginate_offset",
    "dedup_exact", "dedup_minhash_lsh", "text_stats", "doc_chunk",
    "seq_pack", "split_assign", "sim_topk_brute", "sim_topk_pandas",
    "dedup_ngram_jaccard", "join_1n_nested", "join_1n_nested_plain",
    "events_user_daily",
    "sim_topk_pq", "multimodal_audio",
    "tpch_q1_shape", "tpch_q4_shape", "tpch_q6_shape", "tpch_q14_shape",
    "tpch_q16_shape", "tpch_q2_shape", "tpch_q7_shape", "tpch_q11_shape",
    "tpch_q15_shape", "tpch_q17_shape", "tpch_q19_shape", "tpch_q22_shape",
    "join_null_skew", "multimodal_video", "events_funnel",
    "events_retention_cohort", "events_gapfill_locf", "events_interp_linear",
    "find_many_dsl", "etl_check_constraints", "multimodal_resize_real",
    "multimodal_png", "multimodal_webp", "events_rollup_cascade", "events_gapfill_locf_bucketed",
    "sample_stratified", "sim_topk_pq_indexed", "tpch_q8_shape",
    "lm_quality_trigram", "dedup_substring_spans", "sim_topk_ivfpq",
    "etl_delete_dv", "text_search_indexed", "tokenize_bpe",
    "tpch_q21_shape", "etl_bloom_pruned_read", "find_many_included",
]

# not in bench.py's HEADLINE but scale-relevant: the dedup/pipeline family
# the round-3 verdict asked to take through the fourth decade, plus the
# bucketed fact-join variants whose whole point is the scaling slope
EXTRA = [
    "corpus_pipeline", "dedup_embedding", "dedup_embedding_multiprobe",
    "contamination_check", "join_two_hop_bucketed", "tpch_q5_bucketed",
    "tpch_q3_bucketed", "join_1n_nested_bucketed", "join_1n_nested_plain",
    "window_latest_per_group_bucketed", "stream_sessionize_bucketed",
    "join_salted", "window_rolling_range", "window_rolling_range_salted",
    # round-5 additions (each also in SF1_QUERIES for the fourth decade)
    "tpch_q4_shape", "tpch_q14_shape", "tpch_q16_shape", "tpch_q2_shape",
    "tpch_q7_shape", "tpch_q11_shape", "tpch_q15_shape", "tpch_q17_shape",
    "tpch_q19_shape", "tpch_q22_shape", "join_null_skew",
    "events_retention_cohort", "events_gapfill_locf",
    "events_gapfill_locf_bucketed", "events_interp_linear",
    "events_rollup_cascade", "find_many_dsl", "etl_check_constraints",
    "multimodal_resize_real", "multimodal_png", "multimodal_webp", "sample_stratified",
    "sim_topk_pq_indexed", "tpch_q8_shape", "tpch_q21_shape",
    "etl_bloom_pruned_read", "etl_delete_dv", "find_many_included", "agg_unpivot",
    "agg_median_exact", "agg_mode_deterministic", "tpch_q9_shape",
    "tpch_q20_shape", "events_outliers_mad", "find_many_nested",
    "doc_keywords_tfidf", "events_value_histogram", "fn_try_arith",
    "corpus_report", "agg_quartiles", "join_asof_tolerance",
    "lm_quality_trigram", "dedup_substring_spans", "sim_topk_ivfpq",
    "text_search_indexed", "tokenize_bpe", "quality_classifier_lr",
    "dedup_graph_triangles", "graph_pagerank", "events_ewma",
    "sentences", "udaf_median_pandas", "agg_cms_heavy_hitters",
    "source_json_variant",
    # round-7 additions
    "semdedup_kmeans", "embedding_pca", "dsir_importance",
    "knn_graph_brute", "knn_graph_lsh", "text_phrase_indexed",
    "bm25_search_indexed", "events_pattern_topk", "events_motif_pairs",
    "events_discord_topk",
    "events_holt_linear", "multimodal_audio_resample", "multimodal_augment",
    "source_mix_temperature", "tokenize_unigram", "text_index_incremental",
    "events_cusum_drift", "sim_index_incremental", "curriculum_order",
    "etl_backfill_day", "agg_kll_quantiles", "agg_theta_setops",
    "featurestore_pit", "events_markov_transitions", "events_ab_lift",
    "data_profile", "subquery_correlated", "orders_item_cf", "recsys_als",
    "quality_compression_ratio", "graph_reachability", "subquery_lateral",
    "source_xml_roundtrip", "pipeline_observed", "join_runtime_filter",
    "fn_sql_udf", "filter_collated",
    # round-8 additions
    "tpch_q9", "tpch_q20", "partsupp_synth", "hybrid_search_rrf",
    "search_rerank_mmr",
    # round-9 additions
    "tpch_q2", "tpch_q11", "tpch_q9_partsupp_join",
]


def main() -> None:
    spark = get_spark(app_name="scaling-check")
    spark.sparkContext.setLogLevel("ERROR")

    have_sf1 = os.path.exists(os.path.join(SF1_DIR, "_BUILT_V2"))
    table: dict[str, list[float]] = {}
    for name in HEADLINE + EXTRA:
        fn = BENCH_EXTRA.get(name) or QUERIES[name]
        table[name] = [round(time_query(fn, spark, sf), 3) for sf in SFS]
        if have_sf1 and (name in SF1_QUERIES or name in EXTRA):
            table[name].append(round(time_query(fn, spark, SF1_DIR), 3))

    print("| query | sf0.001 s | sf0.01 s | sf0.1 s | sf1 s | x/decade |")
    print("|---|---|---|---|---|---|")
    flagged = []
    for name, times in table.items():
        decades = len(times) - 1
        growth = (times[-1] / times[0]) ** (1 / decades) if times[0] > 0 else float("inf")
        if growth >= 10:
            flagged.append(name)
        sf1 = times[3] if len(times) > 3 else "—"
        print(f"| {name} | {times[0]} | {times[1]} | {times[2]} | {sf1} | {growth:.2f} |")
    print(json.dumps({"per_query_sec": table, "flagged_superlinear": flagged}))


if __name__ == "__main__":
    main()
