"""Machine-readable catalog metadata for the query registry.

316 oracle-paired queries is a catalog, not a list (VERDICT r6 next #5):
every entry in :data:`samza_spark.queries.QUERIES` gets a ``family``
(which subsystem/workload it exercises) and a ``tier`` (what kind of
guarantee its oracle comparison carries), so the driver, ``bench.py``,
and users can sample by family instead of by registration order.

Tiers
-----
``exact``
    Deterministic batch semantics, oracle hash-exact at any sf — the
    audit lane. The default.
``serving``
    An approximation whose *estimate* is deterministic and oracle-replayed
    (ANN/PQ/IVF, sketches): the oracle proves the estimator, the tier
    says "route serving traffic here, route audits to the exact twin".
``streaming``
    Batch analog of a stateful streaming operator (triggers, panes,
    session merges); the streaming path itself is pytest-gated.
``report``
    Monitoring/report aggregate — exact arithmetic, but the product is a
    dashboard row, not a dataset.
``canary``
    Not an operator: isolates ONE oracle primitive to bisect
    driver-environment divergence (r7; see queries.py canary section).

Use :func:`query_meta` for the full dict, :func:`by_family` /
:func:`by_tier` to sample.
"""

from __future__ import annotations

# family -> query names. Every QUERIES key appears in EXACTLY one list
# (asserted by tests/test_registry_meta.py against the live registry).
FAMILIES: dict[str, list[str]] = {
    # -- engine parity: SURVEY.md §2 core --
    "dsl": [
        "passthrough", "filter", "project_case_like", "flatten", "merge",
        "partition_by", "groupby_count", "exists_subquery",
    ],
    "window": [
        "tumbling_window", "global_window", "sliding_window",
        "session_window", "triggered_window", "triggered_window_acc",
        "trailing_agg", "window_distinct", "analytic_window", "rank_funcs",
    ],
    "join": [
        "stream_table_join", "join_left_outer", "multiway_join_revenue",
        "interval_join", "asof_join", "remote_table_join", "range_join",
        "nearest_event_join", "salted_join", "bloom_semi_join",
        "join_fanout_audit", "bloom_fpp_audit", "interval_join_left",
        # r10 adversarial conformance for the outer banded TTL join
        "interval_join_left_empty", "interval_join_left_nomatch",
    ],
    "sql": [
        "topk", "having", "set_ops", "set_ops_all", "distinct_agg",
        "rollup", "grouping_sets", "pivot_counts", "recursive_chain",
        "qualify_topk", "unpivot_metrics", "distinct_on_latest",
        "cube_counts", "json_shred",
        # r9 adversarial conformance (DuckDB runs the same sugar natively)
        "qualify_nested", "qualify_grouped", "distinct_on_expr",
        "distinct_on_ordered_topk", "recursive_edges_reach",
        "recursive_reach_rollup", "unpivot_nulls", "cube_lattice_filter",
        "lateral_topk", "null_semantics_not_in",
        # r10: the aggregate-decorrelation lateral path
        "lateral_correlated_agg",
    ],
    "functions": [
        "scalar_functions", "collections", "udf_regex", "nested_struct",
    ],
    "tpch": [f"tpch_q{i}" for i in range(1, 23)],
    "table": [
        "changelog_compact", "snapshot_diff", "scd2_pit", "merge_upsert",
        "matview_merge", "join_view_refresh", "zorder", "compaction_plan",
        "hypertable_rollup",
        "zone_map_stats", "staleness_report", "fk_integrity",
    ],
    "format": [
        "avro_roundtrip", "csv_roundtrip", "jsonl_roundtrip",
        "orc_roundtrip", "schema_evolution_roundtrip", "multimodal_decode",
        "tfrecord_roundtrip", "wet_roundtrip", "frame_sample_plan",
    ],
    # -- training-data pipeline: dedup & similarity --
    "dedup": [
        "dedup_exact", "dedup_exact_groups", "dedup_keep_best",
        "minhash_pairs", "minhash_dedup", "simhash_pairs", "simhash_dedup",
        "ngram_jaccard", "semantic_dedup", "embedding_near_dup",
        "dup_spans", "incremental_dedup", "indexed_dedup",
        "segment_dedup_first", "dup_matrix", "dup_cluster_sizes",
        "containment_pairs", "source_overlap", "url_normalize",
        "minhash_eval", "soft_dedup_weights", "binary_near_dup", "simhash_eval",
        "jaccard_prefix_join",
        # r10: PPJoin exactly at the rational threshold, prefix ties
        "ppjoin_boundary",
    ],
    "similarity": [
        "cosine_topk", "ann_topk", "ivf_topk", "pq_topk", "ivfpq_topk",
        "quantized_rerank", "embedding_quantize", "embedding_covariance",
        "jl_project", "hybrid_search", "user_similarity", "similarity_join",
        "hard_negatives", "knn_label_noise", "matryoshka_eval",
        "retrieval_eval", "kmeans_assign", "centroid_drift",
        "codebook_utilization", "bitext_margin", "mmr_select",
        "greedy_coverage",
    ],
    # -- training-data pipeline: text --
    "text": [
        "text_metrics", "lang_id", "pipeline_clean", "redact_pii",
        "dataset_shaping", "doc_quality", "token_stats", "rolling_fp",
        "boilerplate_removal", "decontaminate", "decontam_spans",
        "doc_chunks", "bm25_search", "posting_lists", "phrase_search",
        "unigram_logprob", "bigram_logprob", "kneser_ney", "nb_classifier",
        "zipf_fit", "tfidf_topk", "edit_distance", "ngram_diversity",
        "ngram_novelty", "perplexity_buckets", "pmi_collocations",
        "rake_keyphrases", "vocab_coverage", "oov_audit", "doc_structure",
        "mojibake_report", "encoding_profile", "span_corruption",
        "repetition_loops", "quality_percentiles", "global_quality_rank",
        "quality_calibration", "quality_report", "length_outliers",
        "blocklist_filter", "corpus_report", "compression_ratio",
        "feature_hashing", "nfc_audit",
    ],
    "tokenize": [
        "bpe_merges", "bpe_tokenize", "bpe_fertility", "padding_waste",
    ],
    # -- training-data pipeline: sampling / splits / shards --
    "sampling": [
        "mixture_resample", "mixture_plan", "source_caps", "source_stats",
        "uniform_sample", "weighted_sample", "stratified_topk_sample",
        "stratified_weighted_sample", "stratified_kfold", "dsir_weights",
        "temperature_mixture", "mixing_schedule", "split_leakage",
        "leakage_safe_split", "rolling_origin_folds", "balanced_shards",
        "shard_manifest",
        "merkle_manifest", "fair_allocation", "fifo_allocation",
        "range_partition_plan",
    ],
    "sketch": [
        "approx_sketches", "heavy_hitters", "hll_distinct", "countmin_freq",
        "count_sketch_f2", "kmv_distinct", "kmv_jaccard",
        "join_size_estimate", "join_order_advice", "hist_quantiles",
        "hist_ks_drift",
    ],
    "graph": [
        "pagerank", "pagerank_weighted", "pagerank_personalized",
        "graph_components", "graph_components_star", "triangle_count",
        "kcore", "n_hop_reach", "hits", "label_propagation", "sssp",
        "community_modularity", "clustering_coeff", "temporal_reachability",
    ],
    "events": [
        "funnel_steps", "retention_cohorts", "sessionize", "session_stats",
        "gap_fill", "ewma", "seasonal_anomaly", "changepoint_cusum",
        "periodicity", "seq_patterns", "event_transitions",
        "session_funnel", "trending", "twap", "ohlc_bars",
        "rolling_active_users", "peak_concurrency", "funnel_exclusion",
        "window_funnel", "activity_streaks", "churn_analysis",
        "running_balance", "last_touch_attribution", "path_deviation",
        "position_attribution",
        "leadlag_xcorr", "burstiness", "trend_slopes", "hysteresis_alerts",
        "standing_queries", "slo_burn_alerts", "ts_pattern_search",
        "latency_percentiles", "latency_log2_histogram",
        "conversion_delay_ecdf", "interval_merge", "interval_audit",
        "watermark_plan", "tail_attribution", "audience_overlap",
        "rate_limit_replay", "bitmap_intersections",
        # r10: bitmap packing at word seams + provably-disjoint sets
        "bitmap_word_boundary", "bitmap_disjoint",
        "cohort_ltv", "rfm_segments", "skyline_2d",
    ],
    "stats": [
        "robust_stats", "weighted_median", "winsorize_stats",
        "benford_audit", "fd_audit", "chi2_independence", "ks_drift",
        "tvd_drift", "emd_drift", "distribution_drift", "ab_test_report",
        "diff_in_diff", "cuped_readout", "roc_auc", "pr_curve",
        "qini_curve", "lift_chart", "mann_whitney", "mcnemar",
        "kaplan_meier", "poisson_bootstrap", "dp_histogram",
        "conformal_threshold", "bh_fdr", "mutual_information", "concordance",
        "elo_ratings", "ctr_wilson", "labeler_agreement",
        "classifier_confusion", "skew_gini", "concentration_hhi",
        "abc_classification", "category_entropy", "skew_report",
        "markov_eval", "assoc_lift", "target_encoding", "ips_offpolicy",
        "isotonic_calibration", "decision_stump", "cem_att",
        "xi_correlation", "qte_report", "simpson_audit",
    ],
    "governance": [
        "k_anonymity", "l_diversity", "t_closeness", "pii_report",
        "table_profile", "revenue_reconciliation", "disorder_audit",
        "quantile_normalize", "json_props_stats", "source_signatures",
        "luhn_audit", "deletion_audit", "expectations_report",
        "expectations_routing",
    ],
    "linkage": [
        "record_linkage", "typo_pairs", "golden_record", "entity_clusters",
        "blocking_eval",
    ],
    "spatial": ["dbscan_clusters", "nearest_hub"],
    "posttrain": [
        "preference_pairs", "sft_export", "packed_sequences",
        "packing_report", "curriculum_order", "dialogue_turns",
        "embargo_split", "signal_fusion", "task_assignment",
        "rebalance_audit",
        "rank_aggregation", "length_bias_audit",
        "label_aggregation", "curation_pipeline",
    ],
    "canary": [
        "canary_int_div", "canary_hex_cast", "canary_hugeint_mod",
        "canary_round_half", "canary_round_value_micro", "canary_epoch_us",
        "canary_double_reemit", "canary_list_reduce", "canary_regexp_g",
        "canary_token_split", "canary_ts_varchar_cmp", "canary_hugeint_div",
        "canary_negative_divmod", "canary_null_ordering",
    ],
}

# tier overrides; everything else is "exact"
_TIER_BY_FAMILY = {"canary": "canary", "sketch": "serving"}
_TIER_OVERRIDES: dict[str, str] = {
    # ANN / quantized serving paths (exact twins: cosine_topk, bm25_search)
    "ann_topk": "serving", "ivf_topk": "serving", "pq_topk": "serving",
    "ivfpq_topk": "serving", "quantized_rerank": "serving",
    "jl_project": "serving",
    # batch analogs of stateful streaming operators
    "triggered_window": "streaming", "triggered_window_acc": "streaming",
    "standing_queries": "streaming", "hysteresis_alerts": "streaming",
    "slo_burn_alerts": "streaming", "incremental_dedup": "streaming",
    "rate_limit_replay": "streaming",
    # monitoring/report aggregates
    "corpus_report": "report", "quality_report": "report",
    "skew_report": "report", "pii_report": "report",
    "table_profile": "report", "staleness_report": "report",
    "mojibake_report": "report", "encoding_profile": "report",
    "distribution_drift": "report", "source_stats": "report",
    "packing_report": "report", "ab_test_report": "report",
    "json_props_stats": "report", "source_signatures": "report",
    "zone_map_stats": "report",
}


def query_meta() -> dict[str, dict[str, str]]:
    """``{name: {"family": ..., "tier": ...}}`` for every registered query."""
    meta: dict[str, dict[str, str]] = {}
    for family, names in FAMILIES.items():
        default_tier = _TIER_BY_FAMILY.get(family, "exact")
        for n in names:
            meta[n] = {
                "family": family,
                "tier": _TIER_OVERRIDES.get(n, default_tier),
            }
    return meta


def by_family(family: str) -> list[str]:
    return list(FAMILIES[family])


def by_tier(tier: str) -> list[str]:
    return [n for n, m in query_meta().items() if m["tier"] == tier]
