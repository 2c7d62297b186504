"""Query-corpus registry.

Each entry in :data:`CORPUS` declares one operator/query from
SURVEY.md §2C as an executable contract:

- ``builder(spark, sf_dir) -> DataFrame`` — the Spark-first
  implementation (DataFrame API; Catalyst plans it).
- ``oracle`` — equivalent ANSI SQL that DuckDB runs over the same
  parquet fixtures; ``None`` for genuinely non-SQL-expressible ops
  (the driver then records a weaker rows-only check).

Determinism rules (FIXTURES.md): every query ends with a total ORDER BY
over a unique key set, float aggregates are ROUND(x, 2), timestamps are
compared in UTC, no approx/random functions in hash-checked queries.
Column names are aliased identically on both sides — the driver sorts
columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


#: name -> QuerySpec; populated by the @query decorator at import time.
CORPUS: dict[str, QuerySpec] = {}

#: Explicit driver-verification priority (VERDICT.md r3 §Next-round #2).
#: The driver's CORRECTNESS pass covers only the first 50 registry entries
#: per round, so ``queries()`` emits these names first (in this order),
#: then every other registered query in registration order.  Keep this
#: list pointing at (a) queries with no green driver row yet and (b)
#: queries whose implementation changed since their last green row.
PRIORITY: list[str] = [
    # r3 driver FAIL (canonicalizer crashed on array<bigint> column;
    # output stringified this round — re-verify first):
    "text_winnowing_fingerprints",
    # Never driver-verified (added after the r3 rotation):
    "sim_quantized_topk",
    "events_funnel_conversion",
    "events_cohort_retention",
    # New this round (round 4):
    "sim_quantized_grouped_topk",   # per-(query,label) quota retrieval
    "text_pii_redaction",           # email/phone/IP scrub, redacted text hashed
    "pipeline_decontaminate_ngrams",  # train-vs-test 8-gram contamination
    "text_boilerplate_ngrams",      # cross-doc frequent-phrase mining
    "join_bloom_prefilter",         # deterministic bloom semi-join prefilter
    "events_rolling_active_users",  # exact rolling 7-day distinct users
    "events_sessionization_batch",  # 30-min-gap batch sessionization
    "events_attribution_last_touch",  # windowed as-of attribution
    "pipeline_scd2_intervals",      # CDC -> type-2 dimension intervals
    "pipeline_ngram_lm_quality",    # add-one bigram LM quality score
    "table_wap_publish",            # write-audit-publish via fast-forward
    "table_changelog_scan",         # row-level CDC changelog across commits
    "table_rewrite_deletes",        # rewrite_position_delete_files maintenance
    "pipeline_stratified_sample",   # per-lang deterministic hash sampling
    "pipeline_domain_cap",          # per-domain contribution cap (anti-dominance)
    "events_path_transitions",      # first-order Markov transition matrix
    "text_tfidf_keywords",          # top-3 TF-IDF terms per document
    "text_zipf_token_curve",        # corpus vocabulary Zipf head
    "multimodal_pixel_dedup",       # cross-container decoded-pixel dedup
    "fn_bitwise_family",            # shifts/and/or/xor/popcount
    "fn_trig_family",               # sin..atan2, degrees/radians, cbrt
    "agg_histogram_numeric",        # equi-width profiling histogram
    "agg_higher_moments",           # portable skewness/kurtosis + exact mode
    "events_rfm_segments",          # NTILE quartile RFM segmentation
    "events_anomaly_daily_zscore",  # per-type daily volume control chart
    "sim_centroid_per_label",       # class centroids + argmin-cos outlier
    "table_rollback_restore",       # rollback_to_snapshot bad-commit recovery
    "pipeline_dedup_purge",         # LSH -> CC -> purge accounting
    "pipeline_mixture_weights",     # temperature-scaled source mixture
    "join_pit_dimension",           # facts joined to SCD2 row valid at ts
    "table_partitions_metadata",    # per-partition stats from manifests only
    "stream_trending_topk",         # streaming counts + final-state rank
    "sim_pq_topk",                  # product-quantization ADC (rows-only)
    "graph_pagerank_trade",         # iterative weighted PageRank, unrolled oracle
    "quality_expectations",         # Deequ-style validation suite
    "agg_heavy_hitters_mg",         # Misra-Gries candidates + exact recount
    "pipeline_vocab_coverage",      # top-N vocab OOV audit per lang
    "dedup_url_canonical",          # URL canonicalization dedup
    "fn_string_distance",           # levenshtein pair similarity (blocked)
    "table_partition_drop_metadata_only",  # partition-aligned metadata delete
    "graph_triangle_count",         # ordered-wedge triangles + clustering coef
    "ts_downsample_m4",             # M4 first/last/min/max downsampling
    "ts_exp_decay_features",        # 30-day exponential-decay rollup features
    "pipeline_filter_funnel",       # first-failing-rule attrition funnel
    "dedup_cluster_survivorship",   # golden-record field survivorship
    "agg_weighted_percentiles",     # exact weighted p50/p90 via cum-weight
    "udf_arrow_python_scalar",      # useArrow=True Python UDF path
    "win_gaps_islands_streaks",     # longest consecutive-day streaks
    "events_inactivity_churn",      # idle-days churn tiers
    "fn_variant_semistructured",    # Spark-4 VARIANT parse/path access
    "table_branch_diff_audit",      # EXCEPT ALL branch divergence audit
    "fn_collation_ci_grouping",     # Spark-4 collation grouping (UTF8_LCASE)
    "pipeline_doc_chunking",        # overlapped context-window chunking
    "sim_hybrid_rrf_fusion",        # reciprocal-rank-fusion hybrid retrieval
    "events_ab_test_lift",          # hash-assigned A/B conversion readout
    "events_market_basket_lift",    # k=2 association support/confidence/lift
    "graph_label_propagation",      # weighted LPA communities, unrolled oracle
    "sim_knn_classify",             # kNN majority-vote holdout readout
    "events_gini_concentration",    # power-user activity Gini
    "ts_seasonal_naive_backtest",   # lag-7 forecast MAE/MAPE backtest
    "text_code_detection",          # code-vs-prose surface signals
    "agg_benford_first_digit",      # first-digit law profile
    "join_bucketed_colocate",       # shuffle-free bucketed catalog join
    "sim_mmr_rerank",               # greedy MMR diversifier (cogroup UDF)
    "agg_countmin_heavy_terms",     # portable-hash count-min estimates
    "graph_bfs_shortest_hops",      # sparsified-graph BFS distances
    "ts_anomaly_robust_mad",        # MAD modified-z control chart
    "join_dynamic_partition_pruning",  # runtime dim-driven partition skip
    "pipeline_span_corruption",     # T5 span masking, array-HOF only
    "pipeline_curriculum_stages",   # TTR-ordered NTILE curriculum
    "events_rate_change_ztest",     # two-sample Poisson rate z-test
    "fn_try_error_safe",            # try_divide/element_at/cast family
    "pipeline_bpe_pair_merges",     # BPE merge-step pair frequencies
    "events_revenue_pareto_deciles",  # decile share / cumulative curve
    "fn_url_parse_family",          # parse_url protocol/host/path/params
    "graph_jaccard_link_prediction",  # wedge-join common-neighbour scores
    "pipeline_conversation_assembly",  # sort_array ordered SFT assembly
    "graph_kcore_peel",             # bounded-round 4-core extraction
    "win_time_range_rolling",       # integer-microsecond range frames
    "sim_ranking_metrics_ndcg",     # NDCG@10 + MRR eval, ordered folds
    "agg_pmi_type_dayofweek",       # epoch-arithmetic PMI association
    "pipeline_dataset_card_by_source",  # datasheet summary per source
    "ingest_orc_roundtrip",         # lossless parquet->ORC->scan proof
    "events_bot_detection",         # inter-event-gap CV heuristics
    "sim_threshold_sweep",          # dedup cutoff calibration curve
    "join_null_safe_keys",          # <=> hash join incl. NULL block
    "pipeline_importance_resampling",  # hash-deterministic oversampling
    "stream_windowed_distinct_users",  # exact set-buffer streaming distinct
    "dedup_lsh_quality_eval",       # LSH precision/recall vs exact truth
    "table_incremental_rollup_maintenance",  # O(delta) materialized refresh
    "agg_bool_count_if_family",     # count_if / bool_and / bool_or
    "events_user_entropy",          # behavioural Shannon entropy
    "pipeline_lsh_scurve_planner",  # banding probability table
    "agg_grouping_id_labeled",      # GROUPING()-labelled rollup levels
    "text_containment_pairs",       # asymmetric quote/inclusion detector
    "fn_encoding_family",           # base64/hex round-trips
    "agg_arg_min_max_family",       # max_by/min_by on unique keys
    "events_dau_mau_stickiness",    # engagement ratio by calendar month
    "agg_kmv_distinct_estimate",    # mergeable k-minimum-values sketch
    "agg_linear_counting_distinct",  # bitmap-occupancy cardinality
    "events_survival_km",           # Kaplan-Meier churn curve
    "text_rake_phrases",            # stopword-island keyword extraction
    "join_asof_tolerance_left",     # 30-day-bounded left as-of
    "sim_rank_correlation_kendall",  # cosine-vs-dot ordering audit
    "pipeline_padding_waste_report",  # pow2-bucket batching economics
    "dedup_component_size_profile",  # cluster-size purge report
    "pipeline_doc_feature_vector",  # quality-model feature assembly
    "agg_mom_growth",               # monthly lag growth in basis points
    "table_vacuum_lifecycle_audit",  # expire+orphan vacuum, rows invariant
    "sub_in_exists_family",         # EXISTS/IN/NOT-IN null-trap semantics
    "win_running_distinct_types",   # collect_set-over-window running distinct
    "ts_ohlc_bars",                 # daily OHLC with exact open/close tiebreak
    "agg_chi_square_independence",  # contingency-table chi-square statistic
    "fn_make_datetime_family",      # make_date constructors, ISO week, epoch day
    "ts_autocorrelation_lags",      # daily-series ACF lags 1-7
    "graph_reciprocity_profile",    # directed trade reciprocity (plain+weighted)
    "text_vocab_growth_heaps",      # Heaps-law cumulative vocabulary curve
    "fn_string_inspection_family",  # split_part/left/right/locate/printf
    "text_js_divergence_lang",      # pairwise language JSD (union vocab)
    "events_concurrent_peak",       # sweep-line max concurrent intervals
    "win_rolling_median_daily",     # exact rolling median/p90 window
    "agg_theil_decomposition",      # between/within inequality identity
    "events_session_depth_curve",   # depth histogram + continuation prob
    "events_time_to_convert",       # signup->purchase latency percentiles
    "win_skyline_pareto_frontier",  # 2-D skyline via sort + running max
    "sim_silhouette_by_label",      # exact silhouette cluster evaluation
    "events_powerlaw_rank_fit",     # Zipf exponent of user activity
    "table_snapshot_ancestry",      # parent-pointer lineage walk
    "pipeline_epoch_shuffle_batches",  # reproducible epoch batch plan
    "events_ltv_cohort_curve",      # cohort cumulative revenue / LTV
    "text_term_burstiness",         # variance-to-mean term dispersion
    "table_partition_evolution_reads",  # mixed-spec scan certification
    "ts_cusum_changepoint",         # CUSUM level-shift detection
    "ts_weekday_seasonal_index",    # ISO-dow multiplicative indices
    "events_new_vs_returning_daily",  # global first-seen growth split
    "sim_vector_stats_profile",     # embedding QA: norms, dead dims
    "sub_quantified_all_any",       # ALL/ANY rewrite incl. empty-set edge
    "agg_trimmed_winsorized_mean",  # robust means via rank trim / clamp
    "win_max_drawdown_curve",       # running peak + relative drawdown
    "ts_cross_correlation_leadlag",  # views-lead-purchases xcorr
    "join_interval_coalesce_union",  # range consolidation + union length
    "agg_smoothed_rate_ranking",    # additive-smoothed leaderboard
    "win_decile_transition_matrix",  # month-over-month quintile mobility
    "agg_hhi_concentration",        # HHI + effective-N concentration panel
    "events_hour_of_day_profile",   # intraday load shares + peak hour
    "fn_char_byte_family",          # ascii/chr/char-vs-byte lengths
    "agg_share_of_parent_rollup",   # hierarchical drill-down shares
    "text_tfidf_doc_similarity",    # sparse term-join cosine pairs
    # Changed this round (round 4) — re-verify:
    "sim_topk_ivf",                 # hash-sampled centroid seeding (rows-only)
    "sim_ann_agreement",            # guards IVF/LSH quality after reseed
    "events_funnel_daily",          # new: anchored-funnel daily breakdown
    "stream_stream_abandoned_clicks",  # empty-side guard added
    "pipeline_sequence_packing",    # packing persist-handle plumbing
    "prepare_training_corpus",      # same (uses grouped packing)
    # Stable green rows from r1-r3 below: keep the most load-bearing
    # families inside the 50-query driver window for regression cover.
    "stream_stateful_user_sessions",
    "agg_corr_covar",
    "fn_math_family",
    "fn_array_hof_family",
    "dedup_ngram_jaccard_matrix",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_near_pairs",
    "sim_embedding_high_pairs",
    "sim_topk_lsh",
    "table_typed_columns_roundtrip",
    "dedup_connected_components",
    "stream_ingest_icelake",
    "pipeline_training_data",
    "table_mor_delete",
    "table_merge_upsert_mor",
    "stream_cdc_upsert_icelake",
    "q7_nation_volume",
    "q10_returned_items",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q18_large_volume_customers",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_late_lines_by_status",
    "q13_customer_order_counts",
    "q16_supplier_count_by_part",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
    "text_repetition_signals",
    "pipeline_train_test_split",
    "table_zorder_rewrite",
    "multimodal_resize_thumbnail",
    "multimodal_audio_features",
    "ts_gapfill_interpolate",
    "multimodal_video_frame_sample",
    "fn_unpivot_melt",
    "join_lateral_topn",
    "agg_percentiles_regression",
]


def _ordered_names() -> list[str]:
    head = [n for n in PRIORITY if n in CORPUS]
    tail = [n for n in CORPUS if n not in set(head)]
    return head + tail


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a corpus query. Use as a decorator over the builder."""

    def deco(fn: Builder) -> Builder:
        if name in CORPUS:
            raise ValueError(f"duplicate corpus query name: {name}")
        CORPUS[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "")
        )
        return fn

    return deco


def queries() -> dict[str, Builder]:
    return {name: CORPUS[name].builder for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: CORPUS[name].oracle
        for name in _ordered_names()
        if CORPUS[name].oracle
    }
