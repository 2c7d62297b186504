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
    # --- r6 driver window (first 50): the entire never-driver-certified
    # backlog from CORRECTNESS_r01-r05 (VERDICT r5 ask #1), family-grouped
    # fn->win->sim->text->pipeline->graph->join->table, led by the one new
    # judge-requested query and the one changed-but-uncertified query.
    "table_incremental_scan_compacted",  # NEW r6: VERDICT r5 ask #4 — slow-path incremental scan across a compaction
    "text_vocab_growth_heaps",  # REWRITTEN r5 (multi-weight prefix sum), never certified — ADVICE r5 #1
    "fn_variant_semistructured",
    "fn_collation_ci_grouping",
    "fn_try_error_safe",
    "fn_url_parse_family",
    "fn_encoding_family",
    "fn_make_datetime_family",
    "fn_string_inspection_family",
    "fn_char_byte_family",
    "win_gaps_islands_streaks",
    "win_time_range_rolling",
    "win_running_distinct_types",
    "win_rolling_median_daily",
    "win_max_drawdown_curve",
    "win_decile_transition_matrix",
    "sim_hybrid_rrf_fusion",
    "sim_mmr_rerank",
    "sim_ranking_metrics_ndcg",
    "sim_threshold_sweep",
    "sim_rank_correlation_kendall",
    "sim_silhouette_by_label",
    "sim_vector_stats_profile",
    "text_code_detection",
    "text_containment_pairs",
    "text_rake_phrases",
    "text_js_divergence_lang",
    "text_term_burstiness",
    "text_tfidf_doc_similarity",
    "pipeline_doc_chunking",
    "pipeline_span_corruption",
    "pipeline_bpe_pair_merges",
    "pipeline_conversation_assembly",
    "pipeline_dataset_card_by_source",
    "pipeline_importance_resampling",
    "pipeline_lsh_scurve_planner",
    "pipeline_padding_waste_report",
    "pipeline_doc_feature_vector",
    "pipeline_epoch_shuffle_batches",
    "graph_label_propagation",
    "graph_bfs_shortest_hops",
    "graph_jaccard_link_prediction",
    "graph_kcore_peel",
    "graph_reciprocity_profile",
    "join_bucketed_colocate",
    "join_dynamic_partition_pruning",
    "join_null_safe_keys",
    "join_asof_tolerance_left",
    "join_interval_coalesce_union",
    "table_branch_diff_audit",
    # --- r7 queue: the 9 never-certified queries the 50-window cannot
    # hold this round (VERDICT r5 ask #2) -- they lead round 7.
    "table_vacuum_lifecycle_audit",
    "table_snapshot_ancestry",
    "table_partition_evolution_reads",
    "sub_in_exists_family",
    "sub_quantified_all_any",
    "dedup_lsh_quality_eval",
    "dedup_component_size_profile",
    "ingest_orc_roundtrip",
    "ts_cross_correlation_leadlag",
    "sim_topk_lsh",  # UPGRADED r6: replay oracle added (was rows-only) — first hash certification pending
    # --- changed-implementation re-certs (see RECERT below): queued here
    # for the first driver window with free slots.
    "sim_ann_agreement_ivf",
    "sim_ann_agreement_pq",
    # --- r5 window (all certified green in CORRECTNESS_r05) ---
    "stream_windowed_distinct_users",
    "udf_arrow_python_scalar",
    "sim_knn_classify",
    "pipeline_curriculum_stages",
    "events_revenue_pareto_deciles",
    "events_powerlaw_rank_fit",
    "agg_smoothed_rate_ranking",
    "events_concurrent_peak",
    "table_incremental_rollup_maintenance",
    "table_merge_upsert_mor",
    "stream_cdc_upsert_icelake",
    "agg_weighted_percentiles",
    "events_funnel_daily",
    "events_inactivity_churn",
    "events_ab_test_lift",
    "events_market_basket_lift",
    "events_gini_concentration",
    "events_rate_change_ztest",
    "events_bot_detection",
    "events_user_entropy",
    "events_dau_mau_stickiness",
    "events_survival_km",
    "events_session_depth_curve",
    "events_time_to_convert",
    "events_ltv_cohort_curve",
    "events_new_vs_returning_daily",
    "events_hour_of_day_profile",
    "agg_benford_first_digit",
    "agg_countmin_heavy_terms",
    "agg_pmi_type_dayofweek",
    "agg_bool_count_if_family",
    "agg_grouping_id_labeled",
    "agg_arg_min_max_family",
    "agg_kmv_distinct_estimate",
    "agg_linear_counting_distinct",
    "agg_mom_growth",
    "agg_chi_square_independence",
    "agg_theil_decomposition",
    "agg_trimmed_winsorized_mean",
    "agg_hhi_concentration",
    "agg_share_of_parent_rollup",
    "ts_seasonal_naive_backtest",
    "ts_anomaly_robust_mad",
    "ts_ohlc_bars",
    "ts_autocorrelation_lags",
    "ts_cusum_changepoint",
    "ts_weekday_seasonal_index",
    "win_skyline_pareto_frontier",
]

#: Changed-implementation re-certification queue: names whose latest
#: green driver row PREDATES a behavior-relevant change to their
#: implementation. ``scripts/rotate_priority.py --write`` treats this
#: list as an automatic ``--lead`` — these names are pinned at the very
#: head of every mechanical rotation — so a rotation can never silently
#: drop a changed-but-uncertified query out of the driver window (the
#: r5 miss class, made structural instead of a flag someone must
#: remember). Remove a name once a NEW green CORRECTNESS row postdating
#: its change lands; the rotation report prints this queue every run.
RECERT: list[str] = [
    "sim_ann_agreement_ivf",  # CHANGED r6: exact-cosine rerank in ivf_topk (ADVICE r5 #2)
    "sim_ann_agreement_pq",  # CHANGED r6: exact-cosine rerank in pq paths (ADVICE r5 #2)
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
