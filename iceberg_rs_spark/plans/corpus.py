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

#: Explicit driver-verification priority (VERDICT.md r2 §Next-round #1).
#: The driver's CORRECTNESS pass covers only the first 50 registry entries
#: per round, so ``queries()`` emits these names first (in this order),
#: then every other registered query in registration order.  Keep this
#: list pointing at (a) queries with no green driver row yet and (b)
#: queries whose implementation changed since their last green row.
PRIORITY: list[str] = [
    # Never driver-tested (registry position 51 in rounds 1-2):
    "stream_stateful_user_sessions",
    # r1 hash-fails, oracle-side type bugs fixed in 76d3ad2, no driver
    # row since:
    "agg_corr_covar",
    "fn_math_family",
    "fn_array_hof_family",
    # Changed this round (round 3) — re-verify:
    "dedup_ngram_jaccard_matrix",   # threshold lowered to yield rows
    "sim_ann_agreement",            # new hash-checked ANN quality query
    "dedup_minhash_lsh_pairs",      # barrier swap (persist vs localCheckpoint)
    "dedup_simhash_near_pairs",     # barrier swap
    "sim_embedding_high_pairs",     # auto-scaled blocking params
    "sim_topk_lsh",                 # multi-probe added (rows-only)
    "sim_topk_ivf",                 # auto n_centroids (rows-only)
    "table_typed_columns_roundtrip",  # row cap 2000 → 20000 (bench-scale writes)
    "dedup_connected_components",   # new: iterative CC with recursive-CTE oracle
    "stream_ingest_icelake",        # new: streaming foreachBatch → table commits
    "pipeline_training_data",       # new: composed dedup→quality→lang pipeline
    "table_mor_delete",             # new: v2 position-delete files (merge-on-read)
    "table_merge_upsert_mor",       # new: v2 equality-delete upsert (CDC path)
    "stream_cdc_upsert_icelake",    # new: streaming CDC → eq-delete commits
    "q7_nation_volume",             # new: TPC-H Q7 shape
    "q10_returned_items",           # new: TPC-H Q10 shape
    "q14_promo_revenue",            # new: TPC-H Q14 shape
    "q15_top_supplier",             # new: TPC-H Q15 shape
    "q18_large_volume_customers",   # new: TPC-H Q18 shape
    "q22_idle_customers",           # new: TPC-H Q22 shape
    # Full TPC-H sweep completion (remaining 12 query shapes):
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
    # Training-pipeline additions (repetition quality, split, packing):
    "text_repetition_signals",
    "pipeline_train_test_split",
    "pipeline_sequence_packing",
    # Clustered rewrite (z-order multi-dimensional file skipping):
    "table_zorder_rewrite",
    # Outer stream-stream join (watermark state eviction):
    "stream_stream_abandoned_clicks",
    # Multimodal resize (pixel-path oracle):
    "multimodal_resize_thumbnail",
    # Multimodal audio (PCM decode + DSP features):
    "multimodal_audio_features",
    # Time-series gap fill + interpolation:
    "ts_gapfill_interpolate",
    # Multimodal video (container walk + frame decode):
    "multimodal_video_frame_sample",
    # Relational-surface additions:
    "fn_unpivot_melt",
    "join_lateral_topn",
    # Composed round-3 pipeline (repetition gate → split → packing):
    "prepare_training_corpus",
    # Exact percentiles + regression aggregate family:
    "agg_percentiles_regression",
    # Winnowing (MOSS) rolling-hash document sketches:
    "text_winnowing_fingerprints",
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
