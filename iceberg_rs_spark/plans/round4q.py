"""Round-4 corpus additions, batch 16: incremental rollup
maintenance, boolean aggregate family, behavioural entropy, and the
LSH s-curve planner.

The rollup-maintenance query is the incremental-view-maintenance
shape: a materialized aggregate is advanced using ONLY the rows the
table's incremental scan surfaces between snapshots, and certified
equal to a full recompute — the pattern that turns the snapshot log
into cheap derived-table refreshes.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.plans.tables import _events_table, _snap1_id
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

# ---------------------------------------------------------------------------
# Incremental rollup maintenance
# ---------------------------------------------------------------------------


@query(
    "table_incremental_rollup_maintenance",
    oracle=f"""
    {EVENTS_ORACLE_CTE}
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM evt
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("table", "incremental", "materialized-view"),
)
def table_incremental_rollup_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental view maintenance from the snapshot log: the
    per-type rollup is first built from the table AS OF snapshot 1,
    then advanced with ONLY the delta rows incremental_scan surfaces
    between snapshot 1 and head (the second append), by merging the
    delta's partial aggregate into the materialized one — never
    rescanning the base. The certified contract: maintained rollup ==
    full recompute over all events. At 100 TB this is the difference
    between an O(delta) refresh per commit and an O(table) rebuild;
    additive aggregates (count/sum) merge exactly, which is why the
    rollup stores cents, not averages."""
    t = _events_table(spark, sf_dir)
    snap1 = _snap1_id(t)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(cents).cast("long").alias("value_cents"),
        )

    base = rollup(t.scan(snapshot_id=snap1))
    delta = rollup(t.incremental_scan(start_snapshot_id=snap1))
    maintained = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("value_cents").cast("long").alias("value_cents"),
        )
    )
    return maintained.orderBy("event_type")


# ---------------------------------------------------------------------------
# Boolean aggregate family
# ---------------------------------------------------------------------------


@query(
    "agg_bool_count_if_family",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT)
               AS n_large,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
               AS n_finished,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_totalprice > 400000) AS any_huge
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("aggregate", "boolean", "count-if"),
)
def agg_bool_count_if_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family: count_if, bool_and (EVERY), bool_or
    (ANY/SOME) — the assertion-style aggregates data-quality suites
    compile to (quality_expectations builds the same shapes by hand).
    All partial-merge friendly: booleans AND/OR map-side, so the
    reduce moves one bit per group per predicate."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("o_totalprice") > 100000)
            .cast("long")
            .alias("n_large"),
            F.count_if(F.col("o_orderstatus") == "F")
            .cast("long")
            .alias("n_finished"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_huge"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Behavioural entropy per user
# ---------------------------------------------------------------------------


@query(
    "events_user_entropy",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    c AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS DOUBLE) AS n
        FROM evt WHERE user_id % 7 = 0
        GROUP BY 1, 2),
    g AS (
        SELECT user_id, SUM(n) AS tot,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               array_agg(n ORDER BY event_type) AS arr
        FROM c GROUP BY user_id)
    SELECT user_id, CAST(tot AS BIGINT) AS n_events, n_types,
           {rhalf_sql(
               '-list_sum([(arr[i] / tot) * log2(arr[i] / tot) '
               'for i in generate_series(1, len(arr))])', 6)} AS entropy
    FROM g
    ORDER BY user_id
    """,
    tags=("events", "information-theory", "entropy"),
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioural diversity: Shannon entropy of each user's
    event-type distribution — 0 for single-behaviour users, log2(k)
    for uniform ones; the feature that separates scripted accounts
    from organic use (complementing events_bot_detection's timing
    channel). The p·log2(p) terms are folded in a FIXED order (type
    ascending) on both engines — sort_array + aggregate here, ordered
    array_agg + list comprehension in DuckDB — so the irrational sums
    hash-match, the same discipline as the NDCG query."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 7 == 0)
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    g = c.groupBy("user_id").agg(
        F.sum("n").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sort_array(F.collect_list(F.struct("event_type", "n"))).alias("arr"),
    )
    entropy = -F.aggregate(
        F.col("arr"),
        F.lit(0.0),
        lambda acc, x: acc
        + (x["n"] / F.col("tot")) * F.log2(x["n"] / F.col("tot")),
    )
    return g.select(
        "user_id",
        F.col("tot").cast("long").alias("n_events"),
        "n_types",
        rhalf(entropy, 6).alias("entropy"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# LSH s-curve planner
# ---------------------------------------------------------------------------

SCURVE_CONFIGS = ((3, 4), (4, 3), (2, 6), (6, 2))  # (rows_per_band, bands)


def _intpow_sql(base: str, n: int) -> str:
    """Exact repeated multiplication — pow() is not guaranteed
    correctly rounded identically across libm implementations."""
    return "(" + " * ".join([base] * n) + ")"


def _scurve_oracle() -> str:
    arms = []
    for r, b in SCURVE_CONFIGS:
        jr = _intpow_sql("j", r)
        p = f"(1 - {_intpow_sql(f'(1 - {jr})', b)})"
        arms.append(
            f"""SELECT {r} AS rows_per_band, {b} AS bands, j,
               {rhalf_sql(p, 6)} AS p_candidate
        FROM grid"""
        )
    return (
        """WITH grid AS (
        SELECT (i + 1) / 10.0 AS j FROM generate_series(0, 8) AS g(i))
    """
        + "\n    UNION ALL ".join(arms)
        + """
    ORDER BY rows_per_band, bands, j
    """
    )


@query(
    "pipeline_lsh_scurve_planner",
    oracle=_scurve_oracle(),
    tags=("llm", "dedup", "planning", "lsh"),
)
def pipeline_lsh_scurve_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH banding planner: candidate probability
    P = 1 − (1 − J^r)^b for every (rows_per_band, bands) split of the
    12-hash budget across a Jaccard grid — the s-curve table you read
    BEFORE running dedup_lsh_quality_eval to confirm it empirically.
    Powers are expanded to repeated multiplication because pow() is
    not guaranteed bit-identical across libm implementations; the
    chained multiplies are IEEE-exact-rounded the same everywhere."""
    grid = spark.range(9).select(((F.col("id") + 1) / 10.0).alias("j"))

    def intpow(col, n: int):
        return reduce(lambda a, _: a * col, range(n - 1), col)

    # One stage, not a 4-way union (r11 watch-list shave): explode the
    # config list against the grid, then select each config's exact
    # repeated-multiplication polynomial with a when-chain — the same
    # IEEE-exact arithmetic, a quarter of the stages.
    cfg = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("rows_per_band"), F.lit(b).alias("bands")
                )
                for r, b in SCURVE_CONFIGS
            ]
        )
    ).alias("cfg")
    p_expr = None
    for r, b in SCURVE_CONFIGS:
        jr = intpow(F.col("j"), r)
        p = 1 - intpow(1 - jr, b)
        cond = (F.col("cfg.rows_per_band") == r) & (F.col("cfg.bands") == b)
        p_expr = F.when(cond, p) if p_expr is None else p_expr.when(cond, p)
    out = grid.select("j", cfg).select(
        F.col("cfg.rows_per_band").alias("rows_per_band"),
        F.col("cfg.bands").alias("bands"),
        "j",
        rhalf(p_expr, 6).alias("p_candidate"),
    )
    return out.orderBy("rows_per_band", "bands", "j")
