"""Round-4 corpus additions, batch 4: point-in-time dimension join,
partitions metadata table, streaming trending top-k, and product-
quantization ANN.

The PIT join is the warehouse-side dual of the SCD2 build
(`pipeline_scd2_intervals`): facts joined to the dimension row that
was valid AT the fact's event time — the correctness-critical join of
any temporal star schema (a naive join to the current dimension row
leaks future attributes into history)."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.operators import similarity as S
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table
from iceberg_rs_spark.sources.icelake import Catalog

_TS_FMT = "%Y-%m-%d %H:%M:%S"

_SCD2_CTE = f"""
    obs AS (
        SELECT user_id, ts, event_id,
               ['free', 'basic', 'pro', 'max']
                   [CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 + 1] AS tier
        FROM evt WHERE event_type = 'view' AND user_id < 300),
    dedup AS (
        SELECT * FROM (
            SELECT *, lag(tier) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev_tier
            FROM obs)
        WHERE prev_tier IS NULL OR tier != prev_tier),
    dim AS (
        SELECT user_id, tier, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        FROM dedup)
"""


@query(
    "join_pit_dimension",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    {_SCD2_CTE},
    facts AS (
        SELECT user_id, ts, value FROM evt
        WHERE event_type = 'purchase' AND user_id < 300)
    SELECT dim.tier,
           COUNT(*) AS n_purchases,
           COUNT(DISTINCT facts.user_id) AS n_users,
           CAST(SUM(CAST(ROUND(facts.value * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM facts
    JOIN dim ON facts.user_id = dim.user_id
            AND facts.ts >= dim.valid_from
            AND (dim.valid_to IS NULL OR facts.ts < dim.valid_to)
    GROUP BY dim.tier
    ORDER BY dim.tier
    """,
    tags=("join", "point-in-time", "scd2", "temporal"),
)
def join_pit_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: purchases attributed to the subscription
    tier the user held AT purchase time, against the SCD2 dimension
    built from the event stream (same build as
    pipeline_scd2_intervals). The join is an equi-join on user_id with
    an interval residual — Catalyst plans the user_id shuffle join and
    filters the few interval candidates per user, so there is no range
    explosion; dimension history per key is small by construction
    (change points only). Revenue is per-event integer cents, immune
    to summation order."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 300)
    k = F.get_json_object("props", "$.k").cast("bigint")
    tiers = F.array(F.lit("free"), F.lit("basic"), F.lit("pro"), F.lit("max"))
    obs = ev.where(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        "event_id",
        F.element_at(tiers, (k % 4 + 1).cast("int")).alias("tier"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        obs.withColumn("prev_tier", F.lag("tier").over(w))
        .where(F.col("prev_tier").isNull() | (F.col("tier") != F.col("prev_tier")))
        .withColumn("valid_to", F.lead("ts").over(w))
        .select("user_id", "tier", F.col("ts").alias("valid_from"), "valid_to")
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = facts.join(
        dim,
        (facts.user_id == dim.user_id)
        & (facts.ts >= dim.valid_from)
        & (dim.valid_to.isNull() | (facts.ts < dim.valid_to)),
    )
    return (
        joined.groupBy("tier")
        .agg(
            F.count("*").alias("n_purchases"),
            F.countDistinct(facts.user_id).alias("n_users"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("revenue_cents"),
        )
        .orderBy("tier")
    )


@query(
    "table_partitions_metadata",
    oracle=f"""
    {EVENTS_ORACLE_CTE}
    SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS INTEGER)
               AS day_ord,
           COUNT(*) AS record_count
    FROM evt
    GROUP BY day_ord
    ORDER BY day_ord
    """,
    tags=("table", "metadata-tables", "hidden-partitioning"),
)
def table_partitions_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partitions metadata table over a day-partitioned write
    (reference partition.rs day transform = days since epoch +
    README.md:27 inspection surface): per-partition record counts from
    MANIFEST STATS ONLY — no data read, the scan-avoidance payoff the
    metadata model encodes (SURVEY §4.2). The oracle recomputes the
    same rollup relationally from the raw events."""
    events = load_table(spark, sf_dir, "events")
    catalog = Catalog(spark, tempfile.mkdtemp(prefix="icelake_parts_"))
    t = catalog.create_table(
        "db.events_daily", events.schema, partition_by=[("ts", "day")]
    )
    t.append(events)
    return (
        t.partitions()
        .select(
            F.element_at("partition", "ts_day").cast("int").alias("day_ord"),
            F.col("record_count"),
        )
        .orderBy("day_ord")
    )


@query(
    "stream_trending_topk",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    ex AS (
        SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                       date_trunc('hour', ts)]) AS ws,
               event_type
        FROM evt),
    counts AS (
        SELECT ws, event_type, COUNT(*) AS n FROM ex GROUP BY ws, event_type),
    ranked AS (
        SELECT strftime(ws, '{_TS_FMT}') AS win_start, event_type, n,
               ROW_NUMBER() OVER (PARTITION BY ws
                                  ORDER BY n DESC, event_type) AS rk
        FROM counts)
    SELECT win_start, rk, event_type, n
    FROM ranked WHERE rk <= 3
    ORDER BY win_start, rk
    """,
    tags=("streaming", "window", "topk", "trending"),
)
def stream_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending dashboard query: top-3 event types per sliding 2-hour
    window (1-hour slide), replayed to completion. The streaming side
    maintains the per-(window, type) counts incrementally; the rank is
    applied to the final state (a |windows|×|types| aggregate —
    metadata-sized), which is exactly how a production trending view
    is served: stream maintains counts, the dashboard ranks. Counts
    are integers; fully deterministic."""
    from iceberg_rs_spark.streaming import events_stream, replay_to_memory

    ev = events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "win_start"
            ),
            "event_type",
            "n",
        )
    )
    out = replay_to_memory(agg, "trending", "complete")
    w = Window.partitionBy("win_start").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        out.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("win_start", "rk", "event_type", "n")
        .orderBy("win_start", "rk")
    )


def _pq_topk_oracle() -> str:
    """Replay oracle for sim_pq_topk: the sim_ann_agreement_pq
    seeds-only replay (round5.py) extended from a recall@K scalar to
    the full ADC top-k table. Shares round5's _UNIT / _SUBDIST / h60
    fragments and the 16×16 geometry so the two PQ oracles cannot
    drift apart."""
    from iceberg_rs_spark.plans.canon import rhalf_sql
    from iceberg_rs_spark.plans.round5 import (
        _H60_VEC,
        _SUBDIST,
        _UNIT,
        PQ_AGREE_KSUB,
        PQ_AGREE_M,
    )

    return f"""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    u AS (SELECT vec_id, {_UNIT} AS uv FROM base),
    seeds AS (
        SELECT ROW_NUMBER() OVER (ORDER BY {_H60_VEC}, vec_id) - 1 AS sc,
               uv AS cv
        FROM u
        ORDER BY {_H60_VEC}, vec_id
        LIMIT {PQ_AGREE_KSUB}),
    cells AS (
        SELECT t.vec_id, j.j, s.sc, {_SUBDIST} AS d
        FROM u t
        CROSS JOIN (SELECT unnest(generate_series(0, {PQ_AGREE_M - 1})) AS j) j
        CROSS JOIN seeds s),
    codes AS (
        SELECT vec_id, j, sc FROM (
            SELECT vec_id, j, sc,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, j
                       ORDER BY d, sc) AS rn
            FROM cells)
        WHERE rn = 1),
    adc AS (
        SELECT qc.vec_id AS query_id, co.vec_id AS vec_id,
               list_sum(list(qc.d ORDER BY qc.j)) AS dist
        FROM codes co
        JOIN cells qc ON qc.j = co.j AND qc.sc = co.sc AND qc.vec_id < 5
        WHERE co.vec_id != qc.vec_id
        GROUP BY 1, 2)
    SELECT query_id, vec_id, {rhalf_sql('dist', 4)} AS adc_dist,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY dist ASC, vec_id) AS INTEGER) AS rank
    FROM adc
    QUALIFY rank <= 5
    ORDER BY query_id, rank
    """


@query(
    "sim_pq_topk",
    oracle=_pq_topk_oracle(),
    tags=("llm", "similarity", "pq", "approx"),
)
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via product quantization with asymmetric
    distance (operators/similarity.py:pq_topk): vectors stored as 16
    sub-space codes (16× memory compression at dim 64 float32 — the
    lever that makes a 100 TB vector corpus fit an index), queries
    score codes against a broadcast lookup table in pure JVM
    expressions. HASH-CHECKED since r7 (VERDICT r6 ask #5), pinned to
    seeds-only codebooks (lloyd_iters=0): codebooks are then a pure
    function of the portable h60 hash order, so the oracle rebuilds
    them, re-encodes every vector, and replays the ADC ranking in SQL
    (ADC re-folds in ascending sub-space order via
    list(d ORDER BY j), matching the JVM's unrolled fold — the
    sim_ann_agreement_pq replay extended to the full top-k table).
    Every pq_topk mechanism (Arrow unit-normalization, h60 codebook
    seeding, sequential-fold numpy encoding, broadcast per-query LUT,
    JVM ADC sum) runs for real on the Spark side; Lloyd refinement
    only moves codebooks and keeps its recall bars — and their
    monotone improvement with sub-space count — in
    tests/test_operators.py."""
    from iceberg_rs_spark.plans.canon import rhalf

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    topk = S.pq_topk(emb, queries, k=5, m=16, ksub=16, lloyd_iters=0)
    return topk.select(
        "query_id",
        "vec_id",
        rhalf(F.col("adc_dist"), 4).alias("adc_dist"),
        "rank",
    ).orderBy("query_id", "rank")
