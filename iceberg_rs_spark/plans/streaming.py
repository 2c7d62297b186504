"""Streaming corpus (SURVEY.md §2C streaming): every declared
streaming operator, replayed to completion over the events fixture and
hash-checked against the equivalent batch SQL — the batch-replay
equivalence check of SURVEY.md §5.

All oracles build on EVENTS_ORACLE_CTE (`evt` = events with the
ns→micros timestamp rebuild the Spark loader applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table
from iceberg_rs_spark.streaming import (
    events_stream,
    replay_to_memory,
    session_agg,
    sliding_window_agg,
    stateful_dedup,
    stateful_session_counts,
    stream_static_join,
    stream_stream_interval_join,
    tumbling_window_agg,
)

_TS_FMT = "%Y-%m-%d %H:%M:%S"


@query(
    "stream_tumbling_window",
    oracle=f"""
    {EVENTS_ORACLE_CTE}
    SELECT strftime(date_trunc('hour', ts), '{_TS_FMT}') AS win_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM evt
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    """,
    tags=("streaming", "window", "tumbling"),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type, replayed to
    completion — final state equals the batch hourly aggregate."""
    ev = events_stream(spark, sf_dir)
    out = replay_to_memory(tumbling_window_agg(ev, "1 hour"), "tumbling", "complete")
    return out.orderBy("win_start", "event_type")


@query(
    "stream_sliding_window",
    oracle=f"""
    {EVENTS_ORACLE_CTE}, ex AS (
        SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                       date_trunc('hour', ts)]) AS ws,
               value
        FROM evt)
    SELECT strftime(ws, '{_TS_FMT}') AS win_start,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM ex
    GROUP BY ws
    ORDER BY win_start
    """,
    tags=("streaming", "window", "sliding"),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding every hour — each event lands in two
    windows (the oracle unnests the two window starts per event)."""
    ev = events_stream(spark, sf_dir)
    out = replay_to_memory(
        sliding_window_agg(ev, "2 hours", "1 hour"), "sliding", "complete"
    )
    return out.orderBy("win_start")


_SESSIONIZE_SQL = f"""
    {EVENTS_ORACLE_CTE}, o AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 2 HOUR
                    THEN 1 ELSE 0 END AS new_s
        FROM evt
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
        SELECT user_id, ts, value,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM o)
"""


@query(
    "stream_session_windows",
    oracle=_SESSIONIZE_SQL
    + f"""
    SELECT user_id,
           strftime(MIN(ts), '{_TS_FMT}') AS session_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM s
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    tags=("streaming", "window", "session"),
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (2h) per user. The oracle is the
    classic gaps-and-islands rewrite with Spark session_window's TRUE
    boundary: an event at EXACTLY gap after the previous one still
    MERGES (the window [start, last+gap] is closed at the merge end);
    only a strictly greater gap starts a new session. Pinned
    empirically in tests/test_streaming.py::TestSessionGapBoundary —
    the previous `>=` oracle was green only because the fixture's
    subsecond timestamps never land on the exact boundary (the r8
    randomized streaming differential caught it)."""
    ev = events_stream(spark, sf_dir)
    out = replay_to_memory(session_agg(ev, "2 hours"), "sessions", "complete")
    return out.orderBy("user_id", "session_start")


@query(
    "stream_dedup_event_ids",
    oracle=f"""
    {EVENTS_ORACLE_CTE}
    SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
    FROM evt
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "dedup", "stateful"),
)
def stream_dedup_event_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup: the stream is the events fixture
    unioned with itself (every id duplicated); watermark-bounded
    dropDuplicates must restore exactly one copy per event_id."""
    doubled = events_stream(spark, sf_dir).unionByName(events_stream(spark, sf_dir))
    deduped = stateful_dedup(doubled, watermark="1 hour")
    out = replay_to_memory(deduped, "dedup", "append")
    return (
        out.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("event_type")
    )


@query(
    "stream_static_enrichment",
    oracle=f"""
    {EVENTS_ORACLE_CTE}
    SELECT c_mktsegment, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
    FROM evt
    JOIN customer ON c_custkey = user_id
    WHERE event_type = 'purchase'
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("streaming", "join", "stream-static"),
)
def stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: purchase events enriched with the customer
    dimension (no stream-side state), then revenue by market segment.
    No forced broadcast — customer is SF-proportional, so the
    micro-batch planner chooses broadcast from size stats at small
    scale and may shuffle the static side at 100 TB."""
    ev = events_stream(spark, sf_dir).where(F.col("event_type") == "purchase")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = stream_static_join(ev, cust, "user_id")
    agg = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    out = replay_to_memory(agg, "enrich", "complete")
    return out.orderBy("c_mktsegment")


@query(
    "stream_stream_click_purchase",
    oracle=f"""
    {EVENTS_ORACLE_CTE}
    SELECT c.event_id AS l_id, p.event_id AS r_id
    FROM evt c
    JOIN evt p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    ORDER BY l_id, r_id
    """,
    tags=("streaming", "join", "stream-stream"),
)
def stream_stream_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases within 30 minutes after
    a click by the same user. Watermarks bound both join buffers."""
    ev = events_stream(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    joined = stream_stream_interval_join(
        clicks, purchases, key="user_id", interval="30 minutes", watermark="1 hour"
    )
    out = replay_to_memory(joined.select("l_id", "r_id"), "ssjoin", "append")
    return out.orderBy("l_id", "r_id")


@query(
    "stream_stateful_user_sessions",
    oracle=_SESSIONIZE_SQL
    + """
    SELECT user_id,
           CAST(MAX(sid) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM s
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("streaming", "stateful", "applyInPandasWithState"),
)
def stream_stateful_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful processing (applyInPandasWithState): per-user
    sessionization with a 2h gap, counting sessions and events. The
    custom state function reproduces exactly the gaps-and-islands SQL,
    so even the arbitrary-state path is hash-checked. Boundary matches
    Spark's built-in session_window (strictly-greater gap starts a new
    session; an exact-gap event merges), so this operator and
    session_agg agree at the boundary — and since the state carries
    the last seen event time, agreement holds across micro-batch
    boundaries too (the randomized multi-batch differential in
    tests/test_streaming.py pins cross-batch continuation). See
    stateful_session_counts for the state-shape/ordering contract."""
    ev = events_stream(spark, sf_dir)
    sessions = stateful_session_counts(ev, gap="2 hours")
    out = replay_to_memory(sessions, "stateful_sessions", "update")
    return out.orderBy("user_id")


@query(
    "stream_ingest_icelake",
    oracle=f"""
    {EVENTS_ORACLE_CTE}
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM evt
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "table", "ingest"),
)
def stream_ingest_icelake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest INTO the table layer: the events stream is
    replayed through a foreachBatch sink where every micro-batch is one
    atomic icelake append commit carrying its batch id in the snapshot
    summary (idempotent re-delivery — the effectively-once upgrade for
    append-only sinks). The hash check then aggregates the TABLE scan,
    proving the stream→commit→manifest→scan path end to end; at
    cluster scale this is the continuous-ingest pattern with
    per-micro-batch time travel for free."""
    import tempfile

    from iceberg_rs_spark.sources.icelake import Catalog

    ev = events_stream(spark, sf_dir).select("event_id", "event_type", "value", "ts")
    catalog = Catalog(spark, tempfile.mkdtemp(prefix="icelake_stream_"))
    t = catalog.create_table("db.stream_ingest", ev.schema)
    from iceberg_rs_spark.streaming import replay_to_icelake

    replay_to_icelake(ev, t)
    assert any(
        "streaming-batch-id" in s.summary for s in t.metadata.snapshots
    ), "ingest recorded no batch ids"
    return (
        t.scan()
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("event_type")
    )


@query(
    "stream_cdc_upsert_icelake",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    ranked AS (
        SELECT user_id, event_id, event_type, CAST(value AS DOUBLE) AS value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM evt)
    SELECT user_id, event_id, event_type, value
    FROM ranked WHERE rn = 1
    ORDER BY user_id
    """,
    tags=("streaming", "table", "cdc", "merge-on-read"),
)
def stream_cdc_upsert_icelake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert stream into the table layer: every micro-batch
    collapses to its newest row per user and lands as ONE merge-on-read
    commit — the batch as data files plus an equality-delete of the
    batch's keys (Iceberg v2; reference snapshot.rs:28-29 +
    schema.rs:197). The final table holds exactly the latest event per
    user with no data file ever rewritten; the hash check proves
    stream → row_number collapse → equality-delete commit → sequence-
    ordered scan end to end. At 100 TB this is the Debezium/Flink-style
    continuously-upserted dimension table, write cost per trigger
    proportional to the batch."""
    import tempfile

    from iceberg_rs_spark.sources.icelake import Catalog
    from iceberg_rs_spark.streaming import replay_cdc_to_icelake

    ev = events_stream(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "value", "ts"
    )
    catalog = Catalog(spark, tempfile.mkdtemp(prefix="icelake_cdc_"))
    t = catalog.create_table("db.cdc_latest_per_user", ev.schema)
    replay_cdc_to_icelake(ev, t, keys=["user_id"], order=["ts", "event_id"])
    files = t.files().collect()
    assert any(r.content == "equality-deletes" for r in files), "no eq-deletes"
    assert any(
        "streaming-batch-id" in s.summary for s in t.metadata.snapshots
    ), "CDC replay recorded no batch ids"
    return (
        t.scan()
        .select("user_id", "event_id", "event_type", F.col("value").cast("double").alias("value"))
        .orderBy("user_id")
    )


@query(
    "stream_stream_abandoned_clicks",
    oracle=f"""
    {EVENTS_ORACLE_CTE}
    SELECT c.event_id AS l_id, c.user_id
    FROM evt c
    LEFT JOIN evt p
      ON c.user_id = p.user_id
     AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click'
      AND p.event_id IS NULL
      AND c.ts <= (SELECT LEAST(
                       (SELECT MAX(ts) FROM evt WHERE event_type = 'click'),
                       (SELECT MAX(ts) FROM evt WHERE event_type = 'purchase'))
                   - INTERVAL 95 MINUTE)
    ORDER BY l_id
    """,
    tags=("streaming", "join", "stream-stream", "outer"),
)
def stream_stream_abandoned_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — funnel abandonment:
    clicks with NO purchase by the same user within 30 minutes. The
    outer side exercises watermark-driven state eviction: an unmatched
    click is emitted (with NULL purchase columns) only when the
    watermark closes its join window, so the streaming result is the
    anti-join a batch engine would compute.

    Rows whose window is still open at end-of-replay are never emitted,
    and — the part every production consumer must know — the global
    watermark under the default multipleWatermarkPolicy=min is the MIN
    over BOTH sides' event-time maxima: the slower stream (here clicks,
    whose last event precedes the last purchase by hours) gates
    eviction for everyone. Both engines therefore restrict to windows
    closed by `least(max_click_ts, max_purchase_ts) - watermark -
    interval` (minus slack so boundary strictness cannot differ).
    State on both sides stays watermark-bounded at any scale."""
    ev = events_stream(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    joined = stream_stream_interval_join(
        clicks,
        purchases,
        key="user_id",
        interval="30 minutes",
        watermark="1 hour",
        how="left_outer",
    )
    from iceberg_rs_spark.streaming import replay_to_parquet

    # Two-pass drain (not the memory sink): outer-join NULL rows flush
    # one batch after the watermark closes their window, and whether
    # availableNow runs that extra no-data batch before terminating is
    # scheduling-dependent. The second pass resumes from the checkpoint
    # and deterministically drains stragglers (exactly-once file sink).
    out = replay_to_parquet(
        joined.select("l_id", F.col("l_key").alias("user_id"), "l_ts", "r_id"),
        "ss_louter",
        passes=2,
    )
    evb = load_table(spark, sf_dir, "events")
    maxes = evb.groupBy().agg(
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).alias("mc"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("mp"),
    ).collect()[0]
    if maxes["mc"] is None or maxes["mp"] is None:
        # No click or no purchase events in this slice: neither
        # stream's watermark ever advances, so no outer-join window is
        # provably closed — the correct result is empty, not a crash
        # on min(None, ...) (ADVICE r3).
        return (
            out.where(F.lit(False))
            .select("l_id", "user_id")
            .orderBy("l_id")
        )
    # Compare in NTZ: a naive-datetime literal and a session-tz cast
    # disagree about which instant a wall time means whenever the
    # driver's session timezone is not the process default, silently
    # shifting the cutoff by the zone offset. Casting l_ts back to NTZ
    # (inverse of the watermark cast, same session) and parsing the
    # threshold as an NTZ string keeps every comparison wall-clock.
    wall = min(maxes["mc"], maxes["mp"]).strftime("%Y-%m-%d %H:%M:%S.%f")
    closed = F.lit(wall).cast("timestamp_ntz") - F.expr("INTERVAL 95 MINUTES")
    return (
        out.where(F.col("r_id").isNull())
        .where(F.col("l_ts").cast("timestamp_ntz") <= closed)
        .select("l_id", "user_id")
        .orderBy("l_id")
    )
