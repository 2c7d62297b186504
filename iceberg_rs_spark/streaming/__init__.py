"""Structured Streaming surface (SURVEY.md §2C streaming, §7 M5).

The reference's `events` table is append-only (snapshot `append`
operation, reference snapshot.rs:19), which is exactly a stream; this
package exposes it as one and implements the declared streaming
operators: tumbling/sliding/session windows, watermarking, stateful
dedup, stream-static and stream-stream joins, and arbitrary state via
applyInPandasWithState.

Correctness strategy: every streaming query is *replayed to
completion* (`trigger(availableNow=True)` into a memory sink) and the
final table is hash-compared against the equivalent batch SQL on the
same fixture — the batch-replay equivalence check of SURVEY.md §5.
"""

from iceberg_rs_spark.streaming.ops import (  # noqa: F401
    events_stream,
    replay_cdc_to_icelake,
    replay_to_icelake,
    replay_to_memory,
    replay_to_parquet,
    session_agg,
    sliding_window_agg,
    stateful_dedup,
    stateful_session_counts,
    stream_static_join,
    stream_stream_interval_join,
    tumbling_window_agg,
)
