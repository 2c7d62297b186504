"""Streaming state-size scale probe (VERDICT r12 ask #4).

The maintenance/dedup/ANN paths all carry recorded scaling evidence;
this probe adds it for the stateful streaming family. It replays the
three state-bearing shapes behind `stream_stateful_user_sessions`,
`stream_stream_abandoned_clicks` and `stream_cdc_upsert_icelake` at 1x
and 10x EVENT VOLUME (same keyspace, same time span — the dimension an
unbounded production stream grows in), forced through ~12 real
micro-batches (chronological source files + maxFilesPerTrigger=1, so
the watermark actually advances between batches), and captures the
state-store metrics per micro-batch from the terminated query's
recentProgress:

  - applyInPandasWithState sessionization: state must be O(keys) —
    numRowsTotal pinned at the distinct-user count at BOTH volumes
    (flat in volume), flat across the tail batches (flat in time).
  - stream-stream LEFT OUTER interval join: state must be watermark-
    bounded — the numRowsTotal trace rises to the in-horizon buffer
    size and stays flat (eviction), NOT monotone to the cumulative
    input; peak state stays a small fraction of rows fed.
  - CDC merge-on-read upserts: no Spark state operator — the bound is
    in the TABLE: final row count == keyspace at both volumes, one
    commit per batch, and per-batch trigger durations flat (write cost
    proportional to the batch, not to the accumulated table).

Prints one JSON document; BASELINE.md records the verdicts.

    python scripts/streaming_state_probe.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

N_CHUNKS = 12


def build_inputs(spark, sf: str, base: str, scale: int) -> "tuple[str, int, int]":
    """(input_dir, total_rows, distinct_users): the events fixture cut
    into N_CHUNKS chronological parquet files (one micro-batch each),
    volume replicated ``scale``x with the SAME keyspace and time span —
    replica r offsets event_id into a fresh range and jitters ts by r
    seconds (chunk spans are days, so chronology holds)."""
    ev = spark.read.parquet(f"{sf}/events.parquet")
    reps = spark.range(scale).select(F.col("id").alias("_r"))
    scaled = (
        ev.crossJoin(F.broadcast(reps))
        .select(
            (F.col("event_id") + F.col("_r") * F.lit(10_000_000)).alias("event_id"),
            (F.col("ts") + F.make_dt_interval(secs=F.col("_r").cast("double"))).alias("ts"),
            "user_id", "event_type", "value", "props",
        )
    )
    bounds = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    span = (hi - lo).total_seconds() + scale + 1
    chunk = (
        F.floor(
            (F.unix_timestamp("ts") - F.lit(int(lo.timestamp())))
            / F.lit(span / N_CHUNKS)
        )
        .cast("int")
    )
    out_dir = os.path.join(base, f"events_x{scale}")
    os.makedirs(out_dir, exist_ok=True)
    staging = os.path.join(base, f"_stage_x{scale}")
    scaled.withColumn("_c", chunk).repartition("_c").write.mode(
        "overwrite"
    ).partitionBy("_c").parquet(staging)
    # one file per chronological chunk, mtimes ascending so the file
    # source admits them oldest-first
    for i in range(N_CHUNKS):
        part_dir = os.path.join(staging, f"_c={i}")
        if not os.path.isdir(part_dir):
            continue
        files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
        sub = spark.read.parquet(part_dir)
        tmp = os.path.join(base, f"_one_x{scale}_{i}")
        sub.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(
            os.path.join(tmp, f) for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        dst = os.path.join(out_dir, f"events.{i:02d}.parquet")
        shutil.copyfile(src, dst)
        os.utime(dst, (time.time() + i, time.time() + i))
        shutil.rmtree(tmp, ignore_errors=True)
        del files
    shutil.rmtree(staging, ignore_errors=True)
    total = scale * ev.count()
    users = ev.select("user_id").distinct().count()
    return out_dir, total, users


def batched_stream(spark, input_dir: str):
    from iceberg_rs_spark.sources.fixtures import normalize_events_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(input_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{input_dir}/events.*")
    )
    return normalize_events_ts(raw)


def state_trace(q) -> "list[dict]":
    out = []
    for p in q.recentProgress:
        if isinstance(p, str):
            p = json.loads(p)
        ops = p.get("stateOperators") or []
        out.append(
            {
                "batch": p.get("batchId"),
                "rows_total": sum(o.get("numRowsTotal", 0) for o in ops),
                "mem_bytes": sum(o.get("memoryUsedBytes", 0) for o in ops),
                "duration_ms": (p.get("durationMs") or {}).get("triggeredExecution")
                or (p.get("durationMs") or {}).get("triggerExecution"),
                "input_rows": p.get("numInputRows"),
            }
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from iceberg_rs_spark.session import get_spark
    from iceberg_rs_spark.sources.icelake import Catalog
    from iceberg_rs_spark.streaming.ops import (
        replay_cdc_to_icelake,
        stateful_session_counts,
        stream_stream_interval_join,
    )

    spark = get_spark(app_name="streaming-state-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="stream_probe_")
    results: dict = {}
    try:
        for scale in (1, 10):
            in_dir, total, users = build_inputs(spark, args.sf, base, scale)
            row: dict = {"input_rows": total, "distinct_users": users}

            # -- applyInPandasWithState sessionization -----------------
            ev = batched_stream(spark, in_dir)
            sess = stateful_session_counts(ev, gap="2 hours")
            prev = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            try:
                q = (
                    sess.writeStream.format("memory")
                    .queryName(f"probe_sess_x{scale}")
                    .outputMode("update")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev)
            row["session"] = state_trace(q)

            # -- stream-stream LEFT OUTER interval join ----------------
            ev = batched_stream(spark, in_dir)
            clicks = ev.where(F.col("event_type") == "click")
            purchases = ev.where(F.col("event_type") == "purchase")
            joined = stream_stream_interval_join(
                clicks, purchases, key="user_id",
                interval="30 minutes", watermark="1 hour", how="left_outer",
            )
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            try:
                q = (
                    joined.select("l_id", "r_id")
                    .writeStream.format("memory")
                    .queryName(f"probe_join_x{scale}")
                    .outputMode("append")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev)
            row["join"] = state_trace(q)

            # -- CDC merge-on-read upserts ------------------------------
            ev = batched_stream(spark, in_dir).select(
                "user_id", "event_id", "event_type", "value", "ts"
            )
            catalog = Catalog(spark, os.path.join(base, f"cdc_x{scale}"))
            t = catalog.create_table(f"db.probe_cdc_x{scale}", ev.schema)
            q = replay_cdc_to_icelake(ev, t, keys=["user_id"], order=["ts", "event_id"])
            trace = state_trace(q)
            files = t.files().collect()
            row["cdc"] = {
                "trace": trace,
                "n_snapshots": len(t.metadata.snapshots),
                "n_data_files": sum(1 for r in files if r.content == "data"),
                "n_eq_delete_files": sum(
                    1 for r in files if r.content == "equality-deletes"
                ),
                "final_rows": t.scan().count(),
            }
            results[str(scale)] = row

        # ---- verdicts ----------------------------------------------
        verdicts = {}
        for scale in ("1", "10"):
            r = results[scale]
            sess_rows = [b["rows_total"] for b in r["session"] if b["rows_total"]]
            join_rows = [b["rows_total"] for b in r["join"] if b["rows_total"]]
            verdicts[scale] = {
                "session_state_final": sess_rows[-1] if sess_rows else 0,
                "session_state_peak": max(sess_rows) if sess_rows else 0,
                "session_bounded_by_keys": (
                    bool(sess_rows) and max(sess_rows) <= r["distinct_users"]
                ),
                "join_state_peak": max(join_rows) if join_rows else 0,
                "join_state_final": join_rows[-1] if join_rows else 0,
                "join_flat_after_horizon": (
                    len(join_rows) >= 4
                    and join_rows[-1] <= 1.25 * max(join_rows[:-2])
                ),
                "join_peak_fraction_of_input": (
                    round(max(join_rows) / r["input_rows"], 4)
                    if join_rows
                    else None
                ),
                "cdc_final_rows_equals_keys": (
                    r["cdc"]["final_rows"] == r["distinct_users"]
                ),
                "cdc_snapshots": r["cdc"]["n_snapshots"],
            }
        s1 = verdicts["1"]["session_state_peak"]
        s10 = verdicts["10"]["session_state_peak"]
        verdicts["session_state_volume_ratio_10x"] = (
            round(s10 / s1, 3) if s1 else None
        )
        j1 = verdicts["1"]["join_state_peak"]
        j10 = verdicts["10"]["join_state_peak"]
        verdicts["join_state_volume_ratio_10x"] = (
            round(j10 / j1, 3) if j1 else None
        )
        print(json.dumps({"results": results, "verdicts": verdicts}))
    finally:
        spark.stop()
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
