"""Streaming fixed-cost breakdown (VERDICT r14 #7).

For each streaming corpus query: wall time + the terminated query's
recentProgress durationMs buckets (addBatch = execution incl. state
commits, getBatch/latestOffset = source, triggerExecution = whole
trigger, commitOffsets/walCommit = checkpoint fsyncs), so the round
notes can say how much of each ~2 s query is state-store commit vs
sink drain vs trigger machinery.

    python scripts/streaming_cost_probe.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

STREAM_QUERIES = [
    "stream_tumbling_window",
    "stream_sliding_window",
    "stream_session_windows",
    "stream_windowed_distinct_users",
    "stream_trending_topk",
    "stream_dedup_event_ids",
    "stream_static_enrichment",
    "stream_stateful_user_sessions",
    "stream_stream_click_purchase",
    "stream_stream_abandoned_clicks",
    "stream_ingest_icelake",
    "stream_cdc_upsert_icelake",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from iceberg_rs_spark.plans import CORPUS
    from iceberg_rs_spark.session import get_spark
    from iceberg_rs_spark import streaming as S

    spark = get_spark(app_name="streaming-cost-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def _w(b):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from b

    spark.range(0, 32, 1, 32).mapInPandas(_w, "id long").count()
    # collect progress from every query started during the run
    from pyspark.sql import functions as F  # noqa: F401

    for name in STREAM_QUERIES:
        if name not in CORPUS:
            continue
        before = {q.id: q for q in spark.streams.active}
        t0 = time.perf_counter()
        CORPUS[name].builder(spark, args.sf).collect()
        wall = round(time.perf_counter() - t0, 2)
        # terminated queries: pull recentProgress via the listener-less
        # route — spark.streams has no terminated list, so re-run the
        # builder is NOT an option; instead sample active leftovers
        # (availableNow queries have finished; their progress is gone).
        # The durable signal is the last progress of each query name
        # via the StreamingQueryManager's awaitAnyTermination side —
        # simplest: print wall and rely on a second instrumented run
        # below for one representative query.
        print(json.dumps({"query": name, "wall_sec": wall}))

    # Instrumented single-shape run: tumbling window with progress kept.
    from iceberg_rs_spark.streaming import events_stream, tumbling_window_agg

    agg = tumbling_window_agg(events_stream(spark, args.sf))
    qname = "probe_tumbling"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        for p in q.recentProgress:
            print(
                json.dumps(
                    {
                        "batchId": p["batchId"],
                        "numInputRows": p["numInputRows"],
                        "durationMs": p["durationMs"],
                        "stateOperators": [
                            {
                                k: so.get(k)
                                for k in (
                                    "commitTimeMs",
                                    "numRowsTotal",
                                    "numShufflePartitions",
                                )
                            }
                            for so in p.get("stateOperators", [])
                        ],
                    }
                )
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.stop()


if __name__ == "__main__":
    main()
