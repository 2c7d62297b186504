"""Per-key window-skew probe for the events family (r13 audit).

The dedup hot bucket (guarded r10) and the graph hub (guarded r13)
have a third sibling: ``Window.partitionBy(user_id)`` — the shape
behind the sessionization / gaps-and-islands / per-user running
aggregates in the events family. A bot user holding a constant
fraction of all events serializes that user's entire history into ONE
task: wall clock degrades from volume/cores toward hot_share*volume
on a single core, and no join strategy, AQE skew hint, or salting
fixes it (sessions need a total order per key; AQE skew handling
covers joins and aggregations, not window sort-within-partition).

This probe synthesizes the regime — same row count, uniform keys vs
one user owning ~20% of events — and times, at 1x and 4x volume:

  - the canonical per-key window plan (lag -> gap flag -> sum), and
  - operators/sessionize.py's session_counts_distributed, the chunked
    range-partition + edge-stitch plan (no per-key window anywhere),

on both arms. The window plan's hot arm degrades toward
cores x hot-share; the chunked plan must stay flat (and agree with
the window plan's totals, asserted in-probe).

    python scripts/window_skew_probe.py [--rows 2000000]
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

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_USERS = 10_000
HOT_SHARE = 0.2
GAP_S = 1_800


def synth(spark, rows: int, hot: bool):
    """Deterministic (event_id, user_id, ts) stream; ``hot`` routes
    ~HOT_SHARE of all rows to user 0, the rest uniform."""
    df = spark.range(rows).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_USERS)).alias("u"),
        (F.lit(1_700_000_000) + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(30 * 86_400)))
        .cast("timestamp")
        .alias("ts"),
    )
    if hot:
        takeover = F.pmod(F.xxhash64("event_id", F.lit(3)), F.lit(1_000_000))
        df = df.withColumn(
            "u",
            F.when(takeover < int(HOT_SHARE * 1_000_000), F.lit(0)).otherwise(
                F.col("u")
            ),
        )
    return df


def sessionize_count(df):
    """The canonical per-user gaps-and-islands window plan."""
    w = Window.partitionBy("u").orderBy("ts", "event_id")
    gaps = df.withColumn(
        "new_s",
        (
            F.coalesce(
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)),
                F.lit(GAP_S + 1),
            )
            > GAP_S
        ).cast("int"),
    )
    return (
        gaps.groupBy("u")
        .agg(F.sum("new_s").alias("n_sessions"), F.count("*").alias("n"))
        .agg(F.sum("n_sessions"), F.sum("n"))
    )


def prefix_native(df):
    """The canonical per-key running-count window plan (the shape the
    whole per-user running-aggregate family shares); checksum-reduced
    so both arms compare equal work."""
    w = (
        Window.partitionBy("u")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("w1", F.lit(1).cast("long"))
        .withColumn("rs", F.sum("w1").over(w))
        .agg(F.sum("rs").alias("chk"), F.count("*").alias("n"))
    )


def prefix_chunked(df):
    """operators/distwin.py::prefix_scan_keyed — the r14 chunked
    per-key prefix scan (range partition + boundary stitch)."""
    from iceberg_rs_spark.operators.distwin import prefix_scan_keyed

    out = prefix_scan_keyed(
        df.withColumn("w1", F.lit(1).cast("long")),
        "u",
        ["ts", "event_id"],
        "w1",
        "rs",
    )
    return out.agg(F.sum("rs").alias("chk"), F.count("*").alias("n"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    args = ap.parse_args()

    from iceberg_rs_spark.operators.dedup import barrier
    from iceberg_rs_spark.session import get_spark

    spark = get_spark(app_name="window-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"rows_1x": args.rows, "n_users": N_USERS, "hot_share": HOT_SHARE}
    from iceberg_rs_spark.operators.sessionize import (
        session_counts_distributed,
    )

    def chunked_count(df):
        return session_counts_distributed(
            df, gap=f"{GAP_S} seconds", user_col="u", ts_col="ts",
            id_col="event_id",
        ).agg(F.sum("n_sessions"), F.sum("n_events"))

    for scale in (1, 4):
        rows = args.rows * scale
        for arm in ("uniform", "hot"):
            df = barrier(synth(spark, rows, hot=(arm == "hot")))
            df.count()  # materialize input outside the timed section
            # warm both plan shapes once at tiny size
            sessionize_count(df.limit(1000)).collect()
            chunked_count(df.limit(1000)).collect()
            t0 = time.perf_counter()
            win = sessionize_count(df).collect()[0]
            out[f"{arm}_x{scale}_sec"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            chk = chunked_count(df).collect()[0]
            out[f"{arm}_x{scale}_chunked_sec"] = round(
                time.perf_counter() - t0, 3
            )
            assert tuple(win) == tuple(chk), (arm, scale, win, chk)
            # r14 prefix-sum arm (VERDICT r13 ask #5): the per-key
            # running aggregate, native window vs prefix_scan_keyed
            prefix_native(df.limit(1000)).collect()
            prefix_chunked(df.limit(1000)).collect()
            t0 = time.perf_counter()
            pw = prefix_native(df).collect()[0]
            out[f"{arm}_x{scale}_prefix_sec"] = round(
                time.perf_counter() - t0, 3
            )
            t0 = time.perf_counter()
            pc = prefix_chunked(df).collect()[0]
            out[f"{arm}_x{scale}_prefix_chunked_sec"] = round(
                time.perf_counter() - t0, 3
            )
            assert tuple(pw) == tuple(pc), (arm, scale, pw, pc)
            from iceberg_rs_spark.operators import packing

            packing.release_caches()
            df.unpersist()
        out[f"skew_penalty_x{scale}"] = round(
            out[f"hot_x{scale}_sec"] / out[f"uniform_x{scale}_sec"], 2
        )
        out[f"skew_penalty_x{scale}_chunked"] = round(
            out[f"hot_x{scale}_chunked_sec"]
            / out[f"uniform_x{scale}_chunked_sec"],
            2,
        )
        out[f"skew_penalty_x{scale}_prefix"] = round(
            out[f"hot_x{scale}_prefix_sec"]
            / out[f"uniform_x{scale}_prefix_sec"],
            2,
        )
        out[f"skew_penalty_x{scale}_prefix_chunked"] = round(
            out[f"hot_x{scale}_prefix_chunked_sec"]
            / out[f"uniform_x{scale}_prefix_chunked_sec"],
            2,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
