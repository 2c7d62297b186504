"""Isolated per-query profiling — the BASELINE.md r8 protocol as a tool.

For each named corpus query: a FRESH SparkSession, bench.py's own
warmup() (so session-wide one-time costs are paid exactly as the sweep
pays them), then N back-to-back timed executions with the process-level
table-fixture caches cleared between runs (the same clears bench.py's
retime pass does). The first run isolates first-execution cost
(codegen/JIT); the tail runs are the steady state a re-pin should be
based on (ADVICE r12 #4: a pin measured pre-warmup plus a warmup
pre-compile compounds into a ~2.6-2.9x effective gate).

    python scripts/isolate_profile.py q1,q2,... [--runs 5] [--sf DIR]
                                          [--keep-fixture-caches]

``--keep-fixture-caches`` (ADVICE r13 #4) is the sweep-state variant
for fixture-cached table/text queries: the caches are primed by ONE
untimed execution after warmup and then LEFT WARM across the timed
runs — matching what the full sweep pays for these queries (the
default cold-fixtures protocol measures rebuild-inclusive cost the
sweep never pays, which is why repins_r13.late_addendum had to fall
back to committed-sweep history medians). Use warm-fixtures medians as
the clean-box corroboration for a fixture-cached pin; cold-fixtures
stays right for self-contained queries.

Prints one JSON line per query:
    {"query": ..., "runs": [...], "first": t0, "steady_median": m,
     "pin": p, "prev": v, "verdict": "..."}
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def clear_fixture_caches() -> None:
    """The same process-level caches bench.py's retime pass clears, so
    every run rebuilds its table fixtures like a cold sweep does."""
    try:
        from iceberg_rs_spark.plans import round6 as _r6
        from iceberg_rs_spark.plans import tables as _tbl

        _tbl._TABLES.clear()
        _r6._TABLES.clear()
    except Exception:
        pass
    try:
        from iceberg_rs_spark.operators import packing

        packing.release_caches()
    except Exception:
        pass


def profile_query(
    name: str, sf_dir: str, runs: int, keep_fixture_caches: bool = False
) -> dict:
    from bench import warmup
    from iceberg_rs_spark.plans.corpus import CORPUS
    from iceberg_rs_spark.session import get_spark

    spark = get_spark(app_name=f"isolate-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        warmup(spark, sf_dir)
        samples: list[float] = []
        if keep_fixture_caches:
            # prime once (untimed): the sweep reaches a fixture-cached
            # query with the caches already built by earlier queries
            clear_fixture_caches()
            CORPUS[name].builder(spark, sf_dir).collect()
        for _ in range(runs):
            if not keep_fixture_caches:
                clear_fixture_caches()
            t0 = time.perf_counter()
            CORPUS[name].builder(spark, sf_dir).collect()
            samples.append(round(time.perf_counter() - t0, 4))
    finally:
        spark.stop()
    return {
        "query": name,
        "runs": samples,
        "protocol": "warm-fixtures" if keep_fixture_caches else "cold-fixtures",
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", help="comma-separated corpus query names")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--keep-fixture-caches", action="store_true")
    args = ap.parse_args()

    pins = prev = {}
    try:
        pins = json.load(open(f"{REPO}/BENCH_BASELINE.json"))["queries"]
    except Exception:
        pass
    try:
        import subprocess

        doc = json.loads(
            subprocess.run(
                ["git", "show", "HEAD:BENCH_FULL.json"],
                cwd=REPO, capture_output=True, text=True,
            ).stdout
        )
        prev = (
            doc.get("clean_ref_queries")
            if doc.get("ambient_degraded") and doc.get("clean_ref_queries")
            else doc.get("queries", {})
        )
    except Exception:
        pass

    for name in [s.strip() for s in args.names.split(",") if s.strip()]:
        out = profile_query(
            name, args.sf, args.runs, args.keep_fixture_caches
        )
        tail = out["runs"][1:] or out["runs"]
        out["first"] = out["runs"][0]
        out["steady_median"] = round(statistics.median(tail), 4)
        out["pin"] = pins.get(name)
        out["prev"] = prev.get(name)
        cliff = out["first"] > 1.3 * out["steady_median"] + 0.05
        over_pin = (
            out["pin"] is not None and out["steady_median"] > 1.3 * out["pin"]
        )
        out["verdict"] = (
            "codegen-cliff" if cliff and not over_pin
            else "steady-over-pin" if over_pin
            else "steady-at-pin"
        )
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
