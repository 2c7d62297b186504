"""Benchmark harness (SURVEY.md §7 M7).

Runs every corpus query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + fetch); a warmup query
first absorbs JVM/session startup so numbers reflect steady-state
execution, which is what matters at cluster scale.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from iceberg_rs_spark.plans import CORPUS  # noqa: E402
from iceberg_rs_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="iceberg_rs_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JVM classloading + parquet footer caches, plus the
    # Python-worker / Arrow / streaming-state machinery (first
    # initialization costs ~15s and would otherwise be billed to
    # whichever streaming or pandas-UDF query runs first).
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql import functions as F

    from iceberg_rs_spark.operators.similarity import cosine_arrow

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(64)
    emb.select(cosine_arrow(F.col("embedding"), F.col("embedding"))).count()
    from iceberg_rs_spark.streaming import events_stream, replay_to_memory

    replay_to_memory(
        events_stream(spark, sf_dir).groupBy("event_type").count(),
        "bench_warmup",
        "complete",
    ).count()

    timings: dict[str, float] = {}
    for name, spec in sorted(CORPUS.items()):
        t0 = time.perf_counter()
        try:
            df = spec.builder(spark, sf_dir)
            df.collect()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # keep the harness alive; surface the failure
            timings[name] = -1.0
            print(f"BENCH ERROR {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "corpus_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
