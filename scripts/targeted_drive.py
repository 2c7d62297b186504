"""Targeted oracle drive: verify named corpus queries against the
DuckDB oracle at one or more SFs in a single session.

    python scripts/targeted_drive.py q1,q2[,...] [--sfs sf0.001,sf0.01]

Exit non-zero on any mismatch. The per-round optimization loop runs
this after every operator edit (cheaper than the full 296-query drive;
the full drive still gates the round start/end).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", help="comma-separated corpus query names")
    ap.add_argument("--sfs", default="sf0.001,sf0.01")
    ap.add_argument("--base", default="/root/testdata")
    args = ap.parse_args()

    import duckdb

    from iceberg_rs_spark.plans import CORPUS
    from iceberg_rs_spark.session import get_spark
    from iceberg_rs_spark.sources.fixtures import TABLES
    from tests.oracle_utils import assert_frames_match

    spark = get_spark(app_name="targeted-drive")
    spark.sparkContext.setLogLevel("ERROR")
    names = [s.strip() for s in args.names.split(",") if s.strip()]
    fails = 0
    for sf in args.sfs.split(","):
        sf_dir = f"{args.base}/{sf}"
        con = duckdb.connect()
        con.execute("SET TimeZone='UTC'")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in names:
            spec = CORPUS[name]
            t0 = time.perf_counter()
            try:
                spdf = spec.builder(spark, sf_dir).toPandas()
                dt = round(time.perf_counter() - t0, 2)
                if spec.oracle is None:
                    print(f"{sf} {name} rows-only: {len(spdf)} ({dt}s)")
                    continue
                assert_frames_match(spdf, con.sql(spec.oracle).df(), name=name)
                print(f"{sf} {name} OK ({dt}s)")
            except Exception as ex:
                fails += 1
                print(f"{sf} {name} FAIL: {str(ex)[:400]}")
        con.close()
    print("TOTAL FAILS:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
