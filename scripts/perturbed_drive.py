"""Perturbed-session oracle drive (pre-driver de-risking step).

The driver certifies queries with ITS OWN SparkSession, not the
engine's canonical one (`iceberg_rs_spark.session.get_spark`), so a
query can be locally green yet driver-red if its result depends on
session shape: partition count (float fold order, pandas-UDF batch
boundaries), the Arrow toPandas path, or shuffle sizing. This script
re-runs corpus queries against their DuckDB oracles under a
DELIBERATELY different session — fewer cores, 200 shuffle partitions,
Arrow disabled, optionally a non-UTC session timezone (--timezone),
whole-stage codegen off (--no-codegen), or AQE off (--no-aqe) — so any
such sensitivity fails here, before a driver round burns a
certification slot on it.

    python scripts/perturbed_drive.py            # the 50-query driver window
    python scripts/perturbed_drive.py --all      # every hash-checked query
    python scripts/perturbed_drive.py --names a,b,c
    python scripts/perturbed_drive.py --sf /root/testdata/sf0.01
    python scripts/perturbed_drive.py --all --no-codegen --no-aqe

Exit status is non-zero when any driven query mismatches, so the
ritual (record -> rotate --write -> perturbed_drive -> commit) can
gate on it.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01",
                    help="fixture directory (driver certifies at sf0.01)")
    ap.add_argument("--all", action="store_true",
                    help="drive every hash-checked corpus query, not "
                         "just the 50-query driver window")
    ap.add_argument("--names", default="",
                    help="comma-separated explicit query names")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--shuffle-partitions", type=int, default=200)
    ap.add_argument("--timezone", default=None,
                    help="session timezone override (e.g. America/New_York). "
                         "get_spark pins UTC, but the DRIVER's session may "
                         "not — a pass under a shifted tz proves every "
                         "oracle-checked result is tz-independent (NTZ "
                         "arithmetic end to end)")
    ap.add_argument("--no-codegen", action="store_true",
                    help="disable whole-stage codegen: expressions run "
                         "through the interpreted path, so a pass proves no "
                         "result depends on codegen-specific evaluation "
                         "(fold order inside generated loops, overflow "
                         "behavior of fused expressions)")
    ap.add_argument("--no-aqe", action="store_true",
                    help="disable adaptive query execution: static shuffle "
                         "sizing and join strategies, so a pass proves no "
                         "result depends on AQE's runtime re-planning "
                         "(coalesced partition count, demoted broadcasts)")
    args = ap.parse_args()

    import duckdb

    from iceberg_rs_spark.session import get_spark

    extra_conf = {"spark.sql.execution.arrow.pyspark.enabled": "false"}
    if args.no_codegen:
        extra_conf["spark.sql.codegen.wholeStage"] = "false"
    if args.no_aqe:
        extra_conf["spark.sql.adaptive.enabled"] = "false"
    spark = get_spark(
        app_name="perturbed_drive",
        cpus=args.cpus,
        shuffle_partitions=args.shuffle_partitions,
        extra_conf=extra_conf,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if args.timezone:
        spark.conf.set("spark.sql.session.timeZone", args.timezone)

    import iceberg_rs_spark.plans  # noqa: F401 — populate the registry
    from iceberg_rs_spark.plans import corpus
    from tests.oracle_utils import assert_frames_match

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    if args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
        unknown = [n for n in names if n not in corpus.CORPUS]
        if unknown:
            sys.exit(f"unknown query names: {unknown}")
    elif args.all:
        names = [n for n in corpus.CORPUS if corpus.CORPUS[n].oracle]
    else:
        names = [n for n in corpus.PRIORITY if n in corpus.CORPUS][:50]

    fails: list[str] = []
    for name in names:
        spec = corpus.CORPUS[name]
        try:
            spdf = spec.builder(spark, args.sf).toPandas()
            if spec.oracle:
                assert_frames_match(spdf, con.sql(spec.oracle).df(), name=name)
                print(name, "OK")
            else:
                print(name, "rows-only:", len(spdf))
        except Exception as exc:  # report every failure, then exit non-zero
            fails.append(name)
            print(name, "FAILED:", str(exc)[:300])
    print(f"DRIVEN {len(names)} FAILS {len(fails)} {fails}")
    if fails:
        sys.exit(1)


if __name__ == "__main__":
    main()
