"""Loaders for the driver-generated parquet fixtures (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: Legacy events layout: ts stored as parquet TIMESTAMP(NANOS), which
#: Spark's reader rejects; read it as long ns and rebuild a
#: TIMESTAMP_NTZ truncated to micros. Truncation (DIV) rather than
#: rounding matches DuckDB's make_timestamp(epoch_ns(ts)//1000), and
#: interval arithmetic keeps the conversion timezone-independent
#: (works under any session tz).
_EVENTS_TS_EXPR = (
    "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ) + make_dt_interval(0, 0, 0, "
    "CAST(CAST(ts DIV 1000 AS DECIMAL(25,6)) / 1000000 AS DECIMAL(20,6)))"
)

#: DuckDB-side equivalent rewrite for oracle SQL: the driver registers
#: `events` over the raw parquet, so oracles select from the `evt` CTE
#: instead (a CTE named `events` would be a circular ref). epoch_ns
#: works on both layouts (ns-int64 read as TIMESTAMP by DuckDB, and
#: native timestamp[us]), so one CTE serves either fixture generation.
EVENTS_ORACLE_CTE = (
    "WITH evt AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) "
    "FROM events)"
)


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to TIMESTAMP_NTZ at micro precision across
    fixture generations: ns-as-long (legacy TIMESTAMP(NANOS) files read
    under nanosAsLong) gets the truncating rebuild; native timestamp
    columns just cast to NTZ."""
    dt = df.schema["ts"].dataType.typeName()
    if dt in ("long", "bigint"):
        return df.withColumn("ts", F.expr(_EVENTS_TS_EXPR))
    if dt == "timestamp":
        # A TIMESTAMP_LTZ read (isAdjustedToUTC parquet files) would
        # make the NTZ cast below session-timezone-dependent and
        # silently shift rows relative to the oracle's epoch_ns
        # rewrite. No fixture generation has produced LTZ so far; fail
        # loudly rather than shift (ADVICE r3). The safe conversion,
        # if ever needed: to_utc_timestamp(ts, session tz) → NTZ.
        raise TypeError(
            "events.ts read as session-zoned TIMESTAMP_LTZ; refusing the "
            "tz-dependent cast to TIMESTAMP_NTZ — convert via UTC micros "
            "arithmetic instead"
        )
    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Column pruning / predicate pushdown reach
    the parquet scan because this is a plain DataSourceV2 file scan."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return normalize_events_ts(df)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
