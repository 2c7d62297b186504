"""Round-4 corpus additions, batch 18: binary encoding functions,
deterministic arg-max aggregates, and DAU/MAU engagement ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

# ---------------------------------------------------------------------------
# Binary encoding family
# ---------------------------------------------------------------------------


@query(
    "fn_encoding_family",
    oracle="""
    SELECT n_nationkey,
           base64(CAST(n_name AS BLOB)) AS b64,
           CAST(from_base64(base64(CAST(n_name AS BLOB))) AS VARCHAR)
               AS roundtrip,
           lower(hex(CAST(n_name AS BLOB))) AS hexed,
           CAST(unhex(hex(CAST(n_name AS BLOB))) AS VARCHAR) AS unhexed,
           CAST(octet_length(CAST(n_name AS BLOB)) AS BIGINT) AS n_bytes
    FROM nation
    ORDER BY n_nationkey
    """,
    tags=("function", "encoding", "binary"),
)
def fn_encoding_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encoding family: base64/unbase64 and hex/unhex
    round-trips over UTF-8 bytes — the transport encodings multimodal
    columns and webhook payloads pass through (the multimodal stack
    stores raw bytes; these are the text-safe envelopes). Both
    engines agree on the RFC 4648 alphabet and byte-wise hex;
    round-trips certify the decode direction too. Hex is lowercased
    because Spark emits uppercase and DuckDB lowercase — the one
    place the encodings diverge."""
    n = load_table(spark, sf_dir, "nation")
    as_bin = F.col("n_name").cast("binary")
    return n.select(
        "n_nationkey",
        F.base64(as_bin).alias("b64"),
        F.unbase64(F.base64(as_bin)).cast("string").alias("roundtrip"),
        F.lower(F.hex(as_bin)).alias("hexed"),
        F.unhex(F.hex(as_bin)).cast("string").alias("unhexed"),
        F.length(as_bin).cast("long").alias("n_bytes"),
    ).orderBy("n_nationkey")


# ---------------------------------------------------------------------------
# Deterministic arg-max / arg-min aggregates
# ---------------------------------------------------------------------------


@query(
    "agg_arg_min_max_family",
    oracle="""
    SELECT o_orderpriority,
           arg_max(o_orderstatus, o_orderkey) AS latest_status,
           arg_min(o_orderstatus, o_orderkey) AS first_status,
           CAST(arg_max(o_orderkey, o_orderkey) AS BIGINT) AS max_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key_check
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("aggregate", "arg-max"),
)
def agg_arg_min_max_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by (SQL-standard arg-max): the value of one
    column at another column's extremum, in a single aggregation pass
    instead of a self-join or rank window. Deterministic ONLY because
    the ordering key (o_orderkey) is unique per group — with ties
    both engines pick arbitrarily, which is why the determinism rules
    otherwise route these shapes through row_number windows. The
    max_key_check column pins the arg-max against plain max."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderstatus", "o_orderkey").alias("latest_status"),
            F.min_by("o_orderstatus", "o_orderkey").alias("first_status"),
            F.max_by("o_orderkey", "o_orderkey").cast("long").alias("max_key"),
            F.max("o_orderkey").cast("long").alias("max_key_check"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# DAU / MAU stickiness
# ---------------------------------------------------------------------------


@query(
    "events_dau_mau_stickiness",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    dau AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
        FROM evt GROUP BY 1),
    mau AS (
        SELECT CAST(date_trunc('month', ts) AS DATE) AS month_start,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
        FROM evt GROUP BY 1)
    SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, m.mau,
           {rhalf_sql('d.dau * 1.0 / m.mau', 6)} AS stickiness
    FROM dau d
    JOIN mau m ON m.month_start = CAST(date_trunc('month', d.day) AS DATE)
    ORDER BY day
    """,
    tags=("events", "engagement", "dau-mau"),
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness: daily distinct users over their calendar
    month's distinct users — the engagement ratio product dashboards
    lead with. Two independent distinct aggregations at different
    grains joined on the month key (a day's MAU is its month's, so
    the join is 1:1); both distincts shuffle on (period, user) and
    the tiny per-period tables join broadcast. Month truncation is
    calendar arithmetic identical in both engines."""
    ev = load_table(spark, sf_dir, "events")
    dau = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    mau = ev.groupBy(
        F.to_date(F.date_trunc("month", "ts")).alias("month_start")
    ).agg(F.countDistinct("user_id").cast("long").alias("mau"))
    joined = dau.join(
        mau,
        F.to_date(F.date_trunc("month", "day")) == F.col("month_start"),
    )
    return joined.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "dau",
        "mau",
        rhalf(F.col("dau") * 1.0 / F.col("mau"), 6).alias("stickiness"),
    ).orderBy("day")
