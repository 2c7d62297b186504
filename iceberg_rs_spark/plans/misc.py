"""Remaining declared-surface pieces (SURVEY.md §2C): null-safe
equality, the approx sketches (provided, rows-only by the determinism
rule), and deterministic salting for skewed keys — salted plans must
equal their unsalted oracles exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.operators.skew import salted_agg, salted_join
from iceberg_rs_spark.plans.canon import rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table


@query(
    "fn_null_safe_equality",
    oracle="""
    SELECT o_orderkey,
           CAST(NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULLIF(o_orderstatus, 'O') AS INTEGER) AS self_nse,
           CAST(NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F' AS INTEGER) AS vs_f,
           CAST(NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL AS INTEGER) AS vs_null,
           CAST(NULLIF(o_orderstatus, 'O') = 'F' AS INTEGER) AS plain_eq
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
    tags=("scalar", "null-safe-equality"),
)
def fn_null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`<=>` vs `=` on nullable values: null <=> null is true, null =
    anything is null (shown as a null INTEGER next to the 0/1s)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    v = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        v.eqNullSafe(v).cast("int").alias("self_nse"),
        v.eqNullSafe(F.lit("F")).cast("int").alias("vs_f"),
        v.eqNullSafe(F.lit(None).cast("string")).cast("int").alias("vs_null"),
        (v == "F").cast("int").alias("plain_eq"),
    ).orderBy("o_orderkey")


@query(
    "agg_approx_sketches",
    oracle=None,  # sketches differ across engines by design (FIXTURES.md rule)
    tags=("agg", "approx", "sketch"),
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) and approx_percentile —
    provided, deterministic within Spark, but excluded from
    hash-checking: sketch implementations differ across engines. The
    exact counterparts are hash-checked in agg_multi_distinct and
    agg_stats_by_nation."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.approx_percentile("l_extendedprice", F.lit(0.5)).alias("approx_median"),
            F.approx_percentile("l_extendedprice", F.lit(0.95)).alias("approx_p95"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "skew_salted_agg",
    oracle=f"""
    {EVENTS_ORACLE_CTE}
    SELECT event_type,
           COUNT(value) AS count_value,
           {rhalf_sql('SUM(value)', 2)} AS rounded_sum
    FROM evt
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("skew", "salting", "agg"),
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over a 5-hot-key distribution
    (event_type): stage 1 spreads each hot key over 16 salt buckets,
    stage 2 combines — the result must equal the plain GROUP BY."""
    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev, ["event_type"], {"value": "sum"}, salt_col="event_id", buckets=16
    )
    counted = salted_agg(
        ev, ["event_type"], {"value": "count"}, salt_col="event_id", buckets=16
    )
    return (
        counted.join(out, "event_type")
        .select(
            "event_type",
            F.col("count_value"),
            F.round(F.col("sum_value"), 2).alias("rounded_sum"),
        )
        .orderBy("event_type")
    )


@query(
    "skew_salted_join",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    dim AS (
        SELECT DISTINCT event_type,
               CASE event_type WHEN 'purchase' THEN 10.0 ELSE 1.0 END AS weight
        FROM evt)
    SELECT e.event_type,
           COUNT(*) AS n,
           {rhalf_sql('SUM(e.value * d.weight)', 2)} AS weighted
    FROM evt e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    tags=("skew", "salting", "join"),
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join against a 5-row dimension: the big side salts
    deterministically, the dim replicates 16×, and the joined result
    must equal the unsalted join exactly."""
    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn(
            "weight",
            F.when(F.col("event_type") == "purchase", F.lit(10.0)).otherwise(F.lit(1.0)),
        )
    )
    joined = salted_join(ev, dim, key="event_type", salt_source_col="event_id")
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value") * F.col("weight")), 2).alias("weighted"),
        )
        .orderBy("event_type")
    )
