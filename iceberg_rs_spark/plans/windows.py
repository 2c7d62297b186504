"""Window-function corpus (SURVEY.md §2C windows): ranking family,
lag/lead, first/last/nth, running + moving frames, RANGE frames,
per-group top-k."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.operators.topk import per_group_topk
from iceberg_rs_spark.plans.canon import rhalf
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import load_table


def _r2(c):
    return F.round(c, 2)


@query(
    "win_rank_family",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           ROW_NUMBER()   OVER w AS rn,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           NTILE(4)       OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_custkey
    """,
    tags=("window", "ranking"),
)
def win_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six ranking functions over one window (single shuffle+sort;
    Spark evaluates them in the same WindowExec)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    ).orderBy("c_custkey")


@query(
    "win_lag_lead_order_gaps",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           datediff('day',
                    lag(o_orderdate) OVER w,
                    o_orderdate) AS days_since_prev,
           lead(o_orderkey) OVER w AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "lag-lead"),
)
def win_lag_lead_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: days between consecutive orders per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "win_running_totals",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           floor(AVG(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100.0 + 0.5) / 100.0 AS running_avg
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "running"),
)
def win_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum/avg with an explicit ROWS frame and a total order
    (date + key) so float accumulation order is deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        _r2(F.sum("o_totalprice").over(w)).alias("running_total"),
        rhalf(F.avg("o_totalprice").over(w)).alias("running_avg"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "win_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           floor(AVG(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100.0 + 0.5) / 100.0 AS moving_avg3
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "moving"),
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average (sliding ROWS frame)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", rhalf(F.avg("o_totalprice").over(w)).alias("moving_avg3")
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "win_range_frame_balance",
    oracle="""
    SELECT c_custkey,
           COUNT(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
                          RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING) AS n_near_balance
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("window", "range-frame"),
)
def win_range_frame_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric ordering — peers counted by value
    distance (±100), not row position."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal").rangeBetween(-100, 100)
    return c.select(
        "c_custkey", F.count("*").over(w).alias("n_near_balance")
    ).orderBy("c_custkey")


@query(
    "win_first_last_nth",
    oracle="""
    SELECT DISTINCT o_orderpriority,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey)  OVER w AS last_key,
           nth_value(o_orderkey, 3) OVER w AS third_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_orderpriority
    """,
    tags=("window", "analytic"),
)
def win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth over the full partition frame (the frame must be
    explicit — the default frame stops at CURRENT ROW and makes
    last_value useless)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.select(
            "o_orderpriority",
            F.first("o_orderkey").over(w).alias("first_key"),
            F.last("o_orderkey").over(w).alias("last_key"),
            F.nth_value("o_orderkey", 3).over(w).alias("third_key"),
        )
        .distinct()
        .orderBy("o_orderpriority")
    )


@query(
    "win_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey) <= 3
    ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey
    """,
    tags=("window", "topk"),
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via the row_number idiom (operators/topk.py)."""
    o = load_table(spark, sf_dir, "orders")
    top = per_group_topk(
        o, ["o_orderpriority"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], 3
    )
    return top.select(
        "o_orderpriority", "o_orderkey", _r2(F.col("o_totalprice")).alias("o_totalprice")
    ).orderBy("o_orderpriority", F.col("o_totalprice").desc(), "o_orderkey")


@query(
    "sort_four_null_orderings",
    oracle="""
    WITH t AS (
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE ROUND(c_acctbal, 2) END AS bal
        FROM customer WHERE c_custkey <= 50)
    SELECT c_custkey, bal,
           ROW_NUMBER() OVER (ORDER BY bal ASC  NULLS FIRST, c_custkey) AS rn_anf,
           ROW_NUMBER() OVER (ORDER BY bal ASC  NULLS LAST,  c_custkey) AS rn_anl,
           ROW_NUMBER() OVER (ORDER BY bal DESC NULLS FIRST, c_custkey) AS rn_dnf,
           ROW_NUMBER() OVER (ORDER BY bal DESC NULLS LAST,  c_custkey) AS rn_dnl
    FROM t
    ORDER BY c_custkey
    """,
    tags=("sort", "null-order"),
)
def sort_four_null_orderings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four direction × null-order combinations of the reference's
    sort model (sort.rs:11-31), exercised in one query."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 50)
    t = c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(_r2(F.col("c_acctbal"))).alias("bal"),
    )
    mk = lambda order: F.row_number().over(Window.orderBy(order, F.col("c_custkey")))
    return t.select(
        "c_custkey",
        "bal",
        mk(F.col("bal").asc_nulls_first()).alias("rn_anf"),
        mk(F.col("bal").asc_nulls_last()).alias("rn_anl"),
        mk(F.col("bal").desc_nulls_first()).alias("rn_dnf"),
        mk(F.col("bal").desc_nulls_last()).alias("rn_dnl"),
    ).orderBy("c_custkey")
