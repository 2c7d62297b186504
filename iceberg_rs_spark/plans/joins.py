"""Join corpus (SURVEY.md §2C joins): every join kind as a
hash-checked query — inner/left/full equi-joins, semi/anti, cross,
range (non-equi), theta, as-of, interval overlap."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.operators.joins import asof_join, interval_overlap_join
from iceberg_rs_spark.plans.canon import rhalf
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table


def _r2(c):
    return F.round(c, 2)


@query(
    "join_inner_customer_totals",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total_spent
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    HAVING COUNT(*) >= 12
    ORDER BY c_custkey
    """,
    tags=("join", "inner", "having"),
)
def join_inner_customer_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + aggregate + HAVING. customer broadcasts at
    test scale via size stats (no forced hint — it is SF-proportional,
    so the planner must stay free to shuffle it at 100 TB); the
    groupBy reuses the join key so no extra shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.count("*").alias("n_orders"), _r2(F.sum("o_totalprice")).alias("total_spent"))
        .where(F.col("n_orders") >= 12)
        .orderBy("c_custkey")
    )


@query(
    "join_left_missing_side",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_1995_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS spent_1995
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey
     AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
     AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY c.c_custkey
    ORDER BY c_custkey
    """,
    tags=("join", "left"),
)
def join_left_missing_side(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a join-side filter: unmatched customers
    survive with zero counts (COUNT over the null column)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_1995_orders"),
            _r2(F.coalesce(F.sum("o_totalprice"), F.lit(0))).alias("spent_1995"),
        )
        .orderBy("c_custkey")
    )


@query(
    "join_full_outer_daily_activity",
    oracle=EVENTS_ORACLE_CTE
    + """
    , clicks AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, COUNT(*) AS n_clicks
        FROM evt WHERE event_type = 'click' GROUP BY 1),
    purchases AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               ROUND(SUM(value), 2) AS purchase_value
        FROM evt WHERE event_type = 'purchase' GROUP BY 1)
    SELECT COALESCE(c.day, p.day) AS day,
           COALESCE(n_clicks, 0) AS n_clicks,
           COALESCE(purchase_value, 0) AS purchase_value
    FROM clicks c FULL OUTER JOIN purchases p ON c.day = p.day
    ORDER BY day
    """,
    tags=("join", "full_outer", "events"),
)
def join_full_outer_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two independent daily aggregates."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    clicks = (
        ev.where(F.col("event_type") == "click").groupBy(day).agg(F.count("*").alias("n_clicks"))
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(day)
        .agg(_r2(F.sum("value")).alias("purchase_value"))
    )
    return (
        clicks.alias("c")
        .join(purchases.alias("p"), F.col("c.day") == F.col("p.day"), "full_outer")
        .select(
            F.coalesce(F.col("c.day"), F.col("p.day")).alias("day"),
            F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
            F.coalesce(F.col("purchase_value"), F.lit(0)).alias("purchase_value"),
        )
        .orderBy("day")
    )


@query(
    "join_semi_big_spenders",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    ORDER BY c_custkey
    """,
    tags=("join", "semi", "subquery"),
)
def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join = EXISTS subquery (Catalyst decorrelates EXISTS
    to exactly this plan)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "join_anti_inactive_1995",
    oracle="""
    SELECT c.c_custkey, ROUND(c.c_acctbal, 2) AS c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                        AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
    ORDER BY c_custkey
    """,
    tags=("join", "anti", "subquery"),
)
def join_anti_inactive_1995(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join = NOT EXISTS."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", _r2(F.col("c_acctbal")).alias("c_acctbal"))
        .orderBy("c_custkey")
    )


@query(
    "join_cross_region_nation",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    ORDER BY r_name, n_name
    """,
    tags=("join", "cross"),
)
def join_cross_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (both sides tiny — the only sane cross join)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


@query(
    "join_range_size_buckets",
    oracle="""
    WITH buckets(bucket_name, lo, hi) AS (
        VALUES ('small', 1, 15), ('medium', 16, 35), ('large', 36, 50))
    SELECT b.bucket_name, COUNT(*) AS n_parts,
           floor(AVG(p.p_retailprice) * 100.0 + 0.5) / 100.0 AS avg_price
    FROM part p JOIN buckets b ON p.p_size BETWEEN b.lo AND b.hi
    GROUP BY b.bucket_name
    ORDER BY bucket_name
    """,
    tags=("join", "range", "non-equi"),
)
def join_range_size_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a tiny in-line dimension —
    broadcast nested loop, the right physical plan for BETWEEN joins."""
    p = load_table(spark, sf_dir, "part")
    buckets = spark.createDataFrame(
        [("small", 1, 15), ("medium", 16, 35), ("large", 36, 50)],
        "bucket_name string, lo int, hi int",
    )
    return (
        p.join(F.broadcast(buckets), p.p_size.between(F.col("lo"), F.col("hi")))
        .groupBy("bucket_name")
        .agg(F.count("*").alias("n_parts"), rhalf(F.avg("p_retailprice")).alias("avg_price"))
        .orderBy("bucket_name")
    )


@query(
    "join_theta_late_shipments",
    oracle="""
    SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS order_month,
           COUNT(*) AS n_late
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    ORDER BY order_month
    """,
    tags=("join", "theta"),
)
def join_theta_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with a theta residual (ship > order + 90d): Catalyst
    keeps the hash join and applies the inequality as a post-filter."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("order_month"))
        .agg(F.count("*").alias("n_late"))
        .orderBy("order_month")
    )


@query(
    "join_asof_purchase_after_signup",
    oracle=EVENTS_ORACLE_CTE
    + """
    , purchases AS (SELECT * FROM evt WHERE event_type = 'purchase'),
    signups   AS (SELECT * FROM evt WHERE event_type = 'signup')
    SELECT p.event_id,
           p.user_id,
           s.event_id AS signup_event_id,
           ROUND(s.value, 2) AS signup_value
    FROM purchases p
    ASOF JOIN signups s ON p.user_id = s.user_id AND p.ts >= s.ts
    ORDER BY p.event_id
    """,
    tags=("join", "asof", "events"),
)
def join_asof_purchase_after_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the union+window idiom (operators/joins.py):
    each purchase matched to the user's most recent prior signup.
    DuckDB's native ASOF JOIN is the oracle. Inner-as-of: purchases
    with no prior signup are dropped (matching ASOF JOIN semantics)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("s_ts"),
        F.col("event_id").alias("s_event_id"),
        F.col("value").alias("s_value"),
    )
    matched = asof_join(
        purchases,
        signups,
        on=["user_id"],
        left_ts="ts",
        right_ts="s_ts",
        right_cols=["s_event_id", "s_value"],
        suffix="",
    )
    return (
        matched.where(F.col("s_event_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("s_event_id").alias("signup_event_id"),
            _r2(F.col("s_value")).alias("signup_value"),
        )
        .orderBy("event_id")
    )


@query(
    "join_interval_overlap_orders",
    oracle="""
    WITH w AS (
        SELECT o_custkey, o_orderkey, o_orderdate AS start_ts,
               o_orderdate + INTERVAL 7 DAY AS end_ts
        FROM orders)
    SELECT a.o_custkey AS custkey, COUNT(*) AS n_overlaps
    FROM w a JOIN w b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND a.start_ts < b.end_ts AND b.start_ts < a.end_ts
    GROUP BY 1
    ORDER BY custkey
    """,
    tags=("join", "interval"),
)
def join_interval_overlap_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join (7-day order windows per customer),
    equi-key on customer so it stays a hash join."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("start_ts"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("end_ts"),
    )
    joined = interval_overlap_join(
        o, o, "start_ts", "end_ts", "start_ts", "end_ts", on=["o_custkey"]
    ).where(F.col("l.o_orderkey") < F.col("r.o_orderkey"))
    return (
        joined.groupBy(F.col("l.o_custkey").alias("custkey"))
        .agg(F.count("*").alias("n_overlaps"))
        .orderBy("custkey")
    )
