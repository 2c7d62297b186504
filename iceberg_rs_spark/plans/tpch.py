"""Star-schema corpus queries (TPC-H-shaped; SURVEY.md §2C).

Each builder is pure DataFrame API — no spark.sql — so the declared
logical plan is visible and Catalyst picks the physical strategy
(broadcast-hash for the small dims, partial+final hash aggregation,
TakeOrderedAndProject for top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import load_table


def _r2(c):
    return F.round(c, 2)


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           floor(AVG(l_quantity) * 100.0 + 0.5) / 100.0      AS avg_qty,
           floor(AVG(l_extendedprice) * 100.0 + 0.5) / 100.0 AS avg_price,
           floor(AVG(l_discount) * 100.0 + 0.5) / 100.0      AS avg_disc,
           COUNT(*)                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with partial aggregation.

    The filter and the 7-column projection push down to the parquet
    scan; the groupBy keys are low-cardinality so the map-side partial
    aggregate shrinks the shuffle to a handful of rows per partition.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r2(F.sum("l_quantity")).alias("sum_qty"),
            _r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r2(F.sum(disc_price)).alias("sum_disc_price"),
            _r2(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            rhalf(F.avg("l_quantity")).alias("avg_qty"),
            rhalf(F.avg("l_extendedprice")).alias("avg_price"),
            rhalf(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact join -> agg -> top-k.

    customer is tiny relative to lineitem, so Catalyst broadcasts it
    (autoBroadcastJoinThreshold); the final orderBy+limit plans as
    TakeOrderedAndProject — no full sort of the aggregate output.
    """
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    tags=("join", "agg", "multi-join"),
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; every dimension side is broadcast-able.

    The only shuffle left at scale is lineitem x orders; region/nation/
    supplier/customer all fit under the broadcast threshold even at
    100 TB fact scale (dimension tables grow far slower than facts).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy("n_name")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "filter", "global-agg"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: global aggregate over a pushed-down range filter.

    All four predicates push to the parquet reader (min/max row-group
    skipping); the global agg is a 2-stage partial/final with a single
    row crossing the exchange.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(_r2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))


@query(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           strftime(l.l_shipdate, '%Y') AS l_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg", "tpch"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bidirectional nation-pair
    trade by year. The two nation dims broadcast; the OR-of-ANDs pair
    filter evaluates AFTER both broadcast joins, so the only shuffle
    is the final 3-key aggregate — lineitem is never re-partitioned
    for the dimension lookups."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.date_format("l_shipdate", "yyyy").alias("l_year"),
        )
        .agg(
            _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           ROUND(c.c_acctbal, 2) AS c_acctbal,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    lost revenue. Both selective filters (date range, returnflag) push
    to the scans; customer+nation broadcast; orderBy+limit plans as
    TakeOrderedAndProject so only 20 rows survive per partition."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            _r2(F.col("c_acctbal")).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(
             100.00 * SUM(CASE WHEN p.p_type = 'PROMO'
                               THEN l.l_extendedprice * (1 - l.l_discount)
                               ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    tags=("join", "agg", "tpch"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): conditional-aggregate ratio
    over one month of shipments. part broadcasts; the date range prunes
    at the parquet scan, so the join input is one month of the fact —
    at 100 TB the month filter is the difference between scanning the
    table and scanning ~1% of it."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                4,
            ).alias("promo_pct")
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): aggregate-then-argmax via a
    scalar subquery over the derived revenue view. Revenue is rounded
    BEFORE the max comparison so the argmax is bit-stable across
    engines; Catalyst evaluates the max as a subquery broadcast, not a
    self-join shuffle."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    revenue = l.groupBy("l_suppkey").agg(
        _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "total_revenue"
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(revenue, s.s_suppkey == revenue.l_suppkey)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           CAST(SUM(l.l_quantity) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o.o_orderkey
    LIMIT 25
    """,
    tags=("join", "agg", "semi-join", "tpch"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): HAVING-filtered semi
    join back onto the fact. The qualifying-orders set is tiny after
    the HAVING cut, so it broadcasts into the semi join — the fact
    table is scanned twice but shuffled only once (for its own
    group-by); no row explosion ever reaches the driver."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        l.join(big, "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            _r2(F.col("o_totalprice")).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


@query(
    "q22_idle_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0)
    SELECT c.c_mktsegment,
           COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000.0)
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    tags=("agg", "anti-join", "subquery", "tpch"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-sales opportunity): scalar-subquery
    threshold + anti join — above-average-balance customers who never
    placed a large order (every fixture customer has SOME order, so the
    idleness predicate is 'no order over 400k' to keep the result
    non-empty — the plan shape is Q22's). The average-balance scalar
    broadcasts as a 1-row cross join; the NOT EXISTS is a left-anti
    against the filtered orders key projection — two scans, one
    broadcast, no correlated per-row subquery execution."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000.0)
        .select("o_custkey")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _r2(F.sum("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey),
    eur AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
    cand AS (
        SELECT p.p_partkey, p.p_brand, e.s_name, e.s_acctbal, e.n_name,
               ps.unit_cost,
               MIN(ps.unit_cost) OVER (PARTITION BY p.p_partkey) AS min_cost
        FROM ps
        JOIN eur e ON ps.l_suppkey = e.s_suppkey
        JOIN part p ON ps.l_partkey = p.p_partkey
        WHERE p.p_size = 15 AND p.p_type = 'STANDARD')
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           {rhalf_sql('unit_cost', 4)} AS unit_cost
    FROM cand WHERE unit_cost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
    tags=("join", "window", "subquery", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): correlated-min selection
    over a part-supplier relation. The fixture has no partsupp table, so
    the relation is DERIVED from lineitem — unit_cost = min observed
    l_extendedprice/l_quantity per (part, supplier) — which keeps Q2's
    plan shape: derive, filter via broadcast dims, pick the per-part
    minimum. The per-part min is a window over the derived relation
    (one shuffle on partkey), NOT a self-join against a grouped copy —
    at 100 TB that halves the scan count; region/nation/part dims all
    broadcast."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    s = load_table(spark, sf_dir, "supplier")
    eur = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.join(eur, ps.l_suppkey == eur.s_suppkey)
        .join(p, ps.l_partkey == p.p_partkey)
        .withColumn("min_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            rhalf(F.col("unit_cost"), 4).alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("semi-join", "agg", "tpch"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): EXISTS semi-join with a
    correlated date predicate. The fixture lacks commit/receipt dates, so
    'late' is a lineitem shipped more than 60 days after its order date —
    same correlated-EXISTS plan. Spark executes it as one left-semi
    hash join on l_orderkey with the cross-side predicate evaluated in
    the join, then a low-cardinality aggregate; the quarter filter
    prunes the orders scan before the join."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH all_nations AS (
        SELECT strftime(o.o_orderdate, '%Y') AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN nation n2   ON c.c_nationkey = n2.n_nationkey
        JOIN region r    ON n2.n_regionkey = r.r_regionkey
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey
        JOIN nation n1   ON s.s_nationkey = n1.n_nationkey
        JOIN part p      ON l.l_partkey = p.p_partkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
    SELECT o_year,
           {rhalf_sql("SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END) / SUM(volume)", 4)} AS mkt_share
    FROM all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("join", "agg", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): 8-way star join, then a
    conditional-sum ratio per year. Every dimension (customer, the two
    nation aliases, region, supplier, part) broadcasts — the only
    shuffles are the lineitem⋈orders fact join and the final tiny
    aggregate. The two nation roles come from two aliased broadcasts of
    the same 25-row dim, exactly how Catalyst wants role-playing
    dimensions expressed."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat5 = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.date_format("o_orderdate", "yyyy").alias("o_year"))
        .agg(rhalf(F.sum(nat5) / F.sum(vol), 4).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           strftime(o.o_orderdate, '%Y') AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - p.p_retailprice * 0.5 * l.l_quantity), 2) AS sum_profit
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("join", "agg", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit per supplier-nation
    per year for parts matching a name pattern. The fixture has no
    partsupp.ps_supplycost, so unit cost is proxied as half the part's
    retail price — the plan (fact join + three broadcast dims + LIKE
    pushdown on the part dim BEFORE the join) is Q9's. The LIKE filter
    shrinks the broadcast, not the fact scan — at scale that is the
    difference between shipping 2000 and 2M dim rows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * 0.5 * F.col("l_quantity")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy").alias("o_year"),
        )
        .agg(_r2(F.sum(profit)).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH val AS (
        SELECT l.l_partkey AS p_key,
               SUM(l.l_extendedprice * (1 - l.l_discount)) AS value
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_7'
        GROUP BY l.l_partkey),
    total AS (SELECT SUM(value) AS t FROM val)
    SELECT p_key, ROUND(value, 2) AS value
    FROM val, total
    WHERE value > total.t * 0.001
    ORDER BY value DESC, p_key
    """,
    tags=("agg", "subquery", "tpch"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): per-part value
    within one nation's suppliers, kept only when above a fraction of
    the nation's total — an aggregate compared against a scalar
    subquery over the same aggregate. The fixture derives 'stock value'
    from lineitem revenue (no partsupp table). The scalar total rides a
    1-row broadcast cross join, so the per-part relation is scanned
    once and never collected; the fraction (0.1%) is scale-free, which
    is exactly why Q11 uses a relative threshold at any corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    val = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("p_key"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value")
        )
    )
    total = val.agg(F.sum("value").alias("t"))
    return (
        val.join(F.broadcast(total))
        .where(F.col("value") > F.col("t") * 0.001)
        .select("p_key", _r2(F.col("value")).alias("value"))
        .orderBy(F.col("value").desc(), "p_key")
    )


@query(
    "q12_late_lines_by_status",
    oracle="""
    SELECT l.l_linestatus,
           COUNT(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
               AS high_line_count,
           COUNT(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
               AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
      AND l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    tags=("join", "agg", "conditional", "tpch"),
)
def q12_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode / priority): fact-fact join with a
    conditional two-way count split. The fixture has no l_shipmode or
    receipt/commit dates, so the grouping dimension is l_linestatus and
    'late' is shipped >45 days after ordering. The year filter prunes
    the lineitem scan (pushed to parquet); the priority split is two
    count_if aggregates in ONE pass — not two joins, not two scans."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.count_if(high).alias("high_line_count"),
            F.count_if(~high).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q13_customer_order_counts",
    oracle="""
    WITH c_orders AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("outer-join", "agg", "tpch"),
)
def q13_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): left outer join with a
    join-side filter (the filter belongs in the JOIN condition, not a
    WHERE — a WHERE would turn the outer join inner and drop zero-order
    customers), then a two-level aggregate: count orders per customer,
    then the histogram of those counts. Two shuffles total, both keyed
    small; the second aggregate input is |customers| rows, already tiny
    relative to the fact."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ls.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ls
    JOIN part p ON ls.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND ls.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    tags=("agg", "distinct", "anti-join", "tpch"),
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (part-supplier relationship count): distinct
    supplier count per part attribute triple, excluding flagged
    suppliers (negative account balance stands in for the complaints
    predicate; the part-supplier relation derives from lineitem). The
    distinct pair projection happens BEFORE the dim join — dedup on the
    narrow (partkey, suppkey) pair, then broadcast-join the filtered
    part dim; the excluded-supplier set is a broadcast anti join, never
    a NOT IN subquery executed per row."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    )
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    return (
        pairs.join(bad, pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH avg_qty AS (
        SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg
        FROM lineitem GROUP BY l_partkey)
    SELECT {rhalf_sql('SUM(l.l_extendedprice) / 7.0', 2)} AS avg_yearly
    FROM lineitem l
    JOIN part p    ON l.l_partkey = p.p_partkey
    JOIN avg_qty a ON l.l_partkey = a.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
      AND l.l_quantity < a.half_avg
    """,
    tags=("join", "subquery", "agg", "tpch"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): correlated
    average subquery — lineitems whose quantity is below half their
    part's average quantity. Expressed as an aggregate-then-rejoin
    (grouped half-averages broadcast back onto the fact), which is the
    de-correlated plan every optimizer rewrites Q17 into; the brand
    filter shrinks the dim broadcast first. Single-row result."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("a_partkey"))
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(rhalf(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "filter", "tpch"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): a
    join whose residual condition is an OR of conjunct groups mixing
    both sides' columns. The part dim pre-filters to the union of the
    three brand/size envelopes (pushable), the fact side to the union
    of quantity ranges, and the exact disjunction evaluates as the
    broadcast join's residual — the standard decomposition that keeps
    the scans tight when the OR itself cannot push down."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    g1 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    g2 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    g3 = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    p_pre = p.where(
        F.col("p_brand").isin("Brand#2", "Brand#3", "Brand#4")
        & F.col("p_size").between(1, 15)
    )
    li_pre = li.where(F.col("l_quantity").between(1, 30))
    return (
        li_pre.join(p_pre, li.l_partkey == p.p_partkey)
        .where(g1 | g2 | g3)
        .agg(
            _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
    )


@query(
    "q20_excess_shippers",
    oracle="""
    WITH shipped AS (
        SELECT l.l_partkey, l.l_suppkey,
               SUM(l.l_quantity) AS total_qty,
               SUM(l.l_quantity) FILTER (
                   WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                     AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
                   AS qty_1997
        FROM lineitem l
        GROUP BY l.l_partkey, l.l_suppkey)
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM shipped sh
    JOIN part p     ON sh.l_partkey = p.p_partkey
    JOIN supplier s ON sh.l_suppkey = s.s_suppkey
    WHERE p.p_name LIKE 'small%'
      AND sh.qty_1997 > 0.3 * sh.total_qty
    ORDER BY s.s_suppkey
    """,
    tags=("semi-join", "agg", "subquery", "tpch"),
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers who shipped
    an outsized share of a part family in one year. The availqty
    threshold becomes '1997 shipments exceed 30% of the supplier's
    all-time shipments of that part' — derived in ONE grouped pass over
    lineitem with a filtered partial sum (no second scan, no
    self-join), then dim joins and a distinct supplier projection
    (the EXISTS collapse). At 100 TB the single-scan derivation is the
    point: Q20's nested NOT-EXISTS formulation re-scans lineitem
    twice."""
    li = load_table(spark, sf_dir, "lineitem")
    in_1997 = (
        F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("total_qty"),
        F.sum(F.when(in_1997, F.col("l_quantity"))).alias("qty_1997"),
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        shipped.join(p, F.col("l_partkey") == p.p_partkey)
        .where(F.col("qty_1997") > 0.3 * F.col("total_qty"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH fl AS (
        SELECT l.l_orderkey, l.l_suppkey,
               l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F')
    SELECT s.s_name, COUNT(*) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM fl WHERE late) l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (SELECT 1 FROM fl l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM fl l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    tags=("semi-join", "anti-join", "agg", "tpch"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for
    finished orders, suppliers whose line was late (shipped >60 days
    after ordering) while every OTHER supplier on the order was on
    time — EXISTS(other supplier) AND NOT EXISTS(other late supplier).
    Expressed as one pass deriving per-(order, supplier) late flags,
    then a semi join (some other supplier exists) and an anti join (no
    other late supplier) against compact distinct projections of that
    same derivation — three shuffles on l_orderkey total, supplier dim
    broadcast at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    fl = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("late"),
        )
        .distinct()
    )
    l1 = fl.where("late").select("l_orderkey", "l_suppkey").distinct()
    others = fl.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp")
    ).distinct()
    late_others = fl.where("late").select(
        F.col("l_orderkey").alias("lo_key"), F.col("l_suppkey").alias("lo_supp")
    ).distinct()
    s = load_table(spark, sf_dir, "supplier")
    return (
        l1.join(
            others,
            (l1.l_orderkey == F.col("o_key")) & (l1.l_suppkey != F.col("o_supp")),
            "left_semi",
        )
        .join(
            late_others,
            (l1.l_orderkey == F.col("lo_key")) & (l1.l_suppkey != F.col("lo_supp")),
            "left_anti",
        )
        .join(s, l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
