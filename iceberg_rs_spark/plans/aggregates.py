"""Aggregation corpus (SURVEY.md §2C aggregations): statistical aggs,
ROLLUP/CUBE/GROUPING SETS + grouping_id, filtered aggregation, pivot,
multi-distinct, sorted collect_set, exact-decimal aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.plans.canon import rhalf
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import load_table


def _r2(c):
    return F.round(c, 2)


def _r4(c):
    return F.round(c, 4)


@query(
    "agg_stats_by_nation",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n,
           floor(AVG(c_acctbal) * 100.0 + 0.5) / 100.0 AS avg_bal,
           ROUND(STDDEV_SAMP(c_acctbal), 4) AS sd_bal,
           ROUND(VAR_POP(c_acctbal), 4) AS var_bal,
           ROUND(MIN(c_acctbal), 2) AS min_bal,
           ROUND(MAX(c_acctbal), 2) AS max_bal
    FROM customer
    GROUP BY c_nationkey
    HAVING COUNT(*) > 1
    ORDER BY c_nationkey
    """,
    tags=("agg", "stats"),
)
def agg_stats_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev_samp / var_pop with partial
    aggregation (all are algebraic — single shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n"),
            rhalf(F.avg("c_acctbal")).alias("avg_bal"),
            _r4(F.stddev_samp("c_acctbal")).alias("sd_bal"),
            _r4(F.var_pop("c_acctbal")).alias("var_bal"),
            _r2(F.min("c_acctbal")).alias("min_bal"),
            _r2(F.max("c_acctbal")).alias("max_bal"),
        )
        .where(F.col("n") > 1)
        .orderBy("c_nationkey")
    )


@query(
    "agg_corr_covar",
    oracle="""
    SELECT l_returnflag,
           ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           ROUND(COVAR_POP(l_discount, l_tax), 6) + 0.0 AS covar_disc_tax
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate aggregates: corr / covar_samp / covar_pop."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            _r4(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
            _r2(F.covar_samp("l_quantity", "l_extendedprice")).alias("covar_qty_price"),
            F.round(F.covar_pop("l_discount", "l_tax"), 6).alias("covar_disc_tax"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_rollup_revenue",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
    tags=("agg", "rollup"),
)
def agg_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping_id — subtotals + grand total in one pass."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "revenue",
        )
        .orderBy("returnflag", "linestatus")
    )


@query(
    "agg_cube_orders",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
    tags=("agg", "cube"),
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping combinations."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            _r2(F.sum("o_totalprice")).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(n.n_name, 'ALL') AS nation,
           COALESCE(c.c_mktsegment, 'ALL') AS segment,
           COUNT(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n.n_name), (c.c_mktsegment))
    ORDER BY nation, segment
    """,
    tags=("agg", "grouping-sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (one aggregate per set, unioned by the
    planner — not two scans)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    j.createOrReplaceTempView("_cust_nation")
    return spark.sql(
        """
        SELECT COALESCE(n_name, 'ALL') AS nation,
               COALESCE(c_mktsegment, 'ALL') AS segment,
               COUNT(*) AS n_customers
        FROM _cust_nation
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
        ORDER BY nation, segment
        """
    )


@query(
    "agg_filtered",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2) AS rev_high_disc,
           ROUND(SUM(l_extendedprice) FILTER (WHERE l_discount <= 0.05), 2) AS rev_low_disc,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "filtered"),
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregation — sum(CASE WHEN ...) form, identical
    semantics to SQL FILTER clauses."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            _r2(F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice")))).alias(
                "rev_high_disc"
            ),
            _r2(F.sum(F.when(F.col("l_discount") <= 0.05, F.col("l_extendedprice")))).alias(
                "rev_low_disc"
            ),
            F.count(F.when(F.col("l_quantity") > 25, F.lit(1))).alias("n_bulk"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0), 2) AS F,
           ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 0), 2) AS O,
           ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 0), 2) AS P
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("agg", "pivot"),
)
def agg_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with declared values (never undeclared — that would scan
    twice and break plan caching)."""
    o = load_table(spark, sf_dir, "orders")
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("o_totalprice"))
    )
    return out.select(
        "o_orderpriority",
        *[_r2(F.coalesce(F.col(s), F.lit(0))).alias(s) for s in ("F", "O", "P")],
    ).orderBy("o_orderpriority")


@query(
    "agg_multi_distinct",
    oracle="""
    SELECT l_linestatus,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("agg", "distinct"),
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) — planned as expand + two-phase agg."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_linestatus")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT r.r_name,
           array_to_string(list_sort(list(DISTINCT n.n_name)), ',') AS nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r_name
    """,
    tags=("agg", "collect"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set canonicalized through array_sort + array_join
    (FIXTURES.md rule 5: unordered collections sorted before compare)."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations"))
        .orderBy("r_name")
    )


@query(
    "agg_decimal_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price_exact,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty_exact,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST((1 - l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS rev_exact
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "decimal"),
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal aggregation: order-independent exact sums (the float
    canonicalization problem solved at the type level — SURVEY.md §1.2
    decimal(P,S) arithmetic). The *computation* is exact decimal; the
    output is cast to double only because pandas/Arrow decimal
    representations differ across engines."""
    l = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(18,6)")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.sum(price).cast("double").alias("sum_price_exact"),
            F.sum(qty).cast("double").alias("sum_qty_exact"),
            F.sum(price * disc).cast("decimal(38,4)").cast("double").alias("rev_exact"),
        )
        .orderBy("l_returnflag")
    )
