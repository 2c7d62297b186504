"""Set-operation corpus (SURVEY.md §2C set ops): union (bag + distinct),
intersect / intersectAll, except / exceptAll, dropDuplicates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import load_table


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 8000
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000
    ORDER BY c_custkey
    """,
    tags=("setop", "union"),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): rich customers ∪ big-order customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.where(F.col("c_acctbal") > 8000).select("c_custkey")
    b = o.where(F.col("o_totalprice") > 450000).select(F.col("o_custkey").alias("c_custkey"))
    return a.union(b).distinct().orderBy("c_custkey")


@query(
    "setop_union_all_counts",
    oracle="""
    SELECT c_custkey, COUNT(*) AS n
    FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 8000
        UNION ALL
        SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000
    ) u
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
    tags=("setop", "union-all"),
)
def setop_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) — multiplicities preserved and counted."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.where(F.col("c_acctbal") > 8000).select("c_custkey")
    b = o.where(F.col("o_totalprice") > 450000).select(F.col("o_custkey").alias("c_custkey"))
    return a.unionAll(b).groupBy("c_custkey").agg(F.count("*").alias("n")).orderBy("c_custkey")


@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    ORDER BY c_custkey
    """,
    tags=("setop", "intersect"),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers having both F and O orders."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    b = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    return a.intersect(b).orderBy("c_custkey")


@query(
    "setop_intersect_all",
    oracle="""
    SELECT c_custkey FROM (
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT ALL
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    ) t
    ORDER BY c_custkey
    """,
    tags=("setop", "intersect-all"),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag): min(multiplicity) copies survive."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    b = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    return a.intersectAll(b).orderBy("c_custkey")


@query(
    "setop_except_all",
    oracle="""
    SELECT c_custkey FROM (
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    ) t
    ORDER BY c_custkey
    """,
    tags=("setop", "except-all"),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference of multiplicities)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    b = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    return a.exceptAll(b).orderBy("c_custkey")


@query(
    "setop_except_distinct",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    ORDER BY c_custkey
    """,
    tags=("setop", "except"),
)
def setop_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (subtract): customers who never ordered."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.subtract(o).orderBy("c_custkey")


@query(
    "setop_drop_duplicates",
    oracle="""
    SELECT COUNT(*) AS n_pairs FROM (
        SELECT DISTINCT o_custkey, o_orderstatus FROM orders
    ) t
    """,
    tags=("setop", "dedup"),
)
def setop_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a column subset (count is deterministic even
    though which row survives is not)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.dropDuplicates(["o_custkey", "o_orderstatus"])
        .agg(F.count("*").alias("n_pairs"))
    )
