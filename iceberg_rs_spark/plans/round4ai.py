"""Round-4 corpus additions, batch 34: character/byte scalar family
and hierarchical share-of-parent contributions.

Share-of-parent is the missing composition between plain rollup
(`agg_rollup_revenue`, which emits absolute subtotals) and flat
percent-of-total: every node's share of its IMMEDIATE parent in the
region → nation hierarchy, which is what drill-down dashboards
actually display.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import load_table

# ---------------------------------------------------------------------------
# Character / byte scalar family
# ---------------------------------------------------------------------------


@query(
    "fn_char_byte_family",
    oracle="""
    SELECT n_nationkey,
           ascii(n_name) AS first_code,
           chr(CAST(65 + n_nationkey % 26 AS INTEGER)) AS wheel_char,
           CAST(length(n_name) AS INTEGER) AS n_chars,
           CAST(strlen(n_name) AS INTEGER) AS n_bytes,
           CAST(strlen(n_name) * 8 AS INTEGER) AS n_bits,
           upper(chr(ascii(n_name))) AS first_char
    FROM nation
    ORDER BY n_nationkey
    """,
    tags=("scalar", "string", "bytes"),
)
def fn_char_byte_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character/byte inspection scalars: ascii (leading code point),
    chr (code point → character, exercised as a mod-26 wheel),
    char-vs-byte lengths (equal on ASCII fixture names, the
    distinction that matters once UTF-8 multibyte text appears — the
    documents pipeline counts both), bit_length, and the
    chr∘ascii round-trip. All codegen'd JVM expressions over the
    nation dimension.

    Cross-engine caveat (ADVICE r4): the hash pairing assumes the
    nation-name fixture is ASCII — Spark ``ascii()`` returns the
    leading BYTE-derived value for non-ASCII while DuckDB returns the
    Unicode code point, so a non-ASCII fixture would need
    ``unicode()``/codepoint-based expressions on both sides."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.ascii("n_name").alias("first_code"),
        F.char(65 + F.col("n_nationkey") % 26).alias("wheel_char"),
        F.length("n_name").alias("n_chars"),
        F.octet_length("n_name").alias("n_bytes"),
        F.bit_length("n_name").alias("n_bits"),
        F.upper(F.char(F.ascii("n_name"))).alias("first_char"),
    ).orderBy("n_nationkey")


# ---------------------------------------------------------------------------
# Hierarchical share-of-parent
# ---------------------------------------------------------------------------


@query(
    "agg_share_of_parent_rollup",
    oracle=f"""
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100
                              + 0.5) AS BIGINT)) AS cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name)
    SELECT region, nation,
           CAST(cents AS BIGINT) AS revenue_cents,
           {rhalf_sql(
               'cents * 1.0 / SUM(cents) OVER (PARTITION BY region)', 4
           )} AS share_of_region,
           {rhalf_sql('SUM(cents) OVER (PARTITION BY region) * 1.0 '
                      '/ SUM(cents) OVER ()', 4)} AS region_share_of_total,
           {rhalf_sql('cents * 1.0 / SUM(cents) OVER ()', 4)}
               AS share_of_total,
           CAST(RANK() OVER (PARTITION BY region
                             ORDER BY cents DESC, nation) AS INTEGER)
               AS rank_in_region
    FROM rev
    ORDER BY region, nation
    """,
    tags=("aggregate", "hierarchy", "share"),
)
def agg_share_of_parent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical contribution analysis over region → nation:
    every nation's share of its region, each region's share of the
    total, the multiplied-through global share (the drill-down
    numbers dashboards display beside rollup subtotals), and the
    within-region revenue rank. Exact integer-cents revenue to one
    region×nation relation, then three window aggregates sharing the
    region partitioning — Catalyst plans a single exchange for the
    region-partitioned pair and one coalesce for the global frame."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(cents).alias("cents"))
    )
    wreg = Window.partitionBy("region")
    wall = Window.partitionBy()
    wrank = Window.partitionBy("region").orderBy(
        F.col("cents").desc(), "nation"
    )
    return rev.select(
        "region",
        "nation",
        F.col("cents").alias("revenue_cents"),
        rhalf(F.col("cents") * 1.0 / F.sum("cents").over(wreg), 4).alias(
            "share_of_region"
        ),
        rhalf(
            F.sum("cents").over(wreg) * 1.0 / F.sum("cents").over(wall), 4
        ).alias("region_share_of_total"),
        rhalf(F.col("cents") * 1.0 / F.sum("cents").over(wall), 4).alias(
            "share_of_total"
        ),
        F.rank().over(wrank).alias("rank_in_region"),
    ).orderBy("region", "nation")
