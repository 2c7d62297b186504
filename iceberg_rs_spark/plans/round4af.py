"""Round-4 corpus additions, batch 31: quantified subquery
comparisons, robust trimmed/winsorized means, and max drawdown.

ALL/ANY quantified comparisons are the last classic subquery shape
the corpus lacked after EXISTS/IN (`sub_in_exists_family`); Spark has
no native `> ALL`, so the query certifies the standard max/min
rewrite against DuckDB's native quantifiers — including the empty-set
edge where `> ALL (empty)` is TRUE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

# ---------------------------------------------------------------------------
# Quantified comparisons (ALL / ANY)
# ---------------------------------------------------------------------------


@query(
    "sub_quantified_all_any",
    oracle="""
    WITH urgent AS (
        SELECT o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'),
    empty_set AS (
        SELECT o_totalprice FROM orders WHERE o_orderpriority = 'NO-SUCH')
    SELECT * FROM (
        SELECT 'gt_all_urgent' AS variant, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE o_totalprice > ALL (SELECT * FROM urgent)
        UNION ALL
        SELECT 'gt_any_urgent', CAST(COUNT(*) AS BIGINT)
        FROM orders
        WHERE o_totalprice > ANY (SELECT * FROM urgent)
        UNION ALL
        SELECT 'lt_all_urgent', CAST(COUNT(*) AS BIGINT)
        FROM orders
        WHERE o_totalprice < ALL (SELECT * FROM urgent)
        UNION ALL
        SELECT 'gt_all_empty', CAST(COUNT(*) AS BIGINT)
        FROM orders
        WHERE o_totalprice > ALL (SELECT * FROM empty_set))
    ORDER BY variant
    """,
    tags=("subquery", "quantified", "semantics"),
)
def sub_quantified_all_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified subquery comparisons — `> ALL`, `> ANY`, `< ALL`,
    and the `> ALL (empty set)` edge (vacuously TRUE for every row):
    Spark has no native quantifiers, so the engine side certifies the
    standard aggregate rewrite — x > ALL S ⇔ x > max(S) (S
    non-null), x > ANY S ⇔ x > min(S), empty S ⇒ ALL is TRUE — each
    scalar riding in a 1-row broadcast instead of a per-row
    subquery. DuckDB runs its native ALL/ANY, so the rewrite's
    equivalence is what the hash check proves. The urgent-order
    price set is the quantifier domain; counts over the full orders
    table."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").agg(
        F.max("o_totalprice").alias("mx"),
        F.min("o_totalprice").alias("mn"),
        F.count("*").alias("cnt"),
    )
    empty = o.where(F.col("o_orderpriority") == "NO-SUCH").agg(
        F.max("o_totalprice").alias("emx"), F.count("*").alias("ecnt")
    )
    # One conditional-aggregation pass instead of four separate
    # count() actions (guide §1.2/§2.3): the r13 form re-scanned
    # orders AND re-derived both broadcast aggregates per variant —
    # 4 scans + 8 aggregate jobs for four exact counts that one
    # HashAggregate with map-side partials produces identically.
    base = o.crossJoin(F.broadcast(urgent)).crossJoin(F.broadcast(empty))
    cnt = lambda cond: F.sum(cond.cast("long")).alias("n")  # noqa: E731
    row = base.agg(
        cnt(F.col("o_totalprice") > F.col("mx")).alias("gt_all"),
        cnt(F.col("o_totalprice") > F.col("mn")).alias("gt_any"),
        cnt(F.col("o_totalprice") < F.col("mn")).alias("lt_all"),
        cnt(
            (F.col("ecnt") == 0) | (F.col("o_totalprice") > F.col("emx"))
        ).alias("gt_all_empty"),
    ).collect()[0]
    rows = [
        ("gt_all_urgent", row["gt_all"]),
        ("gt_any_urgent", row["gt_any"]),
        ("lt_all_urgent", row["lt_all"]),
        ("gt_all_empty", row["gt_all_empty"]),
    ]
    return spark.createDataFrame(
        rows, "variant string, n_orders long"
    ).orderBy("variant")


# ---------------------------------------------------------------------------
# Trimmed and winsorized means
# ---------------------------------------------------------------------------


@query(
    "agg_trimmed_winsorized_mean",
    oracle=f"""
    WITH v AS (
        SELECT o_orderpriority AS prio, o_totalprice AS x,
               PERCENT_RANK() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice, o_orderkey) AS pr
        FROM orders),
    b AS (
        SELECT prio,
               quantile_cont(x, 0.05) AS lo,
               quantile_cont(x, 0.95) AS hi
        FROM v GROUP BY prio)
    SELECT v.prio,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {rhalf_sql('AVG(v.x)', 2)} AS plain_mean,
           {rhalf_sql(
               'AVG(v.x) FILTER (WHERE v.pr >= 0.05 AND v.pr <= 0.95)', 2
           )} AS trimmed_mean,
           {rhalf_sql(
               'AVG(GREATEST(b.lo, LEAST(b.hi, v.x)))', 2
           )} AS winsorized_mean
    FROM v JOIN b USING (prio)
    GROUP BY v.prio
    ORDER BY v.prio
    """,
    tags=("aggregate", "robust", "statistics"),
)
def agg_trimmed_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust means per order priority: the 5% two-sided TRIMMED mean
    (drop rows whose percent_rank falls outside [0.05, 0.95] under a
    deterministic (value, key) order) and the WINSORIZED mean (clamp
    to the exact p5/p95 boundaries instead of dropping) beside the
    plain mean — the outlier-resistant estimators dashboards switch
    to when heavy tails make averages lie. One window pass for
    ranks, one exact-percentile aggregate for the clamp bounds
    (group-sized relation), one filtered/clamped aggregate; all
    rounding at the edge."""
    o = load_table(spark, sf_dir, "orders")
    wv = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    v = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").alias("x"),
        F.percent_rank().over(wv).alias("pr"),
    )
    b = v.groupBy("prio").agg(
        F.percentile("x", F.lit(0.05)).alias("lo"),
        F.percentile("x", F.lit(0.95)).alias("hi"),
    )
    joined = v.join(b, "prio")
    return (
        joined.groupBy("prio")
        .agg(
            F.count("*").alias("n_orders"),
            rhalf(F.avg("x"), 2).alias("plain_mean"),
            rhalf(
                F.avg(
                    F.when(
                        (F.col("pr") >= 0.05) & (F.col("pr") <= 0.95),
                        F.col("x"),
                    )
                ),
                2,
            ).alias("trimmed_mean"),
            rhalf(
                F.avg(F.greatest("lo", F.least("hi", F.col("x")))), 2
            ).alias("winsorized_mean"),
        )
        .orderBy("prio")
    )


# ---------------------------------------------------------------------------
# Max drawdown
# ---------------------------------------------------------------------------


@query(
    "win_max_drawdown_curve",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS cents
        FROM evt WHERE event_type = 'purchase' GROUP BY 1),
    fixed AS (
        SELECT d, cum,
               MAX(cum) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS peak
        FROM (SELECT d, SUM(cents) OVER (ORDER BY d
                  ROWS UNBOUNDED PRECEDING) AS cum FROM daily) t)
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(cum AS BIGINT) AS cum_cents,
           CAST(peak AS BIGINT) AS peak_cents,
           {rhalf_sql('(peak - cum) * 1.0 / peak', 4)} AS drawdown
    FROM fixed
    ORDER BY day
    """,
    tags=("window", "drawdown", "finance"),
)
def win_max_drawdown_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drawdown curve of cumulative purchase revenue: running total
    (exact integer cents), running PEAK (max-so-far window), and the
    relative drawdown (peak − cum)/peak per day — the risk metric
    read off any cumulative series, and the canonical nested-window
    composition (a running max OVER a running sum) that requires two
    stacked window passes sharing one sort. Integer cents keep both
    running aggregates order-free; the ratio rounds at the edge."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = daily.select("d", F.sum("cents").over(w).alias("cum"))
    fixed = curve.select(
        "d", "cum", F.max("cum").over(w).alias("peak")
    )
    return fixed.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("cum").alias("cum_cents"),
        F.col("peak").alias("peak_cents"),
        rhalf((F.col("peak") - F.col("cum")) * 1.0 / F.col("peak"), 4).alias(
            "drawdown"
        ),
    ).orderBy("day")
