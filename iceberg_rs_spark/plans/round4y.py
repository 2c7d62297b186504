"""Round-4 corpus additions, batch 24: subquery NULL-semantics family,
running-distinct windows, OHLC bars, and a chi-square independence
test.

The subquery family is the correctness landmine of the group: `NOT IN`
against a subquery that can yield NULL returns *no rows* under
three-valued logic, while the anti-join most engines rewrite it to
would return the "obvious" complement. Both semantics are pinned side
by side so the engine's null-aware anti-join rewrite is certified, not
assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

# ---------------------------------------------------------------------------
# Subquery semantics: EXISTS / NOT EXISTS / IN / NOT IN (nullable trap)
# ---------------------------------------------------------------------------


@query(
    "sub_in_exists_family",
    oracle="""
    SELECT * FROM (
        SELECT 'exists' AS variant, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        UNION ALL
        SELECT 'not_exists', CAST(COUNT(*) AS BIGINT)
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        UNION ALL
        SELECT 'in_filtered', CAST(COUNT(*) AS BIGINT)
        FROM customer c
        WHERE c.c_custkey IN
            (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
        UNION ALL
        SELECT 'not_in_clean', CAST(COUNT(*) AS BIGINT)
        FROM customer c
        WHERE c.c_custkey NOT IN
            (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
        UNION ALL
        SELECT 'not_in_nullable', CAST(COUNT(*) AS BIGINT)
        FROM customer c
        WHERE c.c_custkey NOT IN
            (SELECT CASE WHEN o_totalprice > 150000 THEN o_custkey END
             FROM orders))
    ORDER BY variant
    """,
    tags=("subquery", "semantics", "null-aware"),
)
def sub_in_exists_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery predicate semantics certified side by side: EXISTS /
    NOT EXISTS (rewritten to left-semi / left-anti hash joins), IN
    against a filtered subquery, NOT IN against the same de-nulled
    subquery, and the three-valued-logic landmine — NOT IN against a
    subquery that CAN produce NULL, which must return ZERO rows (any
    comparison with NULL is unknown, so no row satisfies the
    conjunction). Spark plans the nullable case as a null-aware
    anti-join (LeftAnti with a disjunctive null check); engines that
    blindly rewrite to a plain anti-join silently return
    `not_in_clean` instead. All five counts come from one broadcast
    of the orders-derived key sets at test scale; at 100 TB each is
    a shuffled semi/anti join on the key — no cartesian anywhere."""
    cust = load_table(spark, sf_dir, "customer").alias("c")
    orders = load_table(spark, sf_dir, "orders")
    cust.createOrReplaceTempView("v_sub_customer")
    orders.createOrReplaceTempView("v_sub_orders")
    return spark.sql(
        """
        SELECT * FROM (
            SELECT 'exists' AS variant, CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM v_sub_customer c
            WHERE EXISTS (SELECT 1 FROM v_sub_orders o
                          WHERE o.o_custkey = c.c_custkey)
            UNION ALL
            SELECT 'not_exists', CAST(COUNT(*) AS BIGINT)
            FROM v_sub_customer c
            WHERE NOT EXISTS (SELECT 1 FROM v_sub_orders o
                              WHERE o.o_custkey = c.c_custkey)
            UNION ALL
            SELECT 'in_filtered', CAST(COUNT(*) AS BIGINT)
            FROM v_sub_customer c
            WHERE c.c_custkey IN
                (SELECT o_custkey FROM v_sub_orders WHERE o_totalprice > 150000)
            UNION ALL
            SELECT 'not_in_clean', CAST(COUNT(*) AS BIGINT)
            FROM v_sub_customer c
            WHERE c.c_custkey NOT IN
                (SELECT o_custkey FROM v_sub_orders WHERE o_totalprice > 150000)
            UNION ALL
            SELECT 'not_in_nullable', CAST(COUNT(*) AS BIGINT)
            FROM v_sub_customer c
            WHERE c.c_custkey NOT IN
                (SELECT CASE WHEN o_totalprice > 150000 THEN o_custkey END
                 FROM v_sub_orders))
        ORDER BY variant
        """
    )


# ---------------------------------------------------------------------------
# Running distinct over a window (collect_set idiom)
# ---------------------------------------------------------------------------


@query(
    "win_running_distinct_types",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    run AS (
        SELECT user_id, ts, event_id,
               COUNT(DISTINCT event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS n_types_seen
        FROM evt WHERE user_id < 400)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(n_types_seen) AS INTEGER) AS n_types_final,
           strftime(MIN(CASE WHEN n_types_seen >= 3 THEN ts END),
                    '%Y-%m-%d %H:%M:%S') AS explored_3_at
    FROM run
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("window", "distinct", "running"),
)
def win_running_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over an ordered window — a frame shape
    Spark's window aggregates don't provide natively
    (`count(distinct) over` is rejected by the analyzer). The idiom:
    `size(collect_set(x))` over a rows-unbounded-preceding frame,
    totally ordered by (ts, event_id) so the prefix at every row is
    deterministic under ties. Emits per user the event count, the
    final breadth (distinct event types ever seen), and the
    exploration milestone — the timestamp at which the user first
    touched 3 distinct types. State per row is the set of types seen
    (bounded by the type vocabulary, here 5), so the frame stays O(1)
    per user at any event volume; the oracle uses DuckDB's native
    windowed COUNT(DISTINCT) over the identical frame."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 400)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = ev.select(
        "user_id",
        "ts",
        F.size(F.collect_set("event_type").over(w)).alias("n_types_seen"),
    )
    return (
        run.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max("n_types_seen").cast("int").alias("n_types_final"),
            F.date_format(
                F.min(F.when(F.col("n_types_seen") >= 3, F.col("ts"))),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("explored_3_at"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Daily OHLC bars
# ---------------------------------------------------------------------------


@query(
    "ts_ohlc_bars",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    px AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS bar_date, ts, event_id,
               value,
               ROW_NUMBER() OVER (PARTITION BY CAST(date_trunc('day', ts) AS DATE)
                                  ORDER BY ts, event_id) AS rn_open,
               ROW_NUMBER() OVER (PARTITION BY CAST(date_trunc('day', ts) AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn_close
        FROM evt WHERE event_type = 'purchase')
    SELECT strftime(bar_date, '%Y-%m-%d') AS bar_date,
           {rhalf_sql('MIN(CASE WHEN rn_open = 1 THEN value END)', 2)} AS open,
           {rhalf_sql('MAX(value)', 2)} AS high,
           {rhalf_sql('MIN(value)', 2)} AS low,
           {rhalf_sql('MIN(CASE WHEN rn_close = 1 THEN value END)', 2)} AS close,
           CAST(COUNT(*) AS BIGINT) AS volume,
           {rhalf_sql('SUM(value)', 2)} AS turnover
    FROM px
    GROUP BY bar_date
    ORDER BY bar_date
    """,
    tags=("timeseries", "ohlc", "downsample"),
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candlestick bars over the purchase-value series:
    open/close via row_number()=1 on the (ts, event_id) total order
    forward and reversed — the portable arg-min/arg-max-with-
    tiebreak idiom — plus high/low/volume/turnover as plain
    aggregates. One shuffle on the bar date; both window passes and
    the final aggregate share that partitioning, so Catalyst plans a
    single exchange. The M4 downsampler (`ts_downsample_m4`) keeps
    extremes for plotting; OHLC is the finance-shaped variant whose
    open/close need the exact first/last-in-order tiebreak that a
    naive min/max-by-timestamp gets wrong under equal timestamps."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    px = ev.select(
        F.col("ts").cast("date").alias("bar_date"), "ts", "event_id", "value"
    )
    wf = Window.partitionBy("bar_date").orderBy("ts", "event_id")
    wr = Window.partitionBy("bar_date").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = px.select(
        "bar_date",
        "value",
        F.row_number().over(wf).alias("rn_open"),
        F.row_number().over(wr).alias("rn_close"),
    )
    return (
        ranked.groupBy("bar_date")
        .agg(
            rhalf(F.min(F.when(F.col("rn_open") == 1, F.col("value"))), 2).alias(
                "open"
            ),
            rhalf(F.max("value"), 2).alias("high"),
            rhalf(F.min("value"), 2).alias("low"),
            rhalf(
                F.min(F.when(F.col("rn_close") == 1, F.col("value"))), 2
            ).alias("close"),
            F.count("*").alias("volume"),
            rhalf(F.sum("value"), 2).alias("turnover"),
        )
        .select(
            F.date_format("bar_date", "yyyy-MM-dd").alias("bar_date"),
            "open",
            "high",
            "low",
            "close",
            "volume",
            "turnover",
        )
        .orderBy("bar_date")
    )


# ---------------------------------------------------------------------------
# Chi-square test of independence
# ---------------------------------------------------------------------------


@query(
    "agg_chi_square_independence",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    obs AS (
        SELECT event_type, dayofweek(ts) AS dow,
               CAST(COUNT(*) AS DOUBLE) AS o
        FROM evt GROUP BY event_type, dayofweek(ts)),
    tot AS (SELECT SUM(o) AS n FROM obs),
    margins AS (
        SELECT obs.event_type, obs.dow, obs.o,
               SUM(obs.o) OVER (PARTITION BY obs.event_type) AS row_sum,
               SUM(obs.o) OVER (PARTITION BY obs.dow) AS col_sum,
               tot.n
        FROM obs CROSS JOIN tot),
    cells AS (
        SELECT event_type, dow, o, row_sum * col_sum / n AS e FROM margins)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT dow) - 1) AS BIGINT) AS dof,
           {rhalf_sql('SUM((o - e) * (o - e) / e)', 4)} AS chi_square,
           {rhalf_sql('MAX(ABS(o - e) / SQRT(e))', 4)} AS max_cell_z
    FROM cells
    """,
    tags=("aggregate", "statistics", "chi-square"),
)
def agg_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and
    day-of-week: the full contingency table built in one groupBy, row
    and column margins recovered with window sums over the (tiny)
    cell table, expected counts n_r*n_c/N, and the test statistic
    sum((O-E)^2/E) plus the worst standardized cell residual. The
    only full-data pass is the first groupBy (cells = |types|×7 rows);
    everything after operates on the contingency table itself, so the
    test costs one aggregation at any scale. The statistic is exact
    integer-count arithmetic until the final division — hash-stable
    at ROUND(4)."""
    ev = load_table(spark, sf_dir, "events")
    obs = (
        ev.groupBy("event_type", F.dayofweek("ts").alias("dow"))
        .agg(F.count("*").cast("double").alias("o"))
    )
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("dow")
    wn = Window.partitionBy()
    cells = obs.select(
        "event_type",
        "dow",
        "o",
        (
            F.sum("o").over(wr) * F.sum("o").over(wc) / F.sum("o").over(wn)
        ).alias("e"),
    )
    return cells.agg(
        F.count("*").alias("n_cells"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
        ).alias("dof"),
        rhalf(F.sum((F.col("o") - F.col("e")) ** 2 / F.col("e")), 4).alias(
            "chi_square"
        ),
        rhalf(F.max(F.abs(F.col("o") - F.col("e")) / F.sqrt("e")), 4).alias(
            "max_cell_z"
        ),
    )
