"""Round-4 corpus additions, batch 32: lead-lag cross-correlation,
interval coalescing, and smoothed rate ranking.

Interval coalescing (range consolidation) is the dual of the
sweep-line peak query: instead of counting overlap it MERGES
overlapping spans — the primitive behind "total active time",
calendar free/busy, and IP-range consolidation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

# ---------------------------------------------------------------------------
# Lead-lag cross-correlation between two daily series
# ---------------------------------------------------------------------------


@query(
    "ts_cross_correlation_leadlag",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS DOUBLE)
                   AS views,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS DOUBLE)
                   AS buys
        FROM evt GROUP BY 1),
    lags AS (SELECT unnest(generate_series(-3, 3)) AS lag),
    pairs AS (
        SELECT l.lag, a.views AS v, b.buys AS p
        FROM lags l
        JOIN daily a ON TRUE
        JOIN daily b ON b.d = a.d + CAST(l.lag AS INTEGER))
    SELECT CAST(lag AS INTEGER) AS lag_days,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           {rhalf_sql('corr(v, p)', 4)} AS xcorr
    FROM pairs
    GROUP BY lag
    ORDER BY lag_days
    """,
    tags=("timeseries", "cross-correlation", "statistics"),
)
def ts_cross_correlation_leadlag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lead-lag cross-correlation between the daily view and purchase
    series at offsets −3..+3 days: corr(views_t, buys_{t+lag}) — a
    positive-lag peak says views LEAD purchases by that many days,
    the causal-direction screen run before any attribution model.
    Same explode-the-lag-set × shifted-date self-join machinery as
    the ACF query (`ts_autocorrelation_lags`) but across two series
    split from one conditional aggregate, so the raw events are
    scanned exactly once."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("double")
        .alias("views"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("buys"),
    )
    lagged = daily.select(
        F.explode(F.sequence(F.lit(-3), F.lit(3))).alias("lag"), "d", "views"
    )
    shifted = daily.select(F.col("d").alias("d2"), "buys")
    pairs = lagged.join(shifted, F.expr("date_add(d, lag) = d2"))
    return (
        pairs.groupBy("lag")
        .agg(
            F.count("*").alias("n_pairs"),
            rhalf(F.corr("views", "buys"), 4).alias("xcorr"),
        )
        .select(F.col("lag").cast("int").alias("lag_days"), "n_pairs", "xcorr")
        .orderBy("lag_days")
    )


# ---------------------------------------------------------------------------
# Interval coalescing (range consolidation)
# ---------------------------------------------------------------------------


@query(
    "join_interval_coalesce_union",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    iv AS (
        SELECT user_id, ts AS s, ts + INTERVAL 10 MINUTE AS e
        FROM evt WHERE event_type IN ('view', 'click') AND user_id < 200),
    spans AS (
        SELECT user_id, s, e,
               SUM(new_span)
                   OVER (PARTITION BY user_id ORDER BY s, e
                         ROWS UNBOUNDED PRECEDING) AS span_id
        FROM (SELECT user_id, s, e,
                     CASE WHEN MAX(e) OVER (
                         PARTITION BY user_id ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         IS NULL THEN 1
                          WHEN s > MAX(e) OVER (
                         PARTITION BY user_id ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         THEN 1 ELSE 0 END AS new_span
              FROM iv) t),
    merged AS (
        SELECT user_id, span_id, MIN(s) AS span_start, MAX(e) AS span_end,
               COUNT(*) AS n_intervals
        FROM spans GROUP BY user_id, span_id)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(n_intervals) AS BIGINT) AS n_intervals,
           CAST(SUM(epoch_us(span_end) - epoch_us(span_start))
                // 1000000 AS BIGINT) AS covered_seconds
    FROM merged
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("join", "intervals", "coalesce"),
)
def join_interval_coalesce_union(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interval coalescing (range consolidation): each view/click
    opens a 10-minute presence interval; overlapping or touching
    intervals merge into maximal spans — per user the span count,
    the raw interval count, and total covered seconds (union length,
    where naive per-interval summing double-counts overlap). The
    classic idiom: an interval starts a NEW span iff its start
    exceeds the running max of all prior ends (ordered by (s, e)),
    then a running sum of the flags numbers the spans — two window
    passes over one user-keyed sort, no self-join. The dual of
    `events_concurrent_peak` (which counts overlap; this merges
    it)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click") & (F.col("user_id") < 200)
    )
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.withColumn("prev_max_e", F.max("e").over(w_prev)).withColumn(
        "new_span",
        F.when(
            F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")),
            1,
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = marked.withColumn("span_id", F.sum("new_span").over(w_run))
    merged = spans.groupBy("user_id", "span_id").agg(
        F.min("s").alias("span_start"),
        F.max("e").alias("span_end"),
        F.count("*").alias("n_intervals"),
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum("n_intervals").alias("n_intervals"),
            F.floor(
                F.sum(
                    F.expr(
                        "timestampdiff(MICROSECOND, span_start, span_end)"
                    )
                )
                / 1_000_000
            )
            .cast("long")
            .alias("covered_seconds"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Smoothed rate ranking
# ---------------------------------------------------------------------------

_SMOOTH_K = 5.0


@query(
    "agg_smoothed_rate_ranking",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    per_user AS (
        SELECT user_id,
               CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS DOUBLE)
                   AS views,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS DOUBLE)
                   AS buys
        FROM evt GROUP BY user_id
        HAVING COUNT(*) FILTER (WHERE event_type = 'view') > 0),
    g AS (SELECT SUM(buys) / SUM(views) AS prior FROM per_user),
    scored AS (
        SELECT user_id, views, buys,
               buys / views AS raw_rate,
               (buys + {_SMOOTH_K} * (SELECT prior FROM g))
                   / (views + {_SMOOTH_K}) AS smoothed_rate
        FROM per_user),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (ORDER BY raw_rate DESC, user_id)
                   AS raw_rank,
               ROW_NUMBER() OVER (ORDER BY smoothed_rate DESC, user_id)
                   AS smooth_rank
        FROM scored)
    SELECT user_id,
           CAST(views AS BIGINT) AS views,
           CAST(buys AS BIGINT) AS buys,
           {rhalf_sql('raw_rate', 4)} AS raw_rate,
           {rhalf_sql('smoothed_rate', 4)} AS smoothed_rate,
           CAST(raw_rank AS INTEGER) AS raw_rank,
           CAST(smooth_rank AS INTEGER) AS smooth_rank
    FROM ranked
    WHERE smooth_rank <= 20
    ORDER BY smooth_rank
    """,
    tags=("aggregate", "smoothing", "ranking"),
)
def agg_smoothed_rate_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive-smoothed conversion-rate ranking: per-user
    purchase/view rate shrunk toward the global prior with k=5
    pseudo-observations — the small-sample fix that stops a 1/1 user
    outranking a 90/100 user (the top-20 by smoothed rate is the
    deliverable; raw ranks ride along to show the reordering). The
    global prior is a ratio of sums in a 1-row scalar; scoring is
    row-local. Because only the top-20 survive, NO global ranking
    pass exists in the plan: the survivors come from a distributed
    TakeOrderedAndProject (per-partition top-20, driver merges 20×P
    rows — the only correct top-k plan at 100 TB), and their global
    raw/smoothed row_numbers are recovered as 1 + count-of-
    predecessors in one map-side pass over the user relation against
    the BROADCAST 20-row leaderboard (a k-bounded nested-loop, not a
    data×data cartesian). All rank arithmetic is exact: views/buys
    are integer-valued doubles, so the prior and both rates are
    bit-deterministic under any aggregation order, and the user_id
    tiebreak keeps the cut hash-stable."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("double")
            .alias("views"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("double")
            .alias("buys"),
        )
        .where(F.col("views") > 0)
    )
    g = per_user.agg((F.sum("buys") / F.sum("views")).alias("prior"))
    scored = per_user.crossJoin(F.broadcast(g)).select(
        "user_id",
        "views",
        "buys",
        (F.col("buys") / F.col("views")).alias("raw_rate"),
        (
            (F.col("buys") + _SMOOTH_K * F.col("prior"))
            / (F.col("views") + _SMOOTH_K)
        ).alias("smoothed_rate"),
    )
    top20 = (
        scored.orderBy(F.desc("smoothed_rate"), "user_id").limit(20).alias("t")
    )
    s = scored.alias("s")

    def before(metric: str):
        return (
            (F.col(f"s.{metric}") > F.col(f"t.{metric}"))
            | (
                (F.col(f"s.{metric}") == F.col(f"t.{metric}"))
                & (F.col("s.user_id") < F.col("t.user_id"))
            )
        ).cast("long")

    ranked = (
        s.crossJoin(F.broadcast(top20))
        .groupBy(
            F.col("t.user_id").alias("user_id"),
            F.col("t.views").alias("views"),
            F.col("t.buys").alias("buys"),
            F.col("t.raw_rate").alias("raw_rate"),
            F.col("t.smoothed_rate").alias("smoothed_rate"),
        )
        .agg(
            (F.sum(before("raw_rate")) + 1).cast("int").alias("raw_rank"),
            (F.sum(before("smoothed_rate")) + 1).cast("int").alias("smooth_rank"),
        )
    )
    return ranked.select(
        "user_id",
        F.col("views").cast("long").alias("views"),
        F.col("buys").cast("long").alias("buys"),
        rhalf(F.col("raw_rate"), 4).alias("raw_rate"),
        rhalf(F.col("smoothed_rate"), 4).alias("smoothed_rate"),
        "raw_rank",
        "smooth_rank",
    ).orderBy("smooth_rank")
