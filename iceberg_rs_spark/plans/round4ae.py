"""Round-4 corpus additions, batch 30: weekday seasonal indices,
new-vs-returning user split, and embedding vector QA profile.

The new-vs-returning split needs a GLOBAL first-seen per user — the
same first-occurrence attribution as the Heaps curve, here keyed by
user — which is the piece naive per-day dashboards get wrong (a user
is "new" on their first day ever, not their first day in the query
window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

# ---------------------------------------------------------------------------
# Weekday seasonal index
# ---------------------------------------------------------------------------


@query(
    "ts_weekday_seasonal_index",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               isodow(date_trunc('day', ts)) AS dow,
               CAST(COUNT(*) AS DOUBLE) AS x
        FROM evt GROUP BY 1, 2),
    mu AS (SELECT AVG(x) AS m FROM daily)
    SELECT CAST(dow AS INTEGER) AS iso_dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           {rhalf_sql('AVG(x)', 2)} AS mean_events,
           {rhalf_sql('AVG(x) / (SELECT m FROM mu)', 4)} AS seasonal_index,
           {rhalf_sql('STDDEV_SAMP(x) / AVG(x)', 4)} AS within_dow_cv
    FROM daily
    GROUP BY dow
    ORDER BY iso_dow
    """,
    tags=("timeseries", "seasonality", "profile"),
)
def ts_weekday_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative weekday seasonal indices: mean daily volume per
    ISO weekday divided by the overall daily mean — index 1.3 means
    "that weekday runs 30% hot", the divisor a seasonal-naive
    forecaster applies and the capacity planner reads directly. The
    within-weekday coefficient of variation says how trustworthy
    each index is. ISO day numbering (Mon=1..Sun=7) on both engines
    — Spark's `dayofweek` is Sunday-1, so the portable expression
    derives ISO dow from the epoch-day modulo instead. Day-level
    rollup first; everything after is a 7-row aggregate."""
    ev = load_table(spark, sf_dir, "events")
    # 1970-01-01 was a Thursday (ISO dow 4): iso = ((epoch_day + 3) % 7) + 1
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("double").alias("x")
    ).withColumn(
        "dow", ((F.unix_date(F.col("d")) + 3) % 7 + 1).cast("int")
    )
    mu = daily.agg(F.avg("x").alias("m"))
    return (
        daily.crossJoin(F.broadcast(mu))
        .groupBy(F.col("dow").alias("iso_dow"))
        .agg(
            F.count("*").alias("n_days"),
            rhalf(F.avg("x"), 2).alias("mean_events"),
            rhalf(F.avg("x") / F.first("m"), 4).alias("seasonal_index"),
            rhalf(F.stddev_samp("x") / F.avg("x"), 4).alias("within_dow_cv"),
        )
        .orderBy("iso_dow")
    )


# ---------------------------------------------------------------------------
# New vs returning users per day
# ---------------------------------------------------------------------------


@query(
    "events_new_vs_returning_daily",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    firsts AS (
        SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS first_day
        FROM evt GROUP BY user_id),
    tagged AS (
        SELECT CAST(date_trunc('day', e.ts) AS DATE) AS d, e.user_id,
               CASE WHEN CAST(date_trunc('day', e.ts) AS DATE) = f.first_day
                    THEN 1 ELSE 0 END AS is_new
        FROM evt e JOIN firsts f USING (user_id))
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT CASE WHEN is_new = 1 THEN user_id END)
                AS BIGINT) AS new_users,
           CAST(COUNT(DISTINCT CASE WHEN is_new = 0 THEN user_id END)
                AS BIGINT) AS returning_users,
           {rhalf_sql(
               'COUNT(DISTINCT CASE WHEN is_new = 1 THEN user_id END) * 1.0 '
               '/ COUNT(DISTINCT user_id)', 4)} AS new_share
    FROM tagged
    GROUP BY d
    ORDER BY day
    """,
    tags=("events", "growth", "users"),
)
def events_new_vs_returning_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Daily new-vs-returning user split: a user counts as NEW only
    on their globally first active day (min ts over all history, not
    the query window — the mistake window-scoped dashboards make),
    returning on every later active day. One pass for global firsts,
    one user-keyed join back, distinct-user counts per day; the
    new_share trend is the growth-accounting headline (new-user
    dependence vs retained engagement)."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("first_day")
    )
    tagged = ev.join(firsts, "user_id").select(
        F.col("ts").cast("date").alias("d"),
        "user_id",
        (F.col("ts").cast("date") == F.col("first_day"))
        .cast("int")
        .alias("is_new"),
    )
    new_u = F.countDistinct(
        F.when(F.col("is_new") == 1, F.col("user_id"))
    )
    ret_u = F.countDistinct(
        F.when(F.col("is_new") == 0, F.col("user_id"))
    )
    return (
        tagged.groupBy("d")
        .agg(
            new_u.alias("new_users"),
            ret_u.alias("returning_users"),
            rhalf(
                new_u * 1.0 / F.countDistinct("user_id"), 4
            ).alias("new_share"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "new_users",
            "returning_users",
            "new_share",
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Embedding vector QA profile
# ---------------------------------------------------------------------------


@query(
    "sim_vector_stats_profile",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings),
    per AS (
        SELECT label,
               sqrt(list_sum([v[i] * v[i] for i in generate_series(1, 64)]))
                   AS l2,
               list_min(v) AS vmin,
               list_max(v) AS vmax,
               list_sum(v) / 64.0 AS vmean,
               len(list_filter(v, x -> abs(x) < 1e-6)) AS n_near_zero
        FROM e)
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           {rhalf_sql('AVG(l2)', 4)} AS mean_l2_norm,
           {rhalf_sql('STDDEV_SAMP(l2)', 4)} AS sd_l2_norm,
           {rhalf_sql('AVG(vmean)', 4)} AS mean_component,
           {rhalf_sql('MIN(vmin)', 4)} AS global_min,
           {rhalf_sql('MAX(vmax)', 4)} AS global_max,
           {rhalf_sql('AVG(n_near_zero)', 2)} AS avg_near_zero_dims
    FROM per
    GROUP BY label
    ORDER BY label
    """,
    tags=("llm", "similarity", "profiling", "qa"),
)
def sim_vector_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column QA profile per label: L2-norm distribution
    (unnormalized vectors break cosine≈dot assumptions), component
    mean/range (detects shifted or clipped encoders), and near-zero
    dimension counts (dead dimensions = wasted index width). The
    pre-flight check before any ANN index build — run it before
    `sim_topk_*` trusts the geometry. All row-local array HOFs
    folded per vector, then a label-keyed aggregate; scan-shaped at
    any corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    l2 = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, b: a + b
        )
    )
    per = emb.select(
        "label",
        l2.alias("l2"),
        F.array_min(v).alias("vmin"),
        F.array_max(v).alias("vmax"),
        (F.aggregate(v, F.lit(0.0), lambda a, b: a + b) / 64.0).alias("vmean"),
        F.size(F.filter(v, lambda x: F.abs(x) < 1e-6)).alias("n_near_zero"),
    )
    return (
        per.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            rhalf(F.avg("l2"), 4).alias("mean_l2_norm"),
            rhalf(F.stddev_samp("l2"), 4).alias("sd_l2_norm"),
            rhalf(F.avg("vmean"), 4).alias("mean_component"),
            rhalf(F.min("vmin"), 4).alias("global_min"),
            rhalf(F.max("vmax"), 4).alias("global_max"),
            rhalf(F.avg("n_near_zero"), 2).alias("avg_near_zero_dims"),
        )
        .orderBy("label")
    )
