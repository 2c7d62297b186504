"""Remaining declared-surface pieces (SURVEY.md §2C): null-safe
equality, the approx sketches (provided, rows-only by the determinism
rule), and deterministic salting for skewed keys — salted plans must
equal their unsalted oracles exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.operators.skew import salted_agg, salted_join
from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table


@query(
    "fn_null_safe_equality",
    oracle="""
    SELECT o_orderkey,
           CAST(NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULLIF(o_orderstatus, 'O') AS INTEGER) AS self_nse,
           CAST(NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F' AS INTEGER) AS vs_f,
           CAST(NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL AS INTEGER) AS vs_null,
           CAST(NULLIF(o_orderstatus, 'O') = 'F' AS INTEGER) AS plain_eq
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
    tags=("scalar", "null-safe-equality"),
)
def fn_null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`<=>` vs `=` on nullable values: null <=> null is true, null =
    anything is null (shown as a null INTEGER next to the 0/1s)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    v = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        v.eqNullSafe(v).cast("int").alias("self_nse"),
        v.eqNullSafe(F.lit("F")).cast("int").alias("vs_f"),
        v.eqNullSafe(F.lit(None).cast("string")).cast("int").alias("vs_null"),
        (v == "F").cast("int").alias("plain_eq"),
    ).orderBy("o_orderkey")


@query(
    "agg_approx_sketches",
    oracle=None,  # sketches differ across engines by design (FIXTURES.md rule)
    # TERMINAL rows-only (VERDICT r7 ask #5): this can never be upgraded
    # to hash-checking — HLL++/GK-sketch internals are engine-specific by
    # the declared no-sketch-hash rule. The exact hash-certified
    # counterparts are agg_multi_distinct and agg_stats_by_nation.
    tags=("agg", "approx", "sketch", "terminal-rows-only"),
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) and approx_percentile —
    provided, deterministic within Spark, but excluded from
    hash-checking: sketch implementations differ across engines. The
    exact counterparts are hash-checked in agg_multi_distinct and
    agg_stats_by_nation."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.approx_percentile("l_extendedprice", F.lit(0.5)).alias("approx_median"),
            F.approx_percentile("l_extendedprice", F.lit(0.95)).alias("approx_p95"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "skew_salted_agg",
    oracle=f"""
    {EVENTS_ORACLE_CTE}
    SELECT event_type,
           COUNT(value) AS count_value,
           {rhalf_sql('SUM(value)', 2)} AS rounded_sum
    FROM evt
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("skew", "salting", "agg"),
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over a 5-hot-key distribution
    (event_type): stage 1 spreads each hot key over 16 salt buckets,
    stage 2 combines — the result must equal the plain GROUP BY."""
    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev, ["event_type"], {"value": "sum"}, salt_col="event_id", buckets=16
    )
    counted = salted_agg(
        ev, ["event_type"], {"value": "count"}, salt_col="event_id", buckets=16
    )
    return (
        counted.join(out, "event_type")
        .select(
            "event_type",
            F.col("count_value"),
            F.round(F.col("sum_value"), 2).alias("rounded_sum"),
        )
        .orderBy("event_type")
    )


@query(
    "skew_salted_join",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    dim AS (
        SELECT DISTINCT event_type,
               CASE event_type WHEN 'purchase' THEN 10.0 ELSE 1.0 END AS weight
        FROM evt)
    SELECT e.event_type,
           COUNT(*) AS n,
           {rhalf_sql('SUM(e.value * d.weight)', 2)} AS weighted
    FROM evt e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    tags=("skew", "salting", "join"),
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join against a 5-row dimension: the big side salts
    deterministically, the dim replicates 16×, and the joined result
    must equal the unsalted join exactly."""
    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn(
            "weight",
            F.when(F.col("event_type") == "purchase", F.lit(10.0)).otherwise(F.lit(1.0)),
        )
    )
    joined = salted_join(ev, dim, key="event_type", salt_source_col="event_id")
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value") * F.col("weight")), 2).alias("weighted"),
        )
        .orderBy("event_type")
    )


@query(
    "ts_gapfill_interpolate",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    hourly AS (
        SELECT user_id,
               CAST(datediff('hour', TIMESTAMP '1970-01-01 00:00:00',
                             date_trunc('hour', ts)) AS BIGINT) AS hidx,
               AVG(value) AS v
        FROM evt WHERE user_id < 40
        GROUP BY user_id, hidx),
    spans AS (
        SELECT user_id, MIN(hidx) AS mn, MAX(hidx) AS mx
        FROM hourly GROUP BY user_id),
    grid AS (
        SELECT s.user_id, t.h AS hidx
        FROM spans s, unnest(generate_series(s.mn, s.mx)) AS t(h)),
    j AS (
        SELECT g.user_id, g.hidx, h.v
        FROM grid g LEFT JOIN hourly h
          ON g.user_id = h.user_id AND g.hidx = h.hidx),
    ctx AS (
        SELECT user_id, hidx, v,
               last_value(v IGNORE NULLS) OVER w_prev AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN hidx END IGNORE NULLS)
                   OVER w_prev AS ph,
               first_value(v IGNORE NULLS) OVER w_next AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN hidx END IGNORE NULLS)
                   OVER w_next AS nh
        FROM j
        WINDOW
          w_prev AS (PARTITION BY user_id ORDER BY hidx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          w_next AS (PARTITION BY user_id ORDER BY hidx
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, hidx,
           {rhalf_sql('COALESCE(v, pv + (nv - pv) * (hidx - ph) * 1.0 / (nh - ph))', 4)}
               AS value,
           CAST(v IS NULL AS BOOLEAN) AS interpolated
    FROM ctx
    ORDER BY user_id, hidx
    """,
    tags=("timeseries", "window", "gapfill"),
)
def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with linear interpolation (the
    TimescaleDB time_bucket_gapfill / interpolate shape): hourly
    averages per user, a dense hour grid spanned per user via
    sequence+explode, missing hours filled by interpolating between
    the nearest present neighbors (last/first over IGNORE NULLS
    windows). Hour indexes are integer hours-since-epoch computed with
    timezone-independent date arithmetic — never unix_timestamp, which
    would shift under the driver's session timezone. The per-user
    windows partition by user_id, so no single-partition window exists
    and the plan scales with the user count."""
    from pyspark.sql import Window

    from iceberg_rs_spark.functions.transforms import hours_from_epoch

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    hourly = (
        ev.select(
            "user_id",
            hours_from_epoch(F.col("ts")).cast("long").alias("hidx"),
            "value",
        )
        .groupBy("user_id", "hidx")
        .agg(F.avg("value").alias("v"))
    )
    # r15 (guide §2.4, VERDICT r14 #3): the r14 shape derived `hourly`
    # into BOTH the span-bounds aggregate and the grid left-join and
    # bridged the fan-out with a barrier whose fixed localCheckpoint
    # job cost more in-sweep than the saved re-aggregation. The dense
    # grid + IGNORE NULLS windows are equivalent to ONE lead() pass
    # over the PRESENT hours: between two consecutive present hours ph
    # and nh, every missing grid hour h in (ph, nh) interpolates
    # between exactly those neighbors (last/first IGNORE NULLS resolve
    # to them), and the per-user grid [mn, mx] is exactly the union of
    # the [ph, nh) intervals plus the last present hour. So each
    # present row emits sequence(ph, nh-1) (itself plus its gap) — no
    # second derivation, no join, no barrier; linear in present hours
    # at any scale. The interpolation expression reproduces the same
    # IEEE operation order as the window form.
    w = Window.partitionBy("user_id").orderBy("hidx")
    nxt = hourly.select(
        "user_id",
        F.col("hidx").alias("ph"),
        F.col("v").alias("pv"),
        F.lead("hidx").over(w).alias("nh"),
        F.lead("v").over(w).alias("nv"),
    )
    span = nxt.select(
        "user_id",
        "ph",
        "pv",
        "nh",
        "nv",
        F.explode(
            F.sequence(
                F.col("ph"), F.coalesce(F.col("nh") - 1, F.col("ph"))
            )
        ).alias("hidx"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.col("hidx") - F.col("ph")
    ) * 1.0 / (F.col("nh") - F.col("ph"))
    return span.select(
        "user_id",
        "hidx",
        rhalf(
            F.when(F.col("hidx") == F.col("ph"), F.col("pv")).otherwise(interp), 4
        ).alias("value"),
        (F.col("hidx") != F.col("ph")).alias("interpolated"),
    ).orderBy("user_id", "hidx")


@query(
    "events_funnel_conversion",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    s1 AS (
        SELECT user_id, MIN(ts) AS t_signup
        FROM evt WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM evt e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t_signup
        GROUP BY e.user_id),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM evt e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
          AND e.ts <= s2.t_click + INTERVAL 7 DAY
        GROUP BY e.user_id)
    SELECT stage, n_users FROM (
        SELECT 1 AS ord, 'signup' AS stage, COUNT(*) AS n_users FROM s1
        UNION ALL
        SELECT 2, 'click_after_signup', COUNT(*) FROM s2
        UNION ALL
        SELECT 3, 'purchase_within_7d', COUNT(*) FROM s3)
    ORDER BY ord
    """,
    tags=("events", "funnel", "sequence"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (the ClickHouse windowFunnel shape):
    users who signed up, then clicked AFTER the signup, then purchased
    after that click within 7 days — each stage anchored at the
    EARLIEST qualifying prior-stage event, so the count is exact
    sequence matching, not mere event co-occurrence. Expressed as
    three conditional-min aggregations, each joined to the previous
    stage's anchors. The anchor side is a PER-USER aggregate — it
    scales with the user population, so no broadcast hint is forced:
    AQE broadcasts it at small scale and falls back to a shuffled hash
    join at 100 TB, where a forced broadcast would OOM executors
    (VERDICT r3 §What's-wrong #2). The declarative chain shuffles only
    per-user anchors between stages."""
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    spark_counts = [
        s1.agg(F.lit(1).alias("ord"), F.lit("signup").alias("stage"), F.count("*").alias("n_users")),
        s2.agg(F.lit(2).alias("ord"), F.lit("click_after_signup").alias("stage"), F.count("*").alias("n_users")),
        s3.agg(F.lit(3).alias("ord"), F.lit("purchase_within_7d").alias("stage"), F.count("*").alias("n_users")),
    ]
    out = spark_counts[0]
    for c in spark_counts[1:]:
        out = out.unionByName(c)
    return out.orderBy("ord").select("stage", "n_users")


@query(
    "events_cohort_retention",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    cohorts AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM evt WHERE event_type = 'signup' GROUP BY user_id),
    activity AS (
        SELECT DISTINCT e.user_id, c.cohort_week,
               CAST(datediff('week', c.cohort_week,
                             date_trunc('week', e.ts)) AS BIGINT) AS week_offset
        FROM evt e JOIN cohorts c ON e.user_id = c.user_id
        WHERE e.ts >= c.cohort_week)
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           week_offset,
           COUNT(*) AS n_active
    FROM activity
    WHERE week_offset <= 4
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    tags=("events", "cohort", "retention"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by signup week, counted
    as active in each later week they produced ANY event — the product
    dashboard's retention triangle. Week truncation is Monday-anchored
    in both engines and the offset is integer week arithmetic, so the
    matrix hash-checks exactly. One aggregation to anchor cohorts, one
    distinct-activity projection, one roll-up. The cohort anchor is a
    PER-USER aggregate, so no broadcast hint is forced — AQE
    broadcasts it at small scale; at 100 TB the anchor is
    population-sized and joins as a shuffled hash join on user_id
    (VERDICT r3 §What's-wrong #2)."""
    ev = load_table(spark, sf_dir, "events")
    cohorts = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    activity = (
        ev.join(cohorts, "user_id")
        .where(F.col("ts") >= F.col("cohort_week"))
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.where(F.col("week_offset") <= 4)
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
        )
        .agg(F.count("*").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )
