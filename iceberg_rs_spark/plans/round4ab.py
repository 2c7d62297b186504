"""Round-4 corpus additions, batch 27: Theil inequality decomposition,
session depth continuation curve, time-to-convert percentiles, and a
2-D skyline (Pareto frontier).

The Theil decomposition is the analytics counterpart of the Gini
query: unlike Gini, Theil's T splits EXACTLY into a between-group and
a within-group component, so it answers "is revenue inequality driven
by differences between nations or within them" with an identity the
oracle certifies to the rounding digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

# ---------------------------------------------------------------------------
# Theil index decomposition
# ---------------------------------------------------------------------------


@query(
    "agg_theil_decomposition",
    oracle=f"""
    WITH cust AS (
        SELECT c.c_nationkey AS g, SUM(o.o_totalprice) AS x
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_nationkey),
    tot AS (SELECT SUM(x) AS sx, COUNT(*) AS n, SUM(x) / COUNT(*) AS mu
            FROM cust),
    grp AS (
        SELECT g, COUNT(*) AS ng, SUM(x) AS sg, SUM(x) / COUNT(*) AS mug
        FROM cust GROUP BY g),
    wterm AS (
        SELECT c.g, (c.x / gr.mug) * ln(c.x / gr.mug) AS term
        FROM cust c JOIN grp gr ON c.g = gr.g),
    tg AS (
        SELECT w.g, SUM(w.term) / MAX(gr.ng) AS tg
        FROM wterm w JOIN grp gr ON w.g = gr.g
        GROUP BY w.g),
    parts AS (
        SELECT gr.g, gr.ng, gr.sg, tg.tg,
               gr.sg / t.sx AS share,
               (gr.sg / t.sx) * ln((gr.sg / t.sx) / (gr.ng * 1.0 / t.n))
                   AS between_term
        FROM grp gr JOIN tg ON gr.g = tg.g CROSS JOIN tot t),
    total AS (
        SELECT SUM((x / t.mu) * ln(x / t.mu)) / MAX(t.n) AS t_total
        FROM cust CROSS JOIN tot t)
    SELECT {rhalf_sql('(SELECT t_total FROM total)', 4)} AS theil_total,
           {rhalf_sql('SUM(between_term)', 4)} AS theil_between,
           {rhalf_sql('SUM(share * tg)', 4)} AS theil_within,
           {rhalf_sql(
               '(SELECT t_total FROM total) - SUM(between_term) - SUM(share * tg)',
               4)} AS decomposition_residual
    FROM parts
    """,
    tags=("aggregate", "inequality", "theil", "statistics"),
)
def agg_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's T inequality index of per-customer revenue, decomposed
    by nation: T_total = T_between + sum_g(share_g · T_within_g) — an
    exact identity (unlike Gini, which does not decompose), certified
    here by emitting all three terms plus the residual, which must
    round to zero. Two aggregation passes over the customer-level
    relation (global mean, then group terms); every log argument is a
    ratio of sums so the statistic is scale-invariant. Answers
    whether revenue concentration is a between-nation or
    within-nation phenomenon — the fairness-audit shape used for
    dataset source balancing just as much as economics."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cust = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", F.col("c_nationkey").alias("g"))
        .agg(F.sum("o_totalprice").alias("x"))
        .select("g", "x")
    )
    tot = cust.agg(
        F.sum("x").alias("sx"),
        F.count("*").alias("n"),
        (F.sum("x") / F.count("*")).alias("mu"),
    )
    withg = cust.groupBy("g").agg(
        F.count("*").alias("ng"),
        F.sum("x").alias("sg"),
        (F.sum("x") / F.count("*")).alias("mug"),
    )
    per = cust.join(withg, "g").select(
        "g",
        "ng",
        "sg",
        ((F.col("x") / F.col("mug")) * F.log(F.col("x") / F.col("mug"))).alias(
            "term"
        ),
    )
    tg = per.groupBy("g", "ng", "sg").agg(
        (F.sum("term") / F.first("ng")).alias("tg")
    )
    parts = tg.crossJoin(F.broadcast(tot)).select(
        "g",
        "tg",
        (F.col("sg") / F.col("sx")).alias("share"),
        (
            (F.col("sg") / F.col("sx"))
            * F.log(
                (F.col("sg") / F.col("sx")) / (F.col("ng") * 1.0 / F.col("n"))
            )
        ).alias("between_term"),
    )
    t_total = (
        cust.crossJoin(F.broadcast(tot))
        .agg(
            (F.sum((F.col("x") / F.col("mu")) * F.log(F.col("x") / F.col("mu"))) / F.first("n")).alias("t_total")
        )
    )
    agg = parts.agg(
        F.sum("between_term").alias("theil_between_raw"),
        F.sum(F.col("share") * F.col("tg")).alias("theil_within_raw"),
    )
    return agg.crossJoin(t_total).select(
        rhalf(F.col("t_total"), 4).alias("theil_total"),
        rhalf(F.col("theil_between_raw"), 4).alias("theil_between"),
        rhalf(F.col("theil_within_raw"), 4).alias("theil_within"),
        rhalf(
            F.col("t_total")
            - F.col("theil_between_raw")
            - F.col("theil_within_raw"),
            4,
        ).alias("decomposition_residual"),
    )


# ---------------------------------------------------------------------------
# Session depth continuation curve
# ---------------------------------------------------------------------------


@query(
    "events_session_depth_curve",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    seq AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                         OR lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM evt WHERE user_id < 600),
    sess AS (
        SELECT user_id,
               SUM(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM seq),
    depths AS (
        SELECT user_id, sess_id, COUNT(*) AS depth
        FROM sess GROUP BY user_id, sess_id),
    lv AS (SELECT unnest(generate_series(1, 10)) AS d),
    curve AS (
        SELECT lv.d,
               COUNT(*) FILTER (WHERE depth >= lv.d) AS n_at_least,
               COUNT(*) FILTER (WHERE depth >= lv.d + 1) AS n_continue
        FROM lv CROSS JOIN depths
        GROUP BY lv.d)
    SELECT CAST(d AS INTEGER) AS depth,
           CAST(n_at_least AS BIGINT) AS n_sessions,
           {rhalf_sql('n_continue * 1.0 / n_at_least', 4)} AS p_continue
    FROM curve
    WHERE n_at_least > 0
    ORDER BY depth
    """,
    tags=("events", "sessionization", "funnel"),
)
def events_session_depth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session depth drop-off curve: sessions from the standard
    30-minute-gap sessionization (lag + running-sum session ids, the
    same build `events_sessionization_batch` certifies), then for
    each depth d = 1..10 the number of sessions reaching ≥ d events
    and the continuation probability P(depth ≥ d+1 | depth ≥ d) — the
    curve product teams read to find where engagement decays. The
    level fan-out is a literal 1..10 explode against the
    session-count-sized relation, so the curve costs nothing beyond
    the sessionization shuffle itself."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 600)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.select("user_id", "ts", "event_id")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | (
                    F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
                    > 1_800_000_000
                ),
                1,
            ).otherwise(0),
        )
    )
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = seq.select(
        "user_id", F.sum("new_sess").over(wc).alias("sess_id")
    )
    depths = sess.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("depth")
    )
    levels = spark.range(1, 11).select(F.col("id").cast("int").alias("d"))
    curve = (
        F.broadcast(levels)
        .crossJoin(depths)
        .groupBy("d")
        .agg(
            F.sum(F.when(F.col("depth") >= F.col("d"), 1).otherwise(0)).alias(
                "n_at_least"
            ),
            F.sum(
                F.when(F.col("depth") >= F.col("d") + 1, 1).otherwise(0)
            ).alias("n_continue"),
        )
        .where(F.col("n_at_least") > 0)
    )
    return curve.select(
        F.col("d").alias("depth"),
        F.col("n_at_least").cast("long").alias("n_sessions"),
        rhalf(F.col("n_continue") * 1.0 / F.col("n_at_least"), 4).alias(
            "p_continue"
        ),
    ).orderBy("depth")


# ---------------------------------------------------------------------------
# Time-to-convert percentiles
# ---------------------------------------------------------------------------


@query(
    "events_time_to_convert",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    signups AS (
        SELECT user_id, MIN(ts) AS signup_ts
        FROM evt WHERE event_type = 'signup' GROUP BY user_id),
    first_buy AS (
        SELECT user_id, MIN(ts) AS buy_ts
        FROM evt WHERE event_type = 'purchase' GROUP BY user_id),
    lat AS (
        SELECT s.user_id,
               (epoch_us(f.buy_ts) - epoch_us(s.signup_ts)) / 1000000.0
                   AS secs
        FROM signups s JOIN first_buy f USING (user_id)
        WHERE f.buy_ts >= s.signup_ts)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           {rhalf_sql('quantile_cont(secs, 0.50) / 3600.0', 3)} AS p50_hours,
           {rhalf_sql('quantile_cont(secs, 0.90) / 3600.0', 3)} AS p90_hours,
           {rhalf_sql('quantile_cont(secs, 0.99) / 3600.0', 3)} AS p99_hours,
           {rhalf_sql('AVG(secs) / 3600.0', 3)} AS mean_hours
    FROM lat
    """,
    tags=("events", "conversion", "latency"),
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-to-first-purchase latency distribution: exact p50/p90/
    p99 hours (the SLA-shaped tail metrics) plus the mean, over users
    whose first purchase follows their first signup. Two keyed min
    aggregations and one user-keyed join; the latency arithmetic is
    epoch-seconds subtraction on NTZ timestamps (tz-independent by
    construction). Exact `percentile` keeps the tail honest — an
    approx sketch under-counts exactly the p99 outliers this query
    exists to expose."""
    ev = load_table(spark, sf_dir, "events")
    signups = ev.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("signup_ts")
    )
    buys = ev.where(F.col("event_type") == "purchase").groupBy("user_id").agg(
        F.min("ts").alias("buy_ts")
    )
    lat = (
        signups.join(buys, "user_id")
        .where(F.col("buy_ts") >= F.col("signup_ts"))
        .select(
            (
                F.expr("timestampdiff(MICROSECOND, signup_ts, buy_ts)")
                / 1_000_000.0
            ).alias("secs")
        )
    )
    return lat.agg(
        F.count("*").alias("n_converted"),
        rhalf(F.percentile("secs", F.lit(0.5)) / 3600.0, 3).alias("p50_hours"),
        rhalf(F.percentile("secs", F.lit(0.9)) / 3600.0, 3).alias("p90_hours"),
        rhalf(F.percentile("secs", F.lit(0.99)) / 3600.0, 3).alias("p99_hours"),
        rhalf(F.avg("secs") / 3600.0, 3).alias("mean_hours"),
    )


# ---------------------------------------------------------------------------
# 2-D skyline / Pareto frontier
# ---------------------------------------------------------------------------


@query(
    "win_skyline_pareto_frontier",
    oracle=f"""
    WITH pts AS (
        SELECT l_partkey,
               SUM(l_quantity) AS total_qty,
               SUM(l_extendedprice) / SUM(l_quantity) AS unit_price
        FROM lineitem GROUP BY l_partkey),
    ranked AS (
        SELECT l_partkey, total_qty, unit_price,
               MAX(total_qty) OVER (
                   ORDER BY unit_price, total_qty DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS best_qty_cheaper
        FROM pts)
    SELECT l_partkey,
           {rhalf_sql('total_qty', 2)} AS total_qty,
           {rhalf_sql('unit_price', 4)} AS unit_price
    FROM ranked
    WHERE best_qty_cheaper IS NULL OR total_qty > best_qty_cheaper
    ORDER BY l_partkey
    """,
    tags=("window", "skyline", "pareto"),
)
def win_skyline_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts minimizing unit price
    while maximizing traded quantity — a part survives iff no
    strictly-cheaper-or-equal-priced part (by the (price, −qty, key)
    total order) already achieved ≥ its quantity. The sort-and-
    running-max formulation turns the quadratic dominance self-join
    into ONE sort + running max over the part-level aggregate; the
    strict `>` against the prefix max applies the standard
    dominated-iff-weakly-worse-in-both skyline convention, and the
    deterministic tiebreak key makes the frontier hash-stable. The
    part relation grows with the corpus, so the running max is the
    distributed two-pass exclusive prefix max
    (operators/distwin.running_max_global — per-partition maxima to
    the driver, preceding-partitions max broadcast back, local window
    finishes) with no single-partition stage. The multi-objective
    shortlist shape (cost vs quality, latency vs recall) that
    precedes any weighted scoring."""
    from iceberg_rs_spark.operators.distwin import running_max_global

    li = load_table(spark, sf_dir, "lineitem")
    pts = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("total_qty"),
        (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("unit_price"),
    )
    ranked = running_max_global(
        pts,
        [F.col("unit_price"), F.col("total_qty").desc(), F.col("l_partkey")],
        "total_qty",
        "best_qty_cheaper",
        inclusive=False,
    )
    return (
        ranked.where(
            F.col("best_qty_cheaper").isNull()
            | (F.col("total_qty") > F.col("best_qty_cheaper"))
        )
        .select(
            "l_partkey",
            rhalf(F.col("total_qty"), 2).alias("total_qty"),
            rhalf(F.col("unit_price"), 4).alias("unit_price"),
        )
        .orderBy("l_partkey")
    )
