"""Round-4 corpus additions, batch 33: decile mobility matrix, HHI
market concentration, and hour-of-day load profiles.

The decile transition matrix is the longitudinal version of the RFM
snapshot (`events_rfm_segments`): instead of scoring users once, it
tracks how users MOVE between activity deciles month over month —
the engagement-mobility readout behind churn-risk models.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

# ---------------------------------------------------------------------------
# Month-over-month decile transition matrix
# ---------------------------------------------------------------------------


@query(
    "win_decile_transition_matrix",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    monthly AS (
        SELECT user_id,
               CAST(date_trunc('month', ts) AS DATE) AS m,
               CAST(COUNT(*) AS DOUBLE) AS activity
        FROM evt GROUP BY 1, 2),
    tiled AS (
        SELECT user_id, m,
               NTILE(5) OVER (PARTITION BY m
                              ORDER BY activity DESC, user_id) AS tile
        FROM monthly),
    moves AS (
        SELECT a.tile AS tile_from, b.tile AS tile_to
        FROM tiled a
        JOIN tiled b ON a.user_id = b.user_id
                    AND b.m = a.m + INTERVAL 1 MONTH)
    SELECT CAST(tile_from AS INTEGER) AS tile_from,
           CAST(tile_to AS INTEGER) AS tile_to,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           {rhalf_sql(
               'COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY tile_from)',
               4)} AS row_share
    FROM moves
    GROUP BY tile_from, tile_to
    ORDER BY tile_from, tile_to
    """,
    tags=("window", "ntile", "mobility"),
)
def win_decile_transition_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Engagement-mobility matrix: users quintiled by monthly
    activity (NTILE(5) with a user_id tiebreak so bucket edges are
    engine-stable), then consecutive-month pairs joined per user and
    counted into a 5×5 transition matrix with row-conditional shares
    — P(tile next month | tile this month), the input to any Markov
    churn model and the longitudinal complement of the RFM snapshot.
    The matrix is built from the user×month rollup, so the self-join
    is on a relation years smaller than raw events."""
    ev = load_table(spark, sf_dir, "events")
    monthly = ev.groupBy(
        "user_id", F.date_trunc("month", F.col("ts")).cast("date").alias("m")
    ).agg(F.count("*").cast("double").alias("activity"))
    wt = Window.partitionBy("m").orderBy(
        F.col("activity").desc(), "user_id"
    )
    tiled = monthly.select(
        "user_id", "m", F.ntile(5).over(wt).alias("tile")
    )
    nxt = tiled.select(
        F.col("user_id").alias("u2"),
        F.col("m").alias("m2"),
        F.col("tile").alias("tile_to"),
    )
    moves = tiled.join(
        nxt,
        (F.col("user_id") == F.col("u2"))
        & (F.col("m2") == F.add_months(F.col("m"), 1)),
    ).select(F.col("tile").alias("tile_from"), "tile_to")
    wrow = Window.partitionBy("tile_from")
    return (
        moves.groupBy("tile_from", "tile_to")
        .agg(F.count("*").alias("n_users"))
        .select(
            "tile_from",
            "tile_to",
            "n_users",
            rhalf(
                F.col("n_users") * 1.0 / F.sum("n_users").over(wrow), 4
            ).alias("row_share"),
        )
        .orderBy("tile_from", "tile_to")
    )


# ---------------------------------------------------------------------------
# HHI market concentration
# ---------------------------------------------------------------------------


@query(
    "agg_hhi_concentration",
    oracle=f"""
    WITH rev AS (
        SELECT n.n_name,
               SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100
                              + 0.5) AS BIGINT)) AS cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name),
    tot AS (SELECT SUM(cents) AS t FROM rev),
    shares AS (
        SELECT n_name, cents, cents * 1.0 / (SELECT t FROM tot) AS s
        FROM rev)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_markets,
           {rhalf_sql('SUM(s * s) * 10000', 2)} AS hhi,
           {rhalf_sql('1.0 / SUM(s * s)', 4)} AS effective_n,
           {rhalf_sql('MAX(s)', 4)} AS top_share,
           {rhalf_sql('SUM(CASE WHEN s >= 0.05 THEN s ELSE 0 END)', 4)}
               AS share_of_5pct_plus
    FROM shares
    """,
    tags=("aggregate", "concentration", "hhi"),
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of customer revenue by
    nation: HHI on the conventional 0–10000 scale (sum of squared
    percentage shares), the EFFECTIVE number of markets 1/Σs² (the
    "how many equal players would look like this" transform), the
    top share, and the mass held by ≥5% players — the
    antitrust-style concentration panel, equally used to audit
    training-data source dominance before fixing mixture weights
    (`pipeline_mixture_weights` is the knob; this is the gauge).
    Exact integer cents to the one dimension-sized share table, then
    a single-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum(cents).alias("cents"))
    )
    tot = rev.agg(F.sum("cents").alias("t"))
    shares = rev.crossJoin(F.broadcast(tot)).select(
        "n_name", (F.col("cents") * 1.0 / F.col("t")).alias("s")
    )
    return shares.agg(
        F.count("*").alias("n_markets"),
        rhalf(F.sum(F.col("s") * F.col("s")) * 10000, 2).alias("hhi"),
        rhalf(1.0 / F.sum(F.col("s") * F.col("s")), 4).alias("effective_n"),
        rhalf(F.max("s"), 4).alias("top_share"),
        rhalf(
            F.sum(F.when(F.col("s") >= 0.05, F.col("s")).otherwise(0.0)), 4
        ).alias("share_of_5pct_plus"),
    )


# ---------------------------------------------------------------------------
# Hour-of-day load profile
# ---------------------------------------------------------------------------


@query(
    "events_hour_of_day_profile",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    hourly AS (
        SELECT event_type, hour(ts) AS h, CAST(COUNT(*) AS DOUBLE) AS c
        FROM evt GROUP BY 1, 2),
    tot AS (
        SELECT event_type, SUM(c) AS t FROM hourly GROUP BY event_type),
    ranked AS (
        SELECT h.event_type, h.h, h.c, h.c / t.t AS share,
               RANK() OVER (PARTITION BY h.event_type
                            ORDER BY h.c DESC, h.h) AS rnk
        FROM hourly h JOIN tot t USING (event_type))
    SELECT event_type,
           CAST(h AS INTEGER) AS hour_utc,
           CAST(c AS BIGINT) AS n_events,
           {rhalf_sql('share', 4)} AS share,
           CAST(rnk = 1 AS BOOLEAN) AS is_peak_hour
    FROM ranked
    ORDER BY event_type, hour_utc
    """,
    tags=("events", "profile", "intraday"),
)
def events_hour_of_day_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraday load profile: events per hour-of-day and type, each
    hour's share of its type's volume, and the peak hour flagged
    (rank with an hour tiebreak so ties resolve identically in both
    engines) — the shape capacity planning and anomaly baselining
    start from, complementing the weekday-level
    `ts_weekday_seasonal_index`. NTZ hours are timezone-free by
    construction; the profile is a 24×|types| relation after one
    grouped pass."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.hour("ts").alias("h")
    ).agg(F.count("*").cast("double").alias("c"))
    wt = Window.partitionBy("event_type")
    wr = Window.partitionBy("event_type").orderBy(F.col("c").desc(), "h")
    return (
        hourly.select(
            "event_type",
            F.col("h").cast("int").alias("hour_utc"),
            F.col("c").cast("long").alias("n_events"),
            rhalf(F.col("c") / F.sum("c").over(wt), 4).alias("share"),
            (F.rank().over(wr) == 1).alias("is_peak_hour"),
        )
        .orderBy("event_type", "hour_utc")
    )
