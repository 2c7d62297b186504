"""Round-4 corpus additions, batch 19: deterministic cardinality
sketches (KMV and linear counting) and Kaplan–Meier survival.

Like the count-min query, the cardinality sketches are built from the
portable hash instead of engine sketch types, so their ESTIMATES are
hash-checkable — the determinism rules only exile sketches whose
internals differ between engines, not the technique itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.functions.hashing import h60, h60_sql
from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

# ---------------------------------------------------------------------------
# KMV (k minimum values) distinct estimate
# ---------------------------------------------------------------------------

KMV_K = 256
_HASH_SPACE = float(2**60)


@query(
    "agg_kmv_distinct_estimate",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    hashes AS (
        SELECT DISTINCT {h60_sql(
            "'kmv|' || CAST(user_id AS VARCHAR)")} AS h
        FROM evt),
    kth AS (
        SELECT MAX(h) AS hk, CAST(COUNT(*) AS BIGINT) AS k_used
        FROM (SELECT h FROM hashes ORDER BY h LIMIT {KMV_K})),
    truth AS (SELECT CAST(COUNT(*) AS BIGINT) AS true_distinct FROM hashes)
    SELECT t.true_distinct, k.k_used,
           CAST(floor((k.k_used - 1) * {_HASH_SPACE} / k.hk) AS BIGINT)
               AS kmv_estimate,
           {rhalf_sql(
               'ABS((k_used - 1) * ' + str(_HASH_SPACE)
               + ' / hk - true_distinct) / true_distinct', 4)} AS rel_error
    FROM kth k CROSS JOIN truth t
    """,
    tags=("aggregate", "sketch", "cardinality", "kmv"),
)
def agg_kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count estimation from the
    portable hash: keep the 256 smallest 60-bit hash values; the kth
    smallest estimates density, so distinct ≈ (k−1)·2⁶⁰/h_k. Unlike
    approx_count_distinct (engine HLL, rows-only under the
    determinism rules), every intermediate here is hash-checkable —
    and the k-smallest set is MERGEABLE (union then re-truncate),
    which is exactly how the sketch distributes: each partition ships
    its k minima, the reduce keeps the global k. The true distinct
    count and relative error ride along, certifying estimator
    quality, not just mechanics."""
    ev = load_table(spark, sf_dir, "events")
    hashes = ev.select(
        h60(F.concat(F.lit("kmv|"), F.col("user_id").cast("string"))).alias("h")
    ).distinct()
    kmin = hashes.orderBy("h").limit(KMV_K)
    kth = kmin.agg(
        F.max("h").alias("hk"), F.count(F.lit(1)).cast("long").alias("k_used")
    )
    truth = hashes.agg(F.count(F.lit(1)).cast("long").alias("true_distinct"))
    est = (F.col("k_used") - 1) * _HASH_SPACE / F.col("hk")
    return (
        kth.crossJoin(F.broadcast(truth))
        .select(
            "true_distinct",
            "k_used",
            F.floor(est).cast("long").alias("kmv_estimate"),
            rhalf(
                F.abs(est - F.col("true_distinct")) / F.col("true_distinct"), 4
            ).alias("rel_error"),
        )
    )


# ---------------------------------------------------------------------------
# Linear counting distinct estimate
# ---------------------------------------------------------------------------

LC_M = 4096


@query(
    "agg_linear_counting_distinct",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    buckets AS (
        SELECT DISTINCT {h60_sql(
            "'lc|' || CAST(user_id AS VARCHAR)")} % {LC_M} AS b
        FROM evt),
    truth AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS true_distinct
        FROM evt),
    occ AS (SELECT CAST(COUNT(*) AS BIGINT) AS occupied FROM buckets)
    SELECT t.true_distinct, o.occupied,
           CAST(floor(-{LC_M} * ln(({LC_M} - o.occupied) * 1.0 / {LC_M}))
                AS BIGINT) AS lc_estimate,
           {rhalf_sql(
               f'ABS(-{LC_M} * ln(({LC_M} - occupied) * 1.0 / {LC_M})'
               ' - true_distinct) / true_distinct', 4)} AS rel_error
    FROM occ o CROSS JOIN truth t
    """,
    tags=("aggregate", "sketch", "cardinality", "linear-counting"),
)
def agg_linear_counting_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear counting: hash users into a 4096-slot bitmap and invert
    the occupancy — distinct ≈ −m·ln(empty/m). The bitmap is ONE bit
    per slot and merges by OR, the cheapest mergeable cardinality
    structure there is (HLL's precursor, still the right tool when
    distinct ≪ slots). Built on the portable hash so the occupied
    count and the estimate hash-check; true count and relative error
    certify quality. Requires occupancy < m, guaranteed here by the
    fixture's user population."""
    ev = load_table(spark, sf_dir, "events")
    buckets = ev.select(
        (
            h60(F.concat(F.lit("lc|"), F.col("user_id").cast("string"))) % LC_M
        ).alias("b")
    ).distinct()
    occ = buckets.agg(F.count(F.lit(1)).cast("long").alias("occupied"))
    truth = ev.agg(
        F.countDistinct("user_id").cast("long").alias("true_distinct")
    )
    est = -LC_M * F.log((LC_M - F.col("occupied")) * 1.0 / LC_M)
    return (
        occ.crossJoin(F.broadcast(truth))
        .select(
            "true_distinct",
            "occupied",
            F.floor(est).cast("long").alias("lc_estimate"),
            rhalf(
                F.abs(est - F.col("true_distinct")) / F.col("true_distinct"), 4
            ).alias("rel_error"),
        )
    )


# ---------------------------------------------------------------------------
# Kaplan–Meier survival over user lifetimes
# ---------------------------------------------------------------------------


@query(
    "events_survival_km",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    lifetimes AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day,
               MAX(CAST(ts AS DATE)) AS last_day
        FROM evt GROUP BY user_id),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM evt),
    joins AS (
        SELECT day,
               (SELECT COUNT(*) FROM lifetimes l WHERE l.first_day <= d.day)
                   AS started,
               (SELECT COUNT(*) FROM lifetimes l WHERE l.last_day < d.day)
                   AS ended,
               (SELECT COUNT(*) FROM lifetimes l WHERE l.last_day = d.day)
                   AS churned
        FROM days d),
    hazard AS (
        SELECT day, started - ended AS n_at_risk, churned,
               CASE WHEN churned < started - ended
                    THEN ln(1.0 - churned * 1.0 / (started - ended))
                    ELSE NULL END AS lnterm,
               CASE WHEN churned >= started - ended THEN 1 ELSE 0 END
                   AS absorbed
        FROM joins),
    curve AS (
        SELECT day, CAST(n_at_risk AS BIGINT) AS n_at_risk,
               CAST(churned AS BIGINT) AS churned,
               CASE WHEN SUM(absorbed) OVER w > 0 THEN 0.0
                    ELSE exp(SUM(lnterm) OVER w) END AS s
        FROM hazard
        WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW))
    SELECT strftime(day, '%Y-%m-%d') AS day, n_at_risk, churned,
           {rhalf_sql('s', 5)} AS survival
    FROM curve
    ORDER BY day
    """,
    tags=("events", "survival", "kaplan-meier"),
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival over user lifetimes: a user "dies" on
    their last active day; S(t) = Π_{u≤t} (1 − d(u)/n(u)) — the churn
    curve product teams read. The risk set n(t) comes from cumulative
    start/end counts (two correlated counts over the tiny lifetime
    table), NEVER a day×user range join; the product telescopes as
    exp of a RUNNING SUM of ln terms — window frames accumulate in
    row order on both engines, so the irrational sum stays
    deterministic (the same ordered-fold discipline as NDCG). Once a
    day absorbs the whole risk set the curve pins to exactly 0."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    lifetimes = ev.groupBy("user_id").agg(
        F.min(day).alias("first_day"), F.max(day).alias("last_day")
    )
    days = ev.select(day.alias("day")).distinct()
    starts = lifetimes.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_start")
    )
    ends = lifetimes.groupBy(F.col("last_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_end")
    )
    grid = (
        days.join(starts, "day", "left")
        .join(ends, "day", "left")
        .na.fill({"n_start": 0, "n_end": 0})
    )
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    joined = grid.select(
        "day",
        F.sum("n_start").over(wcum).alias("started"),
        (F.sum("n_end").over(wcum) - F.col("n_end")).alias("ended"),
        F.col("n_end").alias("churned"),
    )
    hazard = joined.select(
        "day",
        (F.col("started") - F.col("ended")).alias("n_at_risk"),
        "churned",
        F.when(
            F.col("churned") < F.col("started") - F.col("ended"),
            F.log(
                1.0
                - F.col("churned") * 1.0 / (F.col("started") - F.col("ended"))
            ),
        ).alias("lnterm"),
        F.when(
            F.col("churned") >= F.col("started") - F.col("ended"), 1
        ).otherwise(0).alias("absorbed"),
    )
    curve = hazard.select(
        "day",
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.col("churned").cast("long").alias("churned"),
        F.when(F.sum("absorbed").over(wcum) > 0, F.lit(0.0))
        .otherwise(F.exp(F.sum("lnterm").over(wcum)))
        .alias("s"),
    )
    return curve.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_at_risk",
        "churned",
        rhalf(F.col("s"), 5).alias("survival"),
    ).orderBy("day")
