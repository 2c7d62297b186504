"""Round-4 corpus additions, batch 29: cohort LTV curves, term
burstiness, partition-spec evolution reads, and CUSUM changepoint
detection.

The partition-evolution query turns a §2B capability that was only
pytest-covered into a driver-certified corpus entry: scans must read
files written under DIFFERENT partition specs as one table — the
exact contract hidden partitioning exists to provide
(reference table.rs:36-40, partition.rs:15-138).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.plans.llm import TOKENS_SQL
from iceberg_rs_spark.operators import text as T
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table
from iceberg_rs_spark.sources.icelake import Catalog

# ---------------------------------------------------------------------------
# Cohort LTV curve
# ---------------------------------------------------------------------------


@query(
    "events_ltv_cohort_curve",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    cohorts AS (
        SELECT user_id,
               CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
        FROM evt WHERE event_type = 'signup' GROUP BY user_id),
    spend AS (
        SELECT c.cohort_week, e.user_id,
               CAST(FLOOR((epoch_us(e.ts)
                           - epoch_us(CAST(c.cohort_week AS TIMESTAMP)))
                          / CAST(604800000000 AS BIGINT)) AS INTEGER)
                   AS week_offset,
               CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT) AS cents
        FROM evt e JOIN cohorts c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= CAST(c.cohort_week AS TIMESTAMP)),
    weekly AS (
        SELECT cohort_week, week_offset, SUM(cents) AS rev
        FROM spend GROUP BY cohort_week, week_offset),
    sizes AS (
        SELECT cohort_week, COUNT(*) AS n_users FROM cohorts
        GROUP BY cohort_week)
    SELECT strftime(w.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(w.week_offset AS INTEGER) AS week_offset,
           CAST(s.n_users AS BIGINT) AS n_users,
           CAST(SUM(w.rev) OVER (PARTITION BY w.cohort_week
                                 ORDER BY w.week_offset
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_revenue_cents,
           {rhalf_sql(
               'SUM(w.rev) OVER (PARTITION BY w.cohort_week '
               'ORDER BY w.week_offset ROWS UNBOUNDED PRECEDING) '
               '/ (100.0 * s.n_users)', 2)} AS cum_ltv_per_user
    FROM weekly w JOIN sizes s USING (cohort_week)
    ORDER BY cohort_week, week_offset
    """,
    tags=("events", "cohort", "ltv"),
)
def events_ltv_cohort_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by signup week,
    purchase revenue accumulated per cohort across week offsets, and
    the headline per-user cumulative LTV — the revenue companion of
    `events_cohort_retention` (which counts activity, not value).
    Week offsets are micros-exact epoch arithmetic off the Monday
    cohort anchor (floor division — week 0 is the signup week);
    revenue is per-event integer cents so the running sums are
    order-free; the cumulative window runs over the
    cohort×offset-sized rollup, not raw events."""
    ev = load_table(spark, sf_dir, "events")
    cohorts = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week"))
    )
    spend = (
        ev.where(F.col("event_type") == "purchase")
        .join(cohorts, "user_id")
        .where(F.col("ts") >= F.col("cohort_week").cast("timestamp_ntz"))
        .select(
            "cohort_week",
            F.floor(
                F.expr(
                    "timestampdiff(MICROSECOND, "
                    "cast(cohort_week as timestamp_ntz), ts)"
                )
                / (7 * 86400 * 1_000_000)
            )
            .cast("int")
            .alias("week_offset"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
    )
    weekly = spend.groupBy("cohort_week", "week_offset").agg(
        F.sum("cents").alias("rev")
    )
    sizes = cohorts.groupBy("cohort_week").agg(F.count("*").alias("n_users"))
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        weekly.join(sizes, "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_users",
            F.sum("rev").over(w).alias("cum_revenue_cents"),
            rhalf(
                F.sum("rev").over(w) / (100.0 * F.col("n_users")), 2
            ).alias("cum_ltv_per_user"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# Term burstiness (variance-to-mean dispersion)
# ---------------------------------------------------------------------------


@query(
    "text_term_burstiness",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({TOKENS_SQL.format(c='text')}) AS term
        FROM documents),
    tc AS (
        SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS c
        FROM toks GROUP BY doc_id, term),
    nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    stats AS (
        SELECT term,
               SUM(c) AS total,
               COUNT(*) AS doc_freq,
               SUM(c * c) AS ss
        FROM tc GROUP BY term),
    top AS (
        SELECT term, total, doc_freq, ss FROM stats
        ORDER BY total DESC, term LIMIT 30)
    SELECT term,
           CAST(total AS BIGINT) AS total_count,
           CAST(doc_freq AS BIGINT) AS doc_freq,
           {rhalf_sql(
               '(ss / (SELECT n FROM nd) '
               '- (total / (SELECT n FROM nd)) * (total / (SELECT n FROM nd))) '
               '/ (total / (SELECT n FROM nd))', 4)} AS burstiness_vmr
    FROM top
    ORDER BY total_count DESC, term
    """,
    tags=("llm", "text", "dispersion", "statistics"),
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness for the top-30 vocabulary: the
    variance-to-mean ratio (index of dispersion) of per-document
    counts, zeros included — VMR ≈ 1 is Poisson scatter (function
    words), VMR ≫ 1 marks topical/bursty terms that concentrate in
    few documents. Population variance recovered from (Σc, Σc²,
    N_docs) so absent documents never need materializing — one
    explode, one (doc, term) count, one term rollup. The
    content-word/function-word discriminator that TF-IDF approximates
    and this measures directly."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("term")
    )
    tc = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("c")
    )
    stats = tc.groupBy("term").agg(
        F.sum("c").alias("total"),
        F.count("*").alias("doc_freq"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    top = stats.orderBy(F.col("total").desc(), "term").limit(30)
    mean = F.col("total") / n_docs
    vmr = (F.col("ss") / n_docs - mean * mean) / mean
    return top.select(
        "term",
        F.col("total").cast("long").alias("total_count"),
        F.col("doc_freq").cast("long").alias("doc_freq"),
        rhalf(vmr, 4).alias("burstiness_vmr"),
    ).orderBy(F.col("total_count").desc(), "term")


# ---------------------------------------------------------------------------
# Partition-spec evolution reads
# ---------------------------------------------------------------------------


@query(
    "table_partition_evolution_reads",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    base AS (SELECT * FROM evt WHERE event_id % 4 = 0),
    a AS (SELECT COUNT(*) AS c FROM base WHERE event_id % 8 = 0),
    b AS (SELECT COUNT(*) AS c FROM base WHERE event_id % 8 = 4),
    u42 AS (SELECT COUNT(*) AS c FROM base WHERE user_id = 42)
    SELECT * FROM (
        SELECT 1 AS step, 'rows_under_spec1' AS metric,
               CAST((SELECT c FROM a) AS BIGINT) AS value
        UNION ALL SELECT 2, 'rows_after_evolution',
               CAST((SELECT c FROM a) + (SELECT c FROM b) AS BIGINT)
        UNION ALL SELECT 3, 'partition_specs_registered', CAST(2 AS BIGINT)
        UNION ALL SELECT 4, 'rows_user_42_cross_spec',
               CAST((SELECT c FROM u42) AS BIGINT))
    ORDER BY step
    """,
    tags=("table", "partitioning", "evolution"),
)
def table_partition_evolution_reads(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partition-spec evolution certified at the READ path: files
    written under spec 1 (day(ts)) and, after `set_partition_spec`,
    under spec 2 (day(ts) + bucket[4](user_id)) are scanned as ONE
    table — before/after row counts and a cross-spec predicate count
    must all match the plain-parquet oracle. Hidden partitioning's
    core promise (reference table.rs:36-40): evolving the layout
    never changes query results, only pruning opportunities — new
    files gain user-bucket pruning while old files fall back to
    day-only pruning, with no rewrite of historical data."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("event_id") % 4 == 0
    )
    catalog = Catalog(spark, tempfile.mkdtemp(prefix="icelake_specevo_"))
    t = catalog.create_table(
        "db.events_specevo", events.schema, partition_by=[("ts", "day")]
    )
    t.append(events.where(F.col("event_id") % 8 == 0))
    # r15 (guide §6, VERDICT r14 #5): the two unfiltered audit counts
    # are served from the snapshot's manifest statistics
    # (Table.count_rows — the standard Iceberg metadata-only COUNT(*),
    # exact while the snapshot has no delete files, which this table
    # never does), replacing two full multi-file Spark scan jobs. The
    # cross-spec predicate count below still reads data — that is the
    # read-path property this query certifies.
    rows_spec1 = t.count_rows()
    t.set_partition_spec([("ts", "day"), ("user_id", "bucket[4]")])
    t.append(events.where(F.col("event_id") % 8 == 4))
    rows_after = t.count_rows()
    n_specs = len(t.metadata.partition_specs)
    rows_user42 = t.scan().where(F.col("user_id") == 42).count()
    audit = [
        (1, "rows_under_spec1", rows_spec1),
        (2, "rows_after_evolution", rows_after),
        (3, "partition_specs_registered", n_specs),
        (4, "rows_user_42_cross_spec", rows_user42),
    ]
    return spark.createDataFrame(
        audit, "step int, metric string, value long"
    ).orderBy("step")


# ---------------------------------------------------------------------------
# CUSUM changepoint detection
# ---------------------------------------------------------------------------


@query(
    "ts_cusum_changepoint",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(COUNT(*) AS DOUBLE) AS x
        FROM evt GROUP BY 1),
    mu AS (SELECT AVG(x) AS m FROM daily),
    cs AS (
        SELECT d, x,
               SUM(x - (SELECT m FROM mu)) OVER (ORDER BY d
                   ROWS UNBOUNDED PRECEDING) AS cusum
        FROM daily),
    rc AS (SELECT d, x, {rhalf_sql('cusum', 2)} AS cusum FROM cs),
    mx AS (SELECT MAX(ABS(cusum)) AS peak FROM rc)
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(x AS BIGINT) AS n_events,
           cusum,
           CAST(ABS(cusum) = (SELECT peak FROM mx) AS BOOLEAN)
               AS is_changepoint
    FROM rc
    ORDER BY day
    """,
    tags=("timeseries", "changepoint", "cusum"),
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the daily event-count series:
    the running sum of deviations from the global mean, whose
    |maximum| marks the most likely level-shift point (the classic
    offline CUSUM estimator; the drift companion to the
    spike-focused z-score and MAD control charts). The mean rides in
    a 1-row broadcast; the running sum is over the day-level rollup.
    The flagged day is an argmax over exact ROUND(2)-stable sums, so
    the changepoint itself is hash-certified, not just the curve."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("double").alias("x")
    )
    mu = daily.agg(F.avg("x").alias("m"))
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cs = daily.crossJoin(F.broadcast(mu)).select(
        "d", "x", F.sum(F.col("x") - F.col("m")).over(w).alias("cusum")
    )
    wall = Window.partitionBy()
    rc = cs.select(
        "d",
        "x",
        rhalf(F.col("cusum"), 2).alias("cusum"),
    )
    return rc.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("x").cast("long").alias("n_events"),
        "cusum",
        (F.abs("cusum") == F.max(F.abs("cusum")).over(wall)).alias(
            "is_changepoint"
        ),
    ).orderBy("day")
