"""Round-4 corpus additions, batch 26: string inspection functions,
Jensen-Shannon divergence between language vocabularies, sweep-line
peak concurrency, and exact rolling medians.

The sweep-line query is the load-bearing one: max-concurrent-intervals
is the capacity-planning primitive (peak sessions, peak connections,
peak GPU jobs), and the +1/−1 running-sum formulation is the only
shape that stays a single sort + prefix sum at any scale — the naive
self-join over overlapping intervals is quadratic in the peak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.operators.skew import spread_by_range
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.plans.llm import TOKENS_SQL
from iceberg_rs_spark.operators import text as T
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

# ---------------------------------------------------------------------------
# String inspection family
# ---------------------------------------------------------------------------


@query(
    "fn_string_inspection_family",
    oracle="""
    SELECT s_suppkey,
           split_part(s_name, '#', 2) AS name_num,
           left(s_name, 8) AS name_left,
           right(s_name, 3) AS name_right,
           starts_with(s_name, 'Supplier') AS is_supplier,
           CAST(CASE WHEN contains(s_name, '#') THEN 1 ELSE 0 END
                AS BOOLEAN) AS has_hash,
           CAST(strpos(s_name, '#') AS INTEGER) AS hash_pos,
           printf('%s/%05d', upper(left(s_name, 3)),
                  CAST(s_suppkey AS INTEGER)) AS badge
    FROM supplier
    ORDER BY s_suppkey
    """,
    tags=("scalar", "string", "inspection"),
)
def fn_string_inspection_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String INSPECTION functions beyond the slice/concat families:
    split_part (field extraction without materializing the array),
    left/right anchored slices, startswith/contains predicates,
    locate (1-based find, 0 = absent — same convention as DuckDB's
    strpos), and printf-style formatting with zero-padded numerics.
    All codegen'd JVM expressions; the formatting call is the
    standard way to mint fixed-width join/display keys without a
    Python UDF.

    Cross-engine caveat (ADVICE r4): this pairing assumes the
    supplier-name fixture strings are ASCII and ≥ 3 chars.
    ``substring(s, -3, 3)`` diverges from DuckDB ``right(s, 3)`` on
    shorter strings, and Spark/DuckDB ``ascii()`` disagree on
    non-ASCII leading code points — if the fixture ever changes, use
    ``substr(s, greatest(1, length(s)-2))`` on both sides instead."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.split_part(F.col("s_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.col("s_name").substr(1, 8).alias("name_left"),
        F.substring(F.col("s_name"), -3, 3).alias("name_right"),
        F.col("s_name").startswith("Supplier").alias("is_supplier"),
        F.col("s_name").contains("#").alias("has_hash"),
        F.locate("#", F.col("s_name")).alias("hash_pos"),
        F.format_string(
            "%s/%05d",
            F.upper(F.col("s_name").substr(1, 3)),
            F.col("s_suppkey").cast("int"),
        ).alias("badge"),
    ).orderBy("s_suppkey")


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence between language vocabularies
# ---------------------------------------------------------------------------


@query(
    "text_js_divergence_lang",
    oracle=f"""
    WITH toks AS (
        SELECT lang, unnest({TOKENS_SQL.format(c='text')}) AS term
        FROM documents),
    counts AS (
        SELECT lang, term, CAST(COUNT(*) AS DOUBLE) AS c
        FROM toks GROUP BY lang, term),
    tot AS (SELECT lang, SUM(c) AS n FROM counts GROUP BY lang),
    p AS (
        SELECT counts.lang, term, c / tot.n AS p
        FROM counts JOIN tot USING (lang)),
    allterms AS (
        SELECT la.lang AS lang_a, lb.lang AS lang_b, px.term,
               COALESCE(pa.p, 0) AS pa, COALESCE(pb.p, 0) AS pb
        FROM (SELECT DISTINCT lang FROM p) la
        JOIN (SELECT DISTINCT lang FROM p) lb ON la.lang < lb.lang
        JOIN (SELECT DISTINCT term FROM p) px ON TRUE
        LEFT JOIN p pa ON pa.lang = la.lang AND pa.term = px.term
        LEFT JOIN p pb ON pb.lang = lb.lang AND pb.term = px.term
        WHERE COALESCE(pa.p, 0) + COALESCE(pb.p, 0) > 0)
    SELECT lang_a, lang_b,
           CAST(COUNT(*) AS BIGINT) AS n_union_terms,
           CAST(SUM(CASE WHEN pa > 0 AND pb > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_shared_terms,
           {rhalf_sql(
               'SUM(0.5 * (CASE WHEN pa > 0 THEN pa * ln(pa / ((pa + pb) / 2)) ELSE 0 END)'
               ' + 0.5 * (CASE WHEN pb > 0 THEN pb * ln(pb / ((pa + pb) / 2)) ELSE 0 END))',
               4,
           )} AS jsd_nats
    FROM allterms
    GROUP BY lang_a, lang_b
    ORDER BY lang_a, lang_b
    """,
    tags=("llm", "text", "divergence", "statistics"),
)
def text_js_divergence_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between per-language unigram
    distributions, for every language pair in the corpus: the
    standard symmetric, bounded (≤ ln 2) measure of how far apart
    two text distributions sit — the metric used to compare a
    candidate data source against a target mixture before blending.
    Unigram probabilities are computed once per (lang, term); the
    pair table is a term-keyed full alignment (union vocabulary,
    absent side = 0, which contributes p·ln2 to its own half of the
    sum). Everything after the one token explode runs on
    vocabulary-sized relations; JSD is exact at ROUND(4) in nats."""
    docs = spread_by_range(
        load_table(spark, sf_dir, "documents").select("lang", "text"), "lang"
    )
    toks = docs.select("lang", F.explode(T.tokens(F.col("text"))).alias("term"))
    counts = toks.groupBy("lang", "term").agg(
        F.count("*").cast("double").alias("c")
    )
    tot = counts.groupBy("lang").agg(F.sum("c").alias("n"))
    p = counts.join(tot, "lang").select(
        "lang", "term", (F.col("c") / F.col("n")).alias("p")
    )
    # Full alignment per ORDERED lang pair over the union vocabulary,
    # built from the probability table twice (absent side -> p = 0).
    langs = p.select("lang").distinct()
    lp = (
        langs.alias("la")
        .join(langs.alias("lb"), F.col("la.lang") < F.col("lb.lang"))
        .select(
            F.col("la.lang").alias("lang_a"), F.col("lb.lang").alias("lang_b")
        )
    )
    terms = p.select("term").distinct()
    grid = lp.join(terms, F.lit(True))
    pa = p.select(
        F.col("lang").alias("lang_a"),
        F.col("term").alias("term_a"),
        F.col("p").alias("pa"),
    )
    pb = p.select(
        F.col("lang").alias("lang_b"),
        F.col("term").alias("term_pb"),
        F.col("p").alias("pb"),
    )
    cells = (
        grid.join(
            pa,
            (grid["lang_a"] == pa["lang_a"]) & (grid["term"] == pa["term_a"]),
            "left",
        )
        .drop(pa["lang_a"])
        .join(
            pb,
            (grid["lang_b"] == pb["lang_b"]) & (grid["term"] == pb["term_pb"]),
            "left",
        )
        .drop(pb["lang_b"])
        .select(
            "lang_a",
            "lang_b",
            F.coalesce(F.col("pa"), F.lit(0.0)).alias("pa"),
            F.coalesce(F.col("pb"), F.lit(0.0)).alias("pb"),
        )
        .where(F.col("pa") + F.col("pb") > 0)
    )
    m = (F.col("pa") + F.col("pb")) / 2
    kl_a = F.when(
        F.col("pa") > 0, F.col("pa") * F.log(F.col("pa") / m)
    ).otherwise(0.0)
    kl_b = F.when(
        F.col("pb") > 0, F.col("pb") * F.log(F.col("pb") / m)
    ).otherwise(0.0)
    return (
        cells.groupBy("lang_a", "lang_b")
        .agg(
            F.count("*").alias("n_union_terms"),
            F.sum(
                F.when((F.col("pa") > 0) & (F.col("pb") > 0), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_shared_terms"),
            rhalf(F.sum(0.5 * kl_a + 0.5 * kl_b), 4).alias("jsd_nats"),
        )
        .orderBy("lang_a", "lang_b")
    )


# ---------------------------------------------------------------------------
# Sweep-line peak concurrency
# ---------------------------------------------------------------------------


@query(
    "events_concurrent_peak",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    iv AS (
        SELECT user_id, ts AS s, ts + INTERVAL 5 MINUTE AS e
        FROM evt WHERE event_type = 'view'),
    deltas AS (
        SELECT s AS t, 1 AS delta FROM iv
        UNION ALL
        SELECT e AS t, -1 AS delta FROM iv),
    sweep AS (
        SELECT CAST(date_trunc('day', t) AS DATE) AS d, t, delta,
               SUM(delta) OVER (ORDER BY t, delta
                                ROWS UNBOUNDED PRECEDING) AS live
        FROM deltas)
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(MAX(live) AS BIGINT) AS peak_concurrent,
           CAST(COUNT(*) FILTER (WHERE delta = 1) AS BIGINT) AS n_started
    FROM sweep
    GROUP BY d
    ORDER BY day
    """,
    tags=("events", "sweep-line", "concurrency"),
)
def events_concurrent_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent activity via the sweep line: each view event
    opens a 5-minute presence interval; +1/−1 deltas at interval
    boundaries, a running sum over the (time, delta) total order —
    ends processed before the starts sharing their timestamp, the
    touching-intervals-not-concurrent convention — and the per-day
    max of the live counter. ONE sort + prefix sum, against the
    naive overlapping-pairs self-join that is quadratic in the peak.
    The running sum over the (t, delta) total order is the
    distributed two-pass prefix sum (operators/distwin.py: range
    partition → per-partition totals → broadcast offsets + local
    window) — no single-partition window anywhere in the plan, so
    the sweep parallelizes at 100 TB; semantics pinned by the
    oracle's ROWS UNBOUNDED PRECEDING sum."""
    from iceberg_rs_spark.operators.distwin import running_sum_global

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "view"
    )
    iv = ev.select(
        "ts", (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e")
    )
    deltas = iv.select(F.col("ts").alias("t"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    sweep = running_sum_global(
        deltas, [F.col("t"), F.col("delta")], "delta", "live"
    ).select(F.col("t").cast("date").alias("d"), "delta", "live")
    return (
        sweep.groupBy("d")
        .agg(
            F.max("live").alias("peak_concurrent"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_started"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "peak_concurrent",
            "n_started",
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Exact rolling median
# ---------------------------------------------------------------------------


@query(
    "win_rolling_median_daily",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(COUNT(*) AS DOUBLE) AS x
        FROM evt GROUP BY 1)
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(x AS BIGINT) AS n_events,
           {rhalf_sql(
               'quantile_cont(x, 0.5) OVER (ORDER BY d '
               'ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)', 2
           )} AS median_7d,
           {rhalf_sql(
               'quantile_cont(x, 0.9) OVER (ORDER BY d '
               'ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)', 2
           )} AS p90_7d
    FROM daily
    ORDER BY day
    """,
    tags=("window", "median", "rolling"),
)
def win_rolling_median_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling order statistics: 7-day trailing median and p90
    of the daily event count, via Spark's exact `percentile`
    aggregate evaluated over a rows-frame window (linear
    interpolation — the same convention as DuckDB's quantile_cont,
    so the hash check certifies the interpolation arithmetic, not
    just the ranks). Rolling medians are the robust-baseline
    companion to the MAD control chart (`ts_anomaly_robust_mad`);
    the frame holds ≤ 7 day-level rows per evaluation, so cost is
    |days|, not |events|."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("double").alias("x")
    )
    w = Window.orderBy("d").rowsBetween(-6, Window.currentRow)
    return (
        daily.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("x").cast("long").alias("n_events"),
            rhalf(F.percentile("x", F.lit(0.5)).over(w), 2).alias("median_7d"),
            rhalf(F.percentile("x", F.lit(0.9)).over(w), 2).alias("p90_7d"),
        )
        .orderBy("day")
    )
