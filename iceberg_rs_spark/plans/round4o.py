"""Round-4 corpus additions, batch 14: ORC ingestion, bot-detection
heuristics, similarity threshold sweeps, null-safe join keys, and
deterministic importance resampling.

The ORC round-trip certifies a second columnar format end-to-end
(DuckDB cannot read ORC, so the oracle recomputes from the parquet
fixture — equality proves the format conversion was lossless), and
the importance resampler is the "epoch oversampling" step of data
mixing, done with the same portable-hash determinism as the
train/test split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.functions.hashing import h60, h60_sql
from iceberg_rs_spark.operators import similarity as S
from iceberg_rs_spark.operators import text as T
from iceberg_rs_spark.operators.skew import spread_by_range
from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.plans.llm import TOKENS_SQL
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

# ---------------------------------------------------------------------------
# ORC ingestion round-trip
# ---------------------------------------------------------------------------

_ORC_DIR = "/tmp/iceberg_rs_spark_orc/part"


@query(
    "ingest_orc_roundtrip",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS retail_cents,
           CAST(MIN(p_size) AS BIGINT) AS min_size,
           CAST(MAX(p_size) AS BIGINT) AS max_size
    FROM part
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    tags=("ingest", "orc", "format"),
)
def ingest_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC ingestion: the part table is written to ORC (overwriting a
    fixed scratch location) and read back for a grouped aggregate —
    certifying Spark's second columnar format end-to-end. DuckDB
    cannot read ORC, so the oracle computes the same rollup straight
    from the parquet fixture: matching hashes prove the
    parquet→ORC→scan conversion was lossless, including the exact
    decimal-as-double cents. ORC scans get the same predicate/column
    pushdown machinery as parquet, so the layout choice is free at
    query time."""
    part = load_table(spark, sf_dir, "part")
    part.write.mode("overwrite").orc(_ORC_DIR)
    p = spark.read.orc(_ORC_DIR)
    cents = F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long")
    return (
        p.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum(cents).cast("long").alias("retail_cents"),
            F.min("p_size").cast("long").alias("min_size"),
            F.max("p_size").cast("long").alias("max_size"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Bot-detection heuristics
# ---------------------------------------------------------------------------

BOT_MIN_EVENTS, BOT_CV_MAX = 20, 0.5


@query(
    "events_bot_detection",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    seq AS (
        SELECT user_id, ts, event_id,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
        FROM evt WHERE user_id % 5 = 0),
    gaps AS (
        SELECT user_id,
               CAST(floor(epoch_us(ts) / 1000000)
                    - floor(epoch_us(prev_ts) / 1000000) AS BIGINT) AS gap_s
        FROM seq WHERE prev_ts IS NOT NULL),
    stats AS (
        SELECT user_id,
               CAST(COUNT(*) + 1 AS BIGINT) AS n_events,
               AVG(gap_s) AS avg_gap,
               stddev_samp(gap_s) AS sd_gap
        FROM gaps GROUP BY user_id
        HAVING COUNT(*) >= 2)
    SELECT user_id, n_events,
           {rhalf_sql('avg_gap', 4)} AS avg_gap_s,
           {rhalf_sql('COALESCE(sd_gap / NULLIF(avg_gap, 0), 0)', 4)} AS gap_cv,
           CAST(CASE WHEN n_events >= {BOT_MIN_EVENTS}
                      AND COALESCE(sd_gap / NULLIF(avg_gap, 0), 0) < {BOT_CV_MAX}
                THEN 1 ELSE 0 END AS INTEGER) AS bot_flag
    FROM stats
    ORDER BY user_id
    """,
    tags=("events", "anomaly", "bot-detection"),
)
def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot-detection heuristics from inter-event timing: human traffic
    has bursty gaps (coefficient of variation near or above 1), bots
    fire on schedules (CV near 0) — flag users with enough volume and
    suspiciously regular gaps. Gaps are integer seconds from NTZ
    timestamp arithmetic (tz-independent), per-user windows never go
    global, and the per-user stats reduce map-side. The flag
    thresholds are query constants, so the whole heuristic
    hash-checks."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 5 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = (
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast("long")
        * 86400
        + F.hour("ts").cast("long") * 3600
        + F.minute("ts").cast("long") * 60
        + F.second("ts").cast("long")
    )
    seq = ev.select(
        "user_id", sec.alias("s"), F.lag(sec).over(w).alias("prev_s")
    )
    gaps = seq.where(F.col("prev_s").isNotNull()).select(
        "user_id", (F.col("s") - F.col("prev_s")).alias("gap_s")
    )
    stats = (
        gaps.groupBy("user_id")
        .agg(
            (F.count(F.lit(1)) + 1).cast("long").alias("n_events"),
            F.avg("gap_s").alias("avg_gap"),
            F.stddev_samp("gap_s").alias("sd_gap"),
        )
        .where(F.col("n_events") >= 3)
    )
    cv = F.coalesce(
        F.col("sd_gap") / F.nullif(F.col("avg_gap"), F.lit(0)), F.lit(0.0)
    )
    return stats.select(
        "user_id",
        "n_events",
        rhalf(F.col("avg_gap"), 4).alias("avg_gap_s"),
        rhalf(cv, 4).alias("gap_cv"),
        F.when((F.col("n_events") >= BOT_MIN_EVENTS) & (cv < BOT_CV_MAX), 1)
        .otherwise(0)
        .cast("int")
        .alias("bot_flag"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Similarity threshold sweep
# ---------------------------------------------------------------------------

SWEEP_N, SWEEP_THRESHOLDS = 500, (0.90, 0.95, 0.99)

_S_DOT = "list_sum([CAST(a.v[i] * b.v[i] AS DOUBLE) for i in generate_series(1, 64)])"
_S_NRM = (
    "sqrt(list_sum([CAST({x}.v[i] * {x}.v[i] AS DOUBLE) "
    "for i in generate_series(1, 64)]))"
)


@query(
    "sim_threshold_sweep",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE vec_id < {SWEEP_N}),
    pairs AS (
        SELECT {_S_DOT} / ({_S_NRM.format(x='a')} * {_S_NRM.format(x='b')})
                   AS cos
        FROM base a JOIN base b ON a.vec_id < b.vec_id),
    sweep AS (
        SELECT t.threshold,
               CAST(COUNT(*) FILTER (WHERE cos >= t.threshold) AS BIGINT)
                   AS n_pairs,
               CAST(COUNT(*) AS DOUBLE) AS total
        FROM pairs CROSS JOIN (
            SELECT unnest([{', '.join(str(t) for t in SWEEP_THRESHOLDS)}])
                AS threshold) t
        GROUP BY t.threshold)
    SELECT threshold, n_pairs,
           {rhalf_sql('n_pairs / total', 6)} AS pair_frac
    FROM sweep
    ORDER BY threshold
    """,
    tags=("llm", "similarity", "calibration"),
)
def sim_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-threshold calibration: how many vector pairs exceed
    cosine 0.90 / 0.95 / 0.99 — the sweep that picks the semantic
    dedup cut-off before committing to a purge. One pass computes
    every pairwise cosine once and a 3-row threshold dimension
    fans out the conditional counts (never three rescans of the pair
    set). At scale the same sweep runs over the LSH-blocked candidate
    pairs from dedup_minhash_lsh_pairs instead of the all-pairs set;
    the threshold logic is identical."""
    base = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") < SWEEP_N
    ).select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    # r14 (guide §4.2): the pairwise cosine moves from interpreted HOF
    # folds (~25 µs/pair, and each vector's norm was re-folded once per
    # PAIR, i.e. ~n times per vector) to the Arrow-batched bit-exact
    # kernel the rest of the sim family scores with — one
    # ArrowEvalPython node, float-identical to the SQL left fold by
    # construction (cosine_arrow_exact: vectorized across rows,
    # sequential across dimensions). The probe side is spread off the
    # single-file scan partition so the pair evaluation parallelizes.
    a = spread_by_range(base, "vec_id").select(
        F.col("vec_id").alias("ida"), F.col("v").alias("va")
    )
    b = base.select(F.col("vec_id").alias("idb"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("ida") < F.col("idb")).select(
        S.cosine_arrow_exact(F.col("va"), F.col("vb")).alias("cos")
    )
    thresholds = F.explode(
        F.array(*[F.lit(t) for t in SWEEP_THRESHOLDS])
    ).alias("threshold")
    sweep = (
        pairs.select("cos", thresholds)
        .groupBy("threshold")
        .agg(
            F.count(F.when(F.col("cos") >= F.col("threshold"), 1))
            .cast("long")
            .alias("n_pairs"),
            F.count(F.lit(1)).cast("double").alias("total"),
        )
    )
    return sweep.select(
        "threshold",
        "n_pairs",
        rhalf(F.col("n_pairs") / F.col("total"), 6).alias("pair_frac"),
    ).orderBy("threshold")


# ---------------------------------------------------------------------------
# Null-safe join keys
# ---------------------------------------------------------------------------


@query(
    "join_null_safe_keys",
    oracle="""
    WITH ck AS (
        SELECT CASE WHEN c_custkey % 11 = 0 THEN NULL
                    ELSE c_custkey % 100 END AS k
        FROM customer),
    ok AS (
        SELECT CASE WHEN o_custkey % 11 = 0 THEN NULL
                    ELSE o_custkey % 100 END AS k
        FROM orders WHERE o_orderkey % 10 = 0)
    SELECT ck.k AS k, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM ck JOIN ok ON ck.k IS NOT DISTINCT FROM ok.k
    GROUP BY ck.k
    ORDER BY ck.k NULLS FIRST
    """,
    tags=("join", "null-safe"),
)
def join_null_safe_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM) on keys where
    a deterministic slice is NULL: NULL matches NULL, producing the
    NULL×NULL block a plain equi-join silently drops — the semantics
    entity-resolution joins on optional keys need. Spark plans <=>
    as a hash join key (EqualNullSafe is shuffle-keyable), so this
    stays a real distributed join, not a nested loop; the NULL group
    rides one hash bucket and would be the salting candidate under
    skew."""
    c = load_table(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 11 == 0, None)
        .otherwise(F.col("c_custkey") % 100)
        .alias("ck")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 10 == 0)
        .select(
            F.when(F.col("o_custkey") % 11 == 0, None)
            .otherwise(F.col("o_custkey") % 100)
            .alias("ok")
        )
    )
    return (
        c.join(o, F.col("ck").eqNullSafe(F.col("ok")))
        .groupBy(F.col("ck").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy(F.col("k").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# Deterministic importance resampling
# ---------------------------------------------------------------------------

EPOCH_SCALE = 3.0  # max oversampling factor


@query(
    "pipeline_importance_resampling",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL.format(c='text')} AS w FROM documents),
    scored AS (
        SELECT doc_id, len(list_distinct(w)) * 1.0 / len(w) AS q
        FROM toks WHERE len(w) > 0),
    planned AS (
        SELECT doc_id, q,
               q * {EPOCH_SCALE} AS target,
               CAST(floor(q * {EPOCH_SCALE}) AS BIGINT) AS base_copies,
               CAST(floor((q * {EPOCH_SCALE} - floor(q * {EPOCH_SCALE}))
                          * 1000 + 0.5) AS BIGINT) AS frac_mills
        FROM scored)
    SELECT doc_id, {rhalf_sql('q', 6)} AS quality,
           CAST(base_copies
                + CASE WHEN {h60_sql(
                    "'resample|' || CAST(doc_id AS VARCHAR)")} % 1000
                       < frac_mills
                  THEN 1 ELSE 0 END AS BIGINT) AS n_copies
    FROM planned
    ORDER BY doc_id
    """,
    tags=("llm", "pipeline", "mixing", "resampling"),
)
def pipeline_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance resampling — the epoch-oversampling
    step of data mixing: each document's copy count is
    floor(quality·3) plus one stochastic copy with probability equal
    to the fractional part, decided by the salted portable hash of
    the doc id instead of rand(). Expected copies equal the target
    weight exactly, yet the realized sample is bit-reproducible
    across runs, engines, and cluster layouts — rerunning the mix
    never silently changes the training set. The fractional
    comparison happens in integer mills (floor-half-up) so both
    engines threshold identical integers. Row-local math, scan-shaped;
    the actual expansion downstream is one explode of
    sequence(1, n_copies)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = (
        docs.select("doc_id", T.tokens(F.col("text")).alias("w"))
        .withColumn("n", F.size("w"))
        .where(F.col("n") > 0)
        .select(
            "doc_id",
            (F.size(F.array_distinct("w")) * 1.0 / F.col("n")).alias("q"),
        )
    )
    target = F.col("q") * EPOCH_SCALE
    base_copies = F.floor(target).cast("long")
    frac_mills = F.floor((target - F.floor(target)) * 1000 + F.lit(0.5)).cast(
        "long"
    )
    extra = F.when(
        h60(F.concat(F.lit("resample|"), F.col("doc_id").cast("string"))) % 1000
        < frac_mills,
        1,
    ).otherwise(0)
    return scored.select(
        "doc_id",
        rhalf(F.col("q"), 6).alias("quality"),
        (base_copies + extra).cast("long").alias("n_copies"),
    ).orderBy("doc_id")
