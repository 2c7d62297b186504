"""Round-4 corpus additions, batch 11: dynamic partition pruning,
T5-style deterministic span corruption, curriculum staging,
rate-change z-tests, and the error-safe try_* scalar family.

Span corruption is the one genuinely novel shape here: the whole
mask-and-reassemble happens INSIDE one row via array higher-order
functions (sequence → transform → array_join), so the operator is
scan-shaped — no explode, no shuffle, no UDF — and the corrupted
text itself is certified by portable hash against DuckDB list
comprehensions over the same chunk arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.functions.hashing import h60, h60_sql
from iceberg_rs_spark.operators import text as T
from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.operators.skew import spread_by_range
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.plans.llm import TOKENS_SQL
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

# ---------------------------------------------------------------------------
# Dynamic partition pruning
# ---------------------------------------------------------------------------

_DPP_DIR = "/tmp/iceberg_rs_spark_dpp/events"
_CONV_TYPES = ("purchase", "signup")


@query(
    "join_dynamic_partition_pruning",
    oracle=f"""
    {EVENTS_ORACLE_CTE}
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM evt
    WHERE event_type IN {_CONV_TYPES!r}
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("join", "dpp", "layout"),
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is laid out
    partitioned by event_type (hive-style directories, overwriting a
    fixed scratch location), and the filter lives on the DIMENSION —
    Catalyst injects a runtime subquery that reads the dim first and
    prunes fact partitions before scanning them. At 100 TB this is
    the standard star-schema accelerant: a selective dim predicate
    skips whole fact partitions without any static literal in the
    fact scan. The aggregate is certified against a plain oracle —
    pruning must never change answers. The plan gate in
    test_plan_quality asserts the `dynamicpruning` subquery is
    actually present in the fact scan."""
    ev = load_table(spark, sf_dir, "events")
    (
        ev.select("event_id", "event_type", "user_id", "value")
        .write.partitionBy("event_type")
        .mode("overwrite")
        .parquet(_DPP_DIR)
    )
    fact = spark.read.parquet(_DPP_DIR)
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn(
            "is_conversion", F.col("event_type").isin(*_CONV_TYPES)
        )
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        fact.join(
            dim.where(F.col("is_conversion")).select("event_type"), "event_type"
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(cents).cast("long").alias("value_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# T5-style deterministic span corruption
# ---------------------------------------------------------------------------

SPAN_LEN, SPAN_MOD = 3, 6  # 3-token chunks, 1-in-6 masked (~17% tokens)
_SENTINEL = "<X>"


@query(
    "pipeline_span_corruption",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL.format(c='text')} AS w FROM documents),
    sized AS (
        SELECT doc_id, w, len(w) AS n_tok,
               CAST(floor((len(w) + {SPAN_LEN - 1}) / {SPAN_LEN}) AS BIGINT)
                   AS n_chunks
        FROM toks WHERE len(w) > 0),
    built AS (
        SELECT doc_id, n_tok,
               [CASE WHEN {h60_sql(
                   "CAST(doc_id AS VARCHAR) || '|' || CAST(i AS VARCHAR)")}
                       % {SPAN_MOD} = 0
                     THEN '{_SENTINEL}'
                     ELSE array_to_string(
                         list_slice(w, i * {SPAN_LEN} + 1,
                                    i * {SPAN_LEN} + {SPAN_LEN}), ' ')
                END for i in generate_series(0, n_chunks - 1)] AS pieces,
               list_sum([CASE WHEN {h60_sql(
                   "CAST(doc_id AS VARCHAR) || '|' || CAST(i AS VARCHAR)")}
                       % {SPAN_MOD} = 0
                     THEN least({SPAN_LEN}, n_tok - i * {SPAN_LEN})
                     ELSE 0
                END for i in generate_series(0, n_chunks - 1)]) AS n_masked
        FROM sized)
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
           CAST(COALESCE(n_masked, 0) AS BIGINT) AS n_masked,
           {rhalf_sql('COALESCE(n_masked, 0) * 1.0 / n_tok', 6)} AS mask_rate,
           {h60_sql("array_to_string(pieces, ' ')")} AS corrupted_hash
    FROM built
    ORDER BY doc_id
    """,
    tags=("llm", "pipeline", "span-corruption"),
)
def pipeline_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption, deterministically: tokens are grouped
    into 3-token chunks and a chunk is replaced by a single sentinel
    when the portable hash of (doc_id, chunk_index) lands in 1/6 of
    the space — reproducible across runs, engines, and cluster sizes,
    the same property the train/test split and A/B assignment rely
    on. The entire mask-and-reassemble runs INSIDE the row as array
    HOFs (sequence → transform over chunk indices → array_join):
    no explode, no shuffle, no Python — the corruption pass is
    scan-shaped at any corpus size, and the corrupted text is
    hash-certified, not just counted."""
    docs = spread_by_range(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    sized = docs.select(
        "doc_id", T.tokens(F.col("text")).alias("w")
    ).withColumn("n_tok", F.size("w")).where(F.col("n_tok") > 0)
    sized = sized.withColumn(
        "n_chunks",
        F.floor((F.col("n_tok") + (SPAN_LEN - 1)) / SPAN_LEN).cast("long"),
    )

    def _masked(i):
        return (
            h60(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("|"),
                    i.cast("string"),
                )
            )
            % SPAN_MOD
            == 0
        )

    idx = F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1)
    pieces = F.transform(
        idx,
        lambda i: F.when(_masked(i), F.lit(_SENTINEL)).otherwise(
            F.array_join(F.slice(F.col("w"), (i * SPAN_LEN + 1).cast("int"), SPAN_LEN), " ")
        ),
    )
    n_masked = F.aggregate(
        idx,
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            _masked(i), F.least(F.lit(SPAN_LEN), F.col("n_tok") - i * SPAN_LEN)
        ).otherwise(F.lit(0)).cast("long"),
    )
    built = sized.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tokens"),
        F.coalesce(n_masked, F.lit(0)).cast("long").alias("n_masked"),
        pieces.alias("pieces"),
    )
    return built.select(
        "doc_id",
        "n_tokens",
        "n_masked",
        rhalf(F.col("n_masked") * 1.0 / F.col("n_tokens"), 6).alias("mask_rate"),
        h60(F.array_join("pieces", " ")).alias("corrupted_hash"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Curriculum staging by lexical diversity
# ---------------------------------------------------------------------------

CURRICULUM_STAGES = 4


@query(
    "pipeline_curriculum_stages",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL.format(c='text')} AS w FROM documents),
    scored AS (
        SELECT doc_id, len(w) AS n_tok,
               len(list_distinct(w)) * 1.0 / len(w) AS ttr
        FROM toks WHERE len(w) > 0),
    staged AS (
        SELECT doc_id, n_tok, ttr,
               NTILE({CURRICULUM_STAGES}) OVER (ORDER BY ttr, doc_id) AS stage
        FROM scored)
    SELECT CAST(stage AS INTEGER) AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           {rhalf_sql('AVG(n_tok)', 6)} AS avg_tokens,
           {rhalf_sql('AVG(ttr)', 6)} AS avg_ttr,
           {rhalf_sql('MIN(ttr)', 6)} AS min_ttr,
           {rhalf_sql('MAX(ttr)', 6)} AS max_ttr
    FROM staged
    GROUP BY stage
    ORDER BY stage
    """,
    tags=("llm", "pipeline", "curriculum"),
)
def pipeline_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging: order the corpus by lexical diversity
    (type-token ratio — repetitive text first, varied text last) and
    cut it into 4 equal NTILE stages, the curriculum-learning
    schedule that feeds easy data early. NTILE's deterministic
    equal-fill semantics match across engines given the total (ttr,
    doc_id) ordering. Per-doc scoring is scan-shaped array math; the
    global NTILE runs as the distributed two-pass ntile
    (operators/distwin.py: range partition → per-partition totals →
    broadcast offsets), so no single-partition window exists in the
    plan and the cut parallelizes at 100 TB — the per-stage contract
    is bit-identical to SQL NTILE, pinned by the oracle."""
    from iceberg_rs_spark.operators.dedup import _spread, barrier
    from iceberg_rs_spark.operators.distwin import ntile_global

    # r14 (guide §2.5/§2.4): spread the single-file scan BEFORE the
    # tokenize + array_distinct projection (it ran on 1 of 32 cores),
    # and barrier the doc-level score relation — ntile_global's range
    # exchange SAMPLES its child to pick bounds, which re-evaluated the
    # whole heavy projection a second time (before-plan: 3 scans).
    # The barriered frame is one narrow row per doc (id + 2 numbers).
    docs = _spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    scored = barrier(
        docs.select("doc_id", T.tokens(F.col("text")).alias("w"))
        .withColumn("n_tok", F.size("w"))
        .where(F.col("n_tok") > 0)
        .select(
            "doc_id",
            "n_tok",
            (F.size(F.array_distinct("w")) * 1.0 / F.col("n_tok")).alias("ttr"),
        )
    )
    staged = ntile_global(
        scored, CURRICULUM_STAGES, [F.col("ttr"), F.col("doc_id")], "stage"
    )
    return (
        staged.groupBy(F.col("stage").cast("int").alias("stage"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            rhalf(F.avg("n_tok"), 6).alias("avg_tokens"),
            rhalf(F.avg("ttr"), 6).alias("avg_ttr"),
            rhalf(F.min("ttr"), 6).alias("min_ttr"),
            rhalf(F.max("ttr"), 6).alias("max_ttr"),
        )
        .orderBy("stage")
    )


# ---------------------------------------------------------------------------
# Rate-change z-test between corpus halves
# ---------------------------------------------------------------------------

Z_CRIT = 1.96


@query(
    "events_rate_change_ztest",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    bounds AS (
        SELECT MIN(CAST(ts AS DATE)) AS d_min, MAX(CAST(ts AS DATE)) AS d_max
        FROM evt),
    split AS (
        SELECT d_min, d_max,
               d_min + CAST(floor(date_diff('day', d_min, d_max) / 2)
                            AS INTEGER) AS d_mid
        FROM bounds),
    halves AS (
        SELECT e.event_type,
               CASE WHEN CAST(e.ts AS DATE) <= s.d_mid THEN 1 ELSE 2 END AS half,
               s.d_mid, s.d_min, s.d_max
        FROM evt e CROSS JOIN split s),
    agg AS (
        SELECT event_type,
               COUNT(*) FILTER (WHERE half = 1) * 1.0
                   / (date_diff('day', MIN(d_min), MIN(d_mid)) + 1) AS r1,
               COUNT(*) FILTER (WHERE half = 2) * 1.0
                   / date_diff('day', MIN(d_mid), MIN(d_max)) AS r2,
               date_diff('day', MIN(d_min), MIN(d_mid)) + 1 AS days1,
               date_diff('day', MIN(d_mid), MIN(d_max)) AS days2
        FROM halves GROUP BY event_type)
    SELECT event_type,
           CAST(days1 AS BIGINT) AS days1, CAST(days2 AS BIGINT) AS days2,
           {rhalf_sql('r1', 6)} AS rate1, {rhalf_sql('r2', 6)} AS rate2,
           {rhalf_sql('(r2 - r1) / sqrt(r1 / days1 + r2 / days2)', 6)} AS z,
           CAST(CASE WHEN ABS((r2 - r1) / sqrt(r1 / days1 + r2 / days2))
                          > {Z_CRIT}
                THEN 1 ELSE 0 END AS INTEGER) AS significant
    FROM agg
    ORDER BY event_type
    """,
    tags=("events", "stats-test", "rates"),
)
def events_rate_change_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Poisson rate z-test: split the corpus at its
    midpoint date and test, per event type, whether the daily event
    rate changed between halves — z = (r₂−r₁)/√(r₁/d₁ + r₂/d₂), the
    volume-shift monitor behind "did the release change behaviour".
    The date bounds ride in as a 1-row broadcast; one conditional
    aggregate computes both halves in a single pass over events
    (no per-half rescan), so the whole test is one reduce at any
    scale."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    bounds = ev.agg(
        F.min(day).alias("d_min"), F.max(day).alias("d_max")
    ).withColumn(
        "d_mid",
        F.date_add(
            F.col("d_min"),
            F.floor(F.datediff(F.col("d_max"), F.col("d_min")) / 2).cast("int"),
        ),
    )
    halves = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(day <= F.col("d_mid"), 1).otherwise(2).alias("half"),
        "d_min",
        "d_mid",
        "d_max",
    )
    agg = halves.groupBy("event_type").agg(
        (
            F.count(F.when(F.col("half") == 1, 1))
            * 1.0
            / (F.datediff(F.min("d_mid"), F.min("d_min")) + 1)
        ).alias("r1"),
        (
            F.count(F.when(F.col("half") == 2, 1))
            * 1.0
            / F.datediff(F.min("d_max"), F.min("d_mid"))
        ).alias("r2"),
        (F.datediff(F.min("d_mid"), F.min("d_min")) + 1)
        .cast("long")
        .alias("days1"),
        F.datediff(F.min("d_max"), F.min("d_mid")).cast("long").alias("days2"),
    )
    z = (F.col("r2") - F.col("r1")) / F.sqrt(
        F.col("r1") / F.col("days1") + F.col("r2") / F.col("days2")
    )
    return agg.select(
        "event_type",
        "days1",
        "days2",
        rhalf(F.col("r1"), 6).alias("rate1"),
        rhalf(F.col("r2"), 6).alias("rate2"),
        rhalf(z, 6).alias("z"),
        F.when(F.abs(z) > Z_CRIT, 1).otherwise(0).cast("int").alias("significant"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Error-safe try_* scalar family
# ---------------------------------------------------------------------------


@query(
    "fn_try_error_safe",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE floor(o_totalprice / (o_orderkey % 3) * 100 + 0.5) / 100
           END AS safe_div,
           CASE WHEN o_orderkey % 4 + 1 <= 2
                THEN ['alpha', 'beta'][CAST(o_orderkey % 4 + 1 AS INTEGER)]
                ELSE NULL
           END AS safe_elem,
           TRY_CAST('x' || CAST(o_orderkey % 5 AS VARCHAR) AS INTEGER)
               AS bad_int,
           TRY_CAST(CAST(o_orderkey % 5 AS VARCHAR) AS INTEGER) AS good_int,
           TRY_CAST(CASE WHEN o_orderkey % 2 = 0
                         THEN CAST(o_orderdate AS VARCHAR)
                         ELSE 'not-a-date' END AS DATE) IS NOT NULL
               AS date_parsed
    FROM orders
    WHERE o_orderkey < 2000
    ORDER BY o_orderkey
    """,
    tags=("function", "error-safe", "try"),
)
def fn_try_error_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar family: try_divide (NULL on zero divisor),
    try_element_at (NULL out of bounds — indices 3 and 4 on a
    2-element array), try_cast on malformed ints and dates. ANSI-mode pipelines
    rely on these to quarantine bad rows instead of failing the job —
    at 100 TB a single malformed cell must never kill a stage. All
    pure codegen expressions; the oracle mirrors each with DuckDB
    TRY_CAST / guarded CASE semantics."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    arr = F.array(F.lit("alpha"), F.lit("beta"))
    return o.select(
        "o_orderkey",
        rhalf(
            F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 3), 2
        ).alias("safe_div"),
        F.try_element_at(arr, (F.col("o_orderkey") % 4 + 1).cast("int")).alias(
            "safe_elem"
        ),
        F.try_to_number(
            F.concat(F.lit("x"), (F.col("o_orderkey") % 5).cast("string")),
            F.lit("999"),
        )
        .cast("int")
        .alias("bad_int"),
        (F.col("o_orderkey") % 5).cast("string").try_cast("int").alias("good_int"),
        F.when(
            F.col("o_orderkey") % 2 == 0, F.col("o_orderdate").cast("string")
        )
        .otherwise(F.lit("not-a-date"))
        .try_cast("date")
        .isNotNull()
        .alias("date_parsed"),
    ).orderBy("o_orderkey")
