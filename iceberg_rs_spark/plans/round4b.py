"""Round-4 corpus additions, batch 2: rolling active users, batch
sessionization, last-touch attribution, SCD2 interval build, a bigram
language-model quality score, and the write-audit-publish table
pattern.

Classic warehouse / training-pipeline shapes over the shared fixtures;
every builder is paired with an exact DuckDB oracle. Temporal math is
expressed with floor-semantics helpers on BOTH engines
(``timestampdiff`` ↔ ``date_sub``) so microsecond-resolution
timestamps cannot straddle a boundary differently per engine.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.functions.hashing import h60, h60_sql
from iceberg_rs_spark.operators import text as T
from iceberg_rs_spark.operators.sessionize import session_counts_distributed
from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.operators.skew import spread_by_range
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', ' ', 'g'), "
    "' +', ' ', 'g'))"
)
TOKENS_SQL = f"string_split({NORM_SQL.format(c='{c}')}, ' ')"


@query(
    "events_rolling_active_users",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    ud AS (
        SELECT DISTINCT user_id,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        FROM evt),
    daily AS (
        SELECT d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau FROM ud GROUP BY d),
    expl AS (
        SELECT user_id, unnest(generate_series(d, d + 6)) AS day FROM ud),
    wau AS (
        SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau_7d
        FROM expl GROUP BY day)
    SELECT strftime(DATE '1970-01-01' + INTERVAL (daily.d) DAY, '%Y-%m-%d') AS day,
           daily.dau, wau.wau_7d
    FROM daily JOIN wau ON daily.d = wau.day
    ORDER BY day
    """,
    tags=("events", "window", "rolling", "distinct"),
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU and trailing-7-day WAU per active day — the product
    dashboard's activity curve, with EXACT rolling distincts. A rolling
    COUNT(DISTINCT) has no window-frame form in either engine; the
    scalable shape is contribute-and-count: each (user, day) activity
    fact fans out to the ≤7 target days it keeps the user active in
    (integer day arithmetic, tz-independent), then one distinct-count
    per target day. Shuffle volume is 7× the distinct (user, day)
    pairs — linear in users, never events² — and both aggregations
    partial-combine map-side. At 100 TB the same plan holds because
    the fan-out constant (window length) is fixed."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
    ).distinct()
    daily = ud.groupBy("d").agg(F.countDistinct("user_id").alias("dau"))
    expl = ud.select(
        "user_id", F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("day")
    )
    wau = expl.groupBy("day").agg(F.countDistinct("user_id").alias("wau_7d"))
    return (
        daily.join(wau, daily.d == wau.day)
        .select(
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), F.col("d")), "yyyy-MM-dd"
            ).alias("day"),
            "dau",
            "wau_7d",
        )
        .orderBy("day")
    )


@query(
    "events_sessionization_batch",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    seq AS (
        SELECT user_id, ts, event_id, event_type,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM evt WHERE user_id < 300),
    flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR date_sub('second', prev_ts, ts) > 1800
                       THEN 1 ELSE 0 END AS new_s
        FROM seq),
    sess AS (
        SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS INTEGER) AS session_id
        FROM flagged)
    SELECT user_id, session_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(date_sub('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_sec,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_purchases
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    tags=("events", "session", "window", "batch"),
)
def events_sessionization_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH sessionization — the 30-minute-gap rule as a lag +
    running-sum window pair (the batch counterpart of the corpus's
    streaming ``session_window`` and ``applyInPandasWithState``
    queries; warehouses re-sessionize history this way). Windows
    partition by user_id, so no single-partition window exists and
    skew is bounded by one user's history. Gap and duration use
    floor-semantics second arithmetic (``timestampdiff`` in Spark,
    ``date_sub`` in DuckDB) — boundary-counting date_diff would
    disagree on microsecond-resolution timestamps. Ordering ties break
    on event_id, making session numbering bit-deterministic."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 300)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_ts", F.lag("ts").over(w))
    flagged = seq.withColumn(
        "new_s",
        F.when(
            F.col("prev_ts").isNull()
            | (F.expr("timestampdiff(SECOND, prev_ts, ts)") > 1800),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.count("*").alias("n_events"),
            F.expr("CAST(timestampdiff(SECOND, min(ts), max(ts)) AS BIGINT)").alias(
                "duration_sec"
            ),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "n_purchases"
            ),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "events_sessionization_distributed",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    seq AS (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
        FROM evt)
    SELECT user_id,
           CAST(SUM(CASE WHEN prev_ts IS NULL
                           OR ts - prev_ts > INTERVAL 1800 SECOND
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM seq
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("events", "session", "skew", "distributed", "mapInPandas"),
)
def events_sessionization_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ``(n_sessions, n_events)`` under the 30-minute-gap
    rule, computed THROUGH the skew-proof chunked plan
    (``operators/sessionize.py::session_counts_distributed`` — VERDICT
    r13 ask #2's sanctioned corpus addition, #296): range-partition on
    (user, ts, id), one vectorized ``mapInPandas`` pass of per-partition
    per-user partials, then a metadata-sized two-rows-per-partition
    edge stitch — no ``Window.partitionBy`` anywhere in the physical
    plan (gated in tests/test_plan_quality), so a bot user holding a
    constant fraction of a 100 TB stream can never serialize into one
    task. The DuckDB oracle is the independent lag/gap SQL shape that
    certifies ``events_sessionization_batch``, aggregated per user —
    NOT the operator's own window-plan twin, which is what the
    differential pins in tests/test_sessionize.py already cover. The
    gap compares exact microsecond intervals on both engines (every
    fixture ts carries sub-second digits; floor-semantics seconds
    would merge a 1800.5 s gap the operator splits — ADVICE r13 #1's
    resolution applied to the oracle too)."""
    ev = load_table(spark, sf_dir, "events")
    return session_counts_distributed(
        ev, gap="30 minutes", user_col="user_id", ts_col="ts", id_col="event_id"
    ).orderBy("user_id")


#: deterministic channel derived from the props JSON payload
_CHANNELS = ("ads", "email", "social", "search")


@query(
    "events_attribution_last_touch",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    tagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN event_type IN ('click', 'view')
                    THEN ['ads', 'email', 'social', 'search']
                         [CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 + 1]
                    END AS touch_channel,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
        FROM evt
        WHERE event_type IN ('click', 'view', 'purchase')),
    attributed AS (
        SELECT *,
               last_value(touch_channel IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, is_purchase, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS channel
        FROM tagged)
    SELECT COALESCE(channel, 'none') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           {rhalf_sql('SUM(value)', 2)} AS revenue
    FROM attributed
    WHERE is_purchase = 1
    GROUP BY COALESCE(channel, 'none')
    ORDER BY channel
    """,
    tags=("events", "attribution", "asof", "json"),
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase credits the
    most recent prior click/view's channel (channel derived
    deterministically from the props JSON payload). The as-of lookup
    is the union-then-IGNORE-NULLS-last_value idiom — one window pass
    over the merged stream instead of a per-purchase range join, so
    the cost is one user-partitioned sort regardless of how many
    touches precede each purchase (the declared as-of idiom of
    SURVEY.md §2C joins, here in its windowed form). Equal-timestamp
    ties order touches before purchases, then by event_id —
    bit-deterministic attribution."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view", "purchase")
    )
    k = F.get_json_object("props", "$.k").cast("bigint")
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(
            F.col("event_type").isin("click", "view"),
            F.element_at(F.array(*[F.lit(c) for c in _CHANNELS]), (k % 4 + 1).cast("int")),
        ).alias("touch_channel"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_purchase"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attributed = tagged.withColumn(
        "channel", F.last("touch_channel", ignorenulls=True).over(w)
    )
    return (
        attributed.where(F.col("is_purchase") == 1)
        .groupBy(F.coalesce("channel", F.lit("none")).alias("channel"))
        .agg(
            F.count("*").alias("n_purchases"),
            rhalf(F.sum("value"), 2).alias("revenue"),
        )
        .orderBy("channel")
    )


@query(
    "pipeline_scd2_intervals",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    obs AS (
        SELECT user_id, ts, event_id,
               ['free', 'basic', 'pro', 'max']
                   [CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 + 1] AS tier
        FROM evt WHERE event_type = 'view' AND user_id < 300),
    dedup AS (
        SELECT * FROM (
            SELECT *, lag(tier) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev_tier
            FROM obs)
        WHERE prev_tier IS NULL OR tier != prev_tier),
    intervals AS (
        SELECT user_id, tier, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        FROM dedup)
    SELECT user_id, tier,
           strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(strftime(valid_to, '%Y-%m-%d %H:%M:%S'), 'current') AS valid_to
    FROM intervals
    ORDER BY user_id, valid_from
    """,
    tags=("pipeline", "scd2", "window", "cdc"),
)
def pipeline_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an event stream:
    collapse consecutive repeats of each user's observed tier, then
    turn the change points into validity intervals
    (valid_from/valid_to, open interval = 'current') via lead() — the
    standard CDC-to-warehouse dimension materialization. Two
    user-partitioned window passes, no self-join; the historic
    formulation (per-row subquery for the next change) would be O(n²)
    per user. Tie-break on event_id keeps interval boundaries
    bit-deterministic."""
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "view") & (F.col("user_id") < 300)
    )
    k = F.get_json_object("props", "$.k").cast("bigint")
    tiers = F.array(F.lit("free"), F.lit("basic"), F.lit("pro"), F.lit("max"))
    obs = ev.select(
        "user_id", "ts", "event_id", F.element_at(tiers, (k % 4 + 1).cast("int")).alias("tier")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dedup = (
        obs.withColumn("prev_tier", F.lag("tier").over(w))
        .where(F.col("prev_tier").isNull() | (F.col("tier") != F.col("prev_tier")))
        .drop("prev_tier")
    )
    intervals = dedup.withColumn("valid_to_ts", F.lead("ts").over(w))
    return intervals.select(
        "user_id",
        "tier",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format("valid_to_ts", "yyyy-MM-dd HH:mm:ss"), F.lit("current")
        ).alias("valid_to"),
    ).orderBy("user_id", "valid_from")


@query(
    "pipeline_ngram_lm_quality",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL.format(c='text')} AS w,
               CASE WHEN {h60_sql("'split|' || CAST(doc_id AS VARCHAR)")} % 100 < 80
                    THEN 'train'
                    WHEN {h60_sql("'split|' || CAST(doc_id AS VARCHAR)")} % 100 < 90
                    THEN 'val' ELSE 'test' END AS split
        FROM documents),
    train_bi AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM (
            SELECT unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
            FROM toks WHERE split = 'train' AND len(w) >= 2)
        GROUP BY w1, w2),
    train_uni AS (
        SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM (
            SELECT unnest(w) AS w1 FROM toks WHERE split = 'train')
        GROUP BY w1),
    vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM train_uni),
    val_bi AS (
        SELECT doc_id, w1, w2 FROM (
            SELECT doc_id, unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
            FROM toks WHERE split = 'val' AND len(w) >= 2)),
    scored AS (
        SELECT b.doc_id,
               ln((COALESCE(t.c2, 0) + 1.0)
                  / (COALESCE(u.c1, 0) + (SELECT v FROM vocab))) AS lp
        FROM val_bi b
        LEFT JOIN train_bi t ON b.w1 = t.w1 AND b.w2 = t.w2
        LEFT JOIN train_uni u ON b.w1 = u.w1)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           {rhalf_sql('AVG(lp)', 3)} AS avg_logprob
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("llm", "pipeline", "lm", "quality", "ngram"),
)
def pipeline_ngram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical LM quality scoring (the CCNet/KenLM-style filter,
    reduced to an add-one-smoothed bigram model that both engines can
    compute exactly): train bigram/unigram counts on the TRAIN split,
    score each VAL document by its mean bigram log-probability
    ln((c(w1,w2)+1)/(c(w1)+|V|)). Low scores mark gibberish; the real
    pipeline thresholds on them before pretraining.

    Scale shape: counts are plain grouped aggregations (map-side
    partial); scoring is two left joins from the val bigrams onto the
    count tables, keyed by token pair — at 100 TB the count model is
    the small side (vocab², bounded by language, not corpus) and
    broadcasts while the corpus side streams. The vocab size rides in
    as a one-row cross join. Mean log-prob is rounded to 3 decimals —
    the summation-order tolerance every float aggregate in the corpus
    uses (FIXTURES.md determinism rules)."""
    docs = spread_by_range(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    bucket = h60(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))) % 100
    toks = docs.select(
        "doc_id",
        T.tokens(F.col("text")).alias("w"),
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias(
            "split"
        ),
    )
    pair = F.zip_with(
        F.slice(F.col("w"), 1, F.size("w") - 1),
        F.slice(F.col("w"), 2, F.size("w") - 1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    bigrams = (
        toks.where(F.size("w") >= 2)
        .select("doc_id", "split", F.explode(pair).alias("p"))
        .select("doc_id", "split", "p.w1", "p.w2")
    )
    train_bi = (
        bigrams.where(F.col("split") == "train")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )
    train_uni = (
        toks.where(F.col("split") == "train")
        .select(F.explode("w").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    vocab = train_uni.agg(F.count("*").alias("v"))
    val_bi = bigrams.where(F.col("split") == "val").select("doc_id", "w1", "w2")
    scored = (
        val_bi.join(train_bi, ["w1", "w2"], "left")
        .join(train_uni, ["w1"], "left")
        .crossJoin(vocab)
        .select(
            "doc_id",
            F.log(
                (F.coalesce("c2", F.lit(0)) + 1.0)
                / (F.coalesce("c1", F.lit(0)) + F.col("v"))
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            rhalf(F.avg("lp"), 3).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@query(
    "table_wap_publish",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    final AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               {rhalf_sql('SUM(value)', 2)} AS sum_value
        FROM evt)
    SELECT op, seq, metric FROM (
        SELECT 'append' AS op, 1 AS seq, CAST(NULL AS DOUBLE) AS metric
        UNION ALL SELECT 'append', 2, NULL
        UNION ALL SELECT 'rows', 3, (SELECT n FROM final)
        UNION ALL SELECT 'sum', 4, (SELECT sum_value FROM final))
    ORDER BY seq
    """,
    tags=("table", "wap", "branch", "fast-forward"),
)
def table_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish, end to end: append batch 1 to main, write
    batch 2 to a staging branch (main is UNTOUCHED while the audit
    runs), validate the staged data, then publish by fast-forwarding
    main — a metadata-only promote (snapshot.rs:67-103 branch refs;
    the audit-branch pattern of CALL system.fast_forward). The result
    row set certifies the commit-operation sequence AND that the
    published table equals the full fixture, so a failed promote or a
    data-moving publish would hash-mismatch."""
    events = load_table(spark, sf_dir, "events")
    from iceberg_rs_spark.sources.icelake import Catalog

    catalog = Catalog(spark, tempfile.mkdtemp(prefix="icelake_wap_"))
    t = catalog.create_table("db.wap", events.schema)
    t.append(events.where(F.col("event_id") % 2 == 0))
    t.create_branch("staging")
    t.append(events.where(F.col("event_id") % 2 == 1), branch="staging")
    # audit: staged branch must hold the full corpus before publishing
    staged = t.scan(branch="staging").agg(
        F.count("*").alias("n"), rhalf(F.sum("value"), 2).alias("s")
    )
    srow = staged.first()
    expected = events.agg(F.count("*"), rhalf(F.sum("value"), 2)).first()
    if tuple(srow) != tuple(expected):  # audit failure -> no publish
        raise AssertionError("WAP audit failed; staging diverges from source")
    t.fast_forward("main", "staging")
    ops = [
        s.operation
        for s in sorted(t.metadata.snapshots, key=lambda s: s.sequence_number)
    ]
    frow = t.scan().agg(F.count("*"), rhalf(F.sum("value"), 2)).first()
    rows = [(op, i + 1, None) for i, op in enumerate(ops)]
    rows.append(("rows", len(rows) + 1, float(frow[0])))
    rows.append(("sum", len(rows) + 1, float(frow[1])))
    return spark.createDataFrame(rows, "op string, seq int, metric double").orderBy(
        "seq"
    )
