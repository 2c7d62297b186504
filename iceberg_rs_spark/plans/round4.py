"""Round-4 corpus additions: event-funnel daily breakdown, PII
redaction, train/test decontamination, boilerplate-phrase mining, and
a deterministic Bloom-filter join prefilter.

Each is a production pattern from large-scale training-data pipelines
(SURVEY.md §2C north-star); each registers a (DataFrame builder,
DuckDB oracle) pair like every other corpus entry. Scale posture per
query is documented in its docstring — none forces a broadcast of an
SF-proportional relation, none collects data rows to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.functions.hashing import h60, h60_sql
from iceberg_rs_spark.operators import text as T
from iceberg_rs_spark.operators.skew import spread_by_range
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', ' ', 'g'), "
    "' +', ' ', 'g'))"
)
TOKENS_SQL = f"string_split({NORM_SQL.format(c='{c}')}, ' ')"


@query(
    "events_funnel_daily",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    s1 AS (
        SELECT user_id, MIN(ts) AS t_signup FROM evt
        WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t_click FROM evt e
        JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t_signup
        GROUP BY e.user_id),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase FROM evt e
        JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
          AND e.ts <= s2.t_click + INTERVAL 7 DAY
        GROUP BY e.user_id)
    SELECT strftime(CAST(s1.t_signup AS DATE), '%Y-%m-%d') AS signup_date,
           COUNT(*) AS n_signups,
           CAST(COUNT(s2.user_id) AS BIGINT) AS n_clicked,
           CAST(COUNT(s3.user_id) AS BIGINT) AS n_purchased
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    GROUP BY signup_date
    ORDER BY signup_date
    """,
    tags=("events", "funnel", "sequence", "daily"),
)
def events_funnel_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anchored funnel of ``events_funnel_conversion`` broken down
    by signup DAY — the per-cohort-day conversion dashboard. Stage
    anchors are per-user aggregates (earliest qualifying event after
    the prior stage's anchor), so as in the base funnel NO broadcast
    hint is forced: AQE broadcasts the anchors at small scale and
    shuffles on user_id at 100 TB. The final roll-up groups by
    calendar day — a bounded key set — after the per-user funnel
    resolves, so the widest shuffle key in the plan is user_id."""
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
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .groupBy(F.date_format("t_signup", "yyyy-MM-dd").alias("signup_date"))
        .agg(
            F.count("*").alias("n_signups"),
            F.count("t_click").alias("n_clicked"),
            F.count("t_purchase").alias("n_purchased"),
        )
        .orderBy("signup_date")
    )


#: deterministic PII suffix per document — the fixture corpus is a
#: clean word salad, so redaction is exercised against injected,
#: doc_id-derived PII (email + phone + IPv4) that both engines build
#: identically.
_PII_SUFFIX = (
    " contact user{id}@example.com or 555-{ph}-0199 from 10.0.{ip}.7"
)
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\d{3}-\d{3}-\d{4}"
_IP_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"


@query(
    "text_pii_redaction",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or 555-'
                    || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                    || '-0199 from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                    || '.7' AS t
        FROM documents WHERE doc_id < 300),
    red AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
               regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g') AS t1
        FROM aug),
    red2 AS (
        SELECT doc_id, n_emails,
               CAST(len(regexp_extract_all(t1, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
               regexp_replace(t1, '{_PHONE_RE}', '<PHONE>', 'g') AS t2
        FROM red)
    SELECT doc_id, n_emails, n_phones,
           CAST(len(regexp_extract_all(t2, '{_IP_RE}')) AS BIGINT) AS n_ips,
           regexp_replace(t2, '{_IP_RE}', '<IP>', 'g') AS redacted
    FROM red2
    ORDER BY doc_id
    """,
    tags=("llm", "text", "pii", "redaction"),
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing, the compliance pass every pretraining corpus
    runs: count and redact emails → phone numbers → IPv4 addresses
    (sequential passes; order documented because patterns could
    overlap). Pure JVM ``regexp_extract_all``/``regexp_replace``
    column expressions — no UDF, fully codegen-able, embarrassingly
    parallel at 100 TB (no shuffle at all until the final
    presentation ORDER BY, which a real pipeline would not have). The
    redacted text itself is hash-checked, not just the counts, so the
    replacement semantics are certified."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-0199 from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ).alias("t"),
    )
    red = aug.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(_EMAIL_RE), F.lit(0))).cast("long").alias("n_emails"),
        F.regexp_replace("t", _EMAIL_RE, "<EMAIL>").alias("t1"),
    )
    red2 = red.select(
        "doc_id",
        "n_emails",
        F.size(F.regexp_extract_all("t1", F.lit(_PHONE_RE), F.lit(0))).cast("long").alias("n_phones"),
        F.regexp_replace("t1", _PHONE_RE, "<PHONE>").alias("t2"),
    )
    return red2.select(
        "doc_id",
        "n_emails",
        "n_phones",
        F.size(F.regexp_extract_all("t2", F.lit(_IP_RE), F.lit(0))).cast("long").alias("n_ips"),
        F.regexp_replace("t2", _IP_RE, "<IP>").alias("redacted"),
    ).orderBy("doc_id")


@query(
    "pipeline_decontaminate_ngrams",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL.format(c='text')} AS w FROM documents),
    split AS (
        SELECT doc_id, w,
               CASE WHEN {h60_sql("'split|' || CAST(doc_id AS VARCHAR)")} % 100 < 80
                    THEN 'train'
                    WHEN {h60_sql("'split|' || CAST(doc_id AS VARCHAR)")} % 100 < 90
                    THEN 'val' ELSE 'test' END AS split
        FROM toks),
    grams AS (
        SELECT doc_id, split,
               unnest([{h60_sql("array_to_string(list_slice(w, i, i + 7), ' ')")}
                       for i in generate_series(1, len(w) - 7)]) AS gh
        FROM split WHERE len(w) >= 8),
    test_grams AS (SELECT DISTINCT gh FROM grams WHERE split = 'test'),
    train_grams AS (SELECT DISTINCT doc_id, gh FROM grams WHERE split = 'train')
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shared_grams
    FROM train_grams t JOIN test_grams x ON t.gh = x.gh
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
    tags=("llm", "pipeline", "decontamination", "ngram"),
)
def pipeline_decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: find TRAIN documents sharing any
    word 8-gram with the held-out TEST split (the standard n-gram
    contamination check run before every pretraining job; 8 words ≈
    the 13-gram-character overlap regimes of GPT-3/PaLM reports,
    scaled to this fixture's short docs). The split reuses the
    portable-hash 80/10/10 rule of ``pipeline_train_test_split``, so
    membership is engine- and cluster-size-independent.

    Scale shape: both sides explode to (doc, gram-HASH) — the join key
    is h60(gram), a fixed-width long, never the gram string, so
    shuffle volume is 8 bytes/key regardless of gram width. Test-side
    grams are distinct-reduced before the join (the test split is the
    small side by construction; AQE broadcasts it). Output is the
    per-train-doc count of distinct shared grams — the actionable
    artifact (what to drop, with evidence strength)."""
    docs = spread_by_range(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    toks = docs.select("doc_id", T.tokens(F.col("text")).alias("w"))
    bucket = h60(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))) % 100
    split = toks.select(
        "doc_id",
        "w",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )
    grams = (
        split.where(F.size("w") >= 8)
        .select(
            "doc_id",
            "split",
            F.explode(T.shingles_of_tokens(F.col("w"), 8)).alias("g"),
        )
        .select("doc_id", "split", h60(F.col("g")).alias("gh"))
    )
    test_grams = grams.where(F.col("split") == "test").select("gh").distinct()
    train_grams = grams.where(F.col("split") == "train").select("doc_id", "gh").distinct()
    return (
        train_grams.join(test_grams, "gh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
        .orderBy("doc_id")
    )


@query(
    "text_boilerplate_ngrams",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL.format(c='text')} AS w FROM documents),
    grams AS (
        SELECT doc_id,
               unnest([array_to_string(list_slice(w, i, i + 4), ' ')
                       for i in generate_series(1, len(w) - 4)]) AS g
        FROM toks WHERE len(w) >= 5)
    SELECT g AS phrase,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM grams
    GROUP BY g
    HAVING COUNT(DISTINCT doc_id) >= 3
    ORDER BY phrase
    """,
    tags=("llm", "text", "boilerplate", "ngram"),
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-phrase mining (the CCNet/MassiveText cross-document
    repetition pass): word 5-grams appearing in ≥3 DISTINCT documents
    — headers, footers, license banners, navigation chrome in a real
    web corpus. One explode + one grouped aggregation computing doc
    frequency and total occurrences together (count-distinct and
    count share the shuffle); map-side partial aggregation collapses
    within-partition repeats before anything moves. The phrase list
    this emits is what the cleaning pass joins against to strip
    boilerplate — at 100 TB the join uses h60(phrase) exactly like
    ``pipeline_decontaminate_ngrams``."""
    docs = spread_by_range(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    toks = docs.select("doc_id", T.tokens(F.col("text")).alias("w"))
    grams = toks.where(F.size("w") >= 5).select(
        "doc_id", F.explode(T.shingles_of_tokens(F.col("w"), 5)).alias("g")
    )
    return (
        grams.groupBy(F.col("g").alias("phrase"))
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= 3)
        .orderBy("phrase")
    )


_B1 = h60_sql("'b1|' || CAST({k} AS VARCHAR)")
_B2 = h60_sql("'b2|' || CAST({k} AS VARCHAR)")


@query(
    "join_bloom_prefilter",
    oracle=f"""
    WITH dim AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000),
    bits AS (
        SELECT DISTINCT b FROM (
            SELECT unnest([{_B1.format(k='k')} % 1024,
                           {_B2.format(k='k')} % 1024]) AS b
            FROM dim)),
    fact AS (
        SELECT o_orderkey, o_custkey,
               {_B1.format(k='o_custkey')} % 1024 AS b1,
               {_B2.format(k='o_custkey')} % 1024 AS b2
        FROM orders),
    flagged AS (
        SELECT f.o_orderkey,
               CASE WHEN EXISTS (SELECT 1 FROM bits WHERE b = f.b1)
                     AND EXISTS (SELECT 1 FROM bits WHERE b = f.b2)
                    THEN 1 ELSE 0 END AS pre,
               CASE WHEN f.o_custkey IN (SELECT k FROM dim)
                    THEN 1 ELSE 0 END AS tru
        FROM fact f)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(pre) AS BIGINT) AS n_prefiltered,
           CAST(SUM(tru) AS BIGINT) AS n_true,
           CAST(SUM(pre) - SUM(tru) AS BIGINT) AS n_false_pos
    FROM flagged
    """,
    tags=("join", "bloom", "prefilter", "semi"),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bloom-filter join prefilter — the 100 TB pattern
    for semi-joining a fact table against a dimension subset WITHOUT
    shuffling the fact or broadcasting the dimension: build a k=2,
    m=1024-bit filter from the dim keys (h60-derived bit positions,
    portable across engines so the whole thing hash-checks, false
    positives included), broadcast the ≤1024 distinct set-bits, and
    keep fact rows whose both bits are set. The query emits the
    accounting a planner would want: prefilter survivors vs true
    matches vs false positives (Spark's own runtime
    ``spark.sql.optimizer.runtime.bloomFilter`` does exactly this
    under AQE with a non-portable filter; this operator is the
    explicit, oracle-checkable form).

    One scan of orders, three tiny left joins (two on the bit set,
    one on the dim for truth accounting — the latter exists only to
    measure the filter), one aggregate. No SF-proportional broadcast
    is forced; the bit set is 1024 rows at ANY scale."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim = cust.where(F.col("c_acctbal") > 9000).select(F.col("c_custkey").alias("k"))
    kstr = F.col("k").cast("string")
    bits = (
        dim.select(
            F.explode(
                F.array(
                    h60(F.concat(F.lit("b1|"), kstr)) % 1024,
                    h60(F.concat(F.lit("b2|"), kstr)) % 1024,
                )
            ).alias("b")
        )
        .distinct()
    )
    ostr = F.col("o_custkey").cast("string")
    fact = orders.select(
        "o_orderkey",
        "o_custkey",
        (h60(F.concat(F.lit("b1|"), ostr)) % 1024).alias("b1"),
        (h60(F.concat(F.lit("b2|"), ostr)) % 1024).alias("b2"),
    )
    b1m = bits.select(F.col("b").alias("b1"), F.lit(1).alias("_m1"))
    b2m = bits.select(F.col("b").alias("b2"), F.lit(1).alias("_m2"))
    dimm = dim.select(F.col("k").alias("o_custkey"), F.lit(1).alias("_t"))
    flagged = (
        fact.join(b1m, "b1", "left")
        .join(b2m, "b2", "left")
        .join(dimm, "o_custkey", "left")
        .select(
            F.when(F.col("_m1").isNotNull() & F.col("_m2").isNotNull(), 1)
            .otherwise(0)
            .alias("pre"),
            F.when(F.col("_t").isNotNull(), 1).otherwise(0).alias("tru"),
        )
    )
    return flagged.agg(
        F.count("*").alias("n_orders"),
        F.sum("pre").alias("n_prefiltered"),
        F.sum("tru").alias("n_true"),
        (F.sum("pre") - F.sum("tru")).alias("n_false_pos"),
    )
