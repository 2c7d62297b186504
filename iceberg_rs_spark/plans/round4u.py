"""Round-4 corpus additions, batch 20: RAKE keyword extraction and a
tolerance-bounded left as-of join.

RAKE is the classic unsupervised keyword extractor: phrases are
maximal stopword-free token runs (a gaps-and-islands problem on the
token stream), scored by their words' degree/frequency statistics.
The scoring here is the ratio-of-integer-sums variant
(Σdeg / Σfreq) so the score is a single division of exact integers —
per-word float ratios summed in arbitrary order would not be
cross-engine deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.operators import text as T
from iceberg_rs_spark.operators.joins import asof_join
from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.operators.skew import spread_by_range
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.plans.llm import TOKENS_SQL
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

# ---------------------------------------------------------------------------
# RAKE keyword extraction
# ---------------------------------------------------------------------------

RAKE_DOCS, RAKE_TOP = 2000, 20
RAKE_STOPWORDS = ("a", "the")
RAKE_MIN_LEN, RAKE_MAX_LEN = 2, 4


@query(
    "text_rake_phrases",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, {TOKENS_SQL.format(c='text')} AS w
        FROM documents WHERE doc_id < {RAKE_DOCS}),
    tok_rows AS (
        SELECT doc_id, i, w[i] AS tok
        FROM sized CROSS JOIN generate_series(1, 1000) AS g(i)
        WHERE i <= len(w) AND w[i] != ''),
    nonstop AS (
        SELECT doc_id, i, tok,
               i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i)
                   AS island
        FROM tok_rows WHERE tok NOT IN {RAKE_STOPWORDS!r}),
    phr AS (
        SELECT doc_id, island,
               array_to_string(array_agg(tok ORDER BY i), ' ') AS phrase,
               COUNT(*) AS plen
        FROM nonstop GROUP BY 1, 2),
    phr2 AS (
        SELECT phrase, plen FROM phr
        WHERE plen BETWEEN {RAKE_MIN_LEN} AND {RAKE_MAX_LEN}),
    words AS (
        SELECT unnest(string_split(phrase, ' ')) AS wd, plen FROM phr2),
    wstats AS (
        SELECT wd, COUNT(*) AS freq, SUM(plen) AS deg
        FROM words GROUP BY wd),
    occ AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ
            FROM phr2 GROUP BY phrase),
    pw AS (
        SELECT phrase, unnest(string_split(phrase, ' ')) AS wd
        FROM (SELECT DISTINCT phrase FROM phr2)),
    score AS (
        SELECT pw.phrase,
               CAST(SUM(s.deg) AS BIGINT) AS sum_deg,
               CAST(SUM(s.freq) AS BIGINT) AS sum_freq
        FROM pw JOIN wstats s ON s.wd = pw.wd
        GROUP BY pw.phrase)
    SELECT sc.phrase, o.n_occ, sc.sum_deg, sc.sum_freq,
           {rhalf_sql('sc.sum_deg * 1.0 / sc.sum_freq', 6)} AS rake_score
    FROM score sc JOIN occ o ON o.phrase = sc.phrase
    ORDER BY rake_score DESC, sc.phrase
    LIMIT {RAKE_TOP}
    """,
    tags=("llm", "text", "keywords", "rake"),
)
def text_rake_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al.): candidate phrases are
    maximal stopword-free token runs — a gaps-and-islands grouping on
    the token stream (position minus non-stop row_number = island
    key) — scored by their words' degree/frequency statistics. The
    score is Σdeg/Σfreq over the phrase's words: both sums are exact
    integers, so the single final division is the only float — the
    cross-engine-safe variant of per-word ratio summing. Phrase text
    reassembles through sorted struct arrays (order-stable without a
    second window); everything shuffles on (doc, island) then on the
    word, the same scale shape as a word count."""
    docs = spread_by_range(
        load_table(spark, sf_dir, "documents").where(
            F.col("doc_id") < RAKE_DOCS
        ),
        "doc_id",
    )
    toks = docs.select(
        "doc_id", F.posexplode(T.tokens(F.col("text"))).alias("i0", "tok")
    ).where(F.col("tok") != "").select(
        "doc_id", (F.col("i0") + 1).alias("i"), "tok"
    )
    nonstop = toks.where(~F.col("tok").isin(*RAKE_STOPWORDS)).withColumn(
        "island",
        F.col("i")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("i")),
    )
    phr = nonstop.groupBy("doc_id", "island").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("i", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    phr2 = phr.where(
        F.col("plen").between(RAKE_MIN_LEN, RAKE_MAX_LEN)
    ).select("phrase", "plen")
    words = phr2.select(
        F.explode(F.split("phrase", " ")).alias("wd"), "plen"
    )
    wstats = words.groupBy("wd").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    occ = phr2.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occ")
    )
    pw = (
        phr2.select("phrase")
        .distinct()
        .select("phrase", F.explode(F.split("phrase", " ")).alias("wd"))
    )
    score = (
        pw.join(wstats, "wd")
        .groupBy("phrase")
        .agg(
            F.sum("deg").cast("long").alias("sum_deg"),
            F.sum("freq").cast("long").alias("sum_freq"),
        )
    )
    return (
        score.join(occ, "phrase")
        .select(
            "phrase",
            "n_occ",
            "sum_deg",
            "sum_freq",
            rhalf(F.col("sum_deg") * 1.0 / F.col("sum_freq"), 6).alias(
                "rake_score"
            ),
        )
        .orderBy(F.desc("rake_score"), "phrase")
        .limit(RAKE_TOP)
    )


# ---------------------------------------------------------------------------
# Tolerance-bounded LEFT as-of join
# ---------------------------------------------------------------------------

ASOF_TOLERANCE_DAYS = 30


@query(
    "join_asof_tolerance_left",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    purchases AS (SELECT * FROM evt WHERE event_type = 'purchase'),
    signups   AS (SELECT * FROM evt WHERE event_type = 'signup'),
    matched AS (
        SELECT p.event_id, p.user_id, p.ts AS p_ts,
               s.event_id AS s_event_id, s.ts AS s_ts
        FROM purchases p
        ASOF LEFT JOIN signups s
          ON p.user_id = s.user_id AND p.ts >= s.ts)
    SELECT event_id, user_id,
           CASE WHEN s_ts IS NOT NULL
                 AND p_ts <= s_ts + INTERVAL {ASOF_TOLERANCE_DAYS} DAY
                THEN s_event_id END AS signup_event_id,
           CAST(CASE WHEN s_ts IS NOT NULL
                      AND p_ts <= s_ts + INTERVAL {ASOF_TOLERANCE_DAYS} DAY
                THEN 1 ELSE 0 END AS INTEGER) AS matched_within_30d
    FROM matched
    ORDER BY event_id
    """,
    tags=("join", "asof", "tolerance"),
)
def join_asof_tolerance_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT as-of join with a 30-day tolerance: every purchase is
    kept; its most recent prior signup is attached only when it
    happened within the window, else the match columns go NULL — the
    feature-store semantics for "recent signup" features where a
    stale match is worse than none. Built on the same union+window
    as-of operator as the inner variant; tolerance is a post-filter
    on the matched timestamp, so the join cost is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("s_ts"),
        F.col("event_id").alias("s_event_id"),
    )
    matched = asof_join(
        purchases,
        signups,
        on=["user_id"],
        left_ts="ts",
        right_ts="s_ts",
        right_cols=["s_event_id", "s_ts"],
        suffix="",
    )
    within = F.col("s_ts").isNotNull() & (
        F.col("ts") <= F.col("s_ts") + F.expr(f"INTERVAL {ASOF_TOLERANCE_DAYS} DAY")
    )
    return matched.select(
        "event_id",
        "user_id",
        F.when(within, F.col("s_event_id")).alias("signup_event_id"),
        F.when(within, 1).otherwise(0).cast("int").alias("matched_within_30d"),
    ).orderBy("event_id")
