"""Round-4 corpus additions, batch 22: quality-classifier feature
assembly and month-over-month growth.

The feature-vector query is the hand-off point between the curation
stack and any learned quality model: one scan emits the numeric
feature columns, each certified independently, so a trainer can
consume the table without re-deriving (and silently re-defining) the
signals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.operators import text as T
from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.plans.llm import NORM_SQL, TOKENS_SQL
from iceberg_rs_spark.sources.fixtures import load_table

# ---------------------------------------------------------------------------
# Quality-classifier feature vector
# ---------------------------------------------------------------------------

_FV_STOPWORDS = ("a", "the")


@query(
    "pipeline_doc_feature_vector",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, text, {TOKENS_SQL.format(c='text')} AS w
        FROM documents),
    sized AS (
        SELECT doc_id, text, w, len(w) AS n_tok
        FROM toks WHERE len(w) > 0)
    SELECT doc_id,
           CAST(n_tok AS BIGINT) AS n_tokens,
           {rhalf_sql('len(list_distinct(w)) * 1.0 / n_tok', 6)} AS ttr,
           {rhalf_sql(
               'len(list_filter(w, t -> list_contains('
               + repr(list(_FV_STOPWORDS))
               + ', t))) * 1.0 / n_tok', 6)} AS stopword_ratio,
           {rhalf_sql(
               '(length(' + NORM_SQL.format(c='text')
               + ") - length(replace(" + NORM_SQL.format(c='text')
               + ", ' ', ''))) * 1.0 / n_tok", 6)} AS spaces_per_token,
           {rhalf_sql(
               "length(array_to_string(w, '')) * 1.0 / n_tok", 6)}
               AS mean_word_len
    FROM sized
    ORDER BY doc_id
    """,
    tags=("llm", "pipeline", "features"),
)
def pipeline_doc_feature_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier feature assembly: one scan emits the
    numeric per-document features a learned quality model trains on —
    token count, type-token ratio, stopword ratio, spacing density,
    mean word length — each a certified column, so the trainer
    consumes this table instead of silently re-deriving (and
    re-defining) the signals. All row-local array/string arithmetic,
    scan-shaped at any corpus size; categorical and cross-document
    signals (language, dup cluster size, domain caps) join in from
    their own certified queries on doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    norm = T.normalize(F.col("text"))
    sized = docs.select(
        "doc_id", norm.alias("norm"), T.tokens(F.col("text")).alias("w")
    ).withColumn("n_tok", F.size("w")).where(F.col("n_tok") > 0)
    stop_n = F.size(
        F.filter(F.col("w"), lambda t: t.isin(*_FV_STOPWORDS))
    )
    spaces = F.length("norm") - F.length(F.regexp_replace("norm", " ", ""))
    return sized.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tokens"),
        rhalf(F.size(F.array_distinct("w")) * 1.0 / F.col("n_tok"), 6).alias(
            "ttr"
        ),
        rhalf(stop_n * 1.0 / F.col("n_tok"), 6).alias("stopword_ratio"),
        rhalf(spaces * 1.0 / F.col("n_tok"), 6).alias("spaces_per_token"),
        rhalf(
            F.length(F.array_join("w", "")) * 1.0 / F.col("n_tok"), 6
        ).alias("mean_word_len"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Month-over-month growth
# ---------------------------------------------------------------------------


@query(
    "agg_mom_growth",
    oracle="""
    WITH monthly AS (
        SELECT o_orderpriority,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2),
    laged AS (
        SELECT *, LAG(cents) OVER (PARTITION BY o_orderpriority
                                   ORDER BY month_start) AS prev_cents
        FROM monthly)
    SELECT o_orderpriority, strftime(month_start, '%Y-%m') AS month,
           cents,
           CAST(prev_cents AS BIGINT) AS prev_cents,
           CASE WHEN prev_cents > 0
                THEN floor((cents - prev_cents) * 10000.0 / prev_cents + 0.5)
                     / 10000.0
           END AS mom_growth
    FROM laged
    ORDER BY o_orderpriority, month
    """,
    tags=("aggregate", "window", "growth"),
)
def agg_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month growth per order priority: monthly exact-cent
    revenue, previous month via LAG over the tiny monthly rollup, and
    the growth ratio in basis points — the standard trend readout.
    The window runs over the already-aggregated monthly table
    (months × priorities rows), so the lag never touches raw orders;
    growth is floor-half-up in pure double arithmetic, identical in
    both engines."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    monthly = o.groupBy(
        "o_orderpriority",
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month_start"),
    ).agg(F.sum(cents).cast("long").alias("cents"))
    w = Window.partitionBy("o_orderpriority").orderBy("month_start")
    laged = monthly.withColumn("prev_cents", F.lag("cents").over(w))
    growth = F.when(
        F.col("prev_cents") > 0,
        F.floor(
            (F.col("cents") - F.col("prev_cents"))
            * 10000.0
            / F.col("prev_cents")
            + F.lit(0.5)
        )
        / 10000.0,
    )
    return laged.select(
        "o_orderpriority",
        F.date_format("month_start", "yyyy-MM").alias("month"),
        "cents",
        F.col("prev_cents").cast("long").alias("prev_cents"),
        growth.alias("mom_growth"),
    ).orderBy("o_orderpriority", "month")
