"""Round-4 corpus additions, batch 25: datetime constructors,
daily-series autocorrelation, trade-graph reciprocity, and the
Heaps'-law vocabulary growth curve.

The ACF and Heaps queries are corpus-profiling staples: ACF tells a
forecaster which lags carry signal before any model is fit; the
vocabulary growth curve is the standard sanity check that a text
corpus is natural-ish (sublinear vocab growth) rather than templated
(flat) or randomized (linear).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.operators import text as T
from iceberg_rs_spark.operators.skew import spread_by_range
from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.plans.llm import TOKENS_SQL
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

# ---------------------------------------------------------------------------
# Datetime constructors / calendar extractors
# ---------------------------------------------------------------------------


@query(
    "fn_make_datetime_family",
    oracle="""
    SELECT o_orderkey,
           strftime(make_date(CAST(year(o_orderdate) AS INTEGER),
                              CAST(month(o_orderdate) AS INTEGER),
                              CAST(day(o_orderdate) AS INTEGER)),
                    '%Y-%m-%d') AS rebuilt_date,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           strftime(make_date(CAST(year(o_orderdate) AS INTEGER),
                              CAST((quarter(o_orderdate) - 1) * 3 + 1
                                   AS INTEGER), 1),
                    '%Y-%m-%d') AS quarter_start,
           CAST(datediff('day', DATE '1970-01-01',
                         CAST(o_orderdate AS DATE)) AS INTEGER) AS epoch_day,
           monthname(o_orderdate) AS month_name
    FROM orders
    WHERE o_orderkey % 97 = 0
    ORDER BY o_orderkey
    """,
    tags=("scalar", "datetime", "constructors"),
)
def fn_make_datetime_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime CONSTRUCTION, the inverse of the extraction families:
    make_date from extracted (y, m, d) round-trips the original
    date; ISO week / day-of-year / quarter extractors; the quarter
    start rebuilt via make_date(y, 3*(q-1)+1, 1); days-since-epoch
    via unix_date (tz-independent, pure date arithmetic — never
    unix_timestamp, which would shift under the driver's session
    zone); and English month names. All whole-stage-codegen column
    expressions over a modulo-sampled slice of orders."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 97 == 0
    )
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(
            F.make_date(F.year(d), F.month(d), F.dayofmonth(d)), "yyyy-MM-dd"
        ).alias("rebuilt_date"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofyear(d).alias("doy"),
        F.quarter(d).alias("qtr"),
        F.date_format(
            F.make_date(F.year(d), (F.quarter(d) - 1) * 3 + 1, F.lit(1)),
            "yyyy-MM-dd",
        ).alias("quarter_start"),
        F.unix_date(d.cast("date")).alias("epoch_day"),
        F.date_format(d, "MMMM").alias("month_name"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Daily-series autocorrelation function
# ---------------------------------------------------------------------------


@query(
    "ts_autocorrelation_lags",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(COUNT(*) AS DOUBLE) AS x
        FROM evt GROUP BY 1),
    lags AS (SELECT unnest(generate_series(1, 7)) AS lag),
    pairs AS (
        SELECT l.lag, a.x AS x_t, b.x AS x_lag
        FROM lags l
        JOIN daily a ON TRUE
        JOIN daily b ON b.d = a.d - CAST(l.lag AS INTEGER))
    SELECT CAST(lag AS INTEGER) AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           {rhalf_sql('corr(x_t, x_lag)', 4)} AS acf
    FROM pairs
    GROUP BY lag
    ORDER BY lag
    """,
    tags=("timeseries", "autocorrelation", "statistics"),
)
def ts_autocorrelation_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily event-count series at lags
    1–7: the pre-modeling diagnostic that tells a forecaster which
    lags carry signal (lag-7 spikes = weekly seasonality, which
    `ts_seasonal_naive_backtest` then exploits). The series is first
    collapsed to one row per day — after that the lag set is built by
    exploding a literal 1..7 sequence and self-joining on shifted
    dates, so all post-aggregation work is on |days|×7 rows
    regardless of raw event volume. Pearson corr over the aligned
    pairs is the textbook sample ACF (pairwise-complete convention),
    exact at ROUND(4)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("double").alias("x")
    )
    lagged = daily.select(
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag"), "d", "x"
    )
    shifted = daily.select(
        F.col("d").alias("d2"), F.col("x").alias("x_lag")
    )
    pairs = lagged.join(
        shifted, F.expr("date_add(d2, lag) = d"), "inner"
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.count("*").alias("n_pairs"),
            rhalf(F.corr("x", "x_lag"), 4).alias("acf"),
        )
        .select(
            F.col("lag").cast("int").alias("lag"),
            "n_pairs",
            "acf",
        )
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# Trade-graph reciprocity
# ---------------------------------------------------------------------------


_TRADE_EDGES_SQL = """
    edges AS (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                                   * 100 + 0.5) AS BIGINT)) AS BIGINT) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2)
"""


@query(
    "graph_reciprocity_profile",
    oracle=f"""
    WITH {_TRADE_EDGES_SQL},
    offdiag AS (SELECT * FROM edges WHERE src != dst),
    matched AS (
        SELECT a.src, a.dst, a.w, b.w AS w_rev
        FROM offdiag a LEFT JOIN offdiag b
          ON a.src = b.dst AND a.dst = b.src)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(COUNT(w_rev) AS BIGINT) AS n_reciprocal,
           {rhalf_sql('COUNT(w_rev) * 1.0 / COUNT(*)', 4)} AS reciprocity,
           {rhalf_sql(
               'SUM(LEAST(w, COALESCE(w_rev, 0))) * 1.0 / SUM(w)', 4
           )} AS weighted_reciprocity,
           CAST(SUM(w) AS BIGINT) AS total_cents
    FROM matched
    """,
    tags=("graph", "reciprocity", "trade"),
)
def graph_reciprocity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-graph reciprocity over the nation trade graph (same
    edge build as `graph_pagerank_trade`): the share of off-diagonal
    edges whose reverse edge exists, and the weighted variant
    sum(min(w, w_rev))/sum(w) — how much trade volume flows in
    balanced pairs vs one-way. The graph collapses to ≤ |nations|²
    edges in the first aggregation, so the reciprocity self-join is
    on a dimension-sized relation no matter the fact volume; edge
    weights are exact integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.sum(cents).alias("w"))
        .where(F.col("src") != F.col("dst"))
    )
    rev = edges.select(
        F.col("src").alias("r_src"),
        F.col("dst").alias("r_dst"),
        F.col("w").alias("w_rev"),
    )
    matched = edges.join(
        rev,
        (edges["src"] == rev["r_dst"]) & (edges["dst"] == rev["r_src"]),
        "left",
    )
    return matched.agg(
        F.count("*").alias("n_edges"),
        F.count("w_rev").alias("n_reciprocal"),
        rhalf(F.count("w_rev") * 1.0 / F.count("*"), 4).alias("reciprocity"),
        rhalf(
            F.sum(F.least(F.col("w"), F.coalesce(F.col("w_rev"), F.lit(0))))
            * 1.0
            / F.sum("w"),
            4,
        ).alias("weighted_reciprocity"),
        F.sum("w").alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth
# ---------------------------------------------------------------------------


@query(
    "text_vocab_growth_heaps",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL.format(c='text')} AS w FROM documents),
    pos AS (
        SELECT t.doc_id, t.w[i] AS term, i AS p
        FROM toks t, unnest(generate_series(1, len(t.w))) AS g(i)),
    firsts AS (
        SELECT doc_id, term, p,
               CASE WHEN ROW_NUMBER() OVER (
                   PARTITION BY term ORDER BY doc_id, p) = 1
               THEN 1 ELSE 0 END AS is_first
        FROM pos),
    per_doc AS (
        SELECT doc_id, COUNT(*) AS n_tok, SUM(is_first) AS n_new
        FROM firsts GROUP BY doc_id)
    SELECT doc_id,
           CAST(SUM(n_tok) OVER (ORDER BY doc_id) AS BIGINT) AS cum_tokens,
           CAST(SUM(n_new) OVER (ORDER BY doc_id) AS BIGINT) AS cum_vocab,
           CAST(n_new AS BIGINT) AS new_terms
    FROM per_doc
    ORDER BY doc_id
    """,
    tags=("llm", "text", "vocabulary", "heaps"),
)
def text_vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: streaming the corpus in
    doc_id order, the cumulative token count vs cumulative distinct
    vocabulary — sublinear growth is the signature of natural-ish
    text (templated corpora go flat, random ones linear), and the
    curve is the standard input for sizing a tokenizer vocabulary.
    First-seen attribution is exact: each term's global first
    occurrence is found with one row_number over (doc_id, position),
    so a term is counted for the document where the corpus first
    says it. One explode + one term-keyed shuffle + a doc-count-sized
    running sum; no per-prefix distinct recomputation (the naive
    cumulative COUNT(DISTINCT) is quadratic in corpus length). The
    document relation is unbounded, so both cumulative curves run as
    ONE multi-weight two-pass distributed prefix sum
    (operators/distwin.running_sum_global — no single-partition
    window, both sums share the range partition and totals pass)."""
    from iceberg_rs_spark.operators.distwin import running_sum_global

    # r14: spread the single-file scan before tokenize+explode
    # (guide §2.5 — the per-row work otherwise runs on one core)
    docs = spread_by_range(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    # r15 (guide §2.3 "aggregate before you shuffle", VERDICT r14 #2):
    # the r14 shape ranked EVERY token row through a per-term
    # row_number window (full sort shuffle of the token stream) and
    # then shuffled every token row again into the per-doc groupBy. A
    # term's first occurrence is just min(struct(doc_id, p)) — the
    # row_number()==1 row under ORDER BY (doc_id, p) — which
    # aggregates with MAP-SIDE partials: only one row per distinct
    # term crosses the network; token rows themselves never shuffle at
    # any corpus scale. The token arrays are materialized ONCE behind
    # a barrier (one row per doc — the same size class as the dedup
    # fingerprint barriers) because both the explode branch and the
    # per-doc count read them; the count itself is just size(_w), no
    # explode needed.
    from iceberg_rs_spark.operators.dedup import barrier

    # The in-document position p is only a tie-break WITHIN one doc in
    # the oracle's ROW_NUMBER ORDER BY (doc_id, p) — the first
    # occurrence's DOCUMENT is simply min(doc_id) over the docs
    # containing the term, so the aggregate is a plain long min
    # (HashAggregate with partials; a struct-min would plan as a
    # SortAggregate and sort the token stream per partition).
    toks = barrier(
        docs.select("doc_id", T.tokens(F.col("text")).alias("_w")).where(
            F.size("_w") > 0
        )
    )
    n_tok = toks.select("doc_id", F.size("_w").cast("long").alias("n_tok"))
    terms = toks.select("doc_id", F.explode("_w").alias("term"))
    first_at = terms.groupBy("term").agg(F.min("doc_id").alias("doc_id"))
    n_new = first_at.groupBy("doc_id").agg(F.count("*").alias("n_new"))
    per_doc = barrier(
        n_tok.join(n_new, "doc_id", "left").na.fill({"n_new": 0})
    )
    cum = running_sum_global(
        per_doc,
        [F.col("doc_id")],
        ["n_tok", "n_new"],
        ["cum_tokens", "cum_vocab"],
    )
    # (the prefix-scan output is hash-exchanged on _pid by its local
    # window, so the terminal orderBy stays — its sampler reads the
    # PERSISTED ranged frame, not a re-derived pipeline)
    return cum.select(
        "doc_id",
        "cum_tokens",
        "cum_vocab",
        F.col("n_new").cast("long").alias("new_terms"),
    ).orderBy("doc_id")
