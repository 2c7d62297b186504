"""Round-4 corpus additions, batch 13: k-core peeling, time-interval
range-frame windows, NDCG/MRR ranking evaluation, pointwise mutual
information, and per-source dataset cards.

The NDCG query certifies FLOAT SUMS of irrational terms across
engines by forcing both sides into the same left-to-right fold order
(sorted struct array + aggregate() in Spark, ordered array_agg + list
comprehension in DuckDB) — the same trick the cosine kernels use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.functions.hashing import h60_sql
from iceberg_rs_spark.operators import text as T
from iceberg_rs_spark.operators.graph import k_core
from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.plans.llm import NORM_SQL, TOKENS_SQL
from iceberg_rs_spark.plans.round4m import _GRAPH_CTES
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

# ---------------------------------------------------------------------------
# k-core peeling
# ---------------------------------------------------------------------------

KCORE_K, KCORE_ROUNDS = 4, 3


def _kcore_oracle() -> str:
    ctes = [
        _GRAPH_CTES,
        """e0 AS (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM top3)""",
    ]
    for i in range(1, KCORE_ROUNDS + 1):
        p = i - 1
        ctes.append(
            f"""deg{i} AS (
        SELECT node, COUNT(*) AS deg FROM (
            SELECT a AS node FROM e{p} UNION ALL SELECT b FROM e{p})
        GROUP BY node)"""
        )
        ctes.append(
            f"keep{i} AS (SELECT node FROM deg{i} WHERE deg >= {KCORE_K})"
        )
        ctes.append(
            f"""e{i} AS (
        SELECT e.a, e.b FROM e{p} e
        JOIN keep{i} ka ON ka.node = e.a
        JOIN keep{i} kb ON kb.node = e.b)"""
        )
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT n_name, CAST(deg AS BIGINT) AS deg
    FROM (SELECT node, COUNT(*) AS deg FROM (
              SELECT a AS node FROM e{KCORE_ROUNDS}
              UNION ALL SELECT b FROM e{KCORE_ROUNDS})
          GROUP BY node)
    JOIN nation ON node = n_nationkey
    ORDER BY n_name
    """
    )


@query(
    "graph_kcore_peel",
    oracle=_kcore_oracle(),
    tags=("graph", "iterative", "k-core"),
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling toward the 4-core of the sparsified trade graph:
    three synchronous rounds each drop nodes of degree < 4 and their
    incident edges — the standard dense-subgraph extractor (spam
    rings, community cores). Fixed rounds keep the result
    hash-checkable against the unrolled oracle; the distributed
    operator (operators/graph.py:k_core) is one degree aggregation
    plus two semi-joins per round, survivors only shrink, and nothing
    graph-sized reaches the driver."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    directed = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.sum(cents).cast("double").alias("w"))
    )
    und = (
        directed.where(F.col("src") != F.col("dst"))
        .groupBy(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .agg(F.sum("w").alias("w"))
    )
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w").union(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    top3 = (
        sym.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("src").orderBy(F.desc("w"), "dst")
            ),
        )
        .where(F.col("rn") <= 3)
        .select("src", "dst")
    )
    undirected = top3.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    core = k_core(undirected, k=KCORE_K, rounds=KCORE_ROUNDS)
    return (
        core.join(n, core["node"] == n["n_nationkey"])
        .select("n_name", "deg")
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Time-interval range-frame windows
# ---------------------------------------------------------------------------

HOUR_US = 3_600_000_000


@query(
    "win_time_range_rolling",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    base AS (
        SELECT event_id, user_id, ts,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM evt WHERE user_id % 20 = 0)
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS cnt_1h,
           CAST(SUM(cents) OVER w AS BIGINT) AS cents_1h
    FROM base
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN {HOUR_US} PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    tags=("window", "range-frame", "time-interval"),
)
def win_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval range frames: for every event, the count and
    exact cent-sum of the same user's events in the trailing hour —
    VALUE-based frames over epoch microseconds (a row 59 minutes back
    is in-frame regardless of how many rows sit between), the frame
    semantics calendar features and rate limits need, as opposed to
    the ROWS frames in win_moving_avg. Both engines evaluate the
    identical integer-microsecond range, so boundary inclusion is
    exact; windows partition by user and never globally."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 20 == 0)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    # NTZ-safe epoch micros: pure field arithmetic (unix_micros needs a
    # zoned TIMESTAMP and an NTZ->TIMESTAMP cast would be session-tz
    # dependent); extract(SECOND) carries the fractional micros exactly.
    base_sec = (
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast("long")
        * 86400
        + F.hour("ts").cast("long") * 3600
        + F.minute("ts").cast("long") * 60
    )
    us = base_sec * 1_000_000 + (
        F.expr("extract(SECOND FROM ts)") * 1_000_000
    ).cast("long")
    base = ev.select(
        "event_id", "user_id", "ts", cents.alias("cents"), us.alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-HOUR_US, 0)
    )
    return base.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.count(F.lit(1)).over(w).cast("long").alias("cnt_1h"),
        F.sum("cents").over(w).cast("long").alias("cents_1h"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Ranking-quality evaluation: NDCG@10 + MRR
# ---------------------------------------------------------------------------

NDCG_QUERIES, NDCG_K = 30, 10

_N_DOT = "list_sum([CAST(q.v[i] * e.v[i] AS DOUBLE) for i in generate_series(1, 64)])"
_N_NRM = (
    "sqrt(list_sum([CAST({a}.v[i] * {a}.v[i] AS DOUBLE) "
    "for i in generate_series(1, 64)]))"
)


@query(
    "sim_ranking_metrics_ndcg",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
    q AS (SELECT vec_id AS qid, v, label FROM base
          WHERE vec_id < {NDCG_QUERIES}),
    scored AS (
        SELECT q.qid, e.label = q.label AS rel,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                   ORDER BY {_N_DOT}
                       / ({_N_NRM.format(a='q')} * {_N_NRM.format(a='e')})
                       DESC, e.vec_id) AS r
        FROM q JOIN base e ON e.vec_id != q.qid),
    totals AS (
        SELECT q.qid, CAST(COUNT(*) FILTER (WHERE e.label = q.label) AS BIGINT)
                   AS total_rel
        FROM q JOIN base e ON e.vec_id != q.qid
        GROUP BY q.qid),
    top AS (
        SELECT qid,
               list_sum([CASE WHEN rels[i] THEN 1.0 / log2(i + 1) ELSE 0 END
                         for i in generate_series(1, len(rels))]) AS dcg,
               (SELECT MIN(r) FROM scored s2
                WHERE s2.qid = t.qid AND s2.rel AND s2.r <= {NDCG_K})
                   AS first_rel
        FROM (
            SELECT qid, array_agg(rel ORDER BY r) AS rels
            FROM scored WHERE r <= {NDCG_K} GROUP BY qid) t),
    idcg AS (
        SELECT qid, total_rel,
               CASE WHEN total_rel > 0 THEN
                   list_sum([1.0 / log2(i + 1) for i in
                             generate_series(1, least(total_rel, {NDCG_K}))])
               ELSE 0 END AS idcg
        FROM totals)
    SELECT t.qid, i.total_rel,
           {rhalf_sql('COALESCE(t.dcg, 0)', 6)} AS dcg,
           {rhalf_sql('i.idcg', 6)} AS idcg,
           {rhalf_sql(
               'CASE WHEN i.idcg > 0 THEN COALESCE(t.dcg, 0) / i.idcg '
               'ELSE 0 END', 6)} AS ndcg,
           {rhalf_sql('COALESCE(1.0 / t.first_rel, 0)', 6)} AS mrr
    FROM top t JOIN idcg i USING (qid)
    ORDER BY qid
    """,
    tags=("llm", "similarity", "evaluation", "ndcg"),
)
def sim_ranking_metrics_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation: NDCG@10 and MRR of the brute-force
    cosine ranking, with label agreement as graded relevance — the
    retrieval-eval harness every embedding change is judged by.
    Certifying float metrics across engines requires identical
    SUMMATION ORDER for the irrational 1/log2(rank+1) terms, so both
    sides fold the per-rank relevance list left-to-right (sorted
    struct array + aggregate() here, ordered array_agg + list
    comprehension in DuckDB) instead of relying on unordered SUM.
    IDCG uses the full candidate relevance count truncated at k,
    guarded against the empty case."""
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    q = base.where(F.col("vec_id") < NDCG_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    # r14 (guide §4.1/§4.2): the per-pair cosine moved from interpreted
    # HOF folds (~25 µs/pair, re-deriving both norms per PAIR) to the
    # Arrow kernel whose float result is bit-identical to the left fold
    # by construction (sequential across dims), so the rank order —
    # the quantity the certified DCG depends on — is unchanged.
    from iceberg_rs_spark.operators.similarity import cosine_arrow_exact

    pairs = q.join(base, F.col("vec_id") != F.col("qid"))
    scored = pairs.select(
        "qid",
        (F.col("label") == F.col("qlabel")).alias("rel"),
        "vec_id",
        cosine_arrow_exact(F.col("qv"), F.col("v")).alias("_cos"),
    ).select(
        "qid",
        "rel",
        F.row_number()
        .over(Window.partitionBy("qid").orderBy(F.desc("_cos"), "vec_id"))
        .alias("r"),
    )
    totals = pairs.groupBy("qid").agg(
        F.count(F.when(F.col("label") == F.col("qlabel"), 1))
        .cast("long")
        .alias("total_rel")
    )
    topk = scored.where(F.col("r") <= NDCG_K)
    per_q = topk.groupBy("qid").agg(
        F.sort_array(F.collect_list(F.struct("r", "rel"))).alias("ranked"),
        F.min(F.when(F.col("rel"), F.col("r"))).alias("first_rel"),
    )
    dcg = F.aggregate(
        F.col("ranked"),
        F.lit(0.0),
        lambda acc, x: acc
        + F.when(x["rel"], 1.0 / F.log2(x["r"] + 1)).otherwise(F.lit(0.0)),
    )
    idcg = F.when(
        F.col("total_rel") > 0,
        F.aggregate(
            F.sequence(
                F.lit(1).cast("long"),
                F.least(F.col("total_rel"), F.lit(NDCG_K).cast("long")),
            ),
            F.lit(0.0),
            lambda acc, i: acc + 1.0 / F.log2(i + 1),
        ),
    ).otherwise(F.lit(0.0))
    joined = per_q.join(totals, "qid").select(
        "qid",
        "total_rel",
        dcg.alias("dcg_raw"),
        idcg.alias("idcg_raw"),
        "first_rel",
    )
    return joined.select(
        "qid",
        "total_rel",
        rhalf(F.coalesce("dcg_raw", F.lit(0.0)), 6).alias("dcg"),
        rhalf(F.col("idcg_raw"), 6).alias("idcg"),
        rhalf(
            F.when(
                F.col("idcg_raw") > 0,
                F.coalesce("dcg_raw", F.lit(0.0)) / F.col("idcg_raw"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("ndcg"),
        rhalf(F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0)), 6).alias("mrr"),
    ).orderBy("qid")


# ---------------------------------------------------------------------------
# Pointwise mutual information: event type × day-of-week
# ---------------------------------------------------------------------------


@query(
    "agg_pmi_type_dayofweek",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    cells AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                    AS INTEGER) AS dow,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM evt GROUP BY 1, 2),
    mx AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS nx
           FROM cells GROUP BY event_type),
    my AS (SELECT dow, CAST(SUM(n) AS BIGINT) AS ny FROM cells GROUP BY dow),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM cells)
    SELECT c.event_type, c.dow, c.n,
           {rhalf_sql('c.n / (SELECT t FROM tot)', 6)} AS p_joint,
           {rhalf_sql(
               'log2((c.n * (SELECT t FROM tot)) / (mx.nx * 1.0 * my.ny))', 6)}
               AS pmi
    FROM cells c
    JOIN mx USING (event_type)
    JOIN my USING (dow)
    ORDER BY event_type, dow
    """,
    tags=("aggregate", "information-theory", "pmi"),
)
def agg_pmi_type_dayofweek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between event type and day of
    week: which behaviours cluster on which days, the association
    screen behind seasonality features. Day-of-week comes from pure
    integer arithmetic (days-since-epoch mod 7) — never an engine
    dayofweek() whose week origin differs between Spark (Sunday=1)
    and DuckDB (Sunday=0). Per-cell PMI is row-local double math over
    one joint aggregate and two broadcast marginals — no global float
    summation to drift."""
    ev = load_table(spark, sf_dir, "events")
    dow = (F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) % 7).cast(
        "int"
    )
    cells = ev.groupBy(
        "event_type", dow.alias("dow")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    mx = cells.groupBy("event_type").agg(F.sum("n").cast("long").alias("nx"))
    my = cells.groupBy("dow").agg(F.sum("n").cast("long").alias("ny"))
    tot = cells.agg(F.sum("n").cast("double").alias("t"))
    return (
        cells.join(F.broadcast(mx), "event_type")
        .join(F.broadcast(my), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "dow",
            "n",
            rhalf(F.col("n") / F.col("t"), 6).alias("p_joint"),
            rhalf(
                F.log2(
                    (F.col("n") * F.col("t"))
                    / (F.col("nx") * 1.0 * F.col("ny"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy("event_type", "dow")
    )


# ---------------------------------------------------------------------------
# Per-source dataset cards
# ---------------------------------------------------------------------------


@query(
    "pipeline_dataset_card_by_source",
    oracle=f"""
    WITH enriched AS (
        SELECT source, lang,
               CASE WHEN length({NORM_SQL.format(c='text')}) = 0 THEN 0
                    ELSE len({TOKENS_SQL.format(c='text')}) END AS n_tok,
               {h60_sql(NORM_SQL.format(c='text'))} AS h
        FROM documents),
    per_source AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_exact_dups
        FROM enriched GROUP BY source),
    lang_counts AS (
        SELECT source, lang, COUNT(*) AS n,
               ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY COUNT(*) DESC, lang) AS rn
        FROM enriched GROUP BY source, lang)
    SELECT p.source, p.n_docs, p.total_tokens, p.n_langs,
           l.lang AS top_lang, p.n_exact_dups,
           {rhalf_sql('p.n_exact_dups * 1.0 / p.n_docs', 6)} AS dup_rate,
           {rhalf_sql('p.total_tokens * 1.0 / p.n_docs', 6)} AS avg_tokens
    FROM per_source p
    JOIN (SELECT source, lang FROM lang_counts WHERE rn = 1) l USING (source)
    ORDER BY p.source
    """,
    tags=("llm", "pipeline", "profiling", "dataset-card"),
)
def pipeline_dataset_card_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset cards: document counts, token totals,
    language spread with the dominant language, exact-duplicate count
    (docs minus distinct normalized-content hashes) and dup rate —
    the summary block a dataset datasheet leads with, and the
    per-source health check a mixture pipeline monitors. Two grouped
    aggregations over one enriched scan plus a top-1 window on the
    tiny (source, lang) table; the content hash reuses the exact-dedup
    key so "dup" means the same thing across the whole catalog."""
    docs = load_table(spark, sf_dir, "documents")
    norm = T.normalize(F.col("text"))
    enriched = docs.select(
        "source",
        "lang",
        F.when(F.length(norm) == 0, 0)
        .otherwise(F.size(T.tokens(F.col("text"))))
        .alias("n_tok"),
        F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("long").alias("h"),
    )
    per_source = enriched.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        (F.count(F.lit(1)) - F.countDistinct("h")).cast("long").alias(
            "n_exact_dups"
        ),
    )
    lang_top = (
        enriched.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy(F.desc("n"), "lang")
            ),
        )
        .where(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return (
        per_source.join(lang_top, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "n_langs",
            "top_lang",
            "n_exact_dups",
            rhalf(F.col("n_exact_dups") * 1.0 / F.col("n_docs"), 6).alias(
                "dup_rate"
            ),
            rhalf(F.col("total_tokens") * 1.0 / F.col("n_docs"), 6).alias(
                "avg_tokens"
            ),
        )
        .orderBy("source")
    )
