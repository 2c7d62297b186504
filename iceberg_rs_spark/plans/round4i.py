"""Round-4 corpus additions, batch 8: case-insensitive collation,
context-window document chunking, reciprocal-rank-fusion hybrid
retrieval, A/B-test lift, and market-basket association mining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.functions.hashing import h60, h60_sql
from iceberg_rs_spark.operators import text as T
from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.plans.llm import NORM_SQL, TOKENS_SQL
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

# ---------------------------------------------------------------------------
# Case-insensitive collation grouping (Spark 4 collations)
# ---------------------------------------------------------------------------


@query(
    "fn_collation_ci_grouping",
    oracle="""
    WITH variants AS (
        SELECT p_partkey,
               CASE p_partkey % 3 WHEN 0 THEN upper(p_brand)
                                  WHEN 1 THEN lower(p_brand)
                                  ELSE p_brand END AS brand_messy
        FROM part),
    grouped AS (
        SELECT min(brand_messy) AS brand_rep,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(COUNT(DISTINCT brand_messy) AS BIGINT) AS n_casings
        FROM variants
        GROUP BY brand_messy COLLATE NOCASE)
    SELECT brand_rep, n_parts, n_casings
    FROM grouped
    ORDER BY brand_rep
    """,
    tags=("function", "collation", "spark4"),
)
def fn_collation_ci_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation support: grouping under the UTF8_LCASE
    collation unifies case variants WITHOUT rewriting the data through
    lower() — the collation travels with the comparison, so the same
    expression drives joins, DISTINCT, and sorts. The fixture brand
    column is deterministically case-mangled (upper/lower/original by
    key) and the collated groupBy must re-unify it; the binary-minimum
    representative and the distinct-casing count are hash-checked
    against DuckDB's NOCASE collation."""
    part = load_table(spark, sf_dir, "part")
    messy = (
        F.when(F.col("p_partkey") % 3 == 0, F.upper("p_brand"))
        .when(F.col("p_partkey") % 3 == 1, F.lower("p_brand"))
        .otherwise(F.col("p_brand"))
    )
    variants = part.select(messy.alias("brand_messy"))
    return (
        variants.groupBy(
            F.collate(F.col("brand_messy"), "UTF8_LCASE").alias("brand_ci")
        )
        .agg(
            F.min(F.collate(F.col("brand_messy"), "UTF8_BINARY")).alias("brand_rep"),
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.countDistinct(
                F.collate(F.col("brand_messy"), "UTF8_BINARY")
            ).cast("long").alias("n_casings"),
        )
        .select("brand_rep", "n_parts", "n_casings")
        .orderBy("brand_rep")
    )


# ---------------------------------------------------------------------------
# Context-window document chunking
# ---------------------------------------------------------------------------

CHUNK, OVERLAP = 40, 10  # tokens per chunk / overlap (stride = 30)


@query(
    "pipeline_doc_chunking",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL.format(c='text')} AS w
        FROM documents WHERE doc_id < 1500),
    sized AS (SELECT doc_id, w, len(w) AS n_tok FROM toks WHERE len(w) > 0),
    chunks AS (
        SELECT doc_id, n_tok, i AS chunk_idx,
               1 + i * {CHUNK - OVERLAP} AS start_tok,
               least(n_tok, i * {CHUNK - OVERLAP} + {CHUNK}) AS end_tok,
               array_to_string(list_slice(w, 1 + i * {CHUNK - OVERLAP},
                                          i * {CHUNK - OVERLAP} + {CHUNK}), ' ')
                   AS chunk_text
        FROM sized
        CROSS JOIN generate_series(0, 500) AS g(i)
        WHERE i * {CHUNK - OVERLAP} < n_tok
          AND (i = 0 OR i * {CHUNK - OVERLAP} + {OVERLAP} < n_tok))
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(start_tok AS INTEGER) AS start_tok,
           CAST(end_tok AS INTEGER) AS end_tok,
           {h60_sql('chunk_text')} AS chunk_hash
    FROM chunks
    ORDER BY doc_id, chunk_idx
    """,
    tags=("llm", "pipeline", "chunking"),
)
def pipeline_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking with overlap — the RAG/pre-training
    segmentation op: each document becomes ⌈(n−overlap)/stride⌉ chunks
    of ≤40 tokens with a 10-token overlap, via sequence+explode over
    the token array (a tail chunk fully contained in the previous one
    is suppressed). The chunk TEXT is certified by portable hash, not
    just counted — boundary arithmetic (1-based slice closed ends)
    matches DuckDB's list_slice exactly. One explode, no UDF, no
    shuffle at all until the final presentation sort: chunking is
    embarrassingly parallel and the fan-out (tokens/stride per doc) is
    the output size, so the plan is scan-shaped at any corpus size."""
    stride = CHUNK - OVERLAP
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 1500)
    sized = docs.select(
        "doc_id", T.tokens(F.col("text")).alias("w")
    ).withColumn("n_tok", F.size("w")).where(F.col("n_tok") > 0)
    idx = F.explode(
        F.sequence(F.lit(0), F.floor((F.col("n_tok") - 1) / stride).cast("int"))
    )
    chunks = (
        sized.select("doc_id", "w", "n_tok", idx.alias("chunk_idx"))
        .where(
            (F.col("chunk_idx") == 0)
            | (F.col("chunk_idx") * stride + OVERLAP < F.col("n_tok"))
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            (F.col("chunk_idx") * stride + 1).cast("int").alias("start_tok"),
            F.least(F.col("n_tok"), F.col("chunk_idx") * stride + CHUNK)
            .cast("int")
            .alias("end_tok"),
            h60(
                F.array_join(
                    F.slice(F.col("w"), F.col("chunk_idx") * stride + 1, CHUNK), " "
                )
            ).alias("chunk_hash"),
        )
    )
    return chunks.orderBy("doc_id", "chunk_idx")


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal rank fusion
# ---------------------------------------------------------------------------

RRF_K, RRF_TOPK, RRF_QUERIES = 60, 10, 5
_DOT = "list_sum([CAST(q.v[i] * e.v[i] AS DOUBLE) for i in generate_series(1, 64)])"
_NRM = (
    "sqrt(list_sum([CAST({a}.v[i] * {a}.v[i] AS DOUBLE) "
    "for i in generate_series(1, 64)]))"
)


@query(
    "sim_hybrid_rrf_fusion",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
    q AS (SELECT vec_id AS qid, v, label FROM base WHERE vec_id < {RRF_QUERIES}),
    e AS (SELECT vec_id, v, label FROM base),
    cos_ranked AS (
        SELECT q.qid, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                   ORDER BY {_DOT} / ({_NRM.format(a='q')} * {_NRM.format(a='e')})
                       DESC, e.vec_id) AS r
        FROM q JOIN e ON e.vec_id != q.qid),
    lbl_ranked AS (
        SELECT q.qid, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                   ORDER BY abs(e.label - q.label), e.vec_id) AS r
        FROM q JOIN e ON e.vec_id != q.qid),
    fused AS (
        SELECT COALESCE(c.qid, l.qid) AS qid,
               COALESCE(c.vec_id, l.vec_id) AS vec_id,
               COALESCE(1.0 / ({RRF_K} + c.r), 0)
               + COALESCE(1.0 / ({RRF_K} + l.r), 0) AS score
        FROM (SELECT * FROM cos_ranked WHERE r <= {RRF_TOPK}) c
        FULL OUTER JOIN (SELECT * FROM lbl_ranked WHERE r <= {RRF_TOPK}) l
          ON c.qid = l.qid AND c.vec_id = l.vec_id)
    SELECT qid, vec_id, {rhalf_sql('score', 6)} AS rrf_score,
           CAST(ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY score DESC, vec_id) AS INTEGER) AS rank
    FROM fused
    QUALIFY rank <= 5
    ORDER BY qid, rank
    """,
    tags=("llm", "similarity", "hybrid", "rrf"),
)
def sim_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal rank fusion (Cormack et al.):
    two independent retrievers — embedding cosine and a metadata
    retriever (label distance standing in for the lexical channel) —
    each produce a per-query top-10; fusion scores candidates by
    Σ 1/(60+rank) over the lists that retrieved them (FULL OUTER on
    the candidate sets) and keeps the fused top-5. RRF is the
    standard way to merge dense + sparse retrieval without score
    calibration, because it only consumes RANKS. Both channels
    partition their windows by query id, and the fusion join keys on
    (query, candidate) — everything shuffles on ids, nothing on
    scores."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    q = emb.where(F.col("vec_id") < RRF_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("label").alias("qlabel")
    )
    # r14 (guide §4.1/§4.2): per-pair HOF cosine -> the Arrow kernel
    # that replays the left fold's IEEE addition order exactly, so the
    # rank cut (the only thing the cosine feeds here) is unchanged.
    from iceberg_rs_spark.operators.similarity import cosine_arrow_exact

    pairs = q.join(emb, F.col("vec_id") != F.col("qid"))
    wq = Window.partitionBy("qid")
    cos_ranked = (
        pairs.select(
            "qid",
            "vec_id",
            cosine_arrow_exact(F.col("qv"), F.col("v")).alias("_cos"),
        )
        .select(
            "qid",
            "vec_id",
            F.row_number().over(wq.orderBy(F.desc("_cos"), "vec_id")).alias("r"),
        )
        .where(F.col("r") <= RRF_TOPK)
    )
    lbl_ranked = pairs.select(
        "qid",
        "vec_id",
        F.row_number()
        .over(wq.orderBy(F.abs(F.col("label") - F.col("qlabel")), "vec_id"))
        .alias("r"),
    ).where(F.col("r") <= RRF_TOPK)
    c = cos_ranked.alias("c")
    l = lbl_ranked.alias("l")
    fused = (
        c.join(
            l,
            (F.col("c.qid") == F.col("l.qid")) & (F.col("c.vec_id") == F.col("l.vec_id")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("c.qid"), F.col("l.qid")).alias("qid"),
            F.coalesce(F.col("c.vec_id"), F.col("l.vec_id")).alias("vec_id"),
            (
                F.coalesce(1.0 / (RRF_K + F.col("c.r")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("l.r")), F.lit(0.0))
            ).alias("score"),
        )
    )
    ranked = fused.select(
        "qid",
        "vec_id",
        rhalf(F.col("score"), 6).alias("rrf_score"),
        F.row_number()
        .over(Window.partitionBy("qid").orderBy(F.desc("score"), "vec_id"))
        .cast("int")
        .alias("rank"),
    )
    return ranked.where(F.col("rank") <= 5).orderBy("qid", "rank")


# ---------------------------------------------------------------------------
# A/B test lift
# ---------------------------------------------------------------------------


@query(
    "events_ab_test_lift",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    assigned AS (
        SELECT user_id,
               CASE WHEN {h60_sql("'exp1|' || CAST(user_id AS VARCHAR)")} % 2 = 0
                    THEN 'control' ELSE 'treatment' END AS variant
        FROM (SELECT DISTINCT user_id FROM evt)),
    outcomes AS (
        SELECT a.variant,
               COUNT(*) AS n_users,
               COUNT(*) FILTER (WHERE conv.user_id IS NOT NULL) AS n_converted
        FROM assigned a
        LEFT JOIN (SELECT DISTINCT user_id FROM evt
                   WHERE event_type = 'purchase') conv
          ON a.user_id = conv.user_id
        GROUP BY a.variant)
    SELECT variant, CAST(n_users AS BIGINT) AS n_users,
           CAST(n_converted AS BIGINT) AS n_converted,
           {rhalf_sql('n_converted * 1.0 / n_users', 6)} AS conversion_rate
    FROM outcomes
    ORDER BY variant
    """,
    tags=("events", "experiment", "ab-test"),
)
def events_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with deterministic assignment: users
    land in control/treatment by the salted portable hash of their id
    (the SAME property the train/test split relies on — assignment is
    reproducible across runs, engines, and cluster sizes, never
    `rand()`), and per-variant conversion is a distinct-user
    purchase flag via a left semi-style join. The variant populations
    and conversion rates are hash-checked; the experiment-analysis
    stack (lift, significance) consumes exactly these four exact
    counts, so certifying them certifies the input to any stats
    layer."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    variant = F.when(
        h60(F.concat(F.lit("exp1|"), F.col("user_id").cast("string"))) % 2 == 0,
        "control",
    ).otherwise("treatment")
    assigned = users.select("user_id", variant.alias("variant"))
    converters = (
        ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    conv = converters.withColumn("converted", F.lit(1))
    return (
        assigned.join(conv, "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.count("converted").cast("long").alias("n_converted"),
        )
        .withColumn(
            "conversion_rate",
            rhalf(F.col("n_converted") * 1.0 / F.col("n_users"), 6),
        )
        .orderBy("variant")
    )


# ---------------------------------------------------------------------------
# Market-basket association: event-type co-occurrence lift
# ---------------------------------------------------------------------------


@query(
    "events_market_basket_lift",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    baskets AS (
        SELECT DISTINCT user_id, event_type FROM evt),
    n AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users FROM evt),
    singles AS (
        SELECT event_type, COUNT(*) AS n FROM baskets GROUP BY event_type),
    pairs AS (
        SELECT a.event_type AS ante, b.event_type AS cons, COUNT(*) AS n_both
        FROM baskets a JOIN baskets b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2)
    SELECT ante, cons, CAST(n_both AS BIGINT) AS n_both,
           {rhalf_sql('n_both / (SELECT n_users FROM n)', 6)} AS support,
           {rhalf_sql('n_both * 1.0 / sa.n', 6)} AS confidence,
           {rhalf_sql('n_both * (SELECT n_users FROM n) * 1.0 / (sa.n * sc.n)', 6)}
               AS lift
    FROM pairs
    JOIN singles sa ON sa.event_type = ante
    JOIN singles sc ON sc.event_type = cons
    ORDER BY ante, cons
    """,
    tags=("events", "association", "market-basket"),
)
def events_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association over per-user event-type baskets:
    support / confidence / lift for every ordered type pair (ante <
    cons dedupes the symmetric pair; confidence is directional on the
    antecedent). The basket build is one distinct, the pair count a
    self-join on user_id — the worst-case fan-out is |types|² per
    user, bounded by the (tiny, fixed) type vocabulary, NOT the event
    volume; singles and the user total ride in as broadcasts. This is
    the frequent-itemset k=2 core; higher k composes the same join."""
    ev = load_table(spark, sf_dir, "events")
    baskets = ev.select("user_id", "event_type").distinct()
    n_users = ev.agg(
        F.countDistinct("user_id").cast("double").alias("n_users")
    )
    singles = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ante"), F.col("b.event_type").alias("cons")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = singles.select(F.col("event_type").alias("ante"), F.col("n").alias("n_a"))
    sc = singles.select(F.col("event_type").alias("cons"), F.col("n").alias("n_c"))
    return (
        pairs.join(F.broadcast(sa), "ante")
        .join(F.broadcast(sc), "cons")
        .crossJoin(F.broadcast(n_users))
        .select(
            "ante",
            "cons",
            F.col("n_both").cast("long").alias("n_both"),
            rhalf(F.col("n_both") / F.col("n_users"), 6).alias("support"),
            rhalf(F.col("n_both") * 1.0 / F.col("n_a"), 6).alias("confidence"),
            rhalf(
                F.col("n_both") * F.col("n_users") * 1.0
                / (F.col("n_a") * F.col("n_c")),
                6,
            ).alias("lift"),
        )
        .orderBy("ante", "cons")
    )
