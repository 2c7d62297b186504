"""Round-4 corpus additions, batch 21: Kendall rank correlation
between similarity metrics, padding-waste economics, and the near-dup
cluster-size profile.

Kendall's tau is the rare rank statistic that is EXACTLY
cross-engine-deterministic: concordant/discordant counts are integer
comparisons of identically-computed doubles, so the only float is the
final normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.operators import dedup as D
from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.plans.llm import (
    BANDS,
    NUM_HASHES,
    SHINGLE_K,
    TOKENS_SQL,
    _MINHASH_CTES,
)
from iceberg_rs_spark.sources.fixtures import load_table

# ---------------------------------------------------------------------------
# Kendall rank correlation: cosine vs dot-product ordering
# ---------------------------------------------------------------------------

KT_QUERIES, KT_CANDS = 5, 150

_K_DOT = "list_sum([CAST(q.v[i] * e.v[i] AS DOUBLE) for i in generate_series(1, 64)])"
_K_NRM = (
    "sqrt(list_sum([CAST({a}.v[i] * {a}.v[i] AS DOUBLE) "
    "for i in generate_series(1, 64)]))"
)


@query(
    "sim_rank_correlation_kendall",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE vec_id < {KT_CANDS}),
    q AS (SELECT vec_id AS qid, v FROM base WHERE vec_id < {KT_QUERIES}),
    scored AS (
        SELECT q.qid, e.vec_id,
               {_K_DOT} AS dot,
               {_K_DOT} / ({_K_NRM.format(a='q')} * {_K_NRM.format(a='e')})
                   AS cos
        FROM q JOIN base e ON e.vec_id != q.qid),
    pairs AS (
        SELECT a.qid,
               CASE WHEN (a.cos - b.cos) * (a.dot - b.dot) > 0 THEN 1
                    ELSE 0 END AS conc,
               CASE WHEN (a.cos - b.cos) * (a.dot - b.dot) < 0 THEN 1
                    ELSE 0 END AS disc
        FROM scored a JOIN scored b
          ON a.qid = b.qid AND a.vec_id < b.vec_id),
    agg AS (
        SELECT qid, CAST(SUM(conc) AS BIGINT) AS concordant,
               CAST(SUM(disc) AS BIGINT) AS discordant,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM pairs GROUP BY qid)
    SELECT qid, concordant, discordant, n_pairs,
           {rhalf_sql('(concordant - discordant) * 1.0 / n_pairs', 6)}
               AS kendall_tau
    FROM agg
    ORDER BY qid
    """,
    tags=("llm", "similarity", "evaluation", "rank-correlation"),
)
def sim_rank_correlation_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau between the cosine and raw dot-product orderings
    of each query's candidates — the audit for "does vector
    normalization change retrieval order" (tau near 1 means dot
    suffices and the norm computation can be skipped at serving
    time). Tau is exactly cross-engine-deterministic: concordance is
    an integer comparison of identically-computed doubles, so only
    the final (C−D)/n division is float. The pair fan-out is per
    query over its candidate set — quadratic in candidates but
    embarrassingly parallel across queries, and the eval runs on a
    fixed slice by design."""
    base = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") < KT_CANDS
    ).select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = base.where(F.col("vec_id") < KT_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    scored = q.join(base, F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        dot.alias("dot"),
        (dot / (nrm(F.col("qv")) * nrm(F.col("v")))).alias("cos"),
    )
    # Pair counting stays inside one aggregation (r11 watch-list shave):
    # collect each query's candidates once and count concordant /
    # discordant pairs with array HOFs JVM-side — the former self-join
    # recomputed the scored subplan (two scans of embeddings) and
    # shuffled 55k pair rows to compare ~11k candidate pairs per query.
    # sort_array on (vec_id, dot, cos) structs fixes the i<j pair set to
    # exactly the oracle's a.vec_id < b.vec_id (vec_id leads the struct
    # and is unique per qid); the comparisons are integer-exact on
    # identically-computed doubles either way.
    arr = F.sort_array(F.collect_list(F.struct("vec_id", "dot", "cos")))
    pair_count = (
        "aggregate(transform(arr, (x, i) -> "
        "size(filter(slice(arr, i + 2, size(arr) - i - 1), "
        "y -> (x.cos - y.cos) * (x.dot - y.dot) {op} 0))), "
        "0L, (acc, c) -> acc + bigint(c))"
    )
    # A qid with a single candidate has no pairs: the oracle's inner
    # self-join drops it, so the grouped rewrite must too (n_pairs=0
    # would otherwise surface as an extra row with NULL tau).
    agg = (
        scored.groupBy("qid")
        .agg(arr.alias("arr"))
        .where(F.size("arr") >= 2)
        .select(
            "qid",
            F.expr(pair_count.format(op=">")).alias("concordant"),
            F.expr(pair_count.format(op="<")).alias("discordant"),
            (
                F.size("arr").cast("long")
                * (F.size("arr") - 1).cast("long")
                / F.lit(2)
            )
            .cast("long")
            .alias("n_pairs"),
        )
    )
    return agg.select(
        "qid",
        "concordant",
        "discordant",
        "n_pairs",
        rhalf(
            (F.col("concordant") - F.col("discordant")) * 1.0 / F.col("n_pairs"),
            6,
        ).alias("kendall_tau"),
    ).orderBy("qid")


# ---------------------------------------------------------------------------
# Padding-waste report (length-bucketed batching)
# ---------------------------------------------------------------------------


@query(
    "pipeline_padding_waste_report",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, len({TOKENS_SQL.format(c='text')}) AS n_tok
        FROM documents),
    sized AS (SELECT n_tok FROM toks WHERE n_tok > 0),
    bucketed AS (
        SELECT n_tok,
               CAST(power(2, ceil(log2(n_tok))) AS BIGINT) AS bucket
        FROM sized)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS real_tokens,
           CAST(COUNT(*) * bucket AS BIGINT) AS padded_tokens,
           {rhalf_sql(
               '1.0 - SUM(n_tok) * 1.0 / (COUNT(*) * bucket)', 6)}
               AS waste_ratio
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("llm", "pipeline", "batching", "padding"),
)
def pipeline_padding_waste_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding economics for length-bucketed batching: documents
    rounded up to power-of-two token buckets (the dynamic-batching
    policy), reporting real vs padded token totals and the waste
    ratio per bucket — the table that decides whether sequence
    packing (pipeline_sequence_packing) is worth running. log2 is
    exact at powers of two in both engines so bucket edges cannot
    drift, and the rest is integer arithmetic over one scan."""
    docs = load_table(spark, sf_dir, "documents")
    from iceberg_rs_spark.operators import text as T

    sized = docs.select(
        F.size(T.tokens(F.col("text"))).alias("n_tok")
    ).where(F.col("n_tok") > 0)
    bucketed = sized.withColumn(
        "bucket",
        F.pow(F.lit(2.0), F.ceil(F.log2("n_tok"))).cast("long"),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("real_tokens"),
            (F.count(F.lit(1)) * F.col("bucket").cast("long"))
            .cast("long")
            .alias("padded_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "real_tokens",
            "padded_tokens",
            rhalf(
                1.0 - F.col("real_tokens") * 1.0 / F.col("padded_tokens"), 6
            ).alias("waste_ratio"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Near-dup cluster-size profile
# ---------------------------------------------------------------------------


@query(
    "dedup_component_size_profile",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_CTES.replace(
        "FROM documents", "FROM documents WHERE doc_id < 300", 1)},
    near AS (
        SELECT i2.id_a, i2.id_b
        FROM inter i2
        JOIN sizes na ON na.doc_id = i2.id_a
        JOIN sizes nb ON nb.doc_id = i2.id_b
        WHERE i2.i * 1.0 / (na.n + nb.n - i2.i) >= 0.6),
    copies AS (
        SELECT doc_id AS id_a, doc_id + 100000 AS id_b
        FROM documents WHERE doc_id < 100),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM near
        UNION SELECT id_b, id_a FROM near
        UNION SELECT id_a, id_b FROM copies
        UNION SELECT id_b, id_a FROM copies),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    reach AS (
        SELECT node, node AS root FROM nodes
        UNION
        SELECT e.v AS node, r.root FROM reach r JOIN edges e ON e.u = r.node),
    comp AS (
        SELECT node, MIN(root) AS component FROM reach GROUP BY node),
    csize AS (
        SELECT component, CAST(COUNT(*) AS BIGINT) AS size
        FROM comp GROUP BY component)
    SELECT size,
           CAST(COUNT(*) AS BIGINT) AS n_components,
           CAST(SUM(size) AS BIGINT) AS n_docs
    FROM csize
    GROUP BY size
    ORDER BY size
    """,
    tags=("llm", "dedup", "clustering", "profiling"),
)
def dedup_component_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup cluster-size histogram — the report read before a
    purge: how many pairs, how many long chains, whether one
    mega-cluster (a boilerplate template) dominates. Built by
    bucketing the connected-components output (same graph as
    dedup_connected_components: minhash ≥0.6 plus planted exact
    copies) by component size; two tiny aggregations on top of the
    bounded-round CC operator."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    near = D.near_dup_pairs_minhash(
        docs,
        num_hashes=NUM_HASHES,
        bands=BANDS,
        shingle_k=SHINGLE_K,
        threshold=0.6,
    ).select("id_a", "id_b")
    copies = docs.where(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 100000).alias("id_b")
    )
    cc = D.connected_components(near.unionByName(copies))
    csize = cc.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )
    return (
        csize.groupBy("size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_components"),
            F.sum("size").cast("long").alias("n_docs"),
        )
        .orderBy("size")
    )
