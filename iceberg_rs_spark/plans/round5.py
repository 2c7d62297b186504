"""Round-5 corpus additions (VERDICT r4 #7): hash-checked agreement
scalars for the two remaining ANN paths, so every approximate-retrieval
engine in the repo — LSH (sim_ann_agreement), IVF, and PQ — carries a
deterministic, driver-certifiable quality number next to its rows-only
top-k query.

The trick is the one sim_ann_agreement established: the oracle does not
try to "know" the approximate answer — it RERUNS the identical
deterministic pipeline in SQL. Both agreement queries pin the index
configuration to its seeds-only form (``lloyd_iters=0``): centroids /
codebooks are then a pure function of the portable h60 hash order,
which DuckDB can rebuild exactly, while the Spark side still exercises
the REAL operators (ivf_topk / pq_topk) end-to-end — seeding,
assignment, probing, ADC scoring, ranking. Lloyd refinement only moves
centroids; every mechanism the operators are made of is certified here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.functions.hashing import h60_sql
from iceberg_rs_spark.operators import similarity as S
from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import load_table

# ---------------------------------------------------------------------------
# Shared SQL fragments (DOUBLE[] columns, 64-dim)
# ---------------------------------------------------------------------------


def _dot(a: str, b: str) -> str:
    return f"list_sum([{a}[i] * {b}[i] for i in generate_series(1, 64)])"


def _nrm(a: str) -> str:
    return f"sqrt({_dot(a, a)})"


def _cos(a: str, b: str) -> str:
    return f"{_dot(a, b)} / ({_nrm(a)} * {_nrm(b)})"


_H60_VEC = h60_sql("CAST(vec_id AS VARCHAR)")

_EXACT_CTE = f"""
    base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv FROM base WHERE vec_id < 20),
    exact AS (
        SELECT qid, vec_id AS exact_id FROM (
            SELECT q.qid, base.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.qid
                       ORDER BY {_cos('q.qv', 'base.v')} DESC, base.vec_id) AS rn
            FROM base CROSS JOIN q WHERE base.vec_id != q.qid)
        WHERE rn = 1)"""

_AGREE_SELECT = f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN a.approx_id = x.exact_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_agree,
           {rhalf_sql(
               'SUM(CASE WHEN a.approx_id = x.exact_id THEN 1 ELSE 0 END)'
               ' * 1.0 / COUNT(*)', 4)} AS agreement
    FROM exact x LEFT JOIN approx a USING (qid)"""


def _agree_frame(exact: DataFrame, approx: DataFrame) -> DataFrame:
    agree = F.sum(
        F.when(F.col("approx_id") == F.col("exact_id"), 1).otherwise(0)
    ).cast("long")
    return exact.join(approx, "query_id", "left").agg(
        F.count("*").cast("long").alias("n_queries"),
        agree.alias("n_agree"),
        rhalf(agree * 1.0 / F.count("*"), 4).alias("agreement"),
    )


# ---------------------------------------------------------------------------
# IVF agreement: exact vs seeds-only inverted-file probe
# ---------------------------------------------------------------------------

#: Pinned so the static oracle rebuilds the identical index: 8 lists
#: seeded by the h60 hash-sample, 3 probed per query, no Lloyd refine.
IVF_AGREE_CENTROIDS, IVF_AGREE_PROBE = 8, 3


@query(
    "sim_ann_agreement_ivf",
    oracle=f"""
    WITH {_EXACT_CTE},
    seeds AS (
        SELECT ROW_NUMBER() OVER (ORDER BY {_H60_VEC}, vec_id) - 1 AS c,
               v AS cv
        FROM base
        ORDER BY {_H60_VEC}, vec_id
        LIMIT {IVF_AGREE_CENTROIDS}),
    asn AS (
        SELECT vec_id, c AS cid FROM (
            SELECT base.vec_id, s.c,
                   ROW_NUMBER() OVER (PARTITION BY base.vec_id
                       ORDER BY {_cos('base.v', 's.cv')} DESC, s.c) AS rn
            FROM base CROSS JOIN seeds s)
        WHERE rn = 1),
    probe AS (
        SELECT qid, c AS cid FROM (
            SELECT q.qid, s.c,
                   ROW_NUMBER() OVER (PARTITION BY q.qid
                       ORDER BY {_cos('q.qv', 's.cv')} DESC, s.c) AS rn
            FROM q CROSS JOIN seeds s)
        WHERE rn <= {IVF_AGREE_PROBE}),
    approx AS (
        SELECT qid, vec_id AS approx_id FROM (
            SELECT p.qid, e.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY p.qid
                       ORDER BY {_cos('q.qv', 'e.v')} DESC, e.vec_id) AS rn
            FROM asn a
            JOIN base e ON e.vec_id = a.vec_id
            JOIN probe p ON a.cid = p.cid
            JOIN q ON q.qid = p.qid
            WHERE e.vec_id != p.qid)
        WHERE rn = 1)
    {_AGREE_SELECT}
    """,
    tags=("llm", "similarity", "ivf", "quality"),
)
def sim_ann_agreement_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF quality as a HASH-CHECKED scalar: exact-vs-IVF top-1
    agreement over 20 queries, the sim_ann_agreement pattern applied
    to the inverted-file path. The Spark side runs the real
    operators/similarity.ivf_topk — h60 hash-sample seeding, numpy
    argmin assignment over the broadcast centroid matrix, 3-of-8 list
    probing, Arrow-cosine ranking — pinned to seeds-only
    (lloyd_iters=0) so the oracle can rebuild the identical centroids
    from the portable hash order and replay assignment, probing, and
    ranking in SQL. A deterministic certified quality number for the
    IVF scale path (its top-k query stays rows-only by the no-sketch-
    hash rule)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = S.brute_force_topk(emb, queries, k=1).select(
        "query_id", F.col("vec_id").alias("exact_id")
    )
    approx = S.ivf_topk(
        emb,
        queries,
        k=1,
        n_centroids=IVF_AGREE_CENTROIDS,
        n_probe=IVF_AGREE_PROBE,
        lloyd_iters=0,
    ).select("query_id", F.col("vec_id").alias("approx_id"))
    return _agree_frame(exact, approx)


# ---------------------------------------------------------------------------
# PQ agreement: exact vs seeds-only product-quantization ADC
# ---------------------------------------------------------------------------

#: Pinned PQ geometry: 16 sub-spaces x 16 codes over the unit-normalized
#: 64-dim vectors, codebooks = the 16 h60-lowest vectors' sub-vectors.
#: The readout is "exact top-1 found within ADC top-K" — the standard
#: nearest-neighbor recall@K for a compression index.
PQ_AGREE_M, PQ_AGREE_KSUB, PQ_AGREE_K = 16, 16, 5
_DSUB = 64 // PQ_AGREE_M

_UNIT = (
    "[v[i] / sqrt(list_sum([v[j] * v[j] for j in generate_series(1, 64)])) "
    "for i in generate_series(1, 64)]"
)

_SUBDIST = (
    "list_sum([(t.uv[j.j * {d} + w] - s.cv[j.j * {d} + w])"
    " * (t.uv[j.j * {d} + w] - s.cv[j.j * {d} + w])"
    " for w in generate_series(1, {d})])"
).format(d=_DSUB)


@query(
    "sim_ann_agreement_pq",
    oracle=f"""
    WITH {_EXACT_CTE},
    u AS (SELECT vec_id, {_UNIT} AS uv FROM base),
    seeds AS (
        SELECT ROW_NUMBER() OVER (ORDER BY {_H60_VEC}, vec_id) - 1 AS sc,
               uv AS cv
        FROM u
        ORDER BY {_H60_VEC}, vec_id
        LIMIT {PQ_AGREE_KSUB}),
    cells AS (
        SELECT t.vec_id, j.j, s.sc, {_SUBDIST} AS d
        FROM u t
        CROSS JOIN (SELECT unnest(generate_series(0, {PQ_AGREE_M - 1})) AS j) j
        CROSS JOIN seeds s),
    codes AS (
        SELECT vec_id, j, sc FROM (
            SELECT vec_id, j, sc,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, j
                       ORDER BY d, sc) AS rn
            FROM cells)
        WHERE rn = 1),
    adc AS (
        SELECT qc.vec_id AS qid, co.vec_id AS vid,
               list_sum(list(qc.d ORDER BY qc.j)) AS dist
        FROM codes co
        JOIN cells qc ON qc.j = co.j AND qc.sc = co.sc AND qc.vec_id < 20
        WHERE co.vec_id != qc.vec_id
        GROUP BY 1, 2),
    approx AS (
        SELECT qid, vid AS approx_id FROM (
            SELECT qid, vid,
                   ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY dist ASC, vid) AS rn
            FROM adc)
        WHERE rn <= {PQ_AGREE_K})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(COUNT(a.qid) AS BIGINT) AS n_agree,
           {rhalf_sql('COUNT(a.qid) * 1.0 / COUNT(*)', 4)} AS agreement
    FROM exact x
    LEFT JOIN approx a ON a.qid = x.qid AND a.approx_id = x.exact_id
    """,
    tags=("llm", "similarity", "pq", "quality"),
)
def sim_ann_agreement_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ quality as a HASH-CHECKED scalar: the fraction of 20 queries
    whose TRUE nearest neighbor appears in the PQ/ADC top-5 (the
    standard recall@K readout for a compression index; the isotropic
    fixture is PQ's worst case, so the absolute value is modest by
    construction — the contract is its determinism). The Spark side
    runs the real operators/similarity.pq_topk — Arrow
    unit-normalization, h60 hash-sample codebook seeding, numpy
    sub-space encoding, broadcast per-query LUT, JVM ADC fold —
    pinned to seeds-only codebooks (lloyd_iters=0) so the oracle
    rebuilds the identical codebook from the portable hash order and
    replays encoding and ADC ranking in SQL (the ADC sum re-folds in
    ascending sub-space order via list(d ORDER BY j), matching the
    JVM's unrolled fold). sim_pq_topk itself stays rows-only by
    rule."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = S.brute_force_topk(emb, queries, k=1).select(
        F.col("query_id").alias("qid"), F.col("vec_id").alias("exact_id")
    )
    approx = S.pq_topk(
        emb,
        queries,
        k=PQ_AGREE_K,
        m=PQ_AGREE_M,
        ksub=PQ_AGREE_KSUB,
        lloyd_iters=0,
    ).select("query_id", F.col("vec_id").alias("approx_id"))
    hit = exact.join(
        approx,
        (F.col("qid") == F.col("query_id"))
        & (F.col("approx_id") == F.col("exact_id")),
        "left",
    )
    return hit.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.count("approx_id").cast("long").alias("n_agree"),
        rhalf(F.count("approx_id") * 1.0 / F.count("*"), 4).alias("agreement"),
    )
