"""Round-4 corpus additions, batch 10: bucketed co-located joins,
MMR diversified re-ranking (cogrouped applyInPandas), a deterministic
count-min sketch, sparsified BFS hop distances, and robust MAD
anomaly detection.

The count-min sketch here is intentionally built from the portable
seeded hash (functions/hashing.py) instead of an engine sketch type,
which makes the estimate itself hash-checkable against DuckDB — the
answer to the determinism rule that keeps approx sketches rows-only.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.functions.hashing import h60_seeded, h60_seeded_sql
from iceberg_rs_spark.operators import similarity as S
from iceberg_rs_spark.operators import text as T
from iceberg_rs_spark.operators.graph import bfs_hops
from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.plans.llm import TOKENS_SQL
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

# ---------------------------------------------------------------------------
# Bucketed co-located join
# ---------------------------------------------------------------------------

BUCKETS = 8
_BUCKET_DIR = "/tmp/iceberg_rs_spark_bucketed"


@query(
    "join_bucketed_colocate",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("join", "bucketing", "layout"),
)
def join_bucketed_colocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free join via co-located bucketing: both sides are
    written bucketed by the join key into the catalog (8 buckets,
    sorted within buckets), so the subsequent join reads matching
    buckets pairwise with NO exchange on either side — the layout
    investment that, made once at ingest, removes the fact-table
    shuffle from every downstream join and aggregation on that key.
    At 100 TB this is the difference between re-shuffling terabytes
    per query and a scan-local merge; the same idea generalizes to
    the icelake bucket[n] partition transform for storage-partitioned
    joins. The query writes the bucketed tables (overwriting a fixed
    scratch location, so repeated runs stay bounded), joins through
    the catalog, and certifies the aggregate against a plain oracle
    join — proving layout changes never change answers."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_customer")
    (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .write.bucketBy(BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .option("path", f"{_BUCKET_DIR}/orders")
        .mode("overwrite")
        .saveAsTable("bkt_orders")
    )
    (
        customer.select("c_custkey", "c_mktsegment")
        .write.bucketBy(BUCKETS, "c_custkey")
        .sortBy("c_custkey")
        .option("path", f"{_BUCKET_DIR}/customer")
        .mode("overwrite")
        .saveAsTable("bkt_customer")
    )
    o = spark.table("bkt_orders")
    c = spark.table("bkt_customer")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(cents).cast("long").alias("revenue_cents"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# MMR diversified re-ranking (cogrouped applyInPandas)
# ---------------------------------------------------------------------------

MMR_QUERIES, MMR_CAND, MMR_K, MMR_LAMBDA = 3, 20, 5, 0.7

_V_DOT = (
    "list_sum([CAST({a}.v[i] * {b}.v[i] AS DOUBLE) "
    "for i in generate_series(1, 64)])"
)
_V_NRM = (
    "sqrt(list_sum([CAST({a}.v[i] * {a}.v[i] AS DOUBLE) "
    "for i in generate_series(1, 64)]))"
)


def _cos_sql(a: str, b: str) -> str:
    return (
        f"{_V_DOT.format(a=a, b=b)} / "
        f"({_V_NRM.format(a=a)} * {_V_NRM.format(a=b)})"
    )


def _mmr_oracle() -> str:
    lam, rest = MMR_LAMBDA, 1 - MMR_LAMBDA
    ctes = [
        """base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)""",
        f"""q AS (SELECT vec_id AS qid, v FROM base WHERE vec_id < {MMR_QUERIES})""",
        f"""scored AS (
        SELECT q.qid, e.vec_id, {_cos_sql('q', 'e')} AS rel
        FROM q JOIN base e ON e.vec_id != q.qid)""",
        f"""cand AS (
        SELECT qid, vec_id, rel FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY rel DESC, vec_id) AS r
            FROM scored)
        WHERE r <= {MMR_CAND})""",
        f"""sims AS (
        SELECT c1.qid, c1.vec_id AS a, c2.vec_id AS b,
               {_cos_sql('b1', 'b2')} AS sim
        FROM cand c1
        JOIN cand c2 ON c1.qid = c2.qid AND c1.vec_id != c2.vec_id
        JOIN base b1 ON b1.vec_id = c1.vec_id
        JOIN base b2 ON b2.vec_id = c2.vec_id)""",
        f"""p1 AS (
        SELECT qid, vec_id, {lam} * rel AS score,
               ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY rel DESC, vec_id) AS rn
        FROM cand)""",
        "sel1 AS (SELECT qid, vec_id FROM p1 WHERE rn = 1)",
    ]
    for i in range(2, MMR_K + 1):
        p = i - 1
        ctes.append(
            f"""sc{i} AS (
        SELECT c.qid, c.vec_id, {lam} * c.rel - {rest} * MAX(s.sim) AS score
        FROM cand c
        JOIN sims s ON s.qid = c.qid AND s.b = c.vec_id
        JOIN sel{p} x ON x.qid = s.qid AND x.vec_id = s.a
        WHERE NOT EXISTS (SELECT 1 FROM sel{p} z
                          WHERE z.qid = c.qid AND z.vec_id = c.vec_id)
        GROUP BY c.qid, c.vec_id, c.rel)"""
        )
        ctes.append(
            f"""p{i} AS (
        SELECT qid, vec_id, score,
               ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY score DESC, vec_id) AS rn
        FROM sc{i})"""
        )
        ctes.append(
            f"""sel{i} AS (
        SELECT qid, vec_id FROM sel{p}
        UNION ALL SELECT qid, vec_id FROM p{i} WHERE rn = 1)"""
        )
    picks = "\n        UNION ALL ".join(
        f"SELECT qid, {i} AS rank, vec_id, score FROM p{i} WHERE rn = 1"
        for i in range(1, MMR_K + 1)
    )
    return (
        "WITH " + ",\n    ".join(ctes) + f""",
    out AS (
        {picks})
    SELECT qid, CAST(rank AS INTEGER) AS rank, vec_id,
           {rhalf_sql('score', 6)} AS mmr_score
    FROM out
    ORDER BY qid, rank
    """
    )


def _mmr_greedy(cands, sims):
    """Greedy MMR over one query's candidate set (pandas cogroup)."""
    import pandas as pd

    if len(cands) == 0:
        return pd.DataFrame(
            {"qid": [], "rank": [], "vec_id": [], "mmr_score": []}
        )
    qid = int(cands["qid"].iloc[0])
    sim = {
        (int(a), int(b)): float(s)
        for a, b, s in zip(sims["a"], sims["b"], sims["sim"])
    }
    avail = {
        int(v): float(r) for v, r in zip(cands["vec_id"], cands["rel"])
    }
    selected: list[int] = []
    rows = []
    for rank in range(1, MMR_K + 1):
        best_vid, best_score = None, None
        for vid in sorted(avail):  # ascending id => ties keep smallest
            rel = avail[vid]
            if selected:
                mx = max(sim[(s, vid)] for s in selected)
                score = MMR_LAMBDA * rel - (1 - MMR_LAMBDA) * mx
            else:
                score = MMR_LAMBDA * rel
            if best_score is None or score > best_score:
                best_vid, best_score = vid, score
        rows.append(
            (
                qid,
                rank,
                best_vid,
                math.floor(best_score * 1e6 + 0.5) / 1e6,
            )
        )
        selected.append(best_vid)
        del avail[best_vid]
    return pd.DataFrame(rows, columns=["qid", "rank", "vec_id", "mmr_score"])


@query(
    "sim_mmr_rerank",
    oracle=_mmr_oracle(),
    tags=("llm", "similarity", "mmr", "cogroup"),
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein):
    from each query's cosine top-20, greedily pick 5 results that
    trade relevance against redundancy — score(c) = λ·rel(c) −
    (1−λ)·max_{s∈picked} sim(c,s), λ=0.7 — the standard diversifier
    between retrieval and a context window. Relevance and all
    candidate-pair similarities are computed JVM-side (zip_with fold,
    same element order as the oracle's list_sum, so doubles match
    bit-for-bit); only the tiny greedy selection over ≤20 candidates
    runs in Python, as a COGROUPED applyInPandas over (candidates,
    pair-sims) per query id — covering the cogroup UDF surface. The
    oracle unrolls all 5 greedy steps into CTEs. Per-query state is
    O(k·candidates) regardless of corpus size, so the Python stage
    stays constant-cost while candidate generation scales with the
    cluster."""
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = base.where(F.col("vec_id") < MMR_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    # exact (dimension-sequential) Arrow cosine — bit-identical to the
    # zip_with left fold / oracle list_sum, so the top-20 rank cut and
    # the greedy MMR ties are unchanged; the interpreted HOF fold cost
    # ~25µs/pair across |Q|×corpus pairs (guide §4.2, r14 batch 3).
    scored = q.join(base, F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        S.cosine_arrow_exact(F.col("qv"), F.col("v")).alias("rel"),
    )
    cand = (
        scored.withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("rel"), "vec_id")
            ),
        )
        .where(F.col("r") <= MMR_CAND)
        .select("qid", "vec_id", "rel")
    )
    cwv = cand.join(base, "vec_id")
    a = cwv.select(
        "qid", F.col("vec_id").alias("a"), F.col("v").alias("va")
    )
    b = cwv.select(
        F.col("qid").alias("qid_b"), F.col("vec_id").alias("b"), F.col("v").alias("vb")
    )
    sims = (
        a.join(b, F.col("qid") == F.col("qid_b"))
        .where(F.col("a") != F.col("b"))
        .select(
            "qid_b",
            "a",
            "b",
            S.cosine_arrow_exact(F.col("va"), F.col("vb")).alias("sim"),
        )
    )
    out = (
        cand.groupBy("qid")
        .cogroup(sims.groupBy("qid_b"))
        .applyInPandas(
            _mmr_greedy, "qid long, rank int, vec_id long, mmr_score double"
        )
    )
    return out.orderBy("qid", "rank")


# ---------------------------------------------------------------------------
# Deterministic count-min sketch over document tokens
# ---------------------------------------------------------------------------

CMS_D, CMS_W, CMS_TOP = 4, 512, 20


@query(
    "agg_countmin_heavy_terms",
    oracle=f"""
    WITH toks AS (
        SELECT unnest({TOKENS_SQL.format(c='text')}) AS term FROM documents),
    counts AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS true_n
        FROM toks WHERE term != '' GROUP BY term),
    cells AS (
        SELECT g.seed, {h60_seeded_sql('g.seed', 'term')} % {CMS_W} AS bucket,
               CAST(SUM(true_n) AS BIGINT) AS cell_n
        FROM counts CROSS JOIN generate_series(0, {CMS_D - 1}) AS g(seed)
        GROUP BY 1, 2),
    top AS (
        SELECT term, true_n FROM counts
        ORDER BY true_n DESC, term LIMIT {CMS_TOP}),
    est AS (
        SELECT t.term, t.true_n, MIN(c.cell_n) AS cms_est
        FROM top t
        CROSS JOIN generate_series(0, {CMS_D - 1}) AS g(seed)
        JOIN cells c ON c.seed = g.seed
                    AND c.bucket = {h60_seeded_sql('g.seed', 't.term')} % {CMS_W}
        GROUP BY 1, 2)
    SELECT term, true_n, CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - true_n AS BIGINT) AS overcount
    FROM est
    ORDER BY term
    """,
    tags=("aggregate", "sketch", "count-min"),
)
def agg_countmin_heavy_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch built from first principles: d=4 portable
    seeded hash rows × w=512 buckets, populated by one (seed, bucket)
    aggregation, then point-queried for the true top-20 tokens
    (estimate = min over rows; overcount = collision mass). Because
    the hash family is the engine-agnostic h60 — not an opaque sketch
    type — the ESTIMATES themselves hash-check against DuckDB, unlike
    the builtin approx sketches that the determinism rules keep
    rows-only. The sketch table is the mergeable scale structure: at
    100 TB each partition emits its d·w partial cells and a single
    2048-cell reduce merges them, never shuffling the token stream
    twice."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.tokens(F.col("text"))).alias("term")).where(
        F.col("term") != ""
    )
    counts = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("true_n")
    )
    seeds = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("seed")
    cells = (
        counts.select(seeds, "term", "true_n")
        .withColumn("bucket", h60_seeded(F.col("seed"), F.col("term")) % CMS_W)
        .groupBy("seed", "bucket")
        .agg(F.sum("true_n").cast("long").alias("cell_n"))
    )
    top = counts.orderBy(F.desc("true_n"), "term").limit(CMS_TOP)
    est = (
        top.select(seeds, "term", "true_n")
        .withColumn("bucket", h60_seeded(F.col("seed"), F.col("term")) % CMS_W)
        .join(cells, ["seed", "bucket"])
        .groupBy("term", "true_n")
        .agg(F.min("cell_n").alias("cms_est"))
    )
    return est.select(
        "term",
        "true_n",
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("true_n")).cast("long").alias("overcount"),
    ).orderBy("term")


# ---------------------------------------------------------------------------
# BFS hop distances over the sparsified trade graph
# ---------------------------------------------------------------------------

BFS_SOURCE, BFS_ROUNDS, BFS_TOPK = 0, 4, 3

_CENTS_SQL = "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"


def _bfs_oracle() -> str:
    ctes = [
        f"""dir_edges AS (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
               CAST(SUM({_CENTS_SQL}) AS DOUBLE) AS w
        FROM lineitem
        JOIN orders     ON l_orderkey = o_orderkey
        JOIN customer c ON o_custkey = c.c_custkey
        JOIN supplier s ON l_suppkey = s.s_suppkey
        GROUP BY 1, 2)""",
        """und AS (
        SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, SUM(w) AS w
        FROM dir_edges WHERE src != dst GROUP BY 1, 2)""",
        """sym AS (
        SELECT a AS src, b AS dst, w FROM und
        UNION ALL SELECT b, a, w FROM und)""",
        f"""top3 AS (
        SELECT src, dst FROM (
            SELECT src, dst, ROW_NUMBER() OVER (
                PARTITION BY src ORDER BY w DESC, dst) AS rn
            FROM sym)
        WHERE rn <= {BFS_TOPK})""",
        f"d0 AS (SELECT CAST({BFS_SOURCE} AS BIGINT) AS node, 0 AS hops)",
    ]
    for i in range(1, BFS_ROUNDS + 1):
        p = i - 1
        ctes.append(
            f"""n{i} AS (
        SELECT e.dst AS node, MIN(d.hops) + 1 AS hops
        FROM top3 e JOIN d{p} d ON e.src = d.node GROUP BY e.dst)"""
        )
        ctes.append(
            f"""d{i} AS (
        SELECT node, MIN(hops) AS hops
        FROM (SELECT * FROM d{p} UNION ALL SELECT * FROM n{i})
        GROUP BY node)"""
        )
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT n_name, CAST(hops AS INTEGER) AS hops
    FROM d{BFS_ROUNDS} JOIN nation ON node = n_nationkey
    ORDER BY n_name
    """
    )


@query(
    "graph_bfs_shortest_hops",
    oracle=_bfs_oracle(),
    tags=("graph", "iterative", "bfs"),
)
def graph_bfs_shortest_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-hop distances from nation 0 over the trade graph
    sparsified to each nation's 3 heaviest trade partners (the
    sparsification makes hop structure non-trivial — the full graph is
    near-complete). Four synchronous BFS relaxations, unrolled in the
    oracle; nations unreachable within 4 hops are excluded on both
    sides. The distributed operator (operators/graph.py:bfs_hops) is
    one join + one groupBy-min per round with barriered lineage, the
    same bounded-round pattern as connected components — frontier
    size never touches the driver."""
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
        .where(F.col("rn") <= BFS_TOPK)
        .select("src", "dst")
    )
    dist = bfs_hops(top3, source=BFS_SOURCE, rounds=BFS_ROUNDS)
    return (
        dist.join(n, dist["node"] == n["n_nationkey"])
        .select("n_name", F.col("hops").cast("int").alias("hops"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Robust anomaly detection: median absolute deviation
# ---------------------------------------------------------------------------

MAD_Z_THRESHOLD = 2.5


@query(
    "ts_anomaly_robust_mad",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS DOUBLE) AS cnt
        FROM evt GROUP BY 1, 2),
    med AS (
        SELECT event_type, quantile_cont(cnt, 0.5) AS med
        FROM daily GROUP BY event_type),
    dev AS (
        SELECT d.event_type, d.day, d.cnt, m.med, ABS(d.cnt - m.med) AS adev
        FROM daily d JOIN med m USING (event_type)),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type)
    SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
           CAST(d.cnt AS BIGINT) AS cnt,
           {rhalf_sql('d.med', 6)} AS med, {rhalf_sql('m.mad', 6)} AS mad,
           {rhalf_sql('CASE WHEN m.mad > 0 '
                      'THEN 0.6745 * (d.cnt - d.med) / m.mad ELSE 0 END', 6)}
               AS robust_z,
           CAST(CASE WHEN m.mad > 0 AND
                ABS(0.6745 * (d.cnt - d.med) / m.mad) > {MAD_Z_THRESHOLD}
                THEN 1 ELSE 0 END AS INTEGER) AS is_outlier
    FROM dev d JOIN mad m USING (event_type)
    ORDER BY event_type, day
    """,
    tags=("timeseries", "anomaly", "robust-stats"),
)
def ts_anomaly_robust_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly control chart: per-type daily volumes scored by
    the modified z-score 0.6745·(x−median)/MAD (Iglewicz–Hoaglin) —
    the robust counterpart of the mean/σ chart in
    events_anomaly_daily_zscore, immune to the very outliers it
    hunts. Exact interpolated medians on both engines (Spark
    percentile ≡ DuckDB quantile_cont); two grouped medians and two
    small joins over the per-day rollup, which is already thousands
    of times smaller than the raw events at any scale."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(cnt, 0.5)").alias("med")
    )
    dev = daily.join(med, "event_type").withColumn(
        "adev", F.abs(F.col("cnt") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    rz_raw = 0.6745 * (F.col("cnt") - F.col("med")) / F.col("mad")
    rz = F.when(F.col("mad") > 0, rz_raw).otherwise(F.lit(0.0))
    return (
        dev.join(mad, "event_type")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("cnt").cast("long").alias("cnt"),
            rhalf(F.col("med"), 6).alias("med"),
            rhalf(F.col("mad"), 6).alias("mad"),
            rhalf(rz, 6).alias("robust_z"),
            F.when(
                (F.col("mad") > 0) & (F.abs(rz_raw) > MAD_Z_THRESHOLD), 1
            )
            .otherwise(0)
            .cast("int")
            .alias("is_outlier"),
        )
        .orderBy("event_type", "day")
    )
