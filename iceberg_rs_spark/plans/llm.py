"""LLM-pipeline corpus (SURVEY.md §2C north-star): the dedup family,
similarity search, text analysis, and multimodal plumbing — each as a
hash-checked query wherever the semantics are SQL-expressible.

The oracle SQL is *generated* from the same constants (hash scheme,
shingle size, band layout, stopword/marker lists) the Spark operators
use, so the two sides cannot drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.functions.hashing import h60, h60_seeded_sql, h60_sql
from iceberg_rs_spark.operators import dedup as D
from iceberg_rs_spark.operators import multimodal as M
from iceberg_rs_spark.operators import packing as P
from iceberg_rs_spark.operators import similarity as S
from iceberg_rs_spark.operators import text as T
from iceberg_rs_spark.operators.skew import spread_by_range
from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import load_table

#: DuckDB equivalent of operators.text.normalize(text)
NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
)
TOKENS_SQL = f"string_split({NORM_SQL.format(c='{c}')}, ' ')"
#: word 3-grams of the normalized text (k=3, matching operators.text.shingles)
SHINGLES_SQL = (
    "[array_to_string(list_slice(w, i, i + 2), ' ') "
    "for i in generate_series(1, len(w) - 2)]"
)

NUM_HASHES, BANDS, ROWS_PER_BAND, SHINGLE_K = 12, 4, 3, 3


@query(
    "dedup_exact_content_hash",
    oracle=f"""
    WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 100),
    hashed AS (
        SELECT doc_id, {h60_sql(NORM_SQL.format(c='text'))} AS h FROM all_docs)
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM hashed GROUP BY h
    ORDER BY doc_id
    """,
    tags=("llm", "dedup", "exact"),
)
def dedup_exact_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-content hash. The fixture has no
    literal duplicates, so the query re-appends the first 100 docs
    under shifted ids — the dedup keeps each cluster's minimum id.
    One hash-shuffle; survivor choice is deterministic (min id)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = docs.where(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    all_docs = docs.unionByName(dupes)
    h = D.content_hash(F.col("text"))
    return (
        all_docs.select("doc_id", h.alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id")
    )


def _minhash_sig_sql(text_expr: str) -> str:
    """DuckDB: the 12-element minhash signature as a list expression."""
    shingle_hash = h60_seeded_sql("i", "s")
    return (
        f"[list_min([{shingle_hash} for s in sh]) "
        f"for i in generate_series(0, {NUM_HASHES - 1})]"
    )


#: Shared CTE prefix: normalized shingles → minhash signatures → LSH
#: band candidates → exact intersection counts. Used by the pair query
#: and the connected-components query.
_MINHASH_CTES = f"""docs AS (
        SELECT doc_id, {TOKENS_SQL.format(c='text')} AS w FROM documents),
    sh_tbl AS (
        SELECT doc_id, {SHINGLES_SQL} AS sh FROM docs),
    sigs AS (
        SELECT doc_id, {_minhash_sig_sql('text')} AS sig FROM sh_tbl WHERE len(sh) > 0),
    bands AS (
        SELECT doc_id, b AS band_idx,
               md5(array_to_string(list_slice(sig, b * {ROWS_PER_BAND} + 1,
                                              b * {ROWS_PER_BAND} + {ROWS_PER_BAND}), ','))
                   AS band_sig
        FROM sigs, unnest(generate_series(0, {BANDS - 1})) AS t(b)),
    cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
         AND a.doc_id < b.doc_id),
    shingle_rows AS (
        SELECT doc_id, unnest(list_distinct(sh)) AS s FROM sh_tbl),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingle_rows GROUP BY doc_id),
    inter AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS i
        FROM cands c
        JOIN shingle_rows sa ON sa.doc_id = c.id_a
        JOIN shingle_rows sb ON sb.doc_id = c.id_b AND sb.s = sa.s
        GROUP BY c.id_a, c.id_b)"""


@query(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    WITH {_MINHASH_CTES}
    SELECT i2.id_a, i2.id_b,
           {rhalf_sql('i2.i * 1.0 / (na.n + nb.n - i2.i)', 4)} AS jaccard
    FROM inter i2
    JOIN sizes na ON na.doc_id = i2.id_a
    JOIN sizes nb ON nb.doc_id = i2.id_b
    WHERE i2.i * 1.0 / (na.n + nb.n - i2.i) >= 0.6
    ORDER BY id_a, id_b
    """,
    tags=("llm", "dedup", "minhash", "lsh"),
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(12) + LSH(4 bands × 3 rows) candidates, exact-Jaccard
    verified at ≥0.6. The oracle rebuilds the identical signature from
    the shared portable hash, so even the LSH bucketing hash-matches."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.near_dup_pairs_minhash(
        docs,
        num_hashes=NUM_HASHES,
        bands=BANDS,
        shingle_k=SHINGLE_K,
        threshold=0.6,
    )
    return pairs.select(
        "id_a", "id_b", rhalf(F.col("jaccard"), 4).alias("jaccard")
    ).orderBy("id_a", "id_b")


@query(
    "dedup_connected_components",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_CTES.replace("FROM documents", "FROM documents WHERE doc_id < 300", 1)},
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
        SELECT e.v AS node, r.root FROM reach r JOIN edges e ON e.u = r.node)
    SELECT node AS doc_id, CAST(MIN(root) AS BIGINT) AS component_id
    FROM reach GROUP BY node
    ORDER BY doc_id
    """,
    tags=("llm", "dedup", "clustering", "iterative"),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering: the near-dup pair graph (minhash
    ≥0.6) UNIONed with exact-copy edges (the first 100 docs re-appended
    under shifted ids, as in dedup_exact_content_hash) forms chains like
    copy—original—near-dup—copy; every member must collapse to its
    component's minimum id. Spark runs alternating large-star/small-star
    (O(log n) bounded-shuffle rounds — operators/dedup.py); the oracle
    recomputes the same components by recursive-CTE reachability. An
    ITERATIVE algorithm with a full hash-checked oracle row. The graph
    is bounded to the 300-doc window (like the ngram baseline) — wide
    enough for the sf0.01 planted chains; the operator itself is
    unbounded."""
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
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("component_id")
    ).orderBy("doc_id")


@query(
    "dedup_simhash_fingerprints",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, {TOKENS_SQL.format(c='text')} AS w
        FROM documents WHERE doc_id < 100)
    SELECT doc_id,
           CAST(list_sum([
               CASE WHEN list_sum([(({h60_sql('t')} >> b) & 1) * 2 - 1 for t in w]) > 0
                    THEN (CAST(1 AS BIGINT) << b) ELSE 0 END
               for b in generate_series(0, {D.SIMHASH_BITS - 1})]) AS BIGINT) AS fp
    FROM docs
    ORDER BY doc_id
    """,
    tags=("llm", "dedup", "simhash"),
)
def dedup_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash fingerprints (sign-sum over token hashes) —
    bit-identical across engines via the portable hash."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return docs.select("doc_id", D.simhash(F.col("text")).alias("fp")).orderBy("doc_id")


@query(
    "dedup_simhash_near_pairs",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, {TOKENS_SQL.format(c='text')} AS w FROM documents),
    fps AS (
        SELECT doc_id,
               list_sum([
                   CASE WHEN list_sum([(({h60_sql('t')} >> b) & 1) * 2 - 1 for t in w]) > 0
                        THEN (CAST(1 AS BIGINT) << b) ELSE 0 END
                   for b in generate_series(0, {D.SIMHASH_BITS - 1})]) AS fp
        FROM docs)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.fp, b.fp)) AS hamming
    FROM fps a JOIN fps b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= 3
    ORDER BY id_a, id_b
    """,
    tags=("llm", "dedup", "simhash"),
)
def dedup_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3) via the 4-chunk pigeonhole
    bucket join — complete for distance ≤ 3 by construction, so it
    matches the oracle's brute-force O(n²) scan without being one."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_near_dup_pairs(docs, max_hamming=3).orderBy("id_a", "id_b")


@query(
    "dedup_ngram_jaccard_matrix",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, {TOKENS_SQL.format(c='text')} AS w
        FROM documents WHERE doc_id < 300),
    sh_tbl AS (SELECT doc_id, {SHINGLES_SQL} AS sh FROM docs),
    shingle_rows AS (SELECT doc_id, unnest(list_distinct(sh)) AS s FROM sh_tbl),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingle_rows GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM docs a JOIN docs b ON a.doc_id < b.doc_id),
    inter AS (
        SELECT p.id_a, p.id_b, COUNT(*) AS i
        FROM pairs p
        JOIN shingle_rows sa ON sa.doc_id = p.id_a
        JOIN shingle_rows sb ON sb.doc_id = p.id_b AND sb.s = sa.s
        GROUP BY p.id_a, p.id_b)
    SELECT i2.id_a, i2.id_b,
           {rhalf_sql('i2.i * 1.0 / (na.n + nb.n - i2.i)', 4)} AS jaccard
    FROM inter i2
    JOIN sizes na ON na.doc_id = i2.id_a
    JOIN sizes nb ON nb.doc_id = i2.id_b
    WHERE i2.i * 1.0 / (na.n + nb.n - i2.i) >= 0.2
    ORDER BY id_a, id_b
    """,
    tags=("llm", "dedup", "jaccard"),
)
def dedup_ngram_jaccard_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard over an explicit pair set (all pairs of the
    first 300 docs) — the LSH-free baseline the LSH variant is recalled
    against. The window is wide enough that the sf0.01 fixture's planted
    near-dups (e.g. 8↔245) land inside it, so the driver row certifies
    the Jaccard arithmetic on a non-empty result; it stays a fixed-size
    window regardless of sf, so the declared all-pairs baseline never
    scales with the corpus."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    ids = docs.select("doc_id")
    pairs = (
        ids.alias("a")
        .join(ids.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    jac = D.jaccard_pairs(docs, pairs, shingle_k=SHINGLE_K)
    return (
        jac.where(F.col("jaccard") >= 0.2)
        .select("id_a", "id_b", rhalf(F.col("jaccard"), 4).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


_DOT_SQL = "list_sum([qa[i] * ea[i] for i in generate_series(1, 64)])"
_NORM_A = "sqrt(list_sum([qa[i] * qa[i] for i in generate_series(1, 64)]))"
_NORM_B = "sqrt(list_sum([ea[i] * ea[i] for i in generate_series(1, 64)]))"


@query(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ea FROM embeddings),
    q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qa
        FROM embeddings WHERE vec_id < 5),
    scored AS (
        SELECT q.query_id, e.vec_id,
               {_DOT_SQL} / ({_NORM_A} * {_NORM_B}) AS cos
        FROM e CROSS JOIN q
        WHERE e.vec_id != q.query_id)
    SELECT query_id, vec_id, {rhalf_sql('cos', 4)} AS cos,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= 5
    ORDER BY query_id, rank
    """,
    tags=("llm", "similarity", "topk"),
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 5 query vectors: broadcast the query set,
    scan the embedding table once map-side, per-query TakeOrdered.
    Sequential left-fold dot product matches the oracle bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    topk = S.brute_force_topk(emb, queries, k=5)
    return topk.select(
        "query_id", "vec_id", rhalf(F.col("cos"), 4).alias("cos"), "rank"
    ).orderBy("query_id", "rank")


def _lsh_bucket_sql(num_planes: int = 4, dim: int = 64, col: str = "ea") -> str:
    """DuckDB expression for the random-hyperplane sign bucket of a
    DOUBLE[] column ``col`` — built from the *same* deterministic
    md5-derived plane constants the Spark operator uses, so the two
    engines bucket identically."""
    terms = []
    for i in range(num_planes):
        lits = ", ".join(repr(x) for x in S._hyperplane(dim, i))
        proj = f"list_sum([{col}[i] * ([{lits}])[i] for i in generate_series(1, {dim})])"
        terms.append(f"CASE WHEN {proj} > 0 THEN {1 << i} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


#: sim_topk_lsh's pinned index geometry: 2 hyperplanes, Hamming-1
#: multi-probe => XOR masks {0 (own bucket), 1, 2 (one sign flip)}.
_TOPK_LSH_PLANES = 2
_TOPK_LSH_MASKS = "[0, 1, 2]"


@query(
    "sim_topk_lsh",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ea FROM embeddings),
    b AS (
        SELECT vec_id, ea, {_lsh_bucket_sql(_TOPK_LSH_PLANES)} AS bucket FROM e),
    q AS (
        SELECT vec_id AS query_id, ea AS qa, bucket AS qbucket
        FROM b WHERE vec_id < 5),
    probes AS (
        SELECT query_id, qa, xor(qbucket, m.m) AS pb
        FROM q, (SELECT unnest({_TOPK_LSH_MASKS}) AS m) m),
    scored AS (
        SELECT p.query_id, b.vec_id,
               list_sum([p.qa[i] * b.ea[i] for i in generate_series(1, 64)])
               / (sqrt(list_sum([p.qa[i] * p.qa[i] for i in generate_series(1, 64)]))
                  * sqrt(list_sum([b.ea[i] * b.ea[i] for i in generate_series(1, 64)]))) AS cos
        FROM b JOIN probes p ON b.bucket = p.pb
        WHERE b.vec_id != p.query_id)
    SELECT query_id, vec_id, {rhalf_sql('cos', 4)} AS cos,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= 5
    ORDER BY query_id, rank
    """,
    tags=("llm", "similarity", "lsh", "approx"),
)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane LSH buckets with
    Hamming-1 multi-probe (the 100 TB path: each query probes
    (1+planes)/2^planes of the data). HASH-CHECKED since r6: the index
    has no training step — md5-derived plane constants, sign
    bucketing, XOR multi-probe, JVM left-fold cosine — so the oracle
    replays the identical pipeline in SQL (the sim_ann_agreement
    pattern at k=5 instead of a top-1 agreement scalar). Every pair
    meets under exactly ONE probe mask (the mask is the XOR of the two
    buckets), so neither engine needs a distinct. Recall bars (incl.
    ≥0.8 on planted near-dups) remain asserted against brute force in
    tests/test_operators.py; the ranking cut itself is certified here.
    Sibling queries sim_topk_ivf / sim_pq_topk are hash-checked the
    same way since r7, pinned to their seeds-only (lloyd_iters=0)
    index form."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    topk = S.lsh_topk(emb, queries, k=5, num_planes=_TOPK_LSH_PLANES)
    return topk.select(
        "query_id", "vec_id", rhalf(F.col("cos"), 4).alias("cos"), "rank"
    ).orderBy("query_id", "rank")


#: sim_topk_ivf's pinned index geometry (must match the oracle below):
#: 16 seeds-only lists (lloyd_iters=0 — centroids are a pure function
#: of the portable h60 hash order), 6 probed per query.
_TOPK_IVF_CENTROIDS, _TOPK_IVF_PROBE = 16, 6


def _cosq(a: str, b: str) -> str:
    """DuckDB left-fold cosine of two DOUBLE[] columns — the same
    sequential IEEE additions as the JVM fold / numpy per-dim loop."""
    dot = f"list_sum([{a}[i] * {b}[i] for i in generate_series(1, 64)])"
    na = f"sqrt(list_sum([{a}[i] * {a}[i] for i in generate_series(1, 64)]))"
    nb = f"sqrt(list_sum([{b}[i] * {b}[i] for i in generate_series(1, 64)]))"
    return f"{dot} / ({na} * {nb})"


@query(
    "sim_topk_ivf",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv FROM base WHERE vec_id < 5),
    seeds AS (
        SELECT ROW_NUMBER() OVER (ORDER BY {h60_sql('CAST(vec_id AS VARCHAR)')}, vec_id) - 1 AS c,
               v AS cv
        FROM base
        ORDER BY {h60_sql('CAST(vec_id AS VARCHAR)')}, vec_id
        LIMIT {_TOPK_IVF_CENTROIDS}),
    asn AS (
        SELECT vec_id, c AS cid FROM (
            SELECT base.vec_id, s.c,
                   ROW_NUMBER() OVER (PARTITION BY base.vec_id
                       ORDER BY {_cosq('base.v', 's.cv')} DESC, s.c) AS rn
            FROM base CROSS JOIN seeds s)
        WHERE rn = 1),
    probe AS (
        SELECT qid, c AS cid FROM (
            SELECT q.qid, s.c,
                   ROW_NUMBER() OVER (PARTITION BY q.qid
                       ORDER BY {_cosq('q.qv', 's.cv')} DESC, s.c) AS rn
            FROM q CROSS JOIN seeds s)
        WHERE rn <= {_TOPK_IVF_PROBE}),
    scored AS (
        SELECT p.qid AS query_id, e.vec_id, {_cosq('q.qv', 'e.v')} AS cos
        FROM asn a
        JOIN base e ON e.vec_id = a.vec_id
        JOIN probe p ON a.cid = p.cid
        JOIN q ON q.qid = p.qid
        WHERE e.vec_id != p.qid)
    SELECT query_id, vec_id, {rhalf_sql('cos', 4)} AS cos,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= 5
    ORDER BY query_id, rank
    """,
    tags=("llm", "similarity", "ivf", "approx"),
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via an IVF inverted-file index (the second
    classic ANN scale path next to LSH): broadcast-argmin centroid
    assignment, each query probes only its n_probe nearest lists —
    n_probe/n_centroids of the data scanned. HASH-CHECKED since r7
    (VERDICT r6 ask #5), pinned to seeds-only centroids
    (lloyd_iters=0): the index is then a pure function of the portable
    h60 hash order, so the oracle rebuilds the identical 16 centroids
    and replays assignment, 6-list probing, and the exact-cosine rank
    cut in SQL — the sim_ann_agreement_ivf replay extended from a
    top-1 agreement scalar to the full top-k table. Every mechanism of
    operators/similarity.ivf_topk (h60 seeding, fold-order-matched
    numpy assignment, broadcast probe fan-out, dimension-sequential
    Arrow cosine) runs for real on the Spark side; Lloyd refinement
    only moves centroids and keeps its recall bars in
    tests/test_operators.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    topk = S.ivf_topk(
        emb,
        queries,
        k=5,
        n_centroids=_TOPK_IVF_CENTROIDS,
        n_probe=_TOPK_IVF_PROBE,
        lloyd_iters=0,
    )
    return topk.select(
        "query_id", "vec_id", rhalf(F.col("cos"), 4).alias("cos"), "rank"
    ).orderBy("query_id", "rank")


_AGREE_PLANES = 2  # pinned so the oracle rebuilds the identical buckets
_AGREE_MASKS = "[0, 1, 2]"  # own bucket + Hamming-1 neighbors at 2 planes


@query(
    "sim_ann_agreement",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ea FROM embeddings),
    b AS (
        SELECT vec_id, ea, {_lsh_bucket_sql(_AGREE_PLANES)} AS bucket FROM e),
    q AS (
        SELECT vec_id AS query_id, ea AS qa, bucket AS qbucket
        FROM b WHERE vec_id < 20),
    exact AS (
        SELECT query_id, vec_id AS exact_id FROM (
            SELECT q.query_id, e.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {_DOT_SQL} / ({_NORM_A} * {_NORM_B}) DESC, e.vec_id
                   ) AS rn
            FROM e CROSS JOIN q WHERE e.vec_id != q.query_id)
        WHERE rn = 1),
    probes AS (
        SELECT query_id, qa, xor(qbucket, m.m) AS pb
        FROM q, (SELECT unnest({_AGREE_MASKS}) AS m) m),
    lsh AS (
        SELECT query_id, vec_id AS lsh_id FROM (
            SELECT p.query_id, b.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.query_id
                       ORDER BY {_DOT_SQL.replace('ea', 'b.ea').replace('qa', 'p.qa')}
                                / ({_NORM_A.replace('qa', 'p.qa')}
                                   * {_NORM_B.replace('ea', 'b.ea')}) DESC, b.vec_id
                   ) AS rn
            FROM b JOIN probes p ON b.bucket = p.pb
            WHERE b.vec_id != p.query_id)
        WHERE rn = 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN l.lsh_id = x.exact_id THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree,
           {rhalf_sql('SUM(CASE WHEN l.lsh_id = x.exact_id THEN 1 ELSE 0 END) * 1.0 / COUNT(*)', 4)}
               AS agreement
    FROM exact x LEFT JOIN lsh l USING (query_id)
    """,
    tags=("llm", "similarity", "lsh", "quality"),
)
def sim_ann_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality as a HASH-CHECKED scalar: exact-vs-LSH top-1
    agreement over 20 queries. Both engines run the same deterministic
    pipeline — md5-derived hyperplanes, Hamming-1 multi-probe, JVM
    left-fold cosine (bit-identical to DuckDB's list_sum fold) — so
    unlike the rows-only recall pytest bars, the driver certifies the
    approximate path end-to-end: bucketing, probing, and ranking."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = S.brute_force_topk(emb, queries, k=1).select(
        "query_id", F.col("vec_id").alias("exact_id")
    )
    approx = S.lsh_topk(
        emb, queries, k=1, num_planes=_AGREE_PLANES, probe_hamming=1
    ).select("query_id", F.col("vec_id").alias("lsh_id"))
    agree = F.sum(
        F.when(F.col("lsh_id") == F.col("exact_id"), 1).otherwise(0)
    ).cast("long")
    return exact.join(approx, "query_id", "left").agg(
        F.count("*").cast("long").alias("n_queries"),
        agree.alias("n_agree"),
        rhalf(agree * 1.0 / F.count("*"), 4).alias("agreement"),
    )


@query(
    "sim_embedding_high_pairs",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ea FROM embeddings),
    b AS (
        SELECT vec_id, ea, {_lsh_bucket_sql()} AS bucket FROM e)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {rhalf_sql(
               "list_sum([a.ea[i] * b.ea[i] for i in generate_series(1, 64)])"
               " / (sqrt(list_sum([a.ea[i] * a.ea[i] for i in generate_series(1, 64)]))"
               " * sqrt(list_sum([b.ea[i] * b.ea[i] for i in generate_series(1, 64)])))",
               4,
           )} AS cos
    FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_sum([a.ea[i] * b.ea[i] for i in generate_series(1, 64)])
          / (sqrt(list_sum([a.ea[i] * a.ea[i] for i in generate_series(1, 64)]))
             * sqrt(list_sum([b.ea[i] * b.ea[i] for i in generate_series(1, 64)]))) >= 0.35
    ORDER BY id_a, id_b
    """,
    tags=("llm", "similarity", "near-dup"),
)
def sim_embedding_high_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup shape: cosine ≥ τ within an LSH sign-bucket
    block — the blocking key that survives 100 TB (bucket count grows
    2^planes; no value-skew hot spot, unlike a label column). The
    fixture has no planted duplicates, so τ=0.35 surfaces the
    high-similarity tail; the operator is the same one that finds true
    near-dups at τ≈0.98. The oracle rebuilds the identical bucket from
    the shared deterministic hyperplanes."""
    emb = load_table(spark, sf_dir, "embeddings")
    # num_planes pinned (not auto-derived) so the static oracle SQL
    # rebuilds the identical bucket fn for the hash check; production
    # callers omit it and get the corpus-size-scaled default.
    pairs = S.embedding_near_dup_pairs(emb, threshold=0.35, num_planes=4)
    return pairs.select(
        "id_a", "id_b", rhalf(F.col("cos"), 4).alias("cos")
    ).orderBy("id_a", "id_b")


_STOP_LIST = "[" + ", ".join(f"'{w}'" for w in T.STOPWORDS) + "]"


@query(
    "text_stats_profile",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, text, {TOKENS_SQL.format(c='text')} AS w FROM documents)
    SELECT doc_id,
           CASE WHEN length({NORM_SQL.format(c='text')}) = 0 THEN 0 ELSE len(w) END AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           {rhalf_sql('list_sum([length(t) for t in w]) * 1.0 / len(w)', 4)} AS avg_word_len,
           {rhalf_sql(f'len([t for t in w if list_contains({_STOP_LIST}, t)]) * 1.0 / len(w)', 4)} AS stopword_ratio,
           {rhalf_sql(
               "length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) * 1.0 / length(text)", 4
           )} AS punct_ratio,
           {h60_sql(NORM_SQL.format(c='text'))} AS fingerprint
    FROM docs
    ORDER BY doc_id
    """,
    tags=("llm", "text", "stats"),
)
def text_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text metrics: token count, char count, average word
    length, stopword ratio, punctuation ratio, content fingerprint —
    all JVM-side column expressions (operators/text.py).

    r14 shape (guide §4.1/§2.5): normalization is staged ONCE as a
    column instead of re-derived per metric, and the narrow scan is
    range-partitioned by the output order BEFORE the heavy projection
    (single-file scan = one partition; a terminal orderBy would also
    re-evaluate the projection in its range-sampling pass), finished
    with sortWithinPartitions — the identical total order, one
    evaluation. Measured 2.0-2.2 s → ~0.8 s at sf0.1."""
    docs = spread_by_range(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    c = F.col("text")
    staged = docs.select(
        "doc_id", c.alias("text"), T.normalize(c).alias("_norm")
    ).withColumn("_w", F.split(F.col("_norm"), " "))
    w = F.col("_w")
    return staged.select(
        "doc_id",
        F.when(F.length("_norm") == 0, F.lit(0))
        .otherwise(F.size(w))
        .cast("long")
        .alias("n_tokens"),
        F.length(c).cast("long").alias("n_chars_actual"),
        rhalf(T.avg_word_len_from_tokens(w), 4).alias("avg_word_len"),
        rhalf(T.stopword_ratio_from_tokens(w), 4).alias("stopword_ratio"),
        rhalf(T.punct_ratio(c), 4).alias("punct_ratio"),
        h60(F.col("_norm")).alias("fingerprint"),
    ).sortWithinPartitions("doc_id")


#: domain "language" marker sets drawn from the fixture vocabulary so
#: the rule-based language-ID heuristic produces varied output
DOMAIN_MARKERS = {
    "sql": ("table", "join", "query", "filter"),
    "spark": ("spark", "batch", "stream", "shuffle"),
    "data": ("data", "row", "column", "value"),
    "ops": ("sort", "merge", "hash", "scan"),
}


@query(
    "text_language_id",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, {TOKENS_SQL.format(c='text')} AS w FROM documents),
    scored AS (
        SELECT doc_id,
               len([t for t in w if list_contains(['table','join','query','filter'], t)]) AS s_sql,
               len([t for t in w if list_contains(['spark','batch','stream','shuffle'], t)]) AS s_spark,
               len([t for t in w if list_contains(['data','row','column','value'], t)]) AS s_data,
               len([t for t in w if list_contains(['sort','merge','hash','scan'], t)]) AS s_ops
        FROM docs)
    SELECT doc_id,
           CASE WHEN greatest(s_sql, s_spark, s_data, s_ops) <= 0 THEN 'und'
                WHEN s_sql = greatest(s_sql, s_spark, s_data, s_ops) THEN 'sql'
                WHEN s_spark = greatest(s_sql, s_spark, s_data, s_ops) THEN 'spark'
                WHEN s_data = greatest(s_sql, s_spark, s_data, s_ops) THEN 'data'
                ELSE 'ops' END AS guessed
    FROM scored
    ORDER BY doc_id
    """,
    tags=("llm", "text", "language-id"),
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic (n-gram scoring with a
    deterministic argmax). Marker sets are drawn from the fixture's
    vocabulary so the classifier exercises all branches."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", T.tokens(F.col("text")).alias("_w"))
    return toks.select(
        "doc_id",
        T.detect_language_from_tokens(F.col("_w"), DOMAIN_MARKERS).alias("guessed"),
    ).orderBy("doc_id")


@query(
    "text_token_counts_by_lang",
    oracle=f"""
    WITH docs AS (
        SELECT lang, {TOKENS_SQL.format(c='text')} AS w FROM documents)
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(w)) AS BIGINT) AS total_tokens,
           CAST(SUM(list_sum([CAST(ceil(length(t) / 4.0) AS BIGINT) for t in w])) AS BIGINT)
               AS total_bpe_tokens,
           {rhalf_sql('SUM(len(w)) * 1.0 / COUNT(*)', 2)} AS avg_tokens_per_doc
    FROM docs
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("llm", "text", "tokens"),
)
def text_token_counts_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level token accounting per language tag: whitespace
    tokens + a BPE-ish estimate (4-char pieces)."""
    docs = spread_by_range(
        load_table(spark, sf_dir, "documents").select("lang", "text"), "lang"
    )
    c = F.col("text")
    staged = docs.select("lang", T.tokens(c).alias("_w"), c.alias("text"))
    w = F.col("_w")
    per_doc = staged.select(
        "lang",
        T.token_count_from_tokens(w).alias("n_tok"),
        T.approx_bpe_token_count_from_tokens(w).alias("n_bpe"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            rhalf(F.sum("n_tok") / F.count("*"), 2).alias("avg_tokens_per_doc"),
        )
        .orderBy("lang")
    )


_QUALITY_SQL = f"""(
    least(length(text) / 500.0, 1.0) * 0.4
    + least((CASE WHEN len(w) > 0
             THEN len([t for t in w if list_contains({_STOP_LIST}, t)]) * 1.0 / len(w)
             ELSE 0.0 END) * 5, 1.0) * 0.3
    + greatest(0.0, 1.0 - (CASE WHEN length(text) > 0
               THEN length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) * 1.0 / length(text)
               ELSE 0.0 END) * 10) * 0.3)"""

_LANG_CASE_SQL = """CASE WHEN greatest(s_sql, s_spark, s_data, s_ops) <= 0 THEN 'und'
         WHEN s_sql = greatest(s_sql, s_spark, s_data, s_ops) THEN 'sql'
         WHEN s_spark = greatest(s_sql, s_spark, s_data, s_ops) THEN 'spark'
         WHEN s_data = greatest(s_sql, s_spark, s_data, s_ops) THEN 'data'
         ELSE 'ops' END"""


@query(
    "pipeline_training_data",
    oracle=f"""
    WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 100),
    hashed AS (
        SELECT doc_id, text, {h60_sql(NORM_SQL.format(c='text'))} AS h FROM all_docs),
    keep AS (SELECT MIN(doc_id) AS doc_id FROM hashed GROUP BY h),
    dedup AS (SELECT h2.doc_id, h2.text FROM hashed h2 JOIN keep k ON h2.doc_id = k.doc_id),
    toks AS (
        SELECT doc_id, text, {TOKENS_SQL.format(c='text')} AS w FROM dedup),
    feat AS (
        SELECT doc_id, w, {_QUALITY_SQL} AS q,
               len([t for t in w if list_contains(['table','join','query','filter'], t)]) AS s_sql,
               len([t for t in w if list_contains(['spark','batch','stream','shuffle'], t)]) AS s_spark,
               len([t for t in w if list_contains(['data','row','column','value'], t)]) AS s_data,
               len([t for t in w if list_contains(['sort','merge','hash','scan'], t)]) AS s_ops
        FROM toks),
    langd AS (
        SELECT doc_id, w, q, {_LANG_CASE_SQL} AS lang_guess FROM feat)
    SELECT lang_guess,
           COUNT(*) AS n_docs,
           CAST(SUM(len(w)) AS BIGINT) AS total_tokens,
           {rhalf_sql('MIN(q)', 4)} AS min_quality,
           {rhalf_sql('MAX(q)', 4)} AS max_quality
    FROM langd
    WHERE q >= 0.5 AND lang_guess != 'und'
    GROUP BY lang_guess
    ORDER BY lang_guess
    """,
    tags=("llm", "pipeline", "dedup", "quality", "language-id"),
)
def pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED training-data prep pipeline as one declarative
    plan: exact dedup (min-id survivor over re-appended copies) →
    quality gate (length/stopword/punctuation heuristic ≥ 0.5) →
    language-ID filter → per-language corpus accounting. Each stage is
    an already-verified operator; this query certifies the
    composition end to end — one logical plan, so Catalyst pushes the
    whole filter chain below the aggregate. Min/max quality (not avg)
    keeps every output order-independent for the cross-engine hash."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.where(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    deduped = D.exact_dedup(docs.unionByName(copies))
    c = F.col("text")
    # r14 (guide §4.1/§2.5): tokens staged once (token_count /
    # quality_score / detect_language on the raw column each re-derived
    # the token array inside interpreted HOFs — ~8 normalize passes per
    # row), and the survivor side spread off the 1-2 scan partitions
    # the broadcast semi-join preserves. 4.65-4.84 s → 3.49-3.67 s
    # measured at sf0.1, identical output.
    staged = spread_by_range(deduped, "doc_id").select(
        "doc_id", "text", T.tokens(c).alias("_w")
    )
    w = F.col("_w")
    # barrier: stops the q/lang predicate being pushed below this
    # projection (alias substitution would re-derive the token array
    # inside interpreted filter-HOFs per reference — see
    # prepare_training_corpus for the measured cliff)
    feat = D.barrier(
        staged.select(
            "doc_id",
            T.token_count_from_tokens(w).alias("n_tok"),
            T.quality_score_from_tokens(c, w).alias("q"),
            T.detect_language_from_tokens(w, DOMAIN_MARKERS).alias("lang_guess"),
        )
    )
    kept = feat.where((F.col("q") >= 0.5) & (F.col("lang_guess") != "und"))
    return (
        kept.groupBy("lang_guess")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            rhalf(F.min("q"), 4).alias("min_quality"),
            rhalf(F.max("q"), 4).alias("max_quality"),
        )
        .orderBy("lang_guess")
    )


@query(
    "multimodal_decode_features",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               16 + (doc_id % 32) AS w,
               16 + ((doc_id // 32) % 32) AS h
        FROM documents WHERE doc_id < 50)
    SELECT doc_id,
           CAST(54 + h * ((w * 3 + 3) // 4 * 4) AS BIGINT) AS byte_len,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           3 AS n_channels
    FROM dims
    ORDER BY doc_id
    """,
    tags=("llm", "multimodal", "pandas-udf"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline end-to-end with a REAL decode: per-row
    deterministic 24-bit BMP payloads (binary column + typed metadata
    struct) → Arrow-batched mapInPandas → pure-Python BMP header parse
    → feature columns. The oracle derives the expected dimensions and
    the exact BMP byte size (54-byte header + 4-byte-padded rows), so
    a hash match proves the real decoder ran."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    with_payload = M.attach_image_payload(docs)
    feats = M.decode_and_featurize(with_payload, fake=False)
    return feats.select(
        "doc_id", "byte_len", "width", "height", F.col("n_channels").cast("int").alias("n_channels")
    ).orderBy("doc_id")


#: DuckDB word-2gram list over a token list column named w
_BIGRAMS_SQL = (
    "[array_to_string(list_slice(w, i, i + 1), ' ') "
    "for i in generate_series(1, len(w) - 1)]"
)


@query(
    "text_repetition_signals",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL.format(c='text')} AS w FROM documents),
    base AS (
        SELECT doc_id, len(w) AS n_tok,
               CASE WHEN len(w) > 0
                    THEN 1.0 - len(list_distinct(w)) * 1.0 / len(w)
                    ELSE 0.0 END AS dup_word_frac
        FROM toks),
    grams AS (
        SELECT doc_id, 2 AS k, unnest({_BIGRAMS_SQL}) AS g FROM toks
        UNION ALL
        SELECT doc_id, 3 AS k, unnest({SHINGLES_SQL}) AS g FROM toks),
    cnt AS (SELECT doc_id, k, g, COUNT(*) AS c FROM grams GROUP BY doc_id, k, g),
    fr AS (
        SELECT doc_id,
               MAX(CASE WHEN k = 2 THEN mx_frac END) AS top_bigram_frac,
               MAX(CASE WHEN k = 3 THEN mx_frac END) AS top_trigram_frac
        FROM (SELECT doc_id, k, MAX(c) * 1.0 / SUM(c) AS mx_frac
              FROM cnt GROUP BY doc_id, k)
        GROUP BY doc_id)
    SELECT b.doc_id, b.n_tok,
           {rhalf_sql('b.dup_word_frac', 4)} AS dup_word_frac,
           {rhalf_sql('COALESCE(fr.top_bigram_frac, 0.0)', 4)} AS top_bigram_frac,
           {rhalf_sql('COALESCE(fr.top_trigram_frac, 0.0)', 4)} AS top_trigram_frac,
           (b.dup_word_frac <= 0.55 AND COALESCE(fr.top_bigram_frac, 0.0) <= 0.05)
               AS keep
    FROM base b LEFT JOIN fr ON b.doc_id = fr.doc_id
    ORDER BY b.doc_id
    """,
    tags=("llm", "text", "quality", "repetition"),
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style repetition filters: duplicate-word
    fraction plus top-bigram/-trigram mass fraction per document, with
    the keep/drop verdict a pretraining pipeline would apply
    (thresholds sit at the fixture's median so both classes are
    populated). r14: the top-gram fractions are per-row sorted-run
    expressions (operators/text.py:repetition_signals — removes the
    gram explode and both keyed shuffles), the narrow scan is range-
    partitioned by doc_id before the heavy projection, and the ordered
    output is finished with sortWithinPartitions (identical total
    order, no second evaluation in the range-sampler)."""
    docs = spread_by_range(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    sig = T.repetition_signals(docs)
    return sig.select(
        "doc_id",
        "n_tok",
        rhalf(F.col("dup_word_frac"), 4).alias("dup_word_frac"),
        rhalf(F.col("top_bigram_frac"), 4).alias("top_bigram_frac"),
        rhalf(F.col("top_trigram_frac"), 4).alias("top_trigram_frac"),
        (
            (F.col("dup_word_frac") <= 0.55) & (F.col("top_bigram_frac") <= 0.05)
        ).alias("keep"),
    ).sortWithinPartitions("doc_id")


@query(
    "pipeline_train_test_split",
    oracle=f"""
    WITH split AS (
        SELECT doc_id, text,
               {h60_sql("'split|' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
        FROM documents),
    toks AS (
        SELECT bucket, text, {TOKENS_SQL.format(c='text')} AS w FROM split),
    labeled AS (
        SELECT CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split,
               w,
               {_QUALITY_SQL} AS q
        FROM toks)
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(SUM(len(w)) AS BIGINT) AS total_tokens,
           {rhalf_sql('MIN(q)', 4)} AS min_quality,
           {rhalf_sql('MAX(q)', 4)} AS max_quality
    FROM labeled
    GROUP BY split
    ORDER BY split
    """,
    tags=("llm", "pipeline", "split"),
)
def pipeline_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split: the portable h60 hash of the
    (salted) document id buckets every doc 80/10/10, so the assignment
    is reproducible across engines, runs, and cluster sizes — no
    randomSplit, whose sampling is partition-dependent and would both
    defeat the oracle and silently reshuffle the split when the input
    repartitions at 100 TB. Per-split corpus accounting (doc count,
    token total, quality envelope) is the standard pre-training split
    audit."""
    docs = spread_by_range(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    c = F.col("text")
    bucket = (
        h60(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))) % 100
    )
    staged = docs.select("doc_id", "text", T.tokens(c).alias("_w"))
    w = F.col("_w")
    labeled = staged.select(
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
        T.token_count_from_tokens(w).alias("n_tok"),
        T.quality_score_from_tokens(c, w).alias("q"),
    )
    return (
        labeled.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            rhalf(F.min("q"), 4).alias("min_quality"),
            rhalf(F.max("q"), 4).alias("max_quality"),
        )
        .orderBy("split")
    )


@query(
    "pipeline_sequence_packing",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN length({NORM_SQL.format(c='text')}) = 0 THEN 0
                    ELSE len({TOKENS_SQL.format(c='text')}) END AS n_tok
        FROM documents),
    cum AS (
        SELECT doc_id, n_tok,
               SUM(n_tok) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tok AS start_offset
        FROM toks)
    SELECT CAST(FLOOR(start_offset / 512.0) AS BIGINT) AS bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM cum
    GROUP BY bin
    ORDER BY bin
    """,
    tags=("llm", "pipeline", "packing", "prefix-sum"),
)
def pipeline_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: documents in doc_id order are
    laid into a token stream and each doc is assigned the 512-token
    context bin its offset starts in — the pretraining-dataloader
    batching contract. The global offset is a TWO-PASS distributed
    prefix sum (range partition → per-partition totals → broadcast
    offsets + within-partition window; operators/packing.py) — the
    oracle's global-order window is the semantic spec, but a
    single-partition window never appears in the Spark plan, which is
    what makes this runnable at 100 TB."""
    docs = spread_by_range(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    toks = docs.select("doc_id", T.token_count(F.col("text")).alias("n_tok"))
    binned = P.pack_bins(toks, order_col="doc_id", weight_col="n_tok", ctx=512)
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("bin")
    )


@query(
    "multimodal_resize_thumbnail",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               16 + (doc_id % 32) AS w,
               16 + ((doc_id // 32) % 32) AS h
        FROM documents WHERE doc_id < 50),
    sampled AS (
        SELECT doc_id, w, h,
               ((w // 2) * 7 + (h // 2) * 13 + doc_id) % 256 AS v
        FROM dims)
    SELECT doc_id,
           CAST(8 AS INTEGER) AS rs_width,
           CAST(8 AS INTEGER) AS rs_height,
           CAST(246 AS BIGINT) AS rs_byte_len,
           CAST(v AS INTEGER) AS px0,
           CAST((v * 3) % 256 AS INTEGER) AS px1,
           CAST((v * 5) % 256 AS INTEGER) AS px2
    FROM sampled
    ORDER BY doc_id
    """,
    tags=("llm", "multimodal", "resize", "pandas-udf"),
)
def multimodal_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE through the multimodal plumbing: real BMP payloads
    → mapInPandas nearest-neighbor thumbnail (8×8) → BMP re-encode →
    re-decode and sample the center pixel. The oracle derives the
    sampled pixel arithmetically from the synthetic image formula
    (pixel(x,y) = ((x*7 + y*13 + seed) % 256) · (1,3,5) with the
    nearest-neighbor source at (w//2, h//2)), so the hash match proves
    actual pixels flowed through decode → resize → encode → decode —
    not just headers. Same Arrow-batched executor-side shape a real
    thumbnailing pipeline uses at scale."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    with_payload = M.attach_image_payload(docs)
    rs = M.resize_and_featurize(with_payload, dst_w=8, dst_h=8, sample_xy=(4, 4))
    return rs.select(
        "doc_id", "rs_width", "rs_height", "rs_byte_len", "px0", "px1", "px2"
    ).orderBy("doc_id")


@query(
    "multimodal_audio_features",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, 400 + (doc_id % 400) AS n
        FROM documents WHERE doc_id < 50),
    samples AS (
        SELECT d.doc_id, t.i,
               ((t.i * 7919 + d.doc_id * 104729) % 65536) - 32768 AS s
        FROM docs d, unnest(generate_series(0, d.n - 1)) AS t(i)),
    lagged AS (
        SELECT doc_id, s,
               LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM samples)
    SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           COUNT(*) AS n_samples,
           CAST(COUNT(*) * 1000 // 8000 AS BIGINT) AS duration_ms,
           CAST(MAX(ABS(s)) AS INTEGER) AS peak,
           CAST(SUM(CASE WHEN prev IS NOT NULL
                          AND (s >= 0) <> (prev >= 0) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_zero_cross,
           {rhalf_sql('sqrt(SUM(s * s) * 1.0 / COUNT(*))', 4)} AS rms
    FROM lagged
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("llm", "multimodal", "audio", "pandas-udf"),
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio through the multimodal plumbing: real 16-bit PCM WAV
    payloads (RIFF chunks walked, not assumed in order) → Arrow-batched
    mapInPandas → numpy signal features: duration, peak amplitude, zero
    crossings, RMS. Every feature is integer-deterministic — RMS is the
    IEEE sqrt of an exactly-representable integer mean — so the oracle
    regenerates the identical PCM stream arithmetically and the hash
    match certifies the full decode + DSP path, the audio counterpart
    of the image decode/resize queries."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    with_payload = M.attach_audio_payload(docs)
    feats = M.audio_features(with_payload)
    return feats.select(
        "doc_id",
        "sample_rate",
        "n_samples",
        "duration_ms",
        "peak",
        "n_zero_cross",
        rhalf(F.col("rms"), 4).alias("rms"),
    ).orderBy("doc_id")


@query(
    "multimodal_video_frame_sample",
    oracle="""
    WITH docs AS (
        SELECT doc_id,
               4 + (doc_id % 5) AS n_frames,
               16 + (doc_id % 8) AS w
        FROM documents WHERE doc_id < 40),
    frames AS (
        SELECT d.doc_id, d.n_frames, d.w, t.k AS frame_idx
        FROM docs d, unnest(generate_series(0, d.n_frames - 1, 2)) AS t(k))
    SELECT doc_id,
           CAST(n_frames AS INTEGER) AS n_frames,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(w AS INTEGER) AS f_width,
           CAST(16 AS INTEGER) AS f_height,
           CAST((86 + doc_id * 31 + frame_idx) % 256 AS INTEGER) AS px0,
           CAST(((86 + doc_id * 31 + frame_idx) % 256) * 3 % 256 AS INTEGER) AS px1,
           CAST(((86 + doc_id * 31 + frame_idx) % 256) * 5 % 256 AS INTEGER) AS px2
    FROM frames
    ORDER BY doc_id, frame_idx
    """,
    tags=("llm", "multimodal", "video", "frame-sample", "pandas-udf"),
)
def multimodal_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling with REAL frame decode: per-row VID0 clips
    (length-prefixed BMP frames) → mapInPandas walks the container,
    keeps every 2nd frame, decodes each kept BMP, and samples a pixel —
    the one-row-in, row-per-sampled-frame fan-out of per-frame feature
    extraction. The oracle regenerates frame counts, geometry, and the
    sampled pixel (frame k uses seed doc_id*31 + k) arithmetically, so
    the hash match certifies container walk + frame decode + pixel
    sampling — completing the image/audio/video triad with real
    decoders."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    with_payload = M.attach_video_payload(docs.select("doc_id"))
    frames = M.sample_frames_and_featurize(
        with_payload.select("doc_id", "payload"), every_nth=2, sample_xy=(3, 5)
    )
    return frames.select(
        "doc_id", "n_frames", "frame_idx", "f_width", "f_height", "px0", "px1", "px2"
    ).orderBy("doc_id", "frame_idx")


@query(
    "prepare_training_corpus",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL.format(c='text')} AS w FROM documents),
    base AS (
        SELECT doc_id, len(w) AS n_tok,
               CASE WHEN len(w) > 0
                    THEN 1.0 - len(list_distinct(w)) * 1.0 / len(w)
                    ELSE 0.0 END AS dup_word_frac
        FROM toks),
    cnt AS (
        SELECT doc_id, g, COUNT(*) AS c
        FROM (SELECT doc_id, unnest({_BIGRAMS_SQL}) AS g FROM toks)
        GROUP BY doc_id, g),
    fr AS (
        SELECT doc_id, MAX(c) * 1.0 / SUM(c) AS top_bigram_frac
        FROM cnt GROUP BY doc_id),
    kept AS (
        SELECT b.doc_id, b.n_tok
        FROM base b LEFT JOIN fr ON b.doc_id = fr.doc_id
        WHERE b.dup_word_frac <= 0.55
          AND COALESCE(fr.top_bigram_frac, 0.0) <= 0.05),
    labeled AS (
        SELECT doc_id, n_tok,
               CASE WHEN {h60_sql("'split|' || CAST(doc_id AS VARCHAR)")} % 100 < 80
                        THEN 'train'
                    WHEN {h60_sql("'split|' || CAST(doc_id AS VARCHAR)")} % 100 < 90
                        THEN 'val'
                    ELSE 'test' END AS split
        FROM kept),
    packed AS (
        SELECT split, n_tok,
               SUM(n_tok) OVER (PARTITION BY split ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tok AS start_offset
        FROM labeled)
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(MAX(start_offset // 512) + 1 AS BIGINT) AS n_bins
    FROM packed
    GROUP BY split
    ORDER BY split
    """,
    tags=("llm", "pipeline", "composed", "repetition", "split", "packing"),
)
def prepare_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-3 training-data pipeline COMPOSED end to end in one
    declarative plan: repetition quality gate (dup-word + top-bigram
    thresholds) → deterministic hash train/val/test split → per-split
    concat-and-chunk sequence packing (the GROUPED two-pass prefix
    sum: bin numbering restarts per split, running totals reset at
    group boundaries, still no single-partition window) → per-split
    corpus accounting with packed-bin counts. Each stage is an
    already-verified operator; this row certifies their composition,
    the counterpart of pipeline_training_data for the round-3
    additions."""
    docs = spread_by_range(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    # r14: trigram fraction skipped — this gate reads only the
    # dup-word and top-bigram signals (the dropped column was ~half
    # the per-row gram work); see repetition_signals(include_trigrams).
    # The barrier below is load-bearing: without it Catalyst pushes
    # the quality predicate BELOW the signal projection, substituting
    # the full sorted-run HOF expression into the filter, where
    # interpreted lambdas re-derive the token pipeline per reference —
    # measured 22 s vs 1.4 s at sf0.1. (The old explode+aggregate
    # shape blocked that pushdown structurally; the rowwise shape
    # needs an explicit materialization barrier.)
    sig = D.barrier(T.repetition_signals(docs, include_trigrams=False))
    kept = sig.where(
        (F.col("dup_word_frac") <= 0.55) & (F.col("top_bigram_frac") <= 0.05)
    ).select("doc_id", F.col("n_tok").cast("long").alias("n_tok"))
    bucket = (
        h60(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))) % 100
    )
    labeled = kept.select(
        "doc_id",
        "n_tok",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )
    packed = P.pack_bins(
        labeled, order_col="doc_id", weight_col="n_tok", ctx=512,
        group_cols=["split"],
    )
    return (
        packed.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            (F.max(F.col("bin")) + 1).alias("n_bins"),
        )
        .orderBy("split")
    )


#: winnowing parameters shared by the Spark operator and the oracle SQL
WINNOW_K, WINNOW_W, WINNOW_SEED = 8, 6, 7


@query(
    "text_winnowing_fingerprints",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, {NORM_SQL.format(c='text')} AS norm
        FROM documents WHERE doc_id < 200),
    grams AS (
        SELECT doc_id,
               CASE WHEN length(norm) >= {WINNOW_K}
                    THEN [{h60_sql(f"'{WINNOW_SEED}' || '|' || substr(norm, i, {WINNOW_K})")}
                          for i in generate_series(1, length(norm) - {WINNOW_K - 1})]
                    ELSE [] END AS hs
        FROM docs),
    wins AS (
        SELECT doc_id, hs,
               CASE WHEN len(hs) >= {WINNOW_W}
                    THEN [list_min(list_slice(hs, j, j + {WINNOW_W - 1}))
                          for j in generate_series(1, len(hs) - {WINNOW_W - 1})]
                    WHEN len(hs) > 0 THEN [list_min(hs)]
                    ELSE [] END AS mins
        FROM grams)
    SELECT doc_id,
           CAST(len(list_distinct(mins)) AS INTEGER) AS n_fingerprints,
           array_to_string(list_sort(list_distinct(mins)), ',') AS fingerprints
    FROM wins
    ORDER BY doc_id
    """,
    tags=("llm", "text", "fingerprint", "winnowing"),
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) document sketches: k-gram rolling-hash minima
    over sliding windows, the fingerprinting scheme whose guarantee is
    that any exact match of length >= k + w - 1 between two documents
    shares a fingerprint. The full sorted sketch per document is
    hash-checked — the oracle rebuilds the identical k-gram hash
    sequence from the shared portable h60 — so the window-minimum
    selection logic itself is certified, not just a summary statistic.
    All JVM array expressions, with the k-gram hash array STAGED as a
    materialized column between the two HOF passes (an interpreted
    lambda re-evaluates its outer expression per element — unstaged,
    the window-minimum pass would re-derive the hash array per window
    position, O(n²) hashing per row;
    operators/text.py:winnowing_fingerprints_staged). At 100 TB the
    sketch column feeds the same band-bucket join as MinHash for
    plagiarism/overlap detection.

    The sketch is emitted as a comma-joined STRING (not a raw
    array<bigint>): the driver's canonicalizer sorts result columns
    with pandas, which cannot hash list cells — the value content is
    identical, only the wire shape changes (VERDICT r3 §What's-wrong
    #1)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    fp = T.winnowing_fingerprints_staged(
        docs, "text", k=WINNOW_K, window=WINNOW_W, seed=WINNOW_SEED
    )
    return fp.select(
        "doc_id",
        F.size("fingerprints").cast("int").alias("n_fingerprints"),
        F.array_join(
            F.transform(F.col("fingerprints"), lambda x: x.cast("string")), ","
        ).alias("fingerprints"),
    ).orderBy("doc_id")


_QZ_SQL = (
    "[GREATEST(-127, LEAST(127, CAST(FLOOR({v}[i] / "
    "(list_max([abs(x) for x in {v}]) / 127.0) + 0.5) AS INTEGER))) "
    "for i in generate_series(1, 64)]"
)


@query(
    "sim_quantized_topk",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    qz AS (
        SELECT vec_id, v, {_QZ_SQL.format(v='v')} AS qv FROM base),
    e AS (SELECT vec_id, v AS ea, qv AS qea FROM qz),
    q AS (SELECT vec_id AS query_id, v AS qa, qv AS qqa FROM qz WHERE vec_id < 5),
    scored AS (
        SELECT q.query_id, e.vec_id,
               list_sum([qqa[i] * qea[i] for i in generate_series(1, 64)])
                   / (sqrt(CAST(list_sum([qqa[i] * qqa[i] for i in generate_series(1, 64)]) AS DOUBLE))
                      * sqrt(CAST(list_sum([qea[i] * qea[i] for i in generate_series(1, 64)]) AS DOUBLE)))
                   AS qcos,
               {_DOT_SQL} / ({_NORM_A} * {_NORM_B}) AS cos
        FROM e CROSS JOIN q
        WHERE e.vec_id != q.query_id)
    SELECT query_id, vec_id,
           {rhalf_sql('qcos', 4)} AS qcos,
           {rhalf_sql('abs(qcos - cos)', 4)} AS quant_err,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY qcos DESC, vec_id) AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= 5
    ORDER BY query_id, rank
    """,
    tags=("llm", "similarity", "quantization", "topk"),
)
def sim_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector search under int8 scalar quantization: per-vector
    symmetric quantization (max|x|/127 scale), integer dot products,
    top-5 by QUANTIZED cosine with the per-hit quantization error
    against the exact float cosine. At 100 TB this is the 4× memory/IO
    lever for ANN — and because the quantized grid, the integer dot
    (exact, summation-order-free), and floor(+0.5) rounding are all
    bit-reproducible, the whole quantized pipeline hash-checks against
    the oracle, errors included
    (operators/similarity.py:quantize_int8/quantized_topk)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    topk = S.quantized_topk(emb, queries, k=5, dim=64)
    return topk.select(
        "query_id",
        "vec_id",
        rhalf(F.col("qcos"), 4).alias("qcos"),
        rhalf(F.abs(F.col("qcos") - F.col("cos")), 4).alias("quant_err"),
        "rank",
    ).orderBy("query_id", "rank")


@query(
    "sim_quantized_grouped_topk",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    qz AS (
        SELECT vec_id, label, v, {_QZ_SQL.format(v='v')} AS qv FROM base),
    e AS (SELECT vec_id, label, qv AS qea FROM qz),
    q AS (SELECT vec_id AS query_id, qv AS qqa FROM qz WHERE vec_id < 5),
    scored AS (
        SELECT q.query_id, e.label, e.vec_id,
               list_sum([qqa[i] * qea[i] for i in generate_series(1, 64)])
                   / (sqrt(CAST(list_sum([qqa[i] * qqa[i] for i in generate_series(1, 64)]) AS DOUBLE))
                      * sqrt(CAST(list_sum([qea[i] * qea[i] for i in generate_series(1, 64)]) AS DOUBLE)))
                   AS qcos
        FROM e CROSS JOIN q
        WHERE e.vec_id != q.query_id)
    SELECT query_id, label, vec_id,
           {rhalf_sql('qcos', 4)} AS qcos,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id, label
                                   ORDER BY qcos DESC, vec_id) AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= 2
    ORDER BY query_id, label, rank
    """,
    tags=("llm", "similarity", "quantization", "topk", "grouped"),
)
def sim_quantized_grouped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED quantized retrieval: the 2 best int8-cosine neighbors
    per (query, label) — the per-source/per-language quota-retrieval
    pattern (diversified context assembly pulls k from EVERY bucket
    rather than a global top-k that one dominant source can monopolize).
    The ranking window partitions by (query, label), so each partition
    holds one group's candidates and ranking parallelizes across
    groups; the quantized integer dot keeps the whole pipeline
    bit-reproducible at bench scale
    (operators/similarity.py:quantized_topk group_cols)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    topk = S.quantized_topk(emb, queries, k=2, dim=64, group_cols=["label"])
    return topk.select(
        "query_id",
        "label",
        "vec_id",
        rhalf(F.col("qcos"), 4).alias("qcos"),
        "rank",
    ).orderBy("query_id", "label", "rank")
