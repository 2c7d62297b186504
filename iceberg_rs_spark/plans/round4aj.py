"""Round-4 corpus additions, batch 35: sparse TF-IDF document
similarity — the term-keyed sparse-vector join that complements the
dense-embedding cosine stack.

Dense cosine (`sim_embedding_high_pairs`) needs an embedding model;
TF-IDF cosine needs only the corpus. The sparse dot product is a JOIN
ON TERM — no per-pair vector scan — which is why sparse similarity
scaled to the web decades before ANN indexes: the shuffle key is the
term, cost is Σ df², and capping document frequency bounds the worst
key exactly where stopword-like terms would explode it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.operators import text as T
from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.operators.skew import spread_by_range
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.plans.llm import TOKENS_SQL
from iceberg_rs_spark.sources.fixtures import load_table

#: document-frequency cap: terms in more than this share of documents
#: carry no discrimination and would dominate the term-join fan-out.
_DF_CAP_SHARE = 0.5
_SIM_THRESHOLD = 0.35


@query(
    "text_tfidf_doc_similarity",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({TOKENS_SQL.format(c='text')}) AS term
        FROM documents WHERE doc_id < 250),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM toks),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM toks GROUP BY doc_id, term),
    df AS (
        SELECT term, CAST(COUNT(*) AS DOUBLE) AS df
        FROM tf GROUP BY term
        HAVING COUNT(*) <= (SELECT n FROM nd) * {_DF_CAP_SHARE}),
    w AS (
        SELECT tf.doc_id, tf.term,
               tf.tf * ln((SELECT n FROM nd) / df.df) AS wt
        FROM tf JOIN df USING (term)),
    norms AS (
        SELECT doc_id, sqrt(SUM(wt * wt)) AS nrm FROM w GROUP BY doc_id),
    dots AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               SUM(a.wt * b.wt) AS dot,
               COUNT(*) AS shared_terms
        FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id),
    scored AS (
        SELECT d.doc_a, d.doc_b, d.shared_terms,
               d.dot / (na.nrm * nb.nrm) AS cos
        FROM dots d
        JOIN norms na ON d.doc_a = na.doc_id
        JOIN norms nb ON d.doc_b = nb.doc_id)
    SELECT doc_a, doc_b,
           CAST(shared_terms AS BIGINT) AS shared_terms,
           {rhalf_sql('cos', 4)} AS tfidf_cosine
    FROM scored
    WHERE cos >= {_SIM_THRESHOLD}
    ORDER BY doc_a, doc_b
    """,
    tags=("llm", "text", "similarity", "tfidf"),
)
def text_tfidf_doc_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine similarity between documents: tf·ln(N/df)
    weights, document-frequency cap at {_DF_CAP_SHARE:.0%} (stopword-
    like terms carry no signal and quadratically dominate the join
    fan-out — the cap bounds the worst term key at exactly the spot
    a 100 TB run would need it), sparse dot products as a TERM-KEYED
    self-join (cost Σ df², never |docs|² — no per-pair vector scan),
    norms joined back, pairs at cosine ≥ {_SIM_THRESHOLD}. The
    model-free retrieval baseline beside the dense-embedding stack:
    same output shape as `sim_embedding_high_pairs`, no encoder
    required."""
    docs = spread_by_range(
        load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 250),
        "doc_id",
    )
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("term")
    )
    n_docs = toks.select("doc_id").distinct().count()
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    df = (
        tf.groupBy("term")
        .agg(F.count("*").cast("double").alias("df"))
        .where(F.col("df") <= n_docs * _DF_CAP_SHARE)
    )
    w = tf.join(df, "term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("wt"),
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nrm")
    )
    b = w.select(
        F.col("doc_id").alias("doc_b"),
        F.col("term").alias("term_b"),
        F.col("wt").alias("wt_b"),
    )
    dots = (
        w.join(
            b,
            (F.col("term") == F.col("term_b"))
            & (F.col("doc_id") < F.col("doc_b")),
        )
        .groupBy(F.col("doc_id").alias("doc_a"), "doc_b")
        .agg(
            F.sum(F.col("wt") * F.col("wt_b")).alias("dot"),
            F.count("*").alias("shared_terms"),
        )
    )
    na = norms.select(
        F.col("doc_id").alias("doc_a"), F.col("nrm").alias("nrm_a")
    )
    nb = norms.select(
        F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nrm_b")
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_terms",
            (F.col("dot") / (F.col("nrm_a") * F.col("nrm_b"))).alias("cos"),
        )
        .where(F.col("cos") >= _SIM_THRESHOLD)
        .select(
            "doc_a",
            "doc_b",
            "shared_terms",
            rhalf(F.col("cos"), 4).alias("tfidf_cosine"),
        )
        .orderBy("doc_a", "doc_b")
    )
