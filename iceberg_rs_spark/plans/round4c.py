"""Round-4 corpus additions, batch 2: corpus-curation sampling
(stratified hash sample, per-domain cap), event path transitions, and
corpus statistics (TF-IDF keywords, Zipf token curve).

Every query is a production pattern from large-scale training-data
curation; each registers a (DataFrame builder, DuckDB oracle) pair.
All sampling is deterministic portable hashing (functions/hashing.h60)
so results are cluster-size- and engine-invariant; no query collects
data rows to the driver or broadcasts an SF-proportional relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.functions.hashing import h60, h60_sql
from iceberg_rs_spark.operators import text as T
from iceberg_rs_spark.operators.skew import spread_by_range
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

_H_DOC = h60_sql("CAST(doc_id AS VARCHAR)")

NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', ' ', 'g'), "
    "' +', ' ', 'g'))"
)
TOKENS_SQL = f"string_split({NORM_SQL.format(c='{c}')}, ' ')"


@query(
    "pipeline_stratified_sample",
    oracle=f"""
    WITH tagged AS (
        SELECT lang, n_chars,
               ({_H_DOC}) % 100 AS bucket,
               CASE WHEN lang = 'en' THEN 40 ELSE 15 END AS rate
        FROM documents)
    SELECT lang,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN bucket < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(SUM(CASE WHEN bucket < rate THEN n_chars ELSE 0 END) AS BIGINT)
               AS sampled_chars,
           ROUND(SUM(CASE WHEN bucket < rate THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 3) AS achieved_rate
    FROM tagged
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("pipeline", "sampling", "stratified", "deterministic"),
)
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling for corpus curation: each
    language stratum gets its own sampling rate (upsample the head
    language, downsample the tail) and membership is decided by a
    portable hash bucket of the document id — NOT rand(), so the
    sample is reproducible across runs, engines, and cluster sizes,
    and a document's fate never depends on partitioning. One narrow
    projection + one hash per row + one partial agg; no shuffle except
    the final tiny per-lang rollup. At 100 TB this is a single
    map-side pass."""
    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.select(
        "lang",
        "n_chars",
        (h60(F.col("doc_id").cast("string")) % 100).alias("bucket"),
        F.when(F.col("lang") == "en", F.lit(40)).otherwise(F.lit(15)).alias("rate"),
    )
    keep = F.col("bucket") < F.col("rate")
    return (
        tagged.groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(keep.cast("long")).alias("n_sampled"),
            F.sum(F.when(keep, F.col("n_chars")).otherwise(F.lit(0)))
            .cast("long")
            .alias("sampled_chars"),
            F.round(
                F.sum(keep.cast("double")) / F.count("*"), 3
            ).alias("achieved_rate"),
        )
        .orderBy("lang")
    )


@query(
    "pipeline_domain_cap",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY {_H_DOC}, doc_id) AS rk
        FROM documents)
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM ranked
    WHERE rk <= 15
    GROUP BY source
    ORDER BY source
    """,
    tags=("pipeline", "sampling", "domain-cap", "window"),
)
def pipeline_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution cap (anti-dominance mixing): every
    source contributes at most K documents, chosen by portable-hash
    order so the "random" K are reproducible anywhere. This is the
    standard guard against one crawl domain flooding a training
    mixture. Plan: one hash, one window rank partitioned BY THE
    STRATUM (so the sort is per-domain, never global), one filter, one
    rollup. Domains are numerous and individually small ⇒ the window
    partitioning is well-spread at 100 TB; no global orderBy
    anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        h60(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 15)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
        .orderBy("source")
    )


@query(
    "events_path_transitions",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM evt),
    pairs AS (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type)
    SELECT prev_type, next_type, n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY prev_type), 4) AS share
    FROM pairs
    ORDER BY prev_type, next_type
    """,
    tags=("events", "sequence", "markov", "window"),
)
def events_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order path analysis (Markov transition matrix) over the
    event stream: for each user's time-ordered events, count
    (previous event type → next event type) transitions and each
    target's share within its source state. The per-user window sort
    is partitioned by user_id (millions of small partitions — spreads
    perfectly); the transition matrix is |event_types|² rows, so the
    final agg and its share window are metadata-sized at any SF."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    share_w = Window.partitionBy("prev_type")
    return (
        pairs.withColumn(
            "share", F.round(F.col("n").cast("double") / F.sum("n").over(share_w), 4)
        )
        .orderBy("prev_type", "next_type")
    )


@query(
    "text_tfidf_keywords",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({TOKENS_SQL.format(c='text')}) AS term
        FROM documents),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term),
    df AS (
        SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.doc_freq,
               ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.doc_freq), 4)
                   AS tfidf,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf DESC, df.doc_freq ASC, tf.term ASC) AS rk
        FROM tf JOIN df USING (term) CROSS JOIN n)
    SELECT doc_id, rk, term, tf, doc_freq, tfidf
    FROM scored WHERE rk <= 3 AND doc_id < 200
    ORDER BY doc_id, rk
    """,
    tags=("text", "tfidf", "keywords", "window"),
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document. Term frequencies and
    document frequencies are two keyed aggregations off one explode;
    the corpus size joins in as a 1-row broadcast; ranking uses the
    integer-only key (tf DESC, doc_freq ASC, term ASC) — identical to
    the tfidf ordering but immune to float-tie divergence between
    engines, with the rounded tfidf carried as a value column. The
    doc_id < 200 projection bounds the hash-checked output; the plan
    underneath runs over the whole corpus. df is vocabulary-sized
    (zipf-bounded ≪ corpus) so AQE broadcasts it at any realistic
    SF."""
    docs = spread_by_range(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    n_docs = docs.groupBy().agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("doc_freq").asc(), F.col("term").asc()
    )
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("doc_freq")),
                4,
            ),
        )
        .withColumn("rk", F.row_number().over(w))
        .where((F.col("rk") <= 3) & (F.col("doc_id") < 200))
        .select("doc_id", "rk", "term", "tf", "doc_freq", "tfidf")
        .orderBy("doc_id", "rk")
    )


@query(
    "text_zipf_token_curve",
    oracle=f"""
    WITH toks AS (
        SELECT unnest({TOKENS_SQL.format(c='text')}) AS term FROM documents),
    counts AS (
        SELECT term, COUNT(*) AS n FROM toks WHERE term <> '' GROUP BY term),
    total AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot FROM counts),
    ranked AS (
        SELECT term, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, term ASC) AS rk,
               SUM(n) OVER (ORDER BY n DESC, term ASC
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM counts)
    SELECT rk, term, n,
           ROUND(CAST(n AS DOUBLE) / total.tot, 4) AS share,
           ROUND(CAST(cum AS DOUBLE) / total.tot, 4) AS cum_share
    FROM ranked CROSS JOIN total
    WHERE rk <= 20
    ORDER BY rk
    """,
    tags=("text", "zipf", "corpus-stats", "window"),
)
def text_zipf_token_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf head of the corpus vocabulary: top-20 tokens with counts,
    corpus share, and cumulative share — the standard sanity plot for
    tokenizer / dedup health. The per-term counts are one explode +
    one partial-agged groupBy; only the VOCABULARY (zipf-bounded)
    enters the single-partition ranking window, never corpus rows, and
    a 20-row head is driver-safe at any SF."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    total = counts.groupBy().agg(F.sum("n").cast("double").alias("tot"))
    w_rank = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    return (
        counts.withColumn("rk", F.row_number().over(w_rank))
        .withColumn(
            "cum",
            F.sum("n").over(w_rank.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .where(F.col("rk") <= 20)
        .crossJoin(F.broadcast(total))
        .select(
            "rk",
            "term",
            "n",
            F.round(F.col("n").cast("double") / F.col("tot"), 4).alias("share"),
            F.round(F.col("cum").cast("double") / F.col("tot"), 4).alias("cum_share"),
        )
        .orderBy("rk")
    )


@query(
    "multimodal_pixel_dedup",
    oracle="""
    WITH imgs AS (
        SELECT doc_id, doc_id // 2 AS pair,
               CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS container
        FROM documents WHERE doc_id < 120)
    SELECT CAST(MIN(doc_id) AS BIGINT) AS keeper,
           COUNT(*) AS n_copies,
           string_agg(container, ',' ORDER BY container) AS containers,
           CAST(16 + pair % 32 AS INTEGER) AS width,
           CAST(16 + (pair // 32) % 32 AS INTEGER) AS height
    FROM imgs
    GROUP BY pair
    ORDER BY keeper
    """,
    tags=("llm", "multimodal", "dedup", "pandas-udf"),
)
def multimodal_pixel_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-container image dedup on DECODED pixels: the fixture pairs
    every image as a BMP (BGR, bottom-up rows, 4-byte padding) and a
    pixel-identical binary PPM (RGB, top-down, unpadded), so raw-byte
    hashing can never match them. The pipeline decodes both containers
    to canonical RGB in an Arrow-batched mapInPandas, hashes the
    pixels, and groups on the 32-char hash — the dedup shuffle moves
    hashes, never payloads. The oracle reconstructs the expected
    groups from the pair construction, so a hash match proves both
    real decoders produced byte-identical canonical pixels. At 100 TB
    this is the shape of image dedup after ingest from heterogeneous
    sources (same photo, different containers/metadata)."""
    from iceberg_rs_spark.operators import multimodal as M

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    with_payload = M.attach_mixed_container_payload(docs.select("doc_id"))
    hashed = M.pixel_hash(with_payload)
    return (
        hashed.groupBy("pixel_md5")
        .agg(
            F.min("doc_id").cast("long").alias("keeper"),
            F.count("*").alias("n_copies"),
            F.concat_ws(",", F.sort_array(F.collect_set("container"))).alias(
                "containers"
            ),
        )
        .withColumn("pair", (F.col("keeper") / 2).cast("long"))
        .select(
            "keeper",
            "n_copies",
            "containers",
            (F.lit(16) + F.col("pair") % 32).cast("int").alias("width"),
            (F.lit(16) + (F.col("pair") / 32).cast("long") % 32)
            .cast("int")
            .alias("height"),
        )
        .orderBy("keeper")
    )
