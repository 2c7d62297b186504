"""Round-4 corpus additions, batch 15: exact streaming distinct
counts and an LSH-recall evaluation harness.

Streaming COUNT(DISTINCT) is unsupported by design (the final set
cannot be incrementally merged from partial counts); the windowed
query here carries the exact user set in a collect_set aggregation
buffer instead — correct at fixture scale and bounded by users per
window. The eval query closes the loop on the MinHash stack: it
measures the LSH candidate generator's precision/recall against
exact-Jaccard ground truth, the number that justifies the banding
parameters in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.operators.dedup import (
    minhash_candidate_pairs,
    shingle_rows,
)
from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.plans.llm import _MINHASH_CTES
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table
from iceberg_rs_spark.streaming import events_stream, replay_to_memory

# ---------------------------------------------------------------------------
# Streaming exact distinct users per window
# ---------------------------------------------------------------------------

_TS_FMT = "%Y-%m-%d %H:%M:%S"


@query(
    "stream_windowed_distinct_users",
    oracle=f"""
    {EVENTS_ORACLE_CTE}
    SELECT strftime(date_trunc('hour', ts), '{_TS_FMT}') AS win_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM evt
    GROUP BY 1
    ORDER BY win_start
    """,
    tags=("streaming", "window", "distinct"),
)
def stream_windowed_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per tumbling hour over the event stream.
    Streaming COUNT(DISTINCT) is unsupported (distinct counts don't
    merge incrementally), so the window carries its user SET in a
    collect_set aggregation buffer and sizes it at output — exact,
    single stateful operator, state bounded by users-per-window. At
    100 TB the same query swaps the set buffer for the two-stage
    pattern (watermarked dropDuplicates on (window, user) feeding a
    plain windowed count) or an approx_count_distinct sketch; the
    certified window/count contract is identical."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 hour"))
        .agg(
            F.collect_set("user_id").alias("users"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "win_start"
            ),
            F.size("users").cast("long").alias("n_users"),
            "n_events",
        )
    )
    out = replay_to_memory(agg, "windowed_distinct", "complete")
    return out.orderBy("win_start")


# ---------------------------------------------------------------------------
# LSH candidate-quality evaluation
# ---------------------------------------------------------------------------

EVAL_DOCS, EVAL_J = 400, 0.6


@query(
    "dedup_lsh_quality_eval",
    oracle=f"""
    WITH {_MINHASH_CTES.replace(
        "FROM documents)", f"FROM documents WHERE doc_id < {EVAL_DOCS})", 1)},
    truth_inter AS (
        SELECT sa.doc_id AS id_a, sb.doc_id AS id_b, COUNT(*) AS i
        FROM shingle_rows sa
        JOIN shingle_rows sb ON sb.s = sa.s AND sa.doc_id < sb.doc_id
        GROUP BY 1, 2),
    truth AS (
        SELECT t.id_a, t.id_b
        FROM truth_inter t
        JOIN sizes na ON na.doc_id = t.id_a
        JOIN sizes nb ON nb.doc_id = t.id_b
        WHERE t.i * 1.0 / (na.n + nb.n - t.i) >= {EVAL_J}),
    m AS (
        SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
               (SELECT COUNT(*) FROM cands) AS n_cand,
               (SELECT COUNT(*) FROM cands c
                JOIN truth t ON c.id_a = t.id_a AND c.id_b = t.id_b)
                   AS n_tp)
    SELECT CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_cand AS BIGINT) AS n_cand,
           CAST(n_tp AS BIGINT) AS n_tp,
           {rhalf_sql('n_tp * 1.0 / GREATEST(n_cand, 1)', 6)} AS precision,
           {rhalf_sql('n_tp * 1.0 / GREATEST(n_truth, 1)', 6)} AS recall
    FROM m
    """,
    tags=("llm", "dedup", "evaluation", "lsh"),
)
def dedup_lsh_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the MinHash-LSH candidate generator against
    exact-Jaccard ground truth on a 400-doc evaluation slice — the
    measurement that justifies (num_hashes=12, bands=4) before a
    production purge. Ground truth enumerates shared-shingle pairs
    exactly (affordable only because the slice is fixed-size — which
    is the point: at 100 TB you evaluate banding on a sample, then
    run the certified generator on the corpus). Candidates come from
    the SAME operator the dedup pipeline uses
    (operators/dedup.py:minhash_candidate_pairs), so the measured
    recall is the production recall."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < EVAL_DOCS)
        .select("doc_id", "text")
    )
    sh = shingle_rows(docs).localCheckpoint(eager=True)
    cands = minhash_candidate_pairs(docs, shingle_rows_df=sh)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("_s").alias("s"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("_s").alias("s2"))
    truth_inter = (
        sa.join(sb, (F.col("s") == F.col("s2")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    truth = (
        truth_inter.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")),
            "id_b",
        )
        .where(
            F.col("i") * 1.0 / (F.col("na") + F.col("nb") - F.col("i")) >= EVAL_J
        )
        .select("id_a", "id_b")
    )
    n_truth = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    n_cand = cands.agg(F.count(F.lit(1)).cast("long").alias("n_cand"))
    n_tp = (
        cands.join(truth, ["id_a", "id_b"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_tp"))
    )
    return (
        n_truth.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_tp))
        .select(
            "n_truth",
            "n_cand",
            "n_tp",
            rhalf(
                F.col("n_tp") * 1.0 / F.greatest(F.col("n_cand"), F.lit(1)), 6
            ).alias("precision"),
            rhalf(
                F.col("n_tp") * 1.0 / F.greatest(F.col("n_truth"), F.lit(1)), 6
            ).alias("recall"),
        )
    )
