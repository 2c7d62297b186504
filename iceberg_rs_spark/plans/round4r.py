"""Round-4 corpus additions, batch 17: GROUPING_ID-labelled rollup
levels and asymmetric shingle containment.

Containment (|A∩B| / |A|) is the metric exact/near dedup misses:
a short document wholly quoted inside a long one has low Jaccard but
containment 1.0 — the quote/inclusion detector curation pipelines
run AFTER symmetric near-dup removal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.operators.dedup import minhash_candidate_pairs, shingle_rows
from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.plans.llm import _MINHASH_CTES
from iceberg_rs_spark.sources.fixtures import load_table

# ---------------------------------------------------------------------------
# GROUPING_ID-labelled aggregation levels
# ---------------------------------------------------------------------------


@query(
    "agg_grouping_id_labeled",
    oracle="""
    SELECT CASE WHEN GROUPING(o_orderpriority) = 1
                 AND GROUPING(o_orderstatus) = 1 THEN 'grand_total'
                WHEN GROUPING(o_orderstatus) = 1 THEN 'by_priority'
                WHEN GROUPING(o_orderpriority) = 1 THEN 'by_status'
                ELSE 'by_both' END AS level,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
    ORDER BY level, priority, status
    """,
    tags=("aggregate", "grouping-sets", "grouping-id"),
)
def agg_grouping_id_labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with GROUPING()-derived level labels: one pass
    produces the detail, both one-dimension rollups, and the grand
    total, each row self-describing which level it belongs to — the
    disambiguation real report layers need, since a NULL group key is
    otherwise indistinguishable from the rollup marker (COALESCE to
    'ALL' is only safe because GROUPING() separates the cases first).
    Spark expands the sets map-side and aggregates partially, one
    shuffle for all four levels."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_orders_gid")
    return spark.sql(
        """
        SELECT CASE WHEN GROUPING(o_orderpriority) = 1
                     AND GROUPING(o_orderstatus) = 1 THEN 'grand_total'
                    WHEN GROUPING(o_orderstatus) = 1 THEN 'by_priority'
                    WHEN GROUPING(o_orderpriority) = 1 THEN 'by_status'
                    ELSE 'by_both' END AS level,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM _orders_gid
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus), ())
        ORDER BY level, priority, status
        """
    )


# ---------------------------------------------------------------------------
# Asymmetric shingle containment
# ---------------------------------------------------------------------------

CONTAIN_DOCS, CONTAIN_T = 400, 0.5


@query(
    "text_containment_pairs",
    oracle=f"""
    WITH {_MINHASH_CTES.replace(
        "FROM documents)", f"FROM documents WHERE doc_id < {CONTAIN_DOCS})", 1)}
    SELECT i2.id_a, i2.id_b,
           {rhalf_sql('i2.i * 1.0 / na.n', 6)} AS contain_a_in_b,
           {rhalf_sql('i2.i * 1.0 / nb.n', 6)} AS contain_b_in_a
    FROM inter i2
    JOIN sizes na ON na.doc_id = i2.id_a
    JOIN sizes nb ON nb.doc_id = i2.id_b
    WHERE i2.i * 1.0 / LEAST(na.n, nb.n) >= {CONTAIN_T}
    ORDER BY id_a, id_b
    """,
    tags=("llm", "dedup", "containment"),
)
def text_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment over the LSH candidate pairs:
    |A∩B|/|A| and |A∩B|/|B| — the quote/inclusion detector. A short
    document fully embedded in a long one has LOW Jaccard (the union
    is large) but containment 1.0, so symmetric near-dedup misses it;
    pairs are kept when the smaller side is ≥50% contained. Candidate
    generation and the intersection counts reuse the exact same
    MinHash operators as the dedup stack — containment is one extra
    division on numbers the pipeline already computes."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < CONTAIN_DOCS)
        .select("doc_id", "text")
    )
    sh = shingle_rows(docs).localCheckpoint(eager=True)
    cands = minhash_candidate_pairs(docs, shingle_rows_df=sh)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("_s").alias("s"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("_s").alias("s2"))
    inter = (
        cands.join(sa, "id_a")
        .join(
            sb.withColumnRenamed("id_b", "id_b2"),
            (F.col("id_b") == F.col("id_b2")) & (F.col("s") == F.col("s2")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")),
            "id_b",
        )
        .where(
            F.col("i") * 1.0 / F.least(F.col("na"), F.col("nb")) >= CONTAIN_T
        )
        .select(
            "id_a",
            "id_b",
            rhalf(F.col("i") * 1.0 / F.col("na"), 6).alias("contain_a_in_b"),
            rhalf(F.col("i") * 1.0 / F.col("nb"), 6).alias("contain_b_in_a"),
        )
        .orderBy("id_a", "id_b")
    )
