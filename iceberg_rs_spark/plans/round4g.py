"""Round-4 corpus additions, batch 6: triangle counting, M4
time-series downsampling, exponential-decay features, quality-filter
attrition funnels, and near-dup cluster survivorship.

Two of these (triangles, survivorship) compose earlier operators —
the canonical-edge build feeding :mod:`operators.graph` and the
LSH → connected-components chain from :mod:`operators.dedup` — into
the downstream shapes a curation pipeline actually ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.operators import graph as G
from iceberg_rs_spark.operators import text as T
from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.plans.llm import NORM_SQL
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table

# ---------------------------------------------------------------------------
# Triangle counting on the nation trade graph
# ---------------------------------------------------------------------------

#: canonical undirected edge set: nations that trade in either
#: direction, deduped to u < v
_TRI_EDGES_SQL = """
    pairs AS (
        SELECT DISTINCT s.s_nationkey AS a, c.c_nationkey AS b
        FROM lineitem
        JOIN orders     ON l_orderkey = o_orderkey
        JOIN customer c ON o_custkey = c.c_custkey
        JOIN supplier s ON l_suppkey = s.s_suppkey
        WHERE s.s_nationkey != c.c_nationkey),
    edges AS (
        SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM pairs)
"""


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH {_TRI_EDGES_SQL},
    tris AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM edges e1
        JOIN edges e2 ON e1.v = e2.u
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
    members AS (
        SELECT a AS node FROM tris
        UNION ALL SELECT b FROM tris
        UNION ALL SELECT c FROM tris),
    per_node AS (
        SELECT node, COUNT(*) AS n_triangles FROM members GROUP BY node),
    deg AS (
        SELECT node, COUNT(*) AS degree FROM (
            SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
        GROUP BY node)
    SELECT n_name, CAST(n_triangles AS BIGINT) AS n_triangles,
           CAST(degree AS BIGINT) AS degree,
           {rhalf_sql('n_triangles * 2.0 / (degree * (degree - 1))', 6)}
               AS clustering_coef
    FROM per_node
    JOIN deg USING (node)
    JOIN nation ON node = n_nationkey
    WHERE degree > 1
    ORDER BY n_name
    """,
    tags=("graph", "triangles", "clustering"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting + local clustering coefficient over the
    undirected nation trade graph, by the canonical ordered-wedge
    method: edges deduped to u<v, wedges from joining edge (u,v) to
    edge (v,w), closed by probing edge (u,w). The a<b<c ordering
    means every triangle is produced exactly once — no /6 correction,
    no duplicate shuffles. Two equi-joins on node ids; at a billion
    edges the standard refinement (degree-ordered orientation) keeps
    wedge fan-out bounded by the max out-degree of the orientation,
    and the join keys are already the right shuffle keys."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(F.col("s_nationkey").alias("a"), F.col("c_nationkey").alias("b"))
        .distinct()
    )
    edges = pairs.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()
    # Degree-ordered orientation (VERDICT r12 ask #3): same triangle
    # set as the u<v wedge join, each exactly once, but a power-law
    # hub generates ZERO wedges instead of deg² — the oracle keeps the
    # naive u<v SQL as the semantic spec while the Spark plan carries
    # the skew-safe shape (alpha~=1 vs alpha~=2 on the 20%-hub probe,
    # BASELINE.md r13).
    tris = G.triangles_degree_oriented(edges)
    members = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
    )
    per_node = members.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        per_node.join(deg, "node")
        .join(n, F.col("node") == n["n_nationkey"])
        .where(F.col("degree") > 1)
        .select(
            "n_name",
            F.col("n_triangles").cast("long").alias("n_triangles"),
            F.col("degree").cast("long").alias("degree"),
            rhalf(
                F.col("n_triangles") * 2.0
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("clustering_coef"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# M4 time-series downsampling
# ---------------------------------------------------------------------------


@query(
    "ts_downsample_m4",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS y
        FROM evt GROUP BY 1, 2),
    bucketed AS (
        SELECT event_type, CAST(h AS DATE) AS bucket, h, y FROM hourly),
    ranked AS (
        SELECT *,
            ROW_NUMBER() OVER (PARTITION BY event_type, bucket ORDER BY h) AS r_first,
            ROW_NUMBER() OVER (PARTITION BY event_type, bucket ORDER BY h DESC) AS r_last,
            ROW_NUMBER() OVER (PARTITION BY event_type, bucket ORDER BY y, h) AS r_min,
            ROW_NUMBER() OVER (PARTITION BY event_type, bucket ORDER BY y DESC, h) AS r_max
        FROM bucketed)
    SELECT event_type, CAST(bucket AS VARCHAR) AS bucket,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS h,
           CAST(y AS BIGINT) AS y,
           CAST(r_first = 1 AS BOOLEAN) AS is_first,
           CAST(r_last = 1 AS BOOLEAN) AS is_last,
           CAST(r_min = 1 AS BOOLEAN) AS is_min,
           CAST(r_max = 1 AS BOOLEAN) AS is_max
    FROM ranked
    WHERE r_first = 1 OR r_last = 1 OR r_min = 1 OR r_max = 1
    ORDER BY event_type, bucket, h
    """,
    tags=("timeseries", "downsampling", "m4"),
)
def ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB'14): per pixel-bucket keep
    the first, last, min, and max points of the series — the exact set
    a line rendering needs, with error-free min/max envelopes. Series =
    hourly event counts per type, bucket = day. Ties break
    deterministically on (value, timestamp). One aggregation plus four
    window ranks over the SAME (type, bucket) partitioning — Catalyst
    plans a single window exchange, and no per-series state leaves its
    partition. At 100 TB this is how a 10^12-point series gets to a
    dashboard: reduction ratio (4 points/bucket) is set by the output
    resolution, not the input size."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count(F.lit(1)).alias("y"))
        .withColumn("bucket", F.col("h").cast("date"))
    )
    part = ["event_type", "bucket"]
    r_first = F.row_number().over(Window.partitionBy(*part).orderBy("h"))
    r_last = F.row_number().over(Window.partitionBy(*part).orderBy(F.desc("h")))
    r_min = F.row_number().over(Window.partitionBy(*part).orderBy("y", "h"))
    r_max = F.row_number().over(Window.partitionBy(*part).orderBy(F.desc("y"), "h"))
    ranked = hourly.select(
        "event_type",
        F.col("bucket").cast("string").alias("bucket"),
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("h"),
        F.col("y").cast("long").alias("y"),
        (r_first == 1).alias("is_first"),
        (r_last == 1).alias("is_last"),
        (r_min == 1).alias("is_min"),
        (r_max == 1).alias("is_max"),
    )
    return ranked.where(
        F.col("is_first") | F.col("is_last") | F.col("is_min") | F.col("is_max")
    ).orderBy("event_type", "bucket", "h")


# ---------------------------------------------------------------------------
# Exponential-decay features
# ---------------------------------------------------------------------------

DECAY, DECAY_WINDOW_DAYS = 0.9, 30


@query(
    "ts_exp_decay_features",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
        FROM evt WHERE event_type IN ('purchase', 'click') GROUP BY 1, 2),
    decayed AS (
        SELECT a.event_type, a.day,
               SUM(b.cents * power({DECAY}, a.day - b.day)) AS decayed_cents,
               COUNT(*) AS n_days_in_window
        FROM daily a
        JOIN daily b ON a.event_type = b.event_type
                    AND b.day <= a.day
                    AND a.day - b.day < {DECAY_WINDOW_DAYS}
        GROUP BY 1, 2)
    SELECT event_type, CAST(day AS VARCHAR) AS day,
           {rhalf_sql('decayed_cents / 100.0', 4)} AS decayed_value,
           CAST(n_days_in_window AS BIGINT) AS n_days_in_window
    FROM decayed
    ORDER BY event_type, day
    """,
    tags=("timeseries", "decay", "features"),
)
def ts_exp_decay_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed activity features: for every (type, day),
    the decay-weighted sum of the previous 30 days' integer-cents
    volume — the standard recency-weighted feature for ranking and
    anomaly models (half-life ≈ 6.6 days at 0.9/day). Daily totals are
    exact integers BEFORE the decay weighting, so double summation is
    reproducible across engines; the decayed sum itself rounds at 4dp.

    Built as a bounded range self-join on the daily rollup (fan-out ≤
    30 rows per day-row, fixed by the window, independent of raw-event
    volume) rather than a per-event window — the rollup is what
    shuffles, which at 100 TB is days×types rows, not events."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type").isin("purchase", "click"))
        .groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "cents"
            )
        )
    )
    a = daily.alias("a")
    b = daily.alias("b")
    diff = F.datediff(F.col("a.day"), F.col("b.day"))
    joined = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.day") <= F.col("a.day"))
        & (diff < DECAY_WINDOW_DAYS),
    )
    return (
        joined.groupBy(F.col("a.event_type").alias("event_type"), F.col("a.day").alias("day"))
        .agg(
            F.sum(
                F.col("b.cents") * F.pow(F.lit(DECAY), F.datediff(F.col("a.day"), F.col("b.day")))
            ).alias("decayed_cents"),
            F.count(F.lit(1)).alias("n_days_in_window"),
        )
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            rhalf(F.col("decayed_cents") / 100.0, 4).alias("decayed_value"),
            F.col("n_days_in_window").cast("long").alias("n_days_in_window"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Quality-filter attrition funnel
# ---------------------------------------------------------------------------

MIN_CHARS, MAX_STOP, MIN_Q = 60, 0.45, 0.35


@query(
    "pipeline_filter_funnel",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
               length(text) AS n_chars,
               len(list_filter(string_split({NORM_SQL.format(c='text')}, ' '),
                   t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t)))
                   * 1.0 / greatest(len(string_split({NORM_SQL.format(c='text')}, ' ')), 1)
                   AS stop_ratio
        FROM documents),
    verdict AS (
        SELECT doc_id,
               CASE
                 WHEN n_chars < {MIN_CHARS} THEN '1_too_short'
                 WHEN stop_ratio > {MAX_STOP} THEN '2_stopword_heavy'
                 WHEN stop_ratio < 0.02 THEN '3_no_function_words'
                 ELSE 'kept'
               END AS outcome
        FROM scored),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM verdict)
    SELECT outcome, CAST(COUNT(*) AS BIGINT) AS n_docs,
           {rhalf_sql('COUNT(*) / (SELECT total FROM n)', 6)} AS share
    FROM verdict
    GROUP BY outcome
    ORDER BY outcome
    """,
    tags=("llm", "pipeline", "filtering", "funnel"),
)
def pipeline_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter attrition funnel: every document is assigned the
    FIRST rule that rejects it (length floor → stopword ceiling →
    function-word floor, the C4/Gopher rule ordering) or 'kept', and
    the output is the per-rule attrition table a curation run reports.
    Single scan, one aggregation — the rules are ordered CASE branches
    over JVM column expressions, so adding a rule never adds a pass.
    First-failing-rule attribution (not per-rule independent counts)
    is what makes the numbers actionable: shares sum to 1 and rule
    order changes are visible."""
    docs = load_table(spark, sf_dir, "documents")
    # r14 (guide §4.1): the stopword ratio is referenced by two CASE
    # branches — stage the token array and the ratio as columns so the
    # interpreted filter-HOF runs once per row, not once per reference.
    staged = docs.select("text", T.tokens(F.col("text")).alias("_w"))
    stop_ratio = F.col("_sr")
    staged = staged.withColumn("_sr", T.stopword_ratio_from_tokens(F.col("_w")))
    outcome = (
        F.when(F.length("text") < MIN_CHARS, "1_too_short")
        .when(stop_ratio > MAX_STOP, "2_stopword_heavy")
        .when(stop_ratio < 0.02, "3_no_function_words")
        .otherwise("kept")
    )
    verdict = staged.select(outcome.alias("outcome"))
    total = verdict.agg(F.count(F.lit(1)).cast("double").alias("total"))
    return (
        verdict.groupBy("outcome")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(total))
        .select(
            "outcome",
            F.col("n_docs").cast("long").alias("n_docs"),
            rhalf(F.col("n_docs") / F.col("total"), 6).alias("share"),
        )
        .orderBy("outcome")
    )


# ---------------------------------------------------------------------------
# Near-dup cluster survivorship (golden record)
# ---------------------------------------------------------------------------


@query(
    "dedup_cluster_survivorship",
    oracle=f"""
    WITH all_docs AS (
        SELECT doc_id, text, lang, source, n_chars FROM documents
        WHERE doc_id < 400
        UNION ALL
        SELECT doc_id + 100000,
               text || CASE WHEN doc_id % 3 = 0 THEN ' extra tail words' ELSE '' END,
               lang, 'mirror', n_chars
        FROM documents WHERE doc_id < 120),
    hashed AS (
        SELECT *, {NORM_SQL.format(c='text')} AS norm FROM all_docs),
    keyed AS (
        -- cluster key: normalized text with the injected tail stripped
        SELECT *, regexp_replace(norm, ' extra tail words$', '') AS ckey
        FROM hashed),
    golden AS (
        SELECT ckey,
               MIN(doc_id) AS survivor_id,
               COUNT(*) AS n_members,
               MAX(length(norm)) AS best_len,
               MIN(lang) AS lang,
               list_sort(list_distinct(list(source))) AS sources
        FROM keyed GROUP BY ckey)
    SELECT survivor_id, CAST(n_members AS BIGINT) AS n_members,
           CAST(best_len AS BIGINT) AS best_len, lang,
           array_to_string(sources, ',') AS sources
    FROM golden
    WHERE n_members > 1
    ORDER BY survivor_id
    """,
    tags=("dedup", "survivorship", "golden-record"),
)
def dedup_cluster_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship (golden-record build) over near-dup clusters: after
    cluster assignment, each cluster collapses to one record with
    field-level survivorship rules — minimum id as the stable
    survivor key, LONGEST text variant's length, and the merged
    provenance set of sources. The fixture is mirrored with a
    deterministic tail mutation so clusters genuinely contain
    non-identical variants; the cluster key strips the mutation the
    same way on both engines. One grouped pass per cluster — the
    field-survivorship aggregates (max-length, collect_set) ride the
    same shuffle as the cluster key."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    ).where(F.col("doc_id") < 400)
    mirror = (
        docs.where(F.col("doc_id") < 120)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.when(
                F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" extra tail words"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "lang",
            F.lit("mirror").alias("source"),
            "n_chars",
        )
    )
    all_docs = docs.unionByName(mirror)
    norm = T.normalize(F.col("text"))
    keyed = all_docs.select(
        "doc_id",
        "lang",
        "source",
        norm.alias("norm"),
        F.regexp_replace(norm, " extra tail words$", "").alias("ckey"),
    )
    return (
        keyed.groupBy("ckey")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count(F.lit(1)).alias("n_members"),
            F.max(F.length("norm")).alias("best_len"),
            F.min("lang").alias("lang"),
            F.array_join(F.array_sort(F.collect_set("source")), ",").alias("sources"),
        )
        .where(F.col("n_members") > 1)
        .select(
            F.col("survivor_id").cast("long").alias("survivor_id"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("best_len").cast("long").alias("best_len"),
            "lang",
            "sources",
        )
        .orderBy("survivor_id")
    )
