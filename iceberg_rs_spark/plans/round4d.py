"""Round-4 corpus additions, batch 3: bitwise/trig scalar families,
higher-moment & histogram aggregates, RFM segmentation and daily
anomaly scoring over the event stream, per-label embedding centroids,
snapshot rollback, and two composed curation pipelines (near-dup purge
accounting, training-mixture weighting).

Every query follows the corpus determinism rules (FIXTURES.md): total
ORDER BY over a unique key, floats rounded, no engine-specific
functions in hash-checked output. Where float ordering could decide a
rank (RFM ntiles), the ranking key is integerised (cents) first so
both engines sort identical values.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.operators import dedup as D
from iceberg_rs_spark.operators import text as T
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.plans.llm import (
    BANDS,
    NUM_HASHES,
    SHINGLE_K,
    _MINHASH_CTES,
    NORM_SQL,
)
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table
from iceberg_rs_spark.sources.icelake import Catalog

TOKENS_SQL = f"string_split({NORM_SQL.format(c='text')}, ' ')"


@query(
    "fn_bitwise_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_partkey << 3 AS shl3,
           l_orderkey >> 2 AS shr2,
           l_partkey & l_suppkey AS band,
           l_partkey | l_suppkey AS bor,
           xor(l_partkey, l_suppkey) AS bxor,
           ~l_suppkey AS bnot,
           bit_count(CAST(l_partkey AS BIGINT)) AS popcnt,
           CAST(l_orderkey & 255 AS BIGINT) AS low_byte
    FROM lineitem
    WHERE l_orderkey < 2000
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scalar", "bitwise"),
)
def fn_bitwise_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family (shifts, and/or/xor/not, popcount, byte
    masking) — the tool-kit behind hash partitioning, bloom bits, and
    bit-packed flags. Pure integer expressions: bit-identical across
    engines, whole-stage-codegen'd, pushdown-friendly."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 2000)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.shiftleft("l_partkey", 3).alias("shl3"),
        F.shiftright("l_orderkey", 2).alias("shr2"),
        F.col("l_partkey").bitwiseAND(F.col("l_suppkey")).alias("band"),
        F.col("l_partkey").bitwiseOR(F.col("l_suppkey")).alias("bor"),
        F.col("l_partkey").bitwiseXOR(F.col("l_suppkey")).alias("bxor"),
        F.bitwise_not(F.col("l_suppkey")).alias("bnot"),
        F.bit_count(F.col("l_partkey").cast("bigint")).alias("popcnt"),
        F.col("l_orderkey").bitwiseAND(F.lit(255)).cast("long").alias("low_byte"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "fn_trig_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(sin(l_discount), 6) AS sin_d,
           ROUND(cos(l_discount), 6) AS cos_d,
           ROUND(tan(l_discount), 6) AS tan_d,
           ROUND(asin(l_discount * 2), 6) AS asin_2d,
           ROUND(acos(l_tax * 2), 6) AS acos_2t,
           ROUND(atan(l_quantity), 6) AS atan_q,
           ROUND(atan2(l_tax, l_discount + 0.01), 6) AS atan2_td,
           ROUND(degrees(l_discount), 6) AS deg_d,
           ROUND(radians(l_quantity), 6) AS rad_q,
           ROUND(cbrt(l_quantity), 6) AS cbrt_q
    FROM lineitem
    WHERE l_orderkey < 1500
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scalar", "math", "trig"),
)
def fn_trig_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric / angular scalar family (sin..atan2, degree/radian
    conversion, cube root) — completes the math surface beyond
    fn_math_family. Inputs are bounded (discount/tax ≤ 0.2) so the
    inverse functions stay in domain; ROUND(x, 6) absorbs last-ulp
    libm differences between the JVM and DuckDB."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1500)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin("l_discount"), 6).alias("sin_d"),
        F.round(F.cos("l_discount"), 6).alias("cos_d"),
        F.round(F.tan("l_discount"), 6).alias("tan_d"),
        F.round(F.asin(F.col("l_discount") * 2), 6).alias("asin_2d"),
        F.round(F.acos(F.col("l_tax") * 2), 6).alias("acos_2t"),
        F.round(F.atan("l_quantity"), 6).alias("atan_q"),
        F.round(F.atan2(F.col("l_tax"), F.col("l_discount") + 0.01), 6).alias(
            "atan2_td"
        ),
        F.round(F.degrees("l_discount"), 6).alias("deg_d"),
        F.round(F.radians("l_quantity"), 6).alias("rad_q"),
        F.round(F.cbrt("l_quantity"), 6).alias("cbrt_q"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "agg_histogram_numeric",
    oracle="""
    SELECT CAST(floor(l_extendedprice / 5000) AS INTEGER) AS bucket,
           CAST(floor(l_extendedprice / 5000) * 5000 AS DOUBLE) AS lo,
           COUNT(*) AS n,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price,
           ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY 1, 2
    ORDER BY bucket
    """,
    tags=("agg", "histogram"),
)
def agg_histogram_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of a numeric column (the DESCRIBE/profiling
    primitive): bucket index from floor arithmetic — portable, unlike
    width_bucket edge conventions — with per-bucket count/min/max/sum.
    One partial-agged groupBy over ~20 buckets; a pure map-side
    combine at any scale."""
    l = load_table(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / 5000)
    return (
        l.groupBy(
            bucket.cast("int").alias("bucket"),
            (bucket * 5000).cast("double").alias("lo"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .orderBy("bucket")
    )


@query(
    "agg_higher_moments",
    oracle="""
    WITH s AS (
        SELECT l_returnflag AS flag,
               COUNT(*) AS n,
               SUM(l_quantity) AS s1,
               SUM(l_quantity * l_quantity) AS s2,
               SUM(l_quantity * l_quantity * l_quantity) AS s3,
               SUM(l_quantity * l_quantity * l_quantity * l_quantity) AS s4
        FROM lineitem GROUP BY 1),
    m AS (
        SELECT flag, n, s1 / n AS mean,
               s2 / n - (s1 / n) * (s1 / n) AS m2,
               s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * pow(s1 / n, 3) AS m3,
               s4 / n - 4 * (s1 / n) * (s3 / n)
                      + 6 * pow(s1 / n, 2) * (s2 / n) - 3 * pow(s1 / n, 4) AS m4
        FROM s),
    modes AS (
        SELECT flag, qty AS mode_qty FROM (
            SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty,
                   ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                      ORDER BY COUNT(*) DESC, qty ASC) AS rk
            FROM lineitem GROUP BY 1, 2) WHERE rk = 1)
    SELECT m.flag, m.n,
           ROUND(m.mean, 4) AS mean_qty,
           ROUND(m.m3 / pow(m.m2, 1.5), 4) + 0.0 AS skewness,
           ROUND(m.m4 / (m.m2 * m.m2) - 3, 4) + 0.0 AS kurtosis_excess,
           modes.mode_qty
    FROM m JOIN modes USING (flag)
    ORDER BY flag
    """,
    tags=("agg", "moments", "statistics"),
)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order distribution statistics per group: skewness and
    excess kurtosis derived from raw power sums (portable algebra —
    Spark's skewness()/kurtosis() and DuckDB's use different
    sample-vs-population conventions, so both engines compute the SAME
    formula from exact integer sums), plus the exact mode with a
    deterministic smallest-value tie-break. Two grouped passes (moment
    sums + mode ranking) joined on the 3-row flag key."""
    l = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    s = l.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count("*").alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
    )
    mean = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mean * mean
    m3 = F.col("s3") / F.col("n") - 3 * mean * (F.col("s2") / F.col("n")) + 2 * F.pow(
        mean, 3
    )
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * mean * (F.col("s3") / F.col("n"))
        + 6 * F.pow(mean, 2) * (F.col("s2") / F.col("n"))
        - 3 * F.pow(mean, 4)
    )
    moments = s.select(
        "flag",
        "n",
        F.round(mean, 4).alias("mean_qty"),
        # `+ 0.0` collapses IEEE negative zero (a -0.0/0.0 split between
        # engines is a hash mismatch despite equal values).
        (F.round(m3 / F.pow(m2, 1.5), 4) + F.lit(0.0)).alias("skewness"),
        (F.round(m4 / (m2 * m2) - 3, 4) + F.lit(0.0)).alias("kurtosis_excess"),
    )
    rk_w = Window.partitionBy("flag").orderBy(F.col("cnt").desc(), F.col("mode_qty").asc())
    modes = (
        l.groupBy(
            F.col("l_returnflag").alias("flag"),
            q.cast("long").alias("mode_qty"),
        )
        .agg(F.count("*").alias("cnt"))
        .withColumn("rk", F.row_number().over(rk_w))
        .where(F.col("rk") == 1)
        .select("flag", "mode_qty")
    )
    return moments.join(modes, "flag").orderBy("flag")


@query(
    "events_rfm_segments",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    per_user AS (
        SELECT user_id,
               DATE '2024-02-01' - MAX(CAST(ts AS DATE)) AS rec_days,
               COUNT(*) AS freq,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS money_cents
        FROM evt WHERE event_type = 'purchase'
        GROUP BY user_id),
    qb AS (
        SELECT quantile_cont(rec_days, 0.25) AS r1,
               quantile_cont(rec_days, 0.50) AS r2,
               quantile_cont(rec_days, 0.75) AS r3,
               quantile_cont(freq, 0.25) AS f1,
               quantile_cont(freq, 0.50) AS f2,
               quantile_cont(freq, 0.75) AS f3,
               quantile_cont(money_cents, 0.25) AS m1,
               quantile_cont(money_cents, 0.50) AS m2,
               quantile_cont(money_cents, 0.75) AS m3
        FROM per_user),
    scored AS (
        SELECT user_id, money_cents,
               1 + CAST(rec_days > r1 AS INT) + CAST(rec_days > r2 AS INT)
                 + CAST(rec_days > r3 AS INT) AS r,
               1 + CAST(freq < f3 AS INT) + CAST(freq < f2 AS INT)
                 + CAST(freq < f1 AS INT) AS f,
               1 + CAST(money_cents < m3 AS INT) + CAST(money_cents < m2 AS INT)
                 + CAST(money_cents < m1 AS INT) AS m
        FROM per_user CROSS JOIN qb)
    SELECT r, f, m,
           COUNT(*) AS n_users,
           ROUND(AVG(money_cents), 0) / 100.0 AS avg_monetary
    FROM scored
    GROUP BY r, f, m
    ORDER BY r, f, m
    """,
    tags=("events", "rfm", "segmentation", "percentile"),
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over the purchase stream: per-user
    recency/frequency/monetary scored 1 (best) to 4 against the EXACT
    quartile boundaries of each metric. Boundaries come from the
    distributed sort-based percentile aggregate — a 1-row relation
    broadcast back onto the users — so there is NO unpartitioned
    NTILE window funnelling the whole user population through a
    single partition (quantile-threshold scoring is the 100 TB
    formulation, and the textbook RFM definition anyway). Monetary is
    integerised to cents PER EVENT before the integer sum, so float
    summation order can never flip a boundary between engines."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    per_user = ev.groupBy("user_id").agg(
        F.datediff(
            F.lit("2024-02-01").cast("date"), F.max(F.col("ts").cast("date"))
        ).alias("rec_days"),
        F.count("*").alias("freq"),
        # Cents are fixed PER EVENT, then summed as integers: the sum is
        # order-exact, so neither engine nor partitioning can flip a cent
        # (a grand-total round(sum*100) sits one summation-order away
        # from a .5-cent boundary).
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("money_cents"),
    )
    qb = per_user.groupBy().agg(
        *[
            F.percentile(col, F.lit(p)).alias(f"{a}{i}")
            for a, c in (("r", "rec_days"), ("f", "freq"), ("m", "money_cents"))
            for i, p in ((1, 0.25), (2, 0.50), (3, 0.75))
            for col in (F.col(c),)
        ]
    )

    def b(cond) -> F.Column:
        return cond.cast("int")

    scored = per_user.crossJoin(F.broadcast(qb)).select(
        "user_id",
        "money_cents",
        (
            1
            + b(F.col("rec_days") > F.col("r1"))
            + b(F.col("rec_days") > F.col("r2"))
            + b(F.col("rec_days") > F.col("r3"))
        ).alias("r"),
        (
            1
            + b(F.col("freq") < F.col("f3"))
            + b(F.col("freq") < F.col("f2"))
            + b(F.col("freq") < F.col("f1"))
        ).alias("f"),
        (
            1
            + b(F.col("money_cents") < F.col("m3"))
            + b(F.col("money_cents") < F.col("m2"))
            + b(F.col("money_cents") < F.col("m1"))
        ).alias("m"),
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count("*").alias("n_users"),
            # Round in integer-cent space (an exact .5 rounds identically
            # everywhere), divide after — round(x/100, 2) would re-round
            # an inexact double.
            (F.round(F.avg("money_cents"), 0) / 100.0).alias("avg_monetary"),
        )
        .orderBy("r", "f", "m")
    )


@query(
    "events_anomaly_daily_zscore",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    daily AS (
        SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n
        FROM evt GROUP BY 1, 2),
    stats AS (
        SELECT d, event_type, n,
               AVG(n) OVER (PARTITION BY event_type) AS mu,
               STDDEV_SAMP(n) OVER (PARTITION BY event_type) AS sigma
        FROM daily)
    SELECT strftime(d, '%Y-%m-%d') AS day, event_type, n,
           ROUND((n - mu) / sigma, 2) + 0.0 AS z,
           CASE WHEN ABS((n - mu) / sigma) >= 2 THEN 1 ELSE 0 END AS is_anomaly
    FROM stats
    ORDER BY day, event_type
    """,
    tags=("events", "anomaly", "zscore", "window"),
)
def events_anomaly_daily_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-volume anomaly scoring: per event type, each day's
    count is z-scored against that type's own distribution over the
    window (the standard ops-monitoring control chart). The raw stream
    collapses to |days|×|types| rows in one grouped pass; the
    unbounded stat window runs over that tiny aggregate, never over
    events. Counts are integers so mean/stddev agree across engines to
    well past the rounded precision."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("d"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type")
    z = (F.col("n") - F.avg("n").over(w)) / F.stddev_samp("n").over(w)
    return (
        daily.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "event_type",
            "n",
            (F.round(z, 2) + F.lit(0.0)).alias("z"),  # collapse IEEE -0.0
            (F.abs(z) >= 2).cast("int").alias("is_anomaly"),
        )
        .orderBy("day", "event_type")
    )


@query(
    "sim_centroid_per_label",
    oracle="""
    WITH e AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings),
    cent AS (
        SELECT label, dim, AVG(v) AS c FROM e GROUP BY label, dim),
    dots AS (
        SELECT e.vec_id, e.label,
               SUM(e.v * cent.c) AS dot, SUM(e.v * e.v) AS n2
        FROM e JOIN cent ON e.label = cent.label AND e.dim = cent.dim
        GROUP BY e.vec_id, e.label),
    cn AS (SELECT label, SUM(c * c) AS c2 FROM cent GROUP BY label),
    cos AS (
        SELECT d.vec_id, d.label,
               d.dot / (sqrt(d.n2) * sqrt(cn.c2)) AS cs
        FROM dots d JOIN cn ON d.label = cn.label),
    ranked AS (
        SELECT label, vec_id, cs,
               ROW_NUMBER() OVER (PARTITION BY label
                                  ORDER BY cs ASC, vec_id) AS rk
        FROM cos)
    SELECT label,
           COUNT(*) AS n_vecs,
           ROUND(AVG(cs), 3) AS avg_cos,
           ROUND(MIN(cs), 3) AS min_cos,
           CAST(MAX(CASE WHEN rk = 1 THEN vec_id END) AS BIGINT) AS outlier_vec
    FROM ranked
    GROUP BY label
    ORDER BY label
    """,
    tags=("llm", "similarity", "centroid", "outlier"),
)
def sim_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroids with cohesion stats and the
    farthest member (argmin cosine — the label-noise / outlier-mining
    primitive in embedding-space data curation). The exploded
    (vec,dim) relation aggregates to |labels|×|dims| centroids —
    metadata-sized, AQE broadcasts it back onto the exploded stream —
    and every product stays a JVM column expression. No driver-side
    vector math, no crossJoin: cost is O(n·d) + one broadcast join at
    any corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "v")
    ).withColumn("v", F.col("v").cast("double"))
    cent = e.groupBy("label", "dim").agg(F.avg("v").alias("c"))
    dots = (
        e.join(cent, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("v") * F.col("c")).alias("dot"),
            F.sum(F.col("v") * F.col("v")).alias("n2"),
        )
    )
    cn = cent.groupBy("label").agg(F.sum(F.col("c") * F.col("c")).alias("c2"))
    cos = dots.join(cn, "label").select(
        "vec_id",
        "label",
        (F.col("dot") / (F.sqrt("n2") * F.sqrt("c2"))).alias("cs"),
    )
    rk_w = Window.partitionBy("label").orderBy(F.col("cs").asc(), F.col("vec_id"))
    return (
        cos.withColumn("rk", F.row_number().over(rk_w))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("cs"), 3).alias("avg_cos"),
            F.round(F.min("cs"), 3).alias("min_cos"),
            F.max(F.when(F.col("rk") == 1, F.col("vec_id")))
            .cast("long")
            .alias("outlier_vec"),
        )
        .orderBy("label")
    )


@query(
    "table_rollback_restore",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    kept AS (SELECT * FROM evt WHERE event_id % 3 <> 1)
    SELECT 'head_seq' AS kind, '3' AS detail
    UNION ALL SELECT 'n_snapshots', '3'
    UNION ALL SELECT 'ops', 'append,append,append'
    UNION ALL SELECT 'rows', CAST(COUNT(*) AS VARCHAR) FROM kept
    UNION ALL SELECT 'sum_cents',
              CAST(CAST(ROUND(SUM(value) * 100) AS BIGINT) AS VARCHAR) FROM kept
    ORDER BY kind
    """,
    tags=("table", "rollback", "time-travel"),
)
def table_rollback_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot rollback (CALL system.rollback_to_snapshot — the
    bad-commit recovery path the reference's snapshot lineage exists
    for, snapshot.rs:43-65): append A, append a bad batch B, roll main
    back to A's snapshot (metadata-only — B's snapshot stays in the
    log for audit, simply unreachable from main), then append C on the
    restored head. The final state must be exactly A+C, the new head's
    parent must be A, and all three append snapshots remain listed."""
    events = load_table(spark, sf_dir, "events")
    catalog = Catalog(spark, tempfile.mkdtemp(prefix="icelake_rollback_"))
    t = catalog.create_table("db.events_rb", events.schema)
    t.append(events.where(F.col("event_id") % 3 == 0))
    good_head = t.metadata.current_snapshot_id
    t.append(events.where(F.col("event_id") % 3 == 1))  # the bad batch
    t.rollback_to_snapshot(good_head)
    t.append(events.where(F.col("event_id") % 3 == 2))
    snaps = t.snapshots()
    meta = snaps.groupBy().agg(
        F.max("sequence_number").cast("string").alias("head_seq"),
        F.count("*").cast("string").alias("n_snapshots"),
        F.concat_ws(",", F.collect_list("operation")).alias("ops"),
    )
    final = t.scan()
    stats = final.groupBy().agg(
        F.count("*").cast("string").alias("rows"),
        F.round(F.sum("value") * 100).cast("long").cast("string").alias("sum_cents"),
    )
    return (
        meta.selectExpr(
            "stack(3, 'head_seq', head_seq, 'n_snapshots', n_snapshots, "
            "'ops', ops) AS (kind, detail)"
        )
        .unionByName(
            stats.selectExpr(
                "stack(2, 'rows', rows, 'sum_cents', sum_cents) AS (kind, detail)"
            )
        )
        .orderBy("kind")
    )


@query(
    "pipeline_dedup_purge",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_CTES.replace("FROM documents", "FROM documents WHERE doc_id < 300", 1)},
    near AS (
        SELECT i2.id_a, i2.id_b
        FROM inter i2
        JOIN sizes na ON na.doc_id = i2.id_a
        JOIN sizes nb ON nb.doc_id = i2.id_b
        WHERE i2.i * 1.0 / (na.n + nb.n - i2.i) >= 0.6),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM near
        UNION SELECT id_b, id_a FROM near),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    reach AS (
        SELECT node, node AS root FROM nodes
        UNION
        SELECT e.v AS node, r.root FROM reach r JOIN edges e ON e.u = r.node),
    comp AS (
        SELECT node, MIN(root) AS component FROM reach GROUP BY node),
    purged AS (SELECT node AS doc_id FROM comp WHERE node <> component)
    SELECT d.lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_purged,
           CAST(SUM(CASE WHEN p.doc_id IS NOT NULL THEN d.n_chars ELSE 0 END)
               AS BIGINT) AS purged_chars,
           ROUND(SUM(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS purge_rate
    FROM documents d LEFT JOIN purged p ON d.doc_id = p.doc_id
    WHERE d.doc_id < 300
    GROUP BY d.lang
    ORDER BY d.lang
    """,
    tags=("pipeline", "dedup", "clustering", "composed"),
)
def pipeline_dedup_purge(
    spark: SparkSession, sf_dir: str, max_bucket_width: int | None = None
) -> DataFrame:
    """The APPLY step of near-duplicate dedup, end to end: MinHash-LSH
    candidate pairs → exact-Jaccard verify (≥0.6) → connected
    components → keep each cluster's minimum id, purge the rest →
    per-language reduction accounting. This is what a production
    corpus dedup actually ships (not the pair list — the purge
    decision and its audit numbers). Candidate generation is
    band-bucketed, clustering is the O(log n) alternating-star CC,
    and the purge set joins back to the corpus on doc_id — no step is
    quadratic or driver-side. Window-bounded to doc_id < 300 like the
    other pair-level oracles; the operators are unbounded."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    near = D.near_dup_pairs_minhash(
        docs,
        num_hashes=NUM_HASHES,
        bands=BANDS,
        shingle_k=SHINGLE_K,
        threshold=0.6,
        # default off: organic fixtures need no cap and the corpus
        # query's oracle is the exact all-pairs purge; a boilerplate-
        # heavy deployment arms it (VERDICT r11 #5) and accepts the
        # chain semantics documented on near_dup_pairs_minhash
        max_bucket_width=max_bucket_width,
    ).select("id_a", "id_b")
    comp = D.connected_components(near)
    purged = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id"), F.lit(1).alias("purge")
    )
    flagged = docs.select("doc_id", "lang", "n_chars").join(purged, "doc_id", "left")
    is_purged = F.col("purge").isNotNull()
    return (
        flagged.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(is_purged.cast("long")).alias("n_purged"),
            F.sum(F.when(is_purged, F.col("n_chars")).otherwise(F.lit(0)))
            .cast("long")
            .alias("purged_chars"),
            F.round(F.sum(is_purged.cast("double")) / F.count("*"), 4).alias(
                "purge_rate"
            ),
        )
        .orderBy("lang")
    )


@query(
    "pipeline_mixture_weights",
    oracle=f"""
    WITH toks AS (
        SELECT source,
               len(list_filter({TOKENS_SQL}, x -> x <> '')) AS n_tok
        FROM documents),
    per_source AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS tokens
        FROM toks GROUP BY source),
    weighted AS (
        SELECT *, pow(tokens, 0.7) AS w FROM per_source),
    norm AS (
        SELECT SUM(w) AS tot_w, CAST(SUM(tokens) AS DOUBLE) AS tot_tok
        FROM weighted)
    SELECT w.source, w.n_docs, w.tokens,
           ROUND(w.w / norm.tot_w, 4) AS mix_share,
           ROUND((w.w / norm.tot_w) * norm.tot_tok / w.tokens, 3) AS epochs
    FROM weighted w CROSS JOIN norm
    ORDER BY w.source
    """,
    tags=("pipeline", "mixture", "sampling"),
)
def pipeline_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture weighting with temperature-scaled source
    shares (the multilingual/multi-source sampling rule: weight ∝
    tokens^α with α=0.7 flattens the head, upsamples the tail):
    per-source token counts, normalized mixture share, and the implied
    epochs-per-source at a one-total-epoch token budget — exactly the
    table a data-mixing run is configured from. Token counting is one
    map-side pass; everything after operates on the |sources|-row
    aggregate, with the two scalars joined back as a broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.size(F.filter(T.tokens(F.col("text")), lambda x: x != "")).alias("n_tok"),
    )
    per_source = toks.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("tokens"),
    )
    weighted = per_source.withColumn("w", F.pow(F.col("tokens"), 0.7))
    norm = weighted.groupBy().agg(
        F.sum("w").alias("tot_w"),
        F.sum("tokens").cast("double").alias("tot_tok"),
    )
    return (
        weighted.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "n_docs",
            "tokens",
            F.round(F.col("w") / F.col("tot_w"), 4).alias("mix_share"),
            F.round(
                (F.col("w") / F.col("tot_w")) * F.col("tot_tok") / F.col("tokens"), 3
            ).alias("epochs"),
        )
        .orderBy("source")
    )
