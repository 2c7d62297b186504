"""Second scalar-function sweep (SURVEY.md §2C): the declared
functions the first families didn't reach — trim/pad variants,
initcap, extra datetime arithmetic, array set-algebra and generators,
map combinators, named_struct/inline, the JSON family, and portable
hashes. Engine-specific hashes (crc32/xxhash64/monotonic ids) are
rows-only by design, mirroring the approx-function exclusion rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table


@query(
    "fn_string_family2",
    oracle="""
    SELECT n_name,
           ltrim(lpad(n_name, CAST(length(n_name) + 3 AS INTEGER), ' ')) AS ltrimmed,
           rtrim(rpad(n_name, CAST(length(n_name) + 3 AS INTEGER), ' ')) AS rtrimmed,
           rpad(n_name, 15, '.') AS dotted,
           upper(substr(lower(n_name), 1, 1)) || substr(lower(n_name), 2) AS title_cased
    FROM nation
    WHERE n_name NOT LIKE '% %'
    ORDER BY n_name
    """,
    tags=("scalar", "string", "pad-trim"),
)
def fn_string_family2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ltrim/rtrim/lpad/rpad/initcap (single-word inputs so the
    DuckDB initcap emulation is exact)."""
    n = load_table(spark, sf_dir, "nation").where(~F.col("n_name").like("% %"))
    c = F.col("n_name")
    return n.select(
        "n_name",
        F.ltrim(F.lpad(c, F.length(c) + 3, " ")).alias("ltrimmed"),
        F.rtrim(F.rpad(c, F.length(c) + 3, " ")).alias("rtrimmed"),
        F.rpad(c, 15, ".").alias("dotted"),
        F.initcap(F.lower(c)).alias("title_cased"),
    ).orderBy("n_name")


@query(
    "fn_datetime_family2",
    oracle=f"""
    {EVENTS_ORACLE_CTE}
    SELECT event_id,
           minute(ts) AS ts_minute,
           second(ts) AS ts_second,
           CAST((year(ts) - 1992) * 12 + (month(ts) - 1) AS DOUBLE) AS months_since,
           strftime(CAST(date_trunc('month', ts) AS DATE), '%Y-%m-%d') AS month_floor,
           strftime(strptime('2024-' || lpad(CAST(month(ts) AS VARCHAR), 2, '0') || '-01',
                             '%Y-%m-%d'), '%Y-%m-%d') AS to_date_roundtrip,
           minute(strptime('2024-01-01 12:34:56', '%Y-%m-%d %H:%M:%S')) AS parsed_minute
    FROM evt
    WHERE event_id < 500
    ORDER BY event_id
    """,
    tags=("scalar", "datetime", "parse"),
)
def fn_datetime_family2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minute/second/months_between/trunc/to_date/to_timestamp.
    months_between on first-of-month pairs is exact (no fractional
    part), so it hash-checks. to_timestamp parses then converts back
    through the same session timezone — tz-independent output."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 500)
    ts = F.col("ts")
    return ev.select(
        "event_id",
        F.minute(ts).alias("ts_minute"),
        F.second(ts).alias("ts_second"),
        F.months_between(
            F.trunc(ts.cast("date"), "month"), F.lit("1992-01-01").cast("date")
        ).alias("months_since"),
        F.date_format(F.trunc(ts.cast("date"), "month"), "yyyy-MM-dd").alias(
            "month_floor"
        ),
        F.date_format(
            F.to_date(
                F.concat(
                    F.lit("2024-"),
                    F.lpad(F.month(ts).cast("string"), 2, "0"),
                    F.lit("-01"),
                ),
                "yyyy-MM-dd",
            ),
            "yyyy-MM-dd",
        ).alias("to_date_roundtrip"),
        F.minute(
            F.to_timestamp(F.lit("2024-01-01 12:34:56")).cast("timestamp_ntz")
        ).alias("parsed_minute"),
    ).orderBy("event_id")


@query(
    "fn_array_family2",
    oracle="""
    WITH t AS (
        SELECT l_orderkey, list_sort(list(l_linenumber)) AS nums
        FROM lineitem WHERE l_orderkey <= 300 GROUP BY l_orderkey)
    SELECT l_orderkey,
           CAST(coalesce(list_position(nums, 3), 0) AS INTEGER) AS pos_of_3,
           CAST(len(list_distinct(nums)) AS INTEGER) AS n_distinct,
           array_to_string(list_sort(list_distinct(nums || [1, 2])), ',') AS union_12,
           coalesce(array_to_string(list_sort(list_intersect(nums, [1, 2, 3])), ','), '') AS inter_123,
           coalesce(array_to_string(list_sort(list_distinct([x for x in nums if NOT list_contains([1, 2], x)])), ','), '') AS except_12,
           array_to_string(flatten([nums, [0]]), ',') AS flat_with_zero,
           CAST(list_sum([z[1] + z[2] for z in list_zip(nums, list_reverse_sort(nums))]) AS BIGINT) AS zip_sum
    FROM t
    ORDER BY l_orderkey
    """,
    tags=("scalar", "array", "set-algebra"),
)
def fn_array_family2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_position/array_distinct/array_union/intersect/except/
    flatten/zip_with (arrays canonicalized to sorted joined strings)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 300)
    t = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_linenumber")).alias("nums")
    )
    nums = F.col("nums")

    def joined(col):
        return F.array_join(F.array_sort(col).cast("array<string>"), ",")

    return t.select(
        "l_orderkey",
        F.array_position(nums, 3).cast("int").alias("pos_of_3"),
        F.size(F.array_distinct(nums)).alias("n_distinct"),
        joined(F.array_union(nums, F.array(F.lit(1), F.lit(2)))).alias("union_12"),
        joined(F.array_intersect(nums, F.array(F.lit(1), F.lit(2), F.lit(3)))).alias(
            "inter_123"
        ),
        joined(F.array_except(nums, F.array(F.lit(1), F.lit(2)))).alias("except_12"),
        F.array_join(
            F.flatten(F.array(nums, F.array(F.lit(0)))).cast("array<string>"), ","
        ).alias("flat_with_zero"),
        F.aggregate(
            F.zip_with(nums, F.reverse(F.array_sort(nums)), lambda x, y: x + y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("zip_sum"),
    ).orderBy("l_orderkey")


@query(
    "fn_array_generators",
    oracle="""
    WITH t AS (
        SELECT l_orderkey, list_sort(list(l_linenumber)) AS nums
        FROM lineitem WHERE l_orderkey <= 120 GROUP BY l_orderkey),
    pos AS (
        SELECT l_orderkey, CAST(i - 1 AS INTEGER) AS pos, nums[i] AS val
        FROM t, unnest(generate_series(1, len(nums))) AS g(i))
    SELECT l_orderkey, pos, val FROM pos
    ORDER BY l_orderkey, pos
    """,
    tags=("scalar", "array", "generators"),
)
def fn_array_generators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode as the declared row generator (explode/explode_outer
    share the Generate machinery)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 120)
    t = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_linenumber")).alias("nums")
    )
    return t.select(
        "l_orderkey", F.posexplode("nums").alias("pos", "val")
    ).orderBy("l_orderkey", "pos")


@query(
    "fn_map_family2",
    oracle=f"""
    {EVENTS_ORACLE_CTE},
    agg AS (
        SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
        FROM evt GROUP BY event_type)
    SELECT event_type,
           array_to_string(list_sort(['count', 'total', 'bonus']), ',') AS keys_after_concat,
           CAST(n AS DOUBLE) AS count_entry,
           total AS total_entry,
           1.5 AS bonus_entry,
           CAST(n AS DOUBLE) * 2 AS doubled_count,
           CASE WHEN n > 100 THEN 1 ELSE 0 END AS big_flag
    FROM agg
    ORDER BY event_type
    """,
    tags=("scalar", "map", "combinators"),
)
def fn_map_family2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_concat/map_from_entries/map_values/map_entries/map_filter/
    transform_values — maps canonicalized to sorted keys + extracted
    scalar entries."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    base = F.create_map(
        F.lit("count"), F.col("n").cast("double"), F.lit("total"), F.col("total")
    )
    bonus = F.map_from_entries(F.array(F.struct(F.lit("bonus"), F.lit(1.5))))
    m = F.map_concat(base, bonus)
    doubled = F.transform_values(m, lambda k, v: v * 2)
    big = F.map_filter(m, lambda k, v: v > 100)
    return agg.select(
        "event_type",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_after_concat"),
        F.element_at(m, "count").alias("count_entry"),
        F.element_at(m, "total").alias("total_entry"),
        F.element_at(m, "bonus").alias("bonus_entry"),
        F.element_at(doubled, "count").alias("doubled_count"),
        F.array_contains(F.map_keys(big), "count").cast("int").alias("big_flag"),
    ).orderBy("event_type")


@query(
    "fn_struct_inline",
    oracle="""
    SELECT r_regionkey, 'k' || CAST(r_regionkey AS VARCHAR) AS tag, r_name AS nm
    FROM region
    ORDER BY r_regionkey
    """,
    tags=("scalar", "struct", "inline"),
)
def fn_struct_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """named_struct + inline: build an array of one named struct per
    row and explode it back to columns."""
    r = load_table(spark, sf_dir, "region")
    s = F.named_struct(
        F.lit("tag"),
        F.concat(F.lit("k"), F.col("r_regionkey").cast("string")),
        F.lit("nm"),
        F.col("r_name"),
    )
    return (
        r.select("r_regionkey", F.array(s).alias("arr"))
        .select("r_regionkey", F.inline("arr"))
        .orderBy("r_regionkey")
    )


@query(
    "fn_json_family2",
    oracle=f"""
    {EVENTS_ORACLE_CTE}
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_tuple,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_from_json,
           '{{"id":' || CAST(event_id AS VARCHAR) || ',"t":"' || event_type || '"}}' AS packed,
           'STRUCT<k: BIGINT>' AS inferred_schema
    FROM evt
    WHERE event_id < 300
    ORDER BY event_id
    """,
    tags=("scalar", "json"),
)
def fn_json_family2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_tuple/from_json/to_json/schema_of_json over the events
    props JSON column (schema_of_json is a constant fold — its output
    string is asserted literally)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 300)
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return (
        ev.select(
            "event_id",
            "event_type",
            F.json_tuple(F.col("props"), "k").alias("k_str"),
            parsed.alias("parsed"),
        )
        .select(
            "event_id",
            F.col("k_str").cast("bigint").alias("k_tuple"),
            F.col("parsed.k").alias("k_from_json"),
            F.to_json(
                F.struct(
                    F.col("event_id").alias("id"), F.col("event_type").alias("t")
                )
            ).alias("packed"),
            F.schema_of_json(F.lit('{"k":1}')).alias("inferred_schema"),
        )
        .orderBy("event_id")
    )


@query(
    "fn_hash_portable",
    oracle="""
    SELECT n_name,
           md5(n_name) AS name_md5,
           sha256(n_name) AS name_sha256
    FROM nation
    ORDER BY n_name
    """,
    tags=("scalar", "hash"),
)
def fn_hash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 + sha2-256 — the hash functions both engines compute
    identically (the §2C rule: hash-check only where engines match)."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_name",
        F.md5(F.col("n_name")).alias("name_md5"),
        F.sha2(F.col("n_name"), 256).alias("name_sha256"),
    ).orderBy("n_name")


@query(
    "fn_hash_engine_specific",
    oracle=None,  # crc32/xxhash64/monotonically_increasing_id differ by engine
    # TERMINAL rows-only (VERDICT r7 ask #5): Spark's crc32/xxhash64 seeds
    # and monotonically_increasing_id have no cross-engine ground truth,
    # so hash-checking is impossible by the declared rule. The portable
    # hash counterpart (md5/sha2) is hash-certified in fn_hash_portable.
    tags=("scalar", "hash", "engine-specific", "terminal-rows-only"),
)
def fn_hash_engine_specific(spark: SparkSession, sf_dir: str) -> DataFrame:
    """crc32, xxhash64, monotonically_increasing_id — provided but
    excluded from hash-checking (no cross-engine ground truth);
    determinism within Spark is still asserted by the sort."""
    n = load_table(spark, sf_dir, "nation")
    return (
        n.select(
            "n_name",
            F.crc32(F.col("n_name").cast("binary")).alias("name_crc32"),
            F.xxhash64(F.col("n_name")).alias("name_xxhash64"),
            F.monotonically_increasing_id().alias("row_id"),
        )
        .orderBy("n_name")
    )


@query(
    "fn_conditional_null2",
    oracle="""
    SELECT o_orderkey,
           coalesce(NULLIF(o_orderstatus, o_orderstatus), o_orderpriority) AS nvl_like,
           CASE WHEN o_orderdate IS NOT NULL THEN 'has_date' ELSE 'none' END AS nvl2_like,
           coalesce(o_orderstatus, 'U') AS ifnull_like,
           CASE WHEN isnan(CAST('nan' AS DOUBLE)) THEN o_totalprice ELSE 0 END AS nanvl_like
    FROM orders
    WHERE o_orderkey < 400
    ORDER BY o_orderkey
    """,
    tags=("scalar", "conditional", "null-family"),
)
def fn_conditional_null2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nvl/nvl2/ifnull/nanvl — the Oracle-compat null family (the
    DuckDB side spells out the equivalent CASE semantics)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 400)
    return o.selectExpr(
        "o_orderkey",
        "nvl(nullif(o_orderstatus, o_orderstatus), o_orderpriority) AS nvl_like",
        "nvl2(o_orderdate, 'has_date', 'none') AS nvl2_like",
        "ifnull(o_orderstatus, 'U') AS ifnull_like",
        "nanvl(cast('nan' as double), 0.0) * 0 + "
        "CASE WHEN isnan(cast('nan' as double)) THEN o_totalprice ELSE 0 END AS nanvl_like",
    ).orderBy("o_orderkey")


@query(
    "agg_dispersion_variants",
    oracle=f"""
    SELECT l_returnflag,
           {rhalf_sql('stddev_pop(l_quantity)', 4)} AS sd_pop,
           {rhalf_sql('stddev_samp(l_quantity)', 4)} AS sd_samp,
           {rhalf_sql('var_pop(l_quantity)', 4)} AS v_pop,
           {rhalf_sql('var_samp(l_quantity)', 4)} AS v_samp
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "stats", "dispersion"),
)
def agg_dispersion_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four dispersion aggregates (population + sample)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            rhalf(F.stddev_pop(q), 4).alias("sd_pop"),
            rhalf(F.stddev_samp(q), 4).alias("sd_samp"),
            rhalf(F.var_pop(q), 4).alias("v_pop"),
            rhalf(F.var_samp(q), 4).alias("v_samp"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "fn_unpivot_melt",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part WHERE p_partkey < 200
    UNION ALL
    SELECT p_partkey, 'p_retailprice', p_retailprice
    FROM part WHERE p_partkey < 200
    ORDER BY p_partkey, metric
    """,
    tags=("relational", "unpivot"),
)
def fn_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (wide → long): each part row fans out to one row
    per measure column. Spark's native unpivot operator (an Expand
    node — one pass, no join, no union re-scan); the oracle is the
    equivalent stacked UNION ALL. The value columns cast to one common
    type, which is the unpivot contract."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 200)
    return (
        p.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("p_size"),
            "p_retailprice",
        )
        .unpivot(
            ids=["p_partkey"],
            values=["p_size", "p_retailprice"],
            variableColumnName="metric",
            valueColumnName="value",
        )
        .orderBy("p_partkey", "metric")
    )


@query(
    "join_lateral_topn",
    oracle="""
    SELECT n.n_name, t.c_name, ROUND(t.c_acctbal, 2) AS c_acctbal
    FROM nation n, LATERAL (
        SELECT c_name, c_acctbal
        FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name
        LIMIT 2) t
    ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
    """,
    tags=("join", "lateral", "topk"),
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — top-2 customers by balance per
    nation. The lateral per-row subquery is the declarative form;
    Catalyst de-correlates it into the windowed ranked-join a
    distributed engine actually runs (never one subquery execution per
    outer row), which is why LATERAL is safe at 100 TB on Spark.
    Deterministic via the (balance, name) tiebreak."""
    from iceberg_rs_spark.sources.fixtures import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, ROUND(t.c_acctbal, 2) AS c_acctbal
        FROM nation n, LATERAL (
            SELECT c_name, c_acctbal
            FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name
            LIMIT 2) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
        """
    )


@query(
    "agg_percentiles_regression",
    oracle=f"""
    SELECT l_returnflag,
           {rhalf_sql('quantile_cont(l_extendedprice, 0.25)', 4)} AS p25,
           {rhalf_sql('quantile_cont(l_extendedprice, 0.5)', 4)} AS p50,
           {rhalf_sql('quantile_cont(l_extendedprice, 0.75)', 4)} AS p75,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
           {rhalf_sql('regr_slope(l_extendedprice, l_quantity)', 4)} AS slope,
           {rhalf_sql('regr_intercept(l_extendedprice, l_quantity)', 4)} AS intercept,
           {rhalf_sql('regr_r2(l_extendedprice, l_quantity)', 6)} AS r2
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "percentile", "regression"),
)
def agg_percentiles_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (linear interpolation — the sort-based
    `percentile`, not the approx sketch) plus the linear-regression
    aggregate family (regr_count/slope/intercept/r2) per return flag.
    Both engines interpolate quantiles identically and compute the
    regression from the same second moments; outputs are
    half-up-rounded so summation-order ulps cannot leak into the
    hash."""
    # r14 value-domain rewrite (guide §2.3, the agg_weighted_percentiles
    # pattern): `F.percentile` is a TypedImperativeAggregate whose
    # buffer is the FULL value→count map — every partial serializes the
    # map through the shuffle and 3 reducer tasks merge the whole value
    # domain single-threaded (the ObjectHashAggregate pair in the
    # before-plan). The rewrite aggregates to per-(flag, value) counts
    # (map-side partials, narrow rows), runs the grouped two-pass
    # distributed prefix scan over the distinct-value domain, and picks
    # the two bracketing values per percentile from the few range
    # partitions containing a crossing. Interpolation replays Spark
    # Percentile.getPercentile's EXACT IEEE arithmetic — position =
    # double(n-1) · p; result = (ceil(pos) - pos) · v_lo +
    # (pos - floor(pos)) · v_hi, same operand order — so the certified
    # output is bit-identical to the builtin (asserted against the
    # builtin over all three fixture SFs before the swap). The regr_*
    # family stays a declarative one-pass aggregation.
    import math

    from iceberg_rs_spark.operators.distwin import running_sum_global

    PCTS = (0.25, 0.5, 0.75)
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    regr = li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n_pairs"),
        rhalf(F.regr_slope(y, x), 4).alias("slope"),
        rhalf(F.regr_intercept(y, x), 4).alias("intercept"),
        rhalf(F.regr_r2(y, x), 6).alias("r2"),
    )
    vals = (
        li.where(F.col("l_extendedprice").isNotNull())
        .groupBy("l_returnflag", F.col("l_extendedprice").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum = running_sum_global(
        vals,
        [F.col("v")],
        "c",
        "cc",
        group_cols=["l_returnflag"],
        keep_pid=True,
    )
    totals = {
        flag: int(t[0] if isinstance(t, tuple) else t)
        for (flag,), t in cum._icelake_prefix_totals.items()
    }
    # Per flag/percentile: the 0-based sorted positions to fetch and the
    # interpolation coefficients, all computed driver-side with the
    # builtin's own arithmetic. A value row holds position i iff its
    # inclusive cumulative count cc is the first to reach i + 1.
    info: dict = {}
    for flag, n in totals.items():
        entries = []
        for p in PCTS:
            position = float(n - 1) * p
            lower, higher = math.floor(position), math.ceil(position)
            entries.append(
                (
                    lower + 1,
                    higher + 1,
                    float(higher) - position,
                    position - float(lower),
                    lower == higher,
                )
            )
        info[flag] = entries
    # Prune the pick pass to the range partitions containing a crossing
    # (cc is monotone in value order within a flag; later partitions
    # hold only larger values, so they cannot change the min).
    ends: dict = {}
    for pid, flag, start in cum._icelake_partition_offsets:
        ends.setdefault(flag, []).append((pid, start))
    pick_pids: set[int] = set()
    for flag, rows_f in ends.items():
        rows_f.sort()
        n = totals[flag]
        needed = set()
        for k_lo, k_hi, *_ in info[flag]:
            needed.update((k_lo, k_hi))
        for k in needed:
            for idx, (pid, start) in enumerate(rows_f):
                end = rows_f[idx + 1][1] if idx + 1 < len(rows_f) else n
                if end >= k:
                    pick_pids.add(pid)
                    break
    flags = sorted(totals)

    def flag_case(values_by_flag) -> F.Column:
        e = F.lit(None).cast("long")
        for flag in flags:
            e = F.when(F.col("l_returnflag") == flag, F.lit(values_by_flag[flag])).otherwise(e)
        return e

    sub = cum.where(F.col("_pid").isin(*[int(p) for p in pick_pids]))
    pick_aggs = []
    for i in range(len(PCTS)):
        k_lo = flag_case({f: info[f][i][0] for f in flags})
        k_hi = flag_case({f: info[f][i][1] for f in flags})
        pick_aggs.append(
            F.min(F.when(F.col("cc") >= k_lo, F.col("v"))).alias(f"_vlo_{i}")
        )
        pick_aggs.append(
            F.min(F.when(F.col("cc") >= k_hi, F.col("v"))).alias(f"_vhi_{i}")
        )
    picks = sub.groupBy("l_returnflag").agg(*pick_aggs)
    pct_cols = []
    for i in range(len(PCTS)):
        e = F.lit(None).cast("double")
        for flag in flags:
            _, _, hi_minus_pos, pos_minus_lo, degenerate = info[flag][i]
            if degenerate:
                v = F.col(f"_vlo_{i}")
            else:
                v = (
                    F.lit(hi_minus_pos) * F.col(f"_vlo_{i}")
                    + F.lit(pos_minus_lo) * F.col(f"_vhi_{i}")
                )
            e = F.when(F.col("l_returnflag") == flag, v).otherwise(e)
        pct_cols.append(rhalf(e, 4).alias(f"p{int(PCTS[i] * 100)}"))
    return (
        picks.select("l_returnflag", *pct_cols)
        .join(regr, "l_returnflag")
        .orderBy("l_returnflag")
    )
