"""Scalar-function corpus (SURVEY.md §2C scalar functions): one query
per family — string, regex, date/time, math, conditional/null, array
(incl. higher-order functions), map/struct, JSON, casts, and the
epoch-relative partition-transform helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.functions.transforms import (
    days_from_epoch,
    hours_from_epoch,
    months_from_epoch,
    truncate,
    truncate_string,
    years_from_epoch,
)
from iceberg_rs_spark.plans.canon import rhalf
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import EVENTS_ORACLE_CTE, load_table


@query(
    "fn_string_family",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_up,
           lower(p_type) AS type_lo,
           concat(p_brand, '/', p_type) AS brand_type,
           substr(p_name, 1, 8) AS name_prefix,
           length(p_name) AS name_len,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           replace(p_type, ' ', '_') AS type_snake,
           trim(concat('  ', p_brand, '  ')) AS brand_trim,
           reverse(p_brand) AS brand_rev,
           repeat('*', p_size % 5) AS stars,
           translate(p_brand, 'Brand#', 'brand_') AS brand_tr,
           instr(p_type, 'ED') AS ed_pos,
           len(string_split(p_name, ' ')) AS n_words,
           levenshtein(p_brand, 'Brand#11') AS lev_to_11
    FROM part
    ORDER BY p_partkey
    """,
    tags=("scalar", "string"),
)
def fn_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over part."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.lower("p_type").alias("type_lo"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("brand_trim"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.lit("*"), F.col("p_size") % 5).alias("stars"),
        F.translate("p_brand", "Brand#", "brand_").alias("brand_tr"),
        F.instr(F.col("p_type"), "ED").alias("ed_pos"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.levenshtein("p_brand", F.lit("Brand#11")).alias("lev_to_11"),
    ).orderBy("p_partkey")


@query(
    "fn_regex_family",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           CASE WHEN regexp_matches(p_type, '^STANDARD') THEN 1 ELSE 0 END AS is_standard,
           CASE WHEN p_name LIKE '%blue%' THEN 1 ELSE 0 END AS has_blue,
           concat_ws('-', p_brand, CAST(p_size AS VARCHAR)) AS brand_size
    FROM part
    ORDER BY p_partkey
    """,
    tags=("scalar", "regex"),
)
def fn_regex_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / rlike / like / concat_ws."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.col("p_type").rlike("^STANDARD").cast("int").alias("is_standard"),
        F.col("p_name").like("%blue%").cast("int").alias("has_blue"),
        F.concat_ws("-", F.col("p_brand"), F.col("p_size").cast("string")).alias("brand_size"),
    ).orderBy("p_partkey")


@query(
    "fn_datetime_family",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           quarter(o_orderdate) AS qtr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dom,
           dayofweek(o_orderdate) + 1 AS dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(CAST(o_orderdate + INTERVAL 30 DAY AS DATE), '%Y-%m-%d') AS plus30,
           strftime(CAST(o_orderdate - INTERVAL 90 DAY AS DATE), '%Y-%m-%d') AS minus90,
           datediff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS plus3mo
    FROM orders
    WHERE o_orderkey <= 600
    ORDER BY o_orderkey
    """,
    tags=("scalar", "datetime"),
)
def fn_datetime_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (Spark dayofweek is 1-based Sunday; DuckDB is
    0-based — the oracle aligns)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 600)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.dayofweek(d).alias("dow"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus30"),
        F.date_format(F.date_sub(d.cast("date"), 90), "yyyy-MM-dd").alias("minus90"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).alias("days_to_y2k"),
        F.date_format(F.last_day(d.cast("date")), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months(d.cast("date"), 3), "yyyy-MM-dd").alias("plus3mo"),
    ).orderBy("o_orderkey")


@query(
    "fn_epoch_transforms",
    oracle=EVENTS_ORACLE_CTE
    + """
    SELECT event_id,
           year(ts) - 1970 AS ts_year,
           (year(ts) - 1970) * 12 + month(ts) - 1 AS ts_month,
           datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ts_day,
           datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) * 24 + hour(ts) AS ts_hour,
           user_id - (user_id % 10) AS user_trunc10,
           substr(event_type, 1, 3) AS type_trunc3
    FROM evt
    WHERE event_id <= 200
    ORDER BY event_id
    """,
    tags=("scalar", "transforms"),
)
def fn_epoch_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's partition transforms as query-side helpers
    (partition.rs:15-35): epoch-relative year/month/day/hour + truncate
    for ints and strings."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") <= 200)
    ts = F.col("ts")
    return ev.select(
        "event_id",
        years_from_epoch(ts).alias("ts_year"),
        months_from_epoch(ts).alias("ts_month"),
        days_from_epoch(ts).alias("ts_day"),
        hours_from_epoch(ts).alias("ts_hour"),
        truncate(10, F.col("user_id")).alias("user_trunc10"),
        truncate_string(3, F.col("event_type")).alias("type_trunc3"),
    ).orderBy("event_id")


@query(
    "fn_math_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_diff,
           round(l_extendedprice, 1) AS price_r1,
           CAST(floor(l_quantity / 7) AS BIGINT) AS qty_div7,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_kilo,
           round(exp(l_discount), 6) AS exp_disc,
           round(ln(l_extendedprice), 6) AS ln_price,
           round(log10(l_extendedprice), 6) AS log10_price,
           round(log2(l_quantity + 1), 6) AS log2_qty,
           round(pow(l_discount, 2), 6) AS disc_sq,
           round(sqrt(l_quantity), 6) AS sqrt_qty,
           CAST(l_orderkey AS BIGINT) % 7 AS mod7,
           ((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7 AS pmod7,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate
    FROM lineitem
    WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scalar", "math"),
)
def fn_math_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (pmod expressed portably; rand/bround excluded from
    hash-checking per FIXTURES.md rule 4)."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 200)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_diff"),
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor(F.col("l_quantity") / 7).alias("qty_div7"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_kilo"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        F.round(F.log2(F.col("l_quantity") + 1), 6).alias("log2_qty"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("pmod7"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "fn_conditional_null",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'HOME-OFFICE') AS seg_remap,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_class,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END AS bal_or_null,
           coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END, -1) AS bal_nvl,
           CASE WHEN isnan(c_acctbal / nullif(c_nationkey, 0)) THEN -999
                ELSE floor(c_acctbal / nullif(c_nationkey, 0) * 10000.0 + 0.5) / 10000.0 END AS per_nation
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("scalar", "conditional"),
)
def fn_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / CASE / isnan / null-propagation family."""
    c = load_table(spark, sf_dir, "customer")
    bal_or_null = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(
        F.round(F.col("c_acctbal"), 2)
    )
    ratio = F.col("c_acctbal") / F.nullif(F.col("c_nationkey").cast("double"), F.lit(0.0))
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("HOME-OFFICE")).alias(
            "seg_remap"
        ),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_class"),
        bal_or_null.alias("bal_or_null"),
        F.coalesce(bal_or_null, F.lit(-1)).alias("bal_nvl"),
        F.when(F.isnan(ratio), F.lit(-999.0)).otherwise(rhalf(ratio, 4)).alias("per_nation"),
    ).orderBy("c_custkey")


@query(
    "fn_array_hof_family",
    oracle="""
    WITH arrs AS (
        SELECT l_orderkey, list_sort(list(l_linenumber)) AS nums,
               list_sort(list(DISTINCT l_suppkey)) AS supps
        FROM lineitem WHERE l_orderkey <= 300 GROUP BY l_orderkey)
    SELECT l_orderkey,
           len(nums) AS n_lines,
           nums[1] AS first_line,
           CASE WHEN list_contains(nums, 3) THEN 1 ELSE 0 END AS has_line3,
           array_to_string(list_slice(nums, 1, 2), ',') AS first_two,
           CAST(list_sum(nums) AS INTEGER) AS line_sum,
           array_to_string([x * 2 for x in nums], ',') AS doubled,
           len([x for x in nums if x % 2 = 0]) AS n_even,
           CASE WHEN len([x for x in nums if x > 5]) > 0 THEN 1 ELSE 0 END AS has_gt5,
           CASE WHEN len([x for x in nums if x <= 7]) = len(nums) THEN 1 ELSE 0 END AS all_le7,
           array_to_string(list_reverse_sort(nums), ',') AS sorted_desc,
           len(supps) AS n_distinct_supps,
           array_to_string(list_transform(generate_series(1, 3), x -> CAST(x * 10 AS VARCHAR)), ',') AS seq_tens
    FROM arrs
    ORDER BY l_orderkey
    """,
    tags=("scalar", "array", "hof"),
)
def fn_array_hof_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order functions: size/element_at/contains/slice,
    aggregate/transform/filter/exists/forall, sort_array desc, sequence.
    Arrays are canonicalized to strings for cross-engine comparison."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 300)
    arrs = l.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_linenumber")).alias("nums"),
        F.array_sort(F.collect_set("l_suppkey")).alias("supps"),
    )
    nums = F.col("nums")
    return arrs.select(
        "l_orderkey",
        F.size(nums).alias("n_lines"),
        F.element_at(nums, 1).alias("first_line"),
        F.array_contains(nums, 3).cast("int").alias("has_line3"),
        F.array_join(F.slice(nums, 1, 2), ",").alias("first_two"),
        F.aggregate(nums, F.lit(0), lambda acc, x: acc + x).alias("line_sum"),
        F.array_join(F.transform(nums, lambda x: (x * 2).cast("string")), ",").alias("doubled"),
        F.size(F.filter(nums, lambda x: x % 2 == 0)).alias("n_even"),
        F.exists(nums, lambda x: x > 5).cast("int").alias("has_gt5"),
        F.forall(nums, lambda x: x <= 7).cast("int").alias("all_le7"),
        F.array_join(
            F.reverse(F.array_sort(nums)).cast("array<string>"), ","
        ).alias("sorted_desc"),
        F.size("supps").alias("n_distinct_supps"),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.lit(3)), lambda x: (x * 10).cast("string")), ","
        ).alias("seq_tens"),
    ).orderBy("l_orderkey")


@query(
    "fn_map_struct_json",
    oracle=EVENTS_ORACLE_CTE
    + """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS k_missing,
           event_type || ':' || CAST(user_id AS VARCHAR) AS struct_key,
           round(value, 2) AS value_field
    FROM evt
    WHERE event_id <= 300
    ORDER BY event_id
    """,
    tags=("scalar", "json", "struct"),
)
def fn_map_struct_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props column + struct build/field
    access (struct flattened to a string key for comparison)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") <= 300)
    s = F.struct(F.col("event_type").alias("t"), F.col("user_id").alias("u"), F.col("value").alias("v"))
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
        F.get_json_object("props", "$.missing").cast("bigint").alias("k_missing"),
        F.concat(s.getField("t"), F.lit(":"), s.getField("u").cast("string")).alias("struct_key"),
        F.round(s.getField("v"), 2).alias("value_field"),
    ).orderBy("event_id")


@query(
    "fn_map_ops",
    oracle=EVENTS_ORACLE_CTE
    + """
    , m AS (
        SELECT event_type,
               COUNT(*) AS n,
               ROUND(SUM(value), 2) AS total
        FROM evt GROUP BY event_type)
    SELECT event_type,
           array_to_string(list_sort(['count', 'total']), ',') AS map_keys_sorted,
           n AS count_val,
           total AS total_val
    FROM m
    ORDER BY event_type
    """,
    tags=("scalar", "map"),
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + map_keys/element_at (map canonicalized to
    sorted keys + extracted values — maps don't hash stably)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    m = F.create_map(
        F.lit("count"), F.col("n").cast("double"), F.lit("total"), F.col("total")
    )
    return agg.select(
        "event_type",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("map_keys_sorted"),
        F.element_at(m, "count").cast("bigint").alias("count_val"),
        F.element_at(m, "total").alias("total_val"),
    ).orderBy("event_type")


@query(
    "fn_cast_matrix",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS BIGINT) AS qty_long,
           CAST(l_quantity AS INTEGER) AS qty_int,
           CAST(round(l_extendedprice, 2) AS VARCHAR) AS price_str,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(8,4)) AS DECIMAL(28,6)) AS VARCHAR) AS tax_amount,
           CAST(l_returnflag = 'R' AS INTEGER) AS is_return,
           strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_day,
           CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip
    FROM lineitem
    WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scalar", "cast", "decimal"),
)
def fn_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast matrix across the §1.2 type lattice incl. decimal
    arithmetic with Iceberg-compatible precision/scale results."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 200)
    price_dec = F.col("l_extendedprice").cast("decimal(18,2)")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty_long"),
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.round("l_extendedprice", 2).cast("string").alias("price_str"),
        price_dec.cast("string").alias("price_dec"),
        (price_dec * F.col("l_tax").cast("decimal(8,4)"))
        .cast("decimal(28,6)")
        .cast("string")
        .alias("tax_amount"),
        (F.col("l_returnflag") == "R").cast("int").alias("is_return"),
        F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM-dd").alias("ship_day"),
        F.col("l_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "sub_scalar_correlated",
    oracle="""
    SELECT p.p_partkey, p.p_brand, ROUND(p.p_retailprice, 2) AS p_retailprice
    FROM part p
    WHERE p.p_retailprice > (SELECT AVG(p2.p_retailprice) FROM part p2
                             WHERE p2.p_brand = p.p_brand)
    ORDER BY p_partkey
    """,
    tags=("subquery", "correlated"),
)
def sub_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (parts above their brand's average),
    decorrelated to an aggregate + join — written directly in the
    decorrelated DataFrame form Catalyst would produce."""
    p = load_table(spark, sf_dir, "part")
    brand_avg = p.groupBy(F.col("p_brand").alias("b_brand")).agg(
        F.avg("p_retailprice").alias("brand_avg")
    )
    return (
        p.join(F.broadcast(brand_avg), p.p_brand == F.col("b_brand"))
        .where(F.col("p_retailprice") > F.col("brand_avg"))
        .select("p_partkey", "p_brand", F.round("p_retailprice", 2).alias("p_retailprice"))
        .orderBy("p_partkey")
    )
