"""UDF / UDAF / UDTF corpus (SURVEY.md §2C UDF surface): one
hash-checked query per declared extension mechanism —

- scalar pandas UDF (Arrow-vectorized)        → udf_scalar_pandas_bucket
- row-at-a-time Python UDF (the slow path)    → udf_scalar_python_classify
- applyInPandas / grouped map (UDAF-shaped)   → udf_grouped_map_zscore
- grouped-agg pandas UDF                      → udf_grouped_agg_median
- mapInArrow (UDTF-shaped, arrow batches)     → udf_map_in_arrow_bytes
- @udtf table function (Spark ≥ 3.5)          → udf_udtf_sequence

The reference has no UDFs (it has no execution at all); this surface
exists for the north-star operators and is pinned here against exact
SQL equivalents so the mechanism itself is oracle-checked.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.plans.canon import rhalf, rhalf_sql
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import load_table


@query(
    "udf_scalar_pandas_bucket",
    oracle="""
    SELECT o_orderkey,
           CAST(CASE WHEN o_totalprice < 50000 THEN 0
                     WHEN o_totalprice < 150000 THEN 1
                     ELSE 2 END AS INTEGER) AS price_bucket
    FROM orders
    WHERE o_orderkey < 2000
    ORDER BY o_orderkey
    """,
    tags=("udf", "pandas-udf", "scalar"),
)
def udf_scalar_pandas_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF: price bucketing in numpy.
    (Production code would use a CASE expression; the point here is
    pinning the Arrow batch path end-to-end.)"""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def bucket(p: pd.Series) -> pd.Series:
        return ((p >= 50000).astype("int32") + (p >= 150000).astype("int32")).astype(
            "int32"
        )

    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    return orders.select(
        "o_orderkey", bucket(F.col("o_totalprice")).alias("price_bucket")
    ).orderBy("o_orderkey")


@query(
    "udf_scalar_python_classify",
    oracle="""
    SELECT n_name,
           CASE WHEN length(n_name) % 3 = 0 THEN 'fizz'
                WHEN length(n_name) % 5 = 0 THEN 'buzz'
                ELSE 'plain' END AS cls
    FROM nation
    ORDER BY n_name
    """,
    tags=("udf", "python-udf", "scalar"),
)
def udf_scalar_python_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the declared slow path, exercised on
    a deliberately tiny input (25 rows). Anything hot must use the
    vectorized variants; see udf_scalar_pandas_bucket."""

    @F.udf("string")
    def classify(name: str) -> str:
        if len(name) % 3 == 0:
            return "fizz"
        if len(name) % 5 == 0:
            return "buzz"
        return "plain"

    nation = load_table(spark, sf_dir, "nation")
    return nation.select("n_name", classify(F.col("n_name")).alias("cls")).orderBy(
        "n_name"
    )


@query(
    "udf_grouped_map_zscore",
    oracle=f"""
    WITH s AS (
        SELECT event_id, event_type, value,
               AVG(value) OVER w AS mu,
               stddev_pop(value) OVER w AS sigma
        FROM events
        WHERE event_id < 3000
        WINDOW w AS (PARTITION BY event_type))
    SELECT event_id, event_type,
           {rhalf_sql('(value - mu) / sigma', 4)} AS z
    FROM s
    ORDER BY event_id
    """,
    tags=("udf", "applyInPandas", "grouped-map"),
)
def udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped map (UDAF-shaped): per-event_type z-score
    of value. Each group becomes one pandas DataFrame on an executor —
    the shape used for per-group model scoring at scale."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sigma = pdf["value"].std(ddof=0)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "z": (pdf["value"] - mu) / sigma,
            }
        )

    events = load_table(spark, sf_dir, "events").where(F.col("event_id") < 3000)
    out = events.groupBy("event_type").applyInPandas(
        zscore, schema="event_id bigint, event_type string, z double"
    )
    return out.select("event_id", "event_type", rhalf(F.col("z"), 4).alias("z")).orderBy(
        "event_id"
    )


@query(
    "udf_grouped_agg_median",
    oracle=f"""
    SELECT event_type,
           {rhalf_sql('median(value)', 2)} AS med_value,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("udf", "pandas-udf", "grouped-agg"),
)
def udf_grouped_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: exact median per event_type
    (both engines interpolate the middle pair on even counts)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median(v: pd.Series) -> float:
        return float(v.median())

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # pandas aggregates can't mix with JVM aggregates in one agg()
        return len(v)

    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            rhalf(median(F.col("value")), 2).alias("med_value"),
            n_rows(F.col("value")).alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "udf_map_in_arrow_bytes",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
    tags=("udf", "mapInArrow", "udtf-shaped"),
)
def udf_map_in_arrow_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: RecordBatch-level transform computing byte and
    character lengths with pyarrow.compute — zero pandas conversion,
    the leanest Python-side batch path."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def lengths(batches):
        for batch in batches:
            text = batch.column(batch.schema.get_field_index("text"))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int64()),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                ],
                names=["doc_id", "n_bytes", "n_chars"],
            )

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    out = docs.mapInArrow(lengths, schema="doc_id bigint, n_bytes bigint, n_chars bigint")
    return out.orderBy("doc_id")


@query(
    "udf_udtf_sequence",
    oracle="""
    SELECT r_name, unnest(generate_series(0, r_regionkey)) AS step
    FROM region
    ORDER BY r_name, step
    """,
    tags=("udf", "udtf", "table-function"),
)
def udf_udtf_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark ≥ 3.5): a table function emitting one row
    per step 0..r_regionkey for each input row — the lateral-join
    shape for custom row expanders."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="r_name string, step bigint")
    class Steps:
        def eval(self, r_name: str, r_regionkey: int):
            for i in range(int(r_regionkey) + 1):
                yield r_name, i

    region = load_table(spark, sf_dir, "region")
    region.createOrReplaceTempView("udtf_region_input")
    spark.udtf.register("steps_udtf", Steps)
    out = spark.sql(
        "SELECT s.r_name, s.step FROM udtf_region_input r, "
        "LATERAL steps_udtf(r.r_name, CAST(r.r_regionkey AS INT)) s"
    )
    return out.orderBy("r_name", "step")
