"""Sources & sinks: raw parquet fixtures + the icelake table layer."""

from iceberg_rs_spark.sources.fixtures import TABLES, load_table, load_tables, register_views  # noqa: F401
