"""Engine expression helpers: partition transforms, similarity math,
text metrics — all built from pyspark.sql.functions so they stay
JVM-side inside whole-stage codegen."""

from iceberg_rs_spark.functions.transforms import (  # noqa: F401
    bucket,
    days_from_epoch,
    hours_from_epoch,
    months_from_epoch,
    transform_column,
    truncate,
    years_from_epoch,
)
