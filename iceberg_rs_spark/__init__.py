"""iceberg_rs_spark — a PySpark-native analytics engine.

A brand-new engine with the capabilities that `oliverdaff/iceberg-rs`
(an Apache Iceberg v2 table-metadata model library) encodes and enables:

- a versioned table layer ("icelake"): typed evolving schemas, hidden
  partitioning via column transforms, declared sort orders, snapshot-based
  time travel with branches/tags, metadata inspection
  (see ``iceberg_rs_spark.model`` and ``iceberg_rs_spark.sources``);
- a full relational query surface executed by Spark SQL / Catalyst
  (see ``iceberg_rs_spark.plans``);
- large-scale training-data pipeline operators: dedup, similarity search,
  text analysis (see ``iceberg_rs_spark.operators``);
- structured-streaming operators over the events table
  (see ``iceberg_rs_spark.streaming``).

Everything is expressed against the DataFrame/SQL API so Catalyst +
Tungsten choose the physical strategy; Python UDFs only where built-ins
genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

from iceberg_rs_spark.session import get_spark  # noqa: F401
