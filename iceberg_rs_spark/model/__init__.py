"""Table-format metadata model (Iceberg spec v2), re-expressed in Python.

Functional equivalent of the reference's entire public surface
(`/root/reference/src/model/*.rs`): typed structs that serialize and
deserialize the v2 metadata JSON, with the same validation behavior.
Unlike the reference, these structs are *live* — they back the icelake
table layer (`iceberg_rs_spark.sources.icelake`), which executes the
capabilities the format encodes (snapshots, hidden partitioning, sort
orders, time travel) on Spark.
"""

from iceberg_rs_spark.model.types import (  # noqa: F401
    IceField,
    IceList,
    IceMap,
    IcePrimitive,
    IceStruct,
    ice_to_spark,
    parse_type,
    spark_to_ice,
    type_from_json,
    type_to_json,
)
from iceberg_rs_spark.model.schema import IceSchema, NameMapping  # noqa: F401
from iceberg_rs_spark.model.partition import PartitionField, PartitionSpec, Transform  # noqa: F401
from iceberg_rs_spark.model.sort import SortField, SortOrder  # noqa: F401
from iceberg_rs_spark.model.snapshot import Reference, Snapshot  # noqa: F401
from iceberg_rs_spark.model.table import MetadataLogEntry, SnapshotLogEntry, TableMetadata  # noqa: F401
