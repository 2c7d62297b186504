"""Round-4 corpus additions, batch 23: the table vacuum lifecycle
audit — expire_snapshots + remove_orphan_files composed end-to-end
with every phase's state certified.

Maintenance procedures are where table formats silently lose data;
this query pins the full lifecycle (3 commits → planted orphan →
expire → vacuum) to an exact VALUES oracle, including the invariant
that matters: the readable row set never changes.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.sources.fixtures import load_table
from iceberg_rs_spark.sources.icelake import Catalog


@query(
    "table_vacuum_lifecycle_audit",
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total
               FROM events WHERE event_id % 3 = 0)
    SELECT * FROM (
        SELECT 1 AS step, 'snapshots_before' AS metric,
               CAST(3 AS BIGINT) AS value
        UNION ALL SELECT 2, 'rows_before', (SELECT total FROM n)
        UNION ALL SELECT 3, 'snapshots_expired', CAST(2 AS BIGINT)
        UNION ALL SELECT 4, 'snapshots_after', CAST(1 AS BIGINT)
        UNION ALL SELECT 5, 'orphans_removed', CAST(1 AS BIGINT)
        UNION ALL SELECT 6, 'rows_after', (SELECT total FROM n))
    ORDER BY step
    """,
    tags=("table", "maintenance", "vacuum"),
)
def table_vacuum_lifecycle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintenance lifecycle, audited end-to-end: three append
    commits build history; a stray parquet file is planted in the
    data directory (a crashed writer's leftover); expire_snapshots
    (retain_last=1) drops the two historical snapshots;
    remove_orphan_files deletes exactly the planted file and nothing
    referenced. Every phase emits a certified metric row, and the
    load-bearing invariant is checked twice: the READABLE ROW SET is
    identical before and after maintenance — vacuum must reclaim
    space, never data. Mirrors CALL system.expire_snapshots /
    remove_orphan_files; at scale both become distributed
    listing-joins, but the commit protocol audited here is the same."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("event_id") % 3 == 0
    )
    catalog = Catalog(spark, tempfile.mkdtemp(prefix="icelake_vacuum_"))
    t = catalog.create_table("db.events_vacuum", events.schema)
    for part in range(3):
        t.append(events.where(F.col("event_id") % 9 == part * 3))
    snaps_before = len(t.metadata.snapshots)
    rows_before = t.scan().count()
    # plant an orphan: a file in data/ no snapshot references
    orphan_path = os.path.join(t.location, "data", "stray-orphan.parquet")
    events.limit(5).write.mode("overwrite").parquet(orphan_path + ".tmp")
    part_file = next(
        f
        for f in os.listdir(orphan_path + ".tmp")
        if f.endswith(".parquet")
    )
    os.replace(os.path.join(orphan_path + ".tmp", part_file), orphan_path)
    expired = t.expire_snapshots(retain_last=1)
    orphans = t.remove_orphan_files()
    rows_after = t.scan().count()
    audit = [
        (1, "snapshots_before", snaps_before),
        (2, "rows_before", rows_before),
        (3, "snapshots_expired", len(expired)),
        (4, "snapshots_after", len(t.metadata.snapshots)),
        (5, "orphans_removed", len(orphans)),
        (6, "rows_after", rows_after),
    ]
    return spark.createDataFrame(
        audit, "step int, metric string, value long"
    ).orderBy("step")
