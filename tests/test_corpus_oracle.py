"""The t2 gate, locally: every corpus query runs on Spark (DataFrame
plan) and DuckDB (oracle SQL) over identical parquet and must match."""

from __future__ import annotations

import pytest

from iceberg_rs_spark.plans import CORPUS
from tests.oracle_utils import assert_frames_match


@pytest.mark.parametrize("name", sorted(CORPUS))
def test_corpus_query_matches_oracle(name, spark, duck, sf_dir):
    spec = CORPUS[name]
    sdf = spec.builder(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    duck_pdf = duck.sql(spec.oracle).df()
    assert_frames_match(spark_pdf, duck_pdf, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(e.queries()) == len(CORPUS)
    assert set(e.oracle_sql()) <= set(e.queries())


def test_priority_queries_lead_registry():
    """The driver verifies only the first 50 queries() entries per round;
    names in corpus.PRIORITY (no/stale driver row) must come first."""
    import __spark_entry__ as e
    from iceberg_rs_spark.plans import corpus

    names = list(e.queries())
    registered_priority = [n for n in corpus.PRIORITY if n in corpus.CORPUS]
    assert names[: len(registered_priority)] == registered_priority
    # Everything registered is still present exactly once.
    assert sorted(names) == sorted(corpus.CORPUS)


@pytest.mark.parametrize(
    "name",
    [
        # the queries whose semantics touch timestamps hardest: stream
        # watermark casts + closed-window cutoff, epoch transforms,
        # datetime scalar family, hour-grid interpolation
        "stream_stream_abandoned_clicks",
        "fn_epoch_transforms",
        "fn_datetime_family2",
        "ts_gapfill_interpolate",
    ],
)
def test_timezone_independence(name, spark, duck, sf_dir):
    """The driver's session timezone is not guaranteed to be UTC; every
    query must produce identical (hash-equal) results regardless. This
    sweep caught a real bug once: a naive-datetime literal cast under a
    non-UTC session shifted the outer stream join's closed-window
    cutoff by the zone offset."""
    spec = CORPUS[name]
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        spark_pdf = spec.builder(spark, sf_dir).toPandas()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert_frames_match(spark_pdf, duck.sql(spec.oracle).df(), name=f"tz:{name}")
