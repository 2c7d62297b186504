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
