from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from iceberg_rs_spark.session import get_spark  # noqa: E402
from iceberg_rs_spark.sources.fixtures import TABLES  # noqa: E402

# Correctness tests default to the smallest sf for speed; set
# SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to mimic the driver.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="iceberg_rs_spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()
