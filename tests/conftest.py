from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ccxt_ohlcv_fetcher_spark.schemas import TABLE_NAMES
from ccxt_ohlcv_fetcher_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # r13: the test session runs on local[8] by default. The fixtures
    # are tiny (sf0.001), so task-scheduling overhead dominates and 8
    # cores measured strictly faster than 32 across the suite
    # (test_analytics 68 -> 59.5 s, test_llm_ops 265 -> 202 s) — this
    # is test-infra sizing; bench.py still honors $SPARK_GRAFT_CPUS.
    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    spark = get_spark(
        "tests", master=f"local[{cpus}]", shuffle_partitions=8
    )
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
