"""Every registered query must hash-match its DuckDB oracle at sf0.001.

This is a fast local replica of the driver's t2 gate (sf0.01); the full
check is ``python tools/oracle_check.py /root/testdata/sf0.01``.
"""

from __future__ import annotations

import pytest

from ccxt_ohlcv_fetcher_spark.plans import load_all
from tools.oracle_check import compare

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    spark_pdf = spec.builder(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check (driver parity)
        return
    oracle_pdf = duck.execute(spec.oracle).df()
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: {problems}"
