"""Pre-verify the driver's t2 gate: every registry query with an
oracle must hash-match DuckDB at sf0.001."""

from __future__ import annotations

import pytest

from rag_system_vector_db_spark.registry import LAZY_ORACLES, ORACLES, QUERIES
from tests.oracle import compare, duck_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    compare(df, con, ORACLES[name])


@pytest.mark.parametrize("name", sorted(LAZY_ORACLES))
def test_lazy_oracle_parity(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    compare(df, con, LAZY_ORACLES[name](sf_dir))


def test_every_query_runs(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
