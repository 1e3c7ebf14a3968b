"""Every catalog query with an oracle must match DuckDB exactly at
sf0.001 (the fast local version of the driver's sf0.01 t2 gate; the
full-size check is tools/check_correctness.py)."""

from __future__ import annotations

import os
import sys

import pytest

# slow (r10): duplicates the driver's own DuckDB t2 gate, which
# re-runs every entry each round (tools/check_correctness.py).
pytestmark = __import__('pytest').mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_correctness import compare, duck_con  # noqa: E402

from mrbf_spark import catalog  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402

QUERIES = catalog.queries()
ORACLES = catalog.oracle_sql()


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_SMOKE)


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, con, name):
    spark_pdf = QUERIES[name](spark, SF_SMOKE).toPandas()
    duck_pdf = con.sql(ORACLES[name]).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, problems


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0
