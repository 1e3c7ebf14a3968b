"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine code lives in ``mrbf_spark/``; this module only adapts it to
the driver's (spark, sf_dir) calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mrbf_spark.tables import load_table
from mrbf_spark.bloom.pipeline import bloom_fp_pipeline
from mrbf_spark import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full four-job Bloom pipeline
    (split → linecount → build → probe → FP report) on sf0.001
    orders, keyed by o_orderpriority over unique o_orderkey values
    (SURVEY.md §3, B0)."""
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    return bloom_fp_pipeline(orders, "o_orderpriority", "o_orderkey", p=0.01)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    north-star extensions). See mrbf_spark/catalog.py."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; non-SQL-expressible ops
    (bloom build/probe internals, LSH bucketing) are omitted →
    rows-only checks."""
    return catalog.oracle_sql()
