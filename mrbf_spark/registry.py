"""Query registry: every operator registers a (spark, sf_dir) ->
DataFrame builder and (when SQL-expressible) a DuckDB oracle string.

The driver compares Spark output vs oracle output order-insensitively
but NAME-sensitively: every computed column must carry the same alias
on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


BUILDER_SQL: dict[str, str] = {}


def builder(name: str, oracle: str | None = None):
    """Decorator for an UNREGISTERED builder query: not part of the
    driver-checked catalog (kept ≤ 50 entries — the driver's
    correctness window), but its oracle SQL is retained in BUILDER_SQL
    so consolidated catalog entries can compose it into their own
    oracles (and tests can still exercise the builder directly)."""

    def deco(fn: QueryFn) -> QueryFn:
        if oracle is not None:
            BUILDER_SQL[name] = oracle
        return fn

    return deco


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle) to the
    catalog. oracle=None ⇒ rows-only check (non-SQL-expressible)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
