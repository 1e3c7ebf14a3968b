"""The engine's query catalog: importing this module registers every
operator query; `queries()`/`oracle_sql()` feed __spark_entry__.py."""

from __future__ import annotations

from .registry import ORACLES, QUERIES

# Import for registration side effects.
from .operators import relational as _relational  # noqa: F401
from .operators import bloom_queries as _bloom_queries  # noqa: F401


def queries():
    return dict(QUERIES)


def oracle_sql():
    return dict(ORACLES)
