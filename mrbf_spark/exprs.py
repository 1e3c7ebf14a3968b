"""Shared column-expression helpers.

Float sums are order-dependent in IEEE double, and Spark and DuckDB
aggregate in different orders — so any double SUM/AVG would hash-
mismatch the oracle in the low bits. Rule: aggregate through
DECIMAL(38,s) (exact, associative, order-insensitive) and cast the
final value back to double. Per-row double arithmetic is deterministic
(same IEEE ops both engines) and needs no such treatment.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col, scale: int = 4) -> Column:
    """Order-insensitive exact sum of a double column → double."""
    return F.sum(_c(col).cast(f"decimal(38,{scale})")).cast("double")


def davg(col, scale: int = 4) -> Column:
    """Order-insensitive mean: exact decimal sum / count, divided in
    double (deterministic given identical operands)."""
    return (dsum(col, scale) / F.count(F.lit(1))).cast("double")


def dsum_sql(expr: str, scale: int = 4) -> str:
    """DuckDB twin of dsum()."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 4) -> str:
    """DuckDB twin of davg()."""
    return f"CAST({dsum_sql(expr, scale)} / COUNT(*) AS DOUBLE)"
