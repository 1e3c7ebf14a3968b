"""Shared column-expression helpers.

Float sums are order-dependent in IEEE double, and Spark and DuckDB
aggregate in different orders — so any double SUM/AVG would hash-
mismatch the oracle in the low bits. Rule: aggregate exactly in
fixed point (associative, order-insensitive) and convert back to
double once at the end. Per-row double arithmetic is deterministic
(same IEEE ops both engines) and needs no such treatment.

r7 hardening (found by the sf1 scale gate, q1 sum_charge): the
previous per-row `CAST(double AS DECIMAL(38,s))` was NOT engine-
portable at the rounding boundary — Spark converts through the
double's SHORTEST decimal representation (BigDecimal.valueOf ⇒
Double.toString) while DuckDB rounds the EXACT binary expansion, and
for ~1-in-10⁶ rows the two fall on opposite sides of the half-ulp
boundary (never fired at ≤600k rows across four rounds of gates;
fired twice in 6M rows at sf1). The fix is the engine's standard
fixed-point rule: scale by 10^s and TRUNCATE the same IEEE double on
both sides — `(long) x` in Spark and `TRUNC(x)` in DuckDB are the
identical toward-zero operation on the identical bit pattern, so the
per-row integers are equal by construction, their exact integer sum
is equal, and the single final int→double conversion (correctly
rounded in both engines) is equal.

Bounds: per-row |x|·10^s must fit int64 (|x| < 9.2·10^(18−s)); the
exact sum rides DECIMAL(38,0)/HUGEINT, far beyond any table here.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col, scale: int = 4) -> Column:
    """Order-insensitive, engine-portable sum of a double column →
    double (per-row toward-zero fixed point at 10^scale, exact
    integer aggregation, one final conversion)."""
    m = float(10**scale)
    q = (_c(col) * F.lit(m)).cast("long").cast("decimal(38,0)")
    return (F.sum(q).cast("double") / F.lit(m)).cast("double")


def davg(col, scale: int = 4) -> Column:
    """Order-insensitive mean: exact fixed-point sum / count, divided
    in double (deterministic given identical operands)."""
    return (dsum(col, scale) / F.count(F.lit(1))).cast("double")


def dsum_sql(expr: str, scale: int = 4, filter_where: str | None = None) -> str:
    """DuckDB twin of dsum() — TRUNC is the same toward-zero op on the
    same IEEE double that Spark's (long) cast performs. `filter_where`
    renders a SQL FILTER clause (the twin of Spark's pivot/when
    filtered aggregation)."""
    m = float(10**scale)
    flt = f" FILTER (WHERE {filter_where})" if filter_where else ""
    # outer parens: the expression ends in a division, so an unwrapped
    # embedding like `dsum_sql(a) / dsum_sql(b)` would left-associate
    # into A/m/B/m (found as a 1e8-off tpch ratio in the r7 gate)
    return (
        f"(CAST(SUM(CAST(TRUNC(({expr}) * {m}) AS HUGEINT)){flt} AS DOUBLE)"
        f" / {m})"
    )


def dfix_sql(expr: str, scale: int = 4) -> str:
    """Per-row fixed-point value as an exact integer (HUGEINT) — the
    DuckDB twin of dfix(); use when a PREDICATE or window compares
    row-level double expressions across engines (same rounding-
    boundary hazard as the sums, same cure)."""
    m = float(10**scale)
    return f"CAST(TRUNC(({expr}) * {m}) AS HUGEINT)"


def dfix(col, scale: int = 4) -> Column:
    """Per-row toward-zero fixed-point integer of a double column —
    bit-identical to dfix_sql on the same IEEE double."""
    m = float(10**scale)
    return (_c(col) * F.lit(m)).cast("long")


def davg_sql(expr: str, scale: int = 4) -> str:
    """DuckDB twin of davg()."""
    return f"CAST({dsum_sql(expr, scale)} / COUNT(*) AS DOUBLE)"
