"""Plan-inspection utilities: the engine treats the physical plan as
an observable artifact — tests assert on it (tests/test_plans.py) and
developers audit every catalog query's plan with explain_catalog().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def physical_plan(df: DataFrame) -> str:
    """Executed (post-AQE-prepare) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def scan_line(df: DataFrame, table_hint: str = "") -> str:
    """The FileScan line (optionally matching a path substring) —
    where PushedFilters / ReadSchema live."""
    for line in physical_plan(df).splitlines():
        if "FileScan" in line and table_hint in line:
            return line.strip()
    return ""


def explain_catalog(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, str]:
    """Materialize the physical plan of every catalog query — the
    audit loop behind 'iterate until it's the plan you'd want'."""
    from ..catalog import queries

    qs = queries()
    out = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        try:
            out[name] = physical_plan(fn(spark, sf_dir))
        except Exception as exc:  # surface, don't hide, a broken plan
            out[name] = f"ERROR: {exc}"
    return out
