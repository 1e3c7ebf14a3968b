"""The data-ops audit suite as ONE driver-checked catalog entry
(r5, VERDICT r4 next-round #1): the Deequ-style constraint report
(functions/validation.py), the generic column profiler (same module),
and the snapshot diff (functions/diffing.py) — three report-shaped
operators a training-data pipeline runs around every ingest, union'd
under a `part` discriminator so each gains an independent driver
hash-check without three catalog slots.

Shared shape: (part, key, k2, id, n1..n6, ok) — all-nullable report
columns; each branch keeps its own plan (single-aggregate scan /
single-aggregate + Expand / digest full-outer join) and the union
adds no exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table
from .diffing import diff_events, diff_events_duckdb_sql
from .validation import (
    profile_duckdb_sql,
    profile_table,
    validate_events,
    validate_events_duckdb_sql,
)

# The events schema as the engine loads it (tables.py pins the ts
# vintage to timestamp) — shared by both engines so the profiler
# branches agree column-for-column.
_EVENTS_KINDS = [
    ("event_id", "int"),
    ("ts", "timestamp"),
    ("user_id", "int"),
    ("event_type", "string"),
    ("value", "float"),
    ("props", "string"),
]

_NB = "CAST(NULL AS BIGINT)"
_NV = "CAST(NULL AS VARCHAR)"


def _oracle() -> str:
    return f"""
    SELECT 'validate' AS part, "check" AS key, {_NV} AS k2, {_NB} AS id,
           violations AS n1, {_NB} AS n2, {_NB} AS n3, {_NB} AS n4,
           {_NB} AS n5, {_NB} AS n6, CAST(ok AS BIGINT) AS ok
    FROM ({validate_events_duckdb_sql()})
    UNION ALL
    SELECT 'profile' AS part, "column" AS key, dtype AS k2, {_NB} AS id,
           n AS n1, nulls AS n2, n_distinct AS n3, min_q AS n4,
           max_q AS n5, avg_len_q AS n6, CAST(NULL AS BIGINT) AS ok
    FROM ({profile_duckdb_sql('events', _EVENTS_KINDS)})
    UNION ALL
    SELECT 'diff_' || part AS part, status AS key, {_NV} AS k2,
           event_id AS id, n AS n1, {_NB} AS n2, {_NB} AS n3, {_NB} AS n4,
           {_NB} AS n5, {_NB} AS n6, CAST(NULL AS BIGINT) AS ok
    FROM ({diff_events_duckdb_sql()})
    """


@register("data_ops_suite", _oracle())
def data_ops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    nb = F.lit(None).cast("long")
    nv = F.lit(None).cast("string")
    # nullable booleans canonicalize differently across engines in the
    # compare harness — report ok as BIGINT 1/0/NULL instead
    nok = F.lit(None).cast("long")
    validate = validate_events(events, customer).select(
        F.lit("validate").alias("part"),
        F.col("check").alias("key"),
        nv.alias("k2"),
        nb.alias("id"),
        F.col("violations").alias("n1"),
        nb.alias("n2"),
        nb.alias("n3"),
        nb.alias("n4"),
        nb.alias("n5"),
        nb.alias("n6"),
        F.col("ok").cast("long").alias("ok"),
    )
    profile = profile_table(events).select(
        F.lit("profile").alias("part"),
        F.col("column").alias("key"),
        F.col("dtype").alias("k2"),
        nb.alias("id"),
        F.col("n").alias("n1"),
        F.col("nulls").alias("n2"),
        F.col("n_distinct").alias("n3"),
        F.col("min_q").alias("n4"),
        F.col("max_q").alias("n5"),
        F.col("avg_len_q").alias("n6"),
        nok.alias("ok"),
    )
    diff = diff_events(spark, sf_dir).select(
        F.concat(F.lit("diff_"), F.col("part")).alias("part"),
        F.col("status").alias("key"),
        nv.alias("k2"),
        F.col("event_id").alias("id"),
        F.col("n").alias("n1"),
        nb.alias("n2"),
        nb.alias("n3"),
        nb.alias("n4"),
        nb.alias("n5"),
        nb.alias("n6"),
        nok.alias("ok"),
    )
    return validate.unionByName(profile).unionByName(diff)
