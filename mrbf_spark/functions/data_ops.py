"""The data-ops audit suite as ONE driver-checked catalog entry
(r5, VERDICT r4 next-round #1): the Deequ-style constraint report
(functions/validation.py), the generic column profiler (same module),
the snapshot diff (functions/diffing.py), and — since r6 — the full
MERGE INTO output (merge_upsert over the same deterministic snapshot
pair, delete_missing=True so all four actions appear) — the
report-shaped operators a training-data pipeline runs around every
ingest, union'd under a `part` discriminator so each gains an
independent driver hash-check without four catalog slots.

Shared shape: (part, key, k2, id, n1..n6, ok, s1) — all-nullable
report columns; each branch keeps its own plan (single-aggregate scan
/ single-aggregate + Expand / digest full-outer join / one pk
full-outer join) and the union adds no exchange. The merge part maps
every merged row: key=__action, k2=event_type, id=event_id,
n1=user_id, n2=epoch-micros(ts), n3=floor(value·1e6) (float→double
widening is exact and ×1e6 + floor is the same IEEE op on both
engines), s1=props — so insert/update/unchanged/delete semantics AND
the source-row-wins column payload are value-hash-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table
from .diffing import (
    BUMP_NEW,
    DROP_NEW,
    DROP_OLD,
    diff_events,
    diff_events_duckdb_sql,
    merge_upsert,
    merge_upsert_duckdb_sql,
)
from .rollup import rollup_maintain
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


# The deterministic snapshot pair, shared by the diff part (inside
# diff_events_duckdb_sql) and the merge part below — same DROP/BUMP
# knobs as functions/diffing.py.
_MERGE_OLD = f"(SELECT * FROM events WHERE event_id % {DROP_OLD[0]} <> {DROP_OLD[1]})"
_MERGE_NEW = f"""(SELECT event_id, ts, user_id, event_type,
             CASE WHEN event_id % {BUMP_NEW[0]} = {BUMP_NEW[1]}
                  THEN value * 2 ELSE value END AS value, props
      FROM events WHERE event_id % {DROP_NEW[0]} <> {DROP_NEW[1]})"""
_EVENT_COLS = ["ts", "user_id", "event_type", "value", "props"]


def _oracle() -> str:
    merge = merge_upsert_duckdb_sql(
        "event_id", _EVENT_COLS, old=_MERGE_OLD, new=_MERGE_NEW,
        delete_missing=True,
    )
    return f"""
    SELECT 'validate' AS part, "check" AS key, {_NV} AS k2, {_NB} AS id,
           violations AS n1, {_NB} AS n2, {_NB} AS n3, {_NB} AS n4,
           {_NB} AS n5, {_NB} AS n6, CAST(ok AS BIGINT) AS ok,
           {_NV} AS s1
    FROM ({validate_events_duckdb_sql()})
    UNION ALL
    SELECT 'profile' AS part, "column" AS key, dtype AS k2, {_NB} AS id,
           n AS n1, nulls AS n2, n_distinct AS n3, min_q AS n4,
           max_q AS n5, avg_len_q AS n6, CAST(NULL AS BIGINT) AS ok,
           {_NV} AS s1
    FROM ({profile_duckdb_sql('events', _EVENTS_KINDS)})
    UNION ALL
    SELECT 'diff_' || part AS part, status AS key, {_NV} AS k2,
           event_id AS id, n AS n1, {_NB} AS n2, {_NB} AS n3, {_NB} AS n4,
           {_NB} AS n5, {_NB} AS n6, CAST(NULL AS BIGINT) AS ok,
           {_NV} AS s1
    FROM ({diff_events_duckdb_sql()})
    UNION ALL
    SELECT 'merge' AS part, __action AS key, event_type AS k2,
           event_id AS id, CAST(user_id AS BIGINT) AS n1,
           epoch_us(ts) AS n2,
           CAST(floor(CAST(value AS DOUBLE) * 1000000.0) AS BIGINT) AS n3,
           {_NB} AS n4, {_NB} AS n5, {_NB} AS n6,
           CAST(NULL AS BIGINT) AS ok, props AS s1
    FROM ({merge})
    UNION ALL
    -- rollup part (r9): the oracle is a DIRECT RECOMPUTE over the new
    -- snapshot, while the engine reaches the same rows by maintaining
    -- the old snapshot's rollup through CDC deltas
    -- (functions/rollup.py) — an independent-formulation check of the
    -- incremental view-maintenance path.
    SELECT 'rollup' AS part, event_type AS key,
           CAST(user_id % 101 AS VARCHAR) AS k2, {_NB} AS id,
           CAST(count(*) AS BIGINT) AS n1, CAST(sum(v) AS BIGINT) AS n2,
           min(v) AS n3, max(v) AS n4, {_NB} AS n5, {_NB} AS n6,
           CAST(NULL AS BIGINT) AS ok, {_NV} AS s1
    FROM (SELECT event_type, user_id,
                 CAST(floor(CAST(value AS DOUBLE) * 1000000.0) AS BIGINT) AS v
          FROM {_MERGE_NEW} t)
    GROUP BY event_type, user_id % 101
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
        nv.alias("s1"),
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
        nv.alias("s1"),
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
        nv.alias("s1"),
    )
    # merge part (r6): the same deterministic old/new snapshot pair
    # the diff part classifies, pushed through the four-action MERGE —
    # every output row (action + winning column payload) hash-checked.
    old = events.filter(F.pmod(F.col("event_id"), F.lit(DROP_OLD[0])) != DROP_OLD[1])
    new = events.filter(
        F.pmod(F.col("event_id"), F.lit(DROP_NEW[0])) != DROP_NEW[1]
    ).withColumn(
        "value",
        F.when(
            F.pmod(F.col("event_id"), F.lit(BUMP_NEW[0])) == BUMP_NEW[1],
            F.col("value") * 2,
        ).otherwise(F.col("value")),
    )
    merged = merge_upsert(old, new, "event_id", delete_missing=True).select(
        F.lit("merge").alias("part"),
        F.col("__action").alias("key"),
        F.col("event_type").alias("k2"),
        F.col("event_id").cast("long").alias("id"),
        F.col("user_id").cast("long").alias("n1"),
        F.unix_micros(F.col("ts")).alias("n2"),
        F.floor(F.col("value").cast("double") * F.lit(1000000.0))
        .cast("long")
        .alias("n3"),
        nb.alias("n4"),
        nb.alias("n5"),
        nb.alias("n6"),
        nok.alias("ok"),
        F.col("props").alias("s1"),
    )
    # rollup part (r9): maintain the old snapshot's per-(event_type,
    # user-bucket) rollup through the CDC delta instead of recomputing
    # it; the oracle IS the recompute, so incremental == full is the
    # driver-checked contract. Values in exact micros (the merge
    # part's convention).
    vm = F.floor(F.col("value").cast("double") * F.lit(1000000.0)).cast("long")
    bucket = F.pmod(F.col("user_id"), F.lit(101)).cast("string")
    keyed = lambda df: df.select(  # noqa: E731
        "event_id",
        F.col("event_type"),
        bucket.alias("k2"),
        vm.alias("v"),
    )
    roll = rollup_maintain(
        keyed(old), keyed(new), "event_id", ["event_type", "k2"], "v"
    ).select(
        F.lit("rollup").alias("part"),
        F.col("event_type").alias("key"),
        F.col("k2"),
        nb.alias("id"),
        F.col("cnt").alias("n1"),
        F.col("vsum").alias("n2"),
        F.col("vmin").alias("n3"),
        F.col("vmax").alias("n4"),
        nb.alias("n5"),
        nb.alias("n6"),
        nok.alias("ok"),
        nv.alias("s1"),
    )
    return (
        validate.unionByName(profile)
        .unionByName(diff)
        .unionByName(merged)
        .unionByName(roll)
    )
