"""Deequ-style declarative data validation over the events table —
the data-quality gate a training-data pipeline runs on every ingest
batch before anything downstream trusts the data (the pattern of
AWS Labs' Deequ / Great Expectations, re-expressed as one Spark
aggregate).

The suite: PK uniqueness, per-column completeness, value-range
compliance, set membership, timestamp sanity, JSON well-formedness,
and referential integrity against the customer dim. Output is one row
per constraint: (check STRING, violations BIGINT, ok BOOLEAN), with
ok ⇔ violations = 0, so the report is exact integer arithmetic and
has a cell-for-cell DuckDB twin (validate_events_duckdb_sql).

100 TB shape (the Deequ trick): EVERY scan-expressible constraint is
a conditional-count column of ONE aggregate, so the whole suite costs
a single pass over the fact table with map-side partial aggregation —
adding a constraint adds a column, not a scan. The only non-scan
constraints are PK uniqueness (count_distinct — Catalyst plans the
standard Expand, still one file scan) and referential integrity (a
broadcast left-anti count against the dim's key column — the dim is
the small side by construction; at warehouse scale swap in a bloom
prune, functions/decontam.py shows the shape). The two single-row
aggregates then cross-join into the literal report — driver traffic
is one row per constraint, never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MIN_ROWS = 100  # row_count_min floor (scale-free: holds at every SF)
VALUE_CAP = 1_000.0  # value must lie in [0, VALUE_CAP]
ALLOWED_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
TS_LO, TS_HI = "2020-01-01", "2030-01-01"  # sane event-time window


def validate_events(events: DataFrame, customer: DataFrame) -> DataFrame:
    """(check, violations, ok) — one row per constraint, ok ⇔ 0."""
    viol = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("long")  # noqa: E731
    scan = events.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("event_id").alias("d_eid"),
        viol(F.col("user_id").isNull()).alias("null_user"),
        viol(F.col("value").isNull()).alias("null_value"),
        viol(F.col("props").isNull()).alias("null_props"),
        viol(F.col("value") < 0).alias("neg_value"),
        viol(F.col("value") > VALUE_CAP).alias("cap_value"),
        viol(~F.col("event_type").isin(*ALLOWED_EVENT_TYPES)).alias("bad_type"),
        viol(
            (F.col("ts") < F.lit(TS_LO).cast("timestamp"))
            | (F.col("ts") >= F.lit(TS_HI).cast("timestamp"))
        ).alias("bad_ts"),
        viol(F.get_json_object("props", "$.k").isNull()).alias("bad_json"),
    )
    fk = (
        events.select("user_id")
        .join(
            F.broadcast(customer.select(F.col("c_custkey").alias("user_id"))),
            "user_id",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("fk_viol"))
    )
    checks = [
        ("row_count_min", F.greatest(F.lit(0).cast("long"), MIN_ROWS - F.col("n"))),
        ("pk_unique_event_id", (F.col("n") - F.col("d_eid")).cast("long")),
        ("complete_user_id", F.col("null_user")),
        ("complete_value", F.col("null_value")),
        ("complete_props", F.col("null_props")),
        ("value_nonnegative", F.col("neg_value")),
        ("value_below_cap", F.col("cap_value")),
        ("event_type_allowed", F.col("bad_type")),
        ("ts_in_range", F.col("bad_ts")),
        ("props_json_valid", F.col("bad_json")),
        ("fk_user_in_customer", F.col("fk_viol")),
    ]
    report = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("check"),
                    v.alias("violations"),
                    (v == F.lit(0).cast("long")).alias("ok"),
                )
                for name, v in checks
            ]
        )
    ).alias("r")
    return scan.crossJoin(fk).select(report).select("r.*")


def validate_events_duckdb_sql() -> str:
    """The DuckDB twin — identical conditional counts, identical
    check names, CASTs pinned to BIGINT (DuckDB SUM(int) is HUGEINT)."""
    allowed = ", ".join(f"'{t}'" for t in ALLOWED_EVENT_TYPES)
    return f"""
    WITH scan AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT event_id) AS BIGINT) AS d_eid,
             CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_user,
             CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_value,
             CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_props,
             CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS neg_value,
             CAST(SUM(CASE WHEN value > {VALUE_CAP} THEN 1 ELSE 0 END) AS BIGINT)
               AS cap_value,
             CAST(SUM(CASE WHEN NOT event_type IN ({allowed})
                           THEN 1 ELSE 0 END) AS BIGINT) AS bad_type,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '{TS_LO}'
                             OR ts >= TIMESTAMP '{TS_HI}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS bad_ts,
             CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS bad_json
      FROM events),
    fk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS fk_viol
      FROM events e ANTI JOIN customer c ON e.user_id = c.c_custkey),
    rep AS (
      SELECT 'row_count_min' AS "check",
             GREATEST(CAST(0 AS BIGINT), {MIN_ROWS} - n) AS violations
      FROM scan
      UNION ALL SELECT 'pk_unique_event_id', n - d_eid FROM scan
      UNION ALL SELECT 'complete_user_id', null_user FROM scan
      UNION ALL SELECT 'complete_value', null_value FROM scan
      UNION ALL SELECT 'complete_props', null_props FROM scan
      UNION ALL SELECT 'value_nonnegative', neg_value FROM scan
      UNION ALL SELECT 'value_below_cap', cap_value FROM scan
      UNION ALL SELECT 'event_type_allowed', bad_type FROM scan
      UNION ALL SELECT 'ts_in_range', bad_ts FROM scan
      UNION ALL SELECT 'props_json_valid', bad_json FROM scan
      UNION ALL SELECT 'fk_user_in_customer', fk_viol FROM fk)
    SELECT "check", violations, violations = 0 AS ok FROM rep
    """
