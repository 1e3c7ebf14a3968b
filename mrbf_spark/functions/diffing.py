"""Snapshot diffing — classify every primary key across two snapshots
of a table as added / removed / changed / unchanged (the
datacompy / Delta-CDF "what changed between versions" primitive a
training-data pipeline needs for incremental rebuilds and audits).

100 TB shape: each side is reduced to (pk, xxhash64(row)) AT SCAN
TIME, so the full-outer shuffle carries 16 bytes per row instead of
the row — the join cost is the two digest exchanges on the pk, and
wide tables diff at the same shuffle cost as narrow ones. The digest
interleaves per-column null flags (xxhash64 alone skips nulls, which
would alias null-shifted rows) and the 2^-64 per-pk collision odds only ever misreport a change as
unchanged — acceptable for an audit diff; use the exact column
comparison (the oracle's IS DISTINCT FROM form) when a legal-grade
diff is required.

The parity test builds both snapshots deterministically from the
events table (dropped pks, added pks, and an updated value column,
all arithmetic on event_id), and the DuckDB twin classifies with
IS DISTINCT FROM — an INDEPENDENT formulation, so the test checks the
digest logic against real column equality, not against itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# deterministic snapshot derivation knobs (shared with the twin)
DROP_OLD = 97, 3  # pk % 97 == 3 missing from OLD  -> 'added'
DROP_NEW = 89, 7  # pk % 89 == 7 missing from NEW  -> 'removed'
BUMP_NEW = 11, 0  # pk % 11 == 0 value doubled in NEW -> 'changed'


def snapshot_diff(old: DataFrame, new: DataFrame, pk: str) -> DataFrame:
    """(pk, status) for every pk in either snapshot; status in
    added | removed | changed | unchanged. Compares all non-pk
    columns via a scan-time xxhash64 row digest.

    Precondition: pk is unique within each snapshot (the validator's
    pk_unique check is the paired gate) — duplicate pks would fan out
    through the full-outer join and classify per-pairing."""
    cols = [c for c in old.columns if c != pk]
    if [c for c in new.columns if c != pk] != cols:
        raise ValueError("snapshots must share a schema")
    # xxhash64 SKIPS null inputs (the accumulator passes through), so
    # ('a', NULL) and (NULL, 'a') would otherwise digest identically —
    # interleave per-column null flags to pin each value to its column.
    # A pk-only table has nothing to compare (xxhash64() with zero args
    # is an AnalysisException): classify purely on pk presence via a
    # constant digest.
    if cols:
        hash_in = [x for c in cols for x in (F.col(c), F.col(c).isNull().cast("int"))]
        digest = F.xxhash64(*hash_in)
    else:
        digest = F.lit(0).cast("long")
    o = old.select(F.col(pk), digest.alias("oh"))
    n = new.select(F.col(pk), digest.alias("nh"))
    return (
        o.join(n, pk, "full_outer")
        .select(
            pk,
            F.when(F.col("oh").isNull(), F.lit("added"))
            .when(F.col("nh").isNull(), F.lit("removed"))
            .when(F.col("oh") == F.col("nh"), F.lit("unchanged"))
            .otherwise(F.lit("changed"))
            .alias("status"),
        )
    )


def diff_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-style instantiation: diff two deterministic event
    snapshots (see module docstring) — per-pk rows for every changed
    status plus one summary row per status (incl. unchanged count)."""
    from ..tables import load_table

    base = load_table(spark, sf_dir, "events")
    old = base.filter(F.pmod(F.col("event_id"), F.lit(DROP_OLD[0])) != DROP_OLD[1])
    new = base.filter(
        F.pmod(F.col("event_id"), F.lit(DROP_NEW[0])) != DROP_NEW[1]
    ).withColumn(
        "value",
        F.when(
            F.pmod(F.col("event_id"), F.lit(BUMP_NEW[0])) == BUMP_NEW[1],
            F.col("value") * 2,
        ).otherwise(F.col("value")),
    )
    d = snapshot_diff(old, new, "event_id")
    detail = d.filter(F.col("status") != "unchanged").select(
        F.lit("detail").alias("part"), "event_id", "status",
        F.lit(1).cast("long").alias("n"),
    )
    summary = d.groupBy("status").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("summary").alias("part"),
        F.lit(-1).cast("long").alias("event_id"),
        "status",
        "n",
    )
    return detail.unionByName(summary)


def diff_events_duckdb_sql() -> str:
    """Independent-formulation twin: classifies by direct column
    comparison (IS DISTINCT FROM), not by replaying the digest."""
    return f"""
    WITH old AS (
      SELECT * FROM events WHERE event_id % {DROP_OLD[0]} <> {DROP_OLD[1]}),
    new AS (
      SELECT event_id, ts, user_id, event_type,
             CASE WHEN event_id % {BUMP_NEW[0]} = {BUMP_NEW[1]}
                  THEN value * 2 ELSE value END AS value, props
      FROM events WHERE event_id % {DROP_NEW[0]} <> {DROP_NEW[1]}),
    d AS (
      SELECT coalesce(o.event_id, n.event_id) AS event_id,
             CASE WHEN o.event_id IS NULL THEN 'added'
                  WHEN n.event_id IS NULL THEN 'removed'
                  WHEN (o.ts IS DISTINCT FROM n.ts)
                    OR (o.user_id IS DISTINCT FROM n.user_id)
                    OR (o.event_type IS DISTINCT FROM n.event_type)
                    OR (o.value IS DISTINCT FROM n.value)
                    OR (o.props IS DISTINCT FROM n.props)
                  THEN 'changed' ELSE 'unchanged' END AS status
      FROM old o FULL OUTER JOIN new n ON o.event_id = n.event_id)
    SELECT 'detail' AS part, event_id, status, CAST(1 AS BIGINT) AS n
    FROM d WHERE status <> 'unchanged'
    UNION ALL
    SELECT 'summary', CAST(-1 AS BIGINT), status, CAST(COUNT(*) AS BIGINT)
    FROM d GROUP BY status
    """


# ---------------------------------------------------------- MERGE INTO


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    pk: str,
    delete_missing: bool = False,
) -> DataFrame:
    """Delta/Iceberg-style MERGE INTO as plain DataFrame ops: the new
    version of `target` after applying `source` by primary key, plus a
    per-row `__action` column (insert | update | unchanged | delete —
    deleted rows are returned TAGGED, not dropped, so the caller can
    both write `filter(__action != 'delete')` and audit what a
    delete_missing sync removed).

      matched + any column differs    -> update (source row wins)
      matched + identical             -> unchanged (target row kept)
      source only                     -> insert
      target only                     -> delete_missing ? delete : unchanged

    Plan shape (100 TB): ONE full-outer shuffle join on the pk — the
    same single-shuffle bound as snapshot_diff; row comparison is a
    null-safe column-wise <=> conjunction (no digest needed here since
    the full rows must flow to the output anyway). Precondition: pk
    unique per side (the validator's pk_unique check is the paired
    gate).
    """
    cols = [c for c in target.columns if c != pk]
    if [c for c in source.columns if c != pk] != cols:
        raise ValueError("merge sides must share a schema")
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col(f"t.{pk}") == F.col(f"s.{pk}"), "full_outer")
    t_pk, s_pk = F.col(f"t.{pk}"), F.col(f"s.{pk}")
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}"))
    action = (
        F.when(t_pk.isNull(), F.lit("insert"))
        .when(s_pk.isNull(), F.lit("delete") if delete_missing else F.lit("unchanged"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("update"))
    )
    use_source = t_pk.isNull() | (s_pk.isNotNull() & ~same)
    out_cols = [F.coalesce(s_pk, t_pk).alias(pk)] + [
        F.when(use_source, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in cols
    ]
    return joined.select(*out_cols, action.alias("__action"))


def merge_upsert_duckdb_sql(
    pk: str, cols: list[str], old: str = "old", new: str = "new",
    delete_missing: bool = False,
) -> str:
    """DuckDB twin over two registered views (defaults old/new)."""
    same = " AND ".join(f"o.{c} IS NOT DISTINCT FROM s.{c}" for c in cols)
    missing = "'delete'" if delete_missing else "'unchanged'"
    use_src = f"(o.{pk} IS NULL OR (s.{pk} IS NOT NULL AND NOT ({same})))"
    out_cols = ", ".join(
        f"CASE WHEN {use_src} THEN s.{c} ELSE o.{c} END AS {c}" for c in cols
    )
    return f"""
    SELECT COALESCE(s.{pk}, o.{pk}) AS {pk}, {out_cols},
           CASE WHEN o.{pk} IS NULL THEN 'insert'
                WHEN s.{pk} IS NULL THEN {missing}
                WHEN {same} THEN 'unchanged'
                ELSE 'update' END AS __action
    FROM {old} o FULL OUTER JOIN {new} s ON o.{pk} = s.{pk}
    """


# ------------------------------------------- partition-scoped MERGE


MERGE_BUCKETS = 64


def bucket_col(pk: Column, n_buckets: int = MERGE_BUCKETS) -> Column:
    """Layout bucket for the partition-scoped merge: pmod(hash(pk), N).
    Internal to the store layout (never crosses engines), so Spark's
    native hash is fine — and both writer and merger derive it from
    the pk, so the two always agree."""
    return F.pmod(F.hash(pk), F.lit(n_buckets))


def write_bucketed_target(
    df: DataFrame, path: str, pk: str, n_buckets: int = MERGE_BUCKETS
) -> None:
    """Materialize a merge target partitioned by pk bucket — the
    layout that makes increments cheap: a later merge rewrites only
    the buckets its pks touch."""
    (
        df.withColumn("pk_bucket", bucket_col(F.col(pk), n_buckets))
        .write.mode("overwrite")
        .partitionBy("pk_bucket")
        .parquet(path)
    )


def merge_upsert_partitioned(
    spark: SparkSession,
    target_dir: str,
    source: DataFrame,
    pk: str,
    n_buckets: int = MERGE_BUCKETS,
    delete_missing: bool = False,
) -> list:
    """MERGE an increment into a bucketed target IN PLACE, touching
    only the partitions the increment's pks hash into — the
    |touched partitions| cost shape merge_upsert's docstring promises
    at 100 TB (vs its copy-on-write full rewrite).

    Steps: bucket the increment, collect its distinct bucket ids
    (≤ n_buckets scalars — driver-bounded by construction), read the
    target with a PARTITION-PRUNED scan over exactly those buckets
    (PartitionFilters, plan-tested), merge_upsert per the usual
    semantics, and dynamic-partition-overwrite — untouched bucket
    directories are never read OR written (byte-identical after,
    tested). Returns the touched bucket ids.

    delete_missing here means "missing from the increment within a
    TOUCHED bucket" — untouched buckets are invisible to the merge by
    design, so a full-table delete sync needs the plain merge_upsert.
    """
    src = source.withColumn("pk_bucket", bucket_col(F.col(pk), n_buckets))
    touched = sorted(
        r["pk_bucket"] for r in src.select("pk_bucket").distinct().collect()
    )
    if not touched:
        return []
    tgt = spark.read.parquet(target_dir).filter(F.col("pk_bucket").isin(touched))
    merged = merge_upsert(tgt, src, pk, delete_missing=delete_missing)
    out = merged.filter(F.col("__action") != "delete").drop("__action")
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            out.write.mode("overwrite")
            .partitionBy("pk_bucket")
            .parquet(target_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    return touched
