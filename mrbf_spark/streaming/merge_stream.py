"""Streaming MERGE INTO — continuous upsert maintenance of a target
table from a stream of increments (the CDC-apply shape: each arriving
micro-batch is a set of new/updated rows keyed by pk; the maintained
target is always the result of applying every increment in order).

Composes functions/diffing.merge_upsert inside foreachBatch with the
same versioned last-writer-wins store discipline as the sketch
maintainers (streaming/sketch_stream.py): each batch reads the latest
complete target version, merges the increment, writes version
`v=<batch_id>`; a replayed batch (foreachBatch is at-least-once)
overwrites its own version directory, so the store converges to the
same state regardless of retries.

Batch-order semantics: within a batch, the increment wins over the
target (update) — the standard CDC apply. Across batches, later
batches win, which the versioned read-modify-write gives for free
since availableNow drains files in deterministic log order.

100 TB shape: the per-batch cost is merge_upsert's one full-outer pk
shuffle of |target| + |increment|. For a large target that is the
classic copy-on-write merge cost (what Delta pays on MERGE without
deletion vectors); a production variant would partition the target by
pk range and rewrite only touched partitions — the
`partitionOverwriteMode=dynamic` machinery validate_stream.py already
uses — which drops the per-batch cost to |touched partitions|.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.diffing import merge_upsert
from ..tables import load_events_stream
from .store import read_latest_version


def read_target(
    spark: SparkSession, store_dir: str, schema: str,
    before_batch: int | None = None,
) -> DataFrame | None:
    """Latest complete target version, or None before the first batch."""
    return read_latest_version(spark, store_dir, schema, before_batch)


def apply_increment(
    batch_df: DataFrame, batch_id: int, store_dir: str, pk: str, schema: str
) -> None:
    spark = batch_df.sparkSession
    # an increment may carry several versions of one pk (e.g. two
    # updates in one file batch): collapse to ONE CONSISTENT row per
    # pk via a single struct max (deterministic lexicographic pick —
    # per-column max would stitch fields from different rows).
    rest = [c for c in batch_df.columns if c != pk]
    inc = (
        batch_df.groupBy(pk)
        .agg(F.max(F.struct(*rest)).alias("__r"))
        .select(pk, *[F.col("__r")[c].alias(c) for c in rest])
    )
    prev = read_target(spark, store_dir, schema, before_batch=batch_id)
    merged = (
        inc
        if prev is None
        else merge_upsert(prev, inc, pk).drop("__action")
    )
    out = os.path.join(store_dir, f"v={batch_id}")
    merged.write.mode("overwrite").parquet(out)


def streaming_merge_events(
    spark: SparkSession,
    src_glob: str,
    store_dir: str,
    checkpoint_dir: str,
    pk: str = "event_id",
    max_files_per_trigger: int = 1,
):
    """availableNow stream maintaining an upserted events table keyed
    by pk. Returns the started query."""
    ev = load_events_stream(
        spark,
        src_glob,
        options=(
            {"maxFilesPerTrigger": str(max_files_per_trigger)}
            if max_files_per_trigger
            else None
        ),
    )
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in ev.schema)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        apply_increment(batch_df, batch_id, store_dir, pk, schema)

    return (
        ev.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_merge_events_partitioned(
    spark: SparkSession,
    src_glob: str,
    target_dir: str,
    checkpoint_dir: str,
    pk: str = "event_id",
    n_buckets: int = 16,
    max_files_per_trigger: int = 1,
):
    """CDC apply over ONE live pk-bucketed directory (the |touched
    partitions| composition the versioned apply's docstring points
    at): each micro-batch runs merge_upsert_partitioned against the
    target in place, rewriting only the buckets the increment's pks
    hash into.

    Replay safety WITHOUT versions: upsert (delete_missing=False) is
    idempotent — a replayed batch re-merges rows the target already
    holds and classifies them unchanged, so the dynamic partition
    overwrite rewrites its buckets with identical content. (A
    delete_missing sync is NOT idempotent under interleaving and
    belongs on the versioned apply above.) First batch bootstraps the
    layout via write_bucketed_target."""
    import os as _os

    from ..functions.diffing import merge_upsert_partitioned, write_bucketed_target

    ev = load_events_stream(
        spark,
        src_glob,
        options=(
            {"maxFilesPerTrigger": str(max_files_per_trigger)}
            if max_files_per_trigger
            else None
        ),
    )

    def step(batch_df: DataFrame, batch_id: int) -> None:
        rest = [c for c in batch_df.columns if c != pk]
        inc = (
            batch_df.groupBy(pk)
            .agg(F.max(F.struct(*rest)).alias("__r"))
            .select(pk, *[F.col("__r")[c].alias(c) for c in rest])
        )
        if not _os.path.isdir(target_dir):
            write_bucketed_target(inc, target_dir, pk, n_buckets)
            return
        merge_upsert_partitioned(spark, target_dir, inc, pk, n_buckets)

    return (
        ev.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
