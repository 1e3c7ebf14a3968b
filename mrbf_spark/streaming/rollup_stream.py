"""Streaming rollup maintenance — continuous incremental view
maintenance of a per-key count/sum/min/max rollup from a CDC upsert
stream (the deployment loop behind data_ops_suite part=rollup: the
stats table that stays current as increments land, without ever
recomputing from the full corpus).

Each micro-batch, inside foreachBatch with the same versioned
last-writer-wins store discipline as merge_stream.py:

1. collapse the increment to one consistent row per pk,
2. upsert it into the previous target version (merge_upsert) and
   write target `v=<batch_id>`,
3. build the rollup delta from the increment against ONLY the
   affected previous-target rows (a pk semi-join — delta-sized, never
   a full-target diff; an upsert stream has no deletes, so incoming
   pks bound every contribution),
4. rollup_apply the delta onto the previous rollup version — the
   dirty-key min/max rescan reads the just-written target parquet, so
   the merge plan is materialized once, not re-executed — and write
   rollup `v=<batch_id>`.

Replay safety: foreachBatch is at-least-once; both writes are keyed
by batch_id, so a replayed batch reads the versions BEFORE itself and
overwrites its own directories with identical content — the store
converges regardless of retries (the sketch_stream/merge_stream
argument).

100 TB shape: per batch, the target upsert pays the usual CDC-apply
cost (full-outer pk shuffle here; the bucketed in-place variant in
merge_stream.streaming_merge_events_partitioned drops it to touched
buckets) and the rollup refresh adds only delta-sized work plus a
dirty-key-pruned scan of the new target.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.diffing import merge_upsert
from ..functions.rollup import rollup_apply, rollup_base, rollup_delta
from ..tables import load_events_stream
from .store import read_latest_version


def rollup_schema(keys_schema: str) -> str:
    """Store schema string for a rollup over the given key columns."""
    return (
        f"{keys_schema}, cnt bigint, cntv bigint, vsum bigint, "
        "vmin bigint, vmax bigint"
    )


def apply_rollup_increment(
    batch_df: DataFrame,
    batch_id: int,
    target_store: str,
    rollup_store: str,
    pk: str,
    keys: list[str],
    v: str,
    target_schema: str,
    keys_schema: str,
) -> None:
    spark = batch_df.sparkSession
    rest = [c for c in batch_df.columns if c != pk]
    # one consistent row per pk (merge_stream's struct-max collapse)
    inc = (
        batch_df.groupBy(pk)
        .agg(F.max(F.struct(*rest)).alias("__r"))
        .select(pk, *[F.col("__r")[c].alias(c) for c in rest])
    )
    prev = read_latest_version(
        spark, target_store, target_schema, before_batch=batch_id
    )
    target_out = os.path.join(target_store, f"v={batch_id}")
    if prev is None:
        inc.write.mode("overwrite").parquet(target_out)
        new_rollup = rollup_base(
            spark.read.parquet(target_out), keys, v
        )
    else:
        merged = merge_upsert(prev, inc, pk).drop("__action")
        merged.write.mode("overwrite").parquet(target_out)
        # contributions come only from incoming pks: pair the
        # increment with the affected slice of the previous target
        affected = prev.join(inc.select(pk), pk, "left_semi")
        delta = rollup_delta(affected, inc, pk, keys, v)
        prev_roll = read_latest_version(
            spark, rollup_store, rollup_schema(keys_schema),
            before_batch=batch_id,
        )
        if prev_roll is None:  # rollup store lost/new: rebuild once
            new_rollup = rollup_base(
                spark.read.parquet(target_out), keys, v
            )
        else:
            new_rollup = rollup_apply(
                prev_roll, delta, spark.read.parquet(target_out), keys, v
            )
    new_rollup.write.mode("overwrite").parquet(
        os.path.join(rollup_store, f"v={batch_id}")
    )


def streaming_rollup_events(
    spark: SparkSession,
    src_glob: str,
    target_store: str,
    rollup_store: str,
    checkpoint_dir: str,
    keys: list[str] | None = None,
    max_files_per_trigger: int = 1,
):
    """availableNow stream maintaining an upserted events table AND
    its per-key rollup. The value column is the exact-micros
    derivation floor(value*1e6) — integer sums, so the maintained
    rollup is bit-equal to a recompute regardless of batch order.
    Returns the started query."""
    keys = keys or ["event_type"]
    ev = load_events_stream(
        spark,
        src_glob,
        options=(
            {"maxFilesPerTrigger": str(max_files_per_trigger)}
            if max_files_per_trigger
            else None
        ),
    )
    ev = ev.withColumn(
        "v", F.floor(F.col("value").cast("double") * F.lit(1e6)).cast("long")
    )
    target_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in ev.schema
    )
    keys_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in ev.schema
        if f.name in keys
    )

    def step(batch_df: DataFrame, batch_id: int) -> None:
        apply_rollup_increment(
            batch_df, batch_id, target_store, rollup_store,
            "event_id", keys, "v", target_schema, keys_schema,
        )

    return (
        ev.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
