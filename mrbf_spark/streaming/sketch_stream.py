"""Streaming sketch maintenance — the streaming face of
functions/sketches.py.

The point of a mergeable sketch at 100 TB is that you never recompute
it: each arriving increment is sketched ALONE (bounded work — the
increment's rows, not the accumulated table's) and merged into a tiny
persisted sketch store. KMV's merge ("union the hash sets, re-take
the k smallest per group") is associative, commutative and
idempotent-on-duplicates, so the maintained store is EXACTLY the
sketch of everything seen — not an approximation of it. That gives
this module a property most streaming-sketch stacks can't test:
stream == batch as exact VALUES (tests/test_sketch_stream.py), the
same determinism the md5 hash family buys everywhere else in the
repo.

Shape: file-source stream drained through ``foreachBatch`` (the
sketch store is a multi-aggregate read-modify-write — the documented
escape hatch, same as validate_stream.py). Per batch: sketch the
increment (one partial-agg'd distinct + a WindowGroupLimit top-k over
≤ groups×k rows), read the ≤ groups×k-row store, kmv_merge, rewrite
the store. State is the store itself — no Spark state store, no
watermark; the store stays k rows per group forever, so batch cost is
independent of history size.

Idempotence: the store write goes to a batch_id-stamped subdirectory
and a replayed batch (foreachBatch is at-least-once) overwrites its
own directory; merge steps read the latest complete version STRICTLY
BELOW their own batch id (streaming/store.py), so a replayed batch
merges against the same predecessor state it saw the first time. For
KMV the exclusion is belt-and-braces (union-distinct re-merge is
idempotent anyway); for the count-min maintainer below it is
CORRECTNESS — counter addition is not idempotent, and reading the
batch's own committed version would double-count the replay.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..functions.sketches import KMV_K, kmv_merge, kmv_sketch
from ..tables import load_events_stream
from .store import read_latest_version

_STORE_SCHEMA = "grp string, h long, rnk int"


def read_sketch_store(
    spark: SparkSession, store_dir: str, before_batch: int | None = None
) -> DataFrame | None:
    """Latest complete store version, or None before the first batch."""
    return read_latest_version(spark, store_dir, _STORE_SCHEMA, before_batch)


def merge_batch_into_store(
    batch_df: DataFrame, batch_id: int, store_dir: str,
    group_col: str = "event_type", item_col: str = "user_id", k: int = KMV_K,
) -> None:
    spark = batch_df.sparkSession
    inc = kmv_sketch(batch_df, group_col, item_col, k)
    prev = read_sketch_store(spark, store_dir, before_batch=batch_id)
    merged = inc if prev is None else kmv_merge(prev, inc, k)
    out = os.path.join(store_dir, f"v={batch_id}")
    merged.select("grp", "h", "rnk").write.mode("overwrite").parquet(out)


def streaming_kmv_distinct(
    spark: SparkSession,
    src_glob: str,
    store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """availableNow stream maintaining the per-event_type distinct-user
    KMV store. Returns the started query; await with .awaitTermination()."""
    opts = (
        {"maxFilesPerTrigger": str(max_files_per_trigger)}
        if max_files_per_trigger
        else None
    )
    ev = load_events_stream(spark, src_glob, options=opts)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_store(batch_df, batch_id, store_dir)

    return (
        ev.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ------------------------------------------------------ streaming CMS

_CMS_STORE_SCHEMA = "i int, bucket long, cnt long"


def read_cms_store(
    spark: SparkSession, store_dir: str, before_batch: int | None = None
) -> DataFrame | None:
    """Latest complete CMS grid version, or None before the first batch."""
    return read_latest_version(spark, store_dir, _CMS_STORE_SCHEMA, before_batch)


def merge_cms_batch_into_store(
    batch_df: DataFrame, batch_id: int, store_dir: str, item_col: str = "user_id"
) -> None:
    """CMS merge is elementwise counter ADDITION — associative and
    commutative, so the maintained grid equals the batch grid of
    everything seen, exactly (tested). The store is ≤ depth×width rows
    forever; per-batch cost is one partial-agg'd groupBy of the
    increment plus a grid-sized union-sum. Addition is NOT idempotent,
    so the predecessor read MUST exclude this batch's own version
    (before_batch) — a replayed batch otherwise double-counts
    (streaming/store.py; replay-tested)."""
    from pyspark.sql import functions as F

    from ..functions.sketches import cms_counters

    spark = batch_df.sparkSession
    inc = cms_counters(batch_df, item_col)
    prev = read_cms_store(spark, store_dir, before_batch=batch_id)
    merged = (
        inc
        if prev is None
        else inc.unionByName(prev)
        .groupBy("i", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    out = os.path.join(store_dir, f"v={batch_id}")
    merged.select(
        F.col("i").cast("int"), F.col("bucket").cast("long"), F.col("cnt").cast("long")
    ).write.mode("overwrite").parquet(out)


def streaming_cms_frequencies(
    spark: SparkSession,
    src_glob: str,
    store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """availableNow stream maintaining the user_id count-min grid."""
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
        merge_cms_batch_into_store(batch_df, batch_id, store_dir)

    return (
        ev.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ------------------------------------------------ streaming quantile

_QSK_STORE_SCHEMA = "grp string, h long, value double, rnk int"


def read_qsk_store(
    spark: SparkSession, store_dir: str, before_batch: int | None = None
) -> DataFrame | None:
    """Latest complete quantile-sample version, or None."""
    return read_latest_version(spark, store_dir, _QSK_STORE_SCHEMA, before_batch)


def merge_qsk_batch_into_store(
    batch_df: DataFrame, batch_id: int, store_dir: str,
    group_col: str = "event_type", value_col: str = "value",
    key_col: str = "event_id",
) -> None:
    """Quantile-sample maintenance: bottom-k by row-key hash merges
    like KMV — union, dedupe on (grp, h) row identity, re-take k
    smallest — so a replayed increment collapses into itself and the
    before_batch exclusion is belt-and-braces here (it would be
    load-bearing without bottomk_merge's dedupe)."""
    from pyspark.sql import functions as F

    from ..functions.sketches import bottomk_merge, bottomk_sample

    spark = batch_df.sparkSession
    inc = bottomk_sample(batch_df, group_col, value_col, F.col(key_col))
    prev = read_qsk_store(spark, store_dir, before_batch=batch_id)
    merged = inc if prev is None else bottomk_merge(prev, inc)
    out = os.path.join(store_dir, f"v={batch_id}")
    merged.select("grp", "h", "value", "rnk").write.mode("overwrite").parquet(out)


def streaming_bottomk_quantile(
    spark: SparkSession,
    src_glob: str,
    store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """availableNow stream maintaining the per-event_type bottom-k
    value sample (feed read_qsk_store into sketches.sample_median for
    the running median estimate)."""
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
        merge_qsk_batch_into_store(batch_df, batch_id, store_dir)

    return (
        ev.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
