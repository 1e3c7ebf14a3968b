"""Streaming Gopher repetition signals — the streaming twin of
functions/repetition.repetition_signals (r7).

Deployment shape: a document feed whose rows must carry their
repetition metrics (and rep_pass gate verdict) before landing in the
curated sink. The batch operator is PER-DOCUMENT — every groupBy,
window, and distinct is keyed by doc_id, and a document is one input
row — so its result NEVER crosses a micro-batch boundary: running the
batch operator over each micro-batch via foreachBatch produces
row-for-row the batch answer regardless of how the feed is chopped.
stream == batch is structural, not approximate (contrast the
contiguous packer, whose global stream offsets genuinely cannot
stream — COVERAGE.md documents that no-twin rationale; THIS family is
the opposite case and gets the real twin).

The sink is the engine's idempotent per-batch layout (`v=<batch_id>`
overwrite, same as sketch/merge streams): foreachBatch is
at-least-once, and a replayed batch overwrites its own directory with
identical rows (the operator is deterministic), so restarts are safe.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..functions.repetition import repetition_signals


def process_repetition_batch(
    batch_df: DataFrame, batch_id: int, store_dir: str
) -> None:
    """One micro-batch: per-doc signals -> idempotent v=<batch_id> dir."""
    from ..registry import release_scoped_caches

    out = os.path.join(store_dir, f"v={batch_id}")
    repetition_signals(batch_df.select("doc_id", "text")).write.mode(
        "overwrite"
    ).parquet(out)
    # the operator scope-caches its unit explosion; a long-running
    # stream must not accumulate one cache per micro-batch
    release_scoped_caches()


def streaming_repetition_signals(
    spark: SparkSession,
    src_glob: str,
    store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """availableNow stream scoring every arriving document with the
    full 13-threshold battery. Returns the started query; await with
    .awaitTermination(). Read the result with
    spark.read.parquet(f"{store_dir}/v=*")."""
    schema = spark.read.parquet(src_glob).schema
    docs = (
        spark.readStream.schema(schema)
        .format("parquet")
        .options(maxFilesPerTrigger=str(max_files_per_trigger))
        .load(src_glob)
    )

    def step(batch_df: DataFrame, batch_id: int) -> None:
        process_repetition_batch(batch_df, batch_id, store_dir)

    return (
        docs.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
