"""Checkpointed streaming ingest — the restart/exactly-once layer of
the streaming family.

Everything else in this package demonstrates transformation semantics
(windows, dedup, joins, state); this module carries the operational
guarantee a 100 TB/day ingest actually relies on: a file-source →
file-sink stream with a checkpoint directory delivers EXACTLY-ONCE
output across stops and restarts — the source's processed-file log
lives in the checkpoint WAL, and the parquet sink commits atomically
through its _spark_metadata transaction log, so a replayed micro-batch
overwrites rather than duplicates.

The restart contract is pinned by
tests/test_extensions.py::test_checkpointed_ingest_exactly_once_across_restart:
drain, add more input, restart with the SAME checkpoint, drain again —
the sink holds each input row exactly once, and an idle restart adds
nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def checkpointed_ingest(
    spark: SparkSession,
    src_glob: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    transform=None,
    max_files_per_trigger: int = 1,
):
    """Start an availableNow file→file stream: drains everything the
    source currently has (in max_files_per_trigger increments, so the
    checkpoint records real micro-batch boundaries) then stops.
    Re-invoke with the same checkpoint_dir after new files arrive —
    only the unprocessed ones run. Returns the StreamingQuery."""
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .format("parquet")
        .load(src_glob)
    )
    df: DataFrame = transform(raw) if transform is not None else raw
    return (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
