"""Per-micro-batch data validation — the streaming face of
functions/validation.py: every arriving micro-batch is gated through
the SAME single-scan constraint suite before anything downstream sees
it, which is exactly where a production ingest runs its quality gate
(validate the increment, not the accumulated table).

Shape: a file-source stream drained through ``foreachBatch``; each
batch runs the batch-tier `validate_events` (one aggregate + one
broadcast anti count — multi-aggregate reports aren't expressible as
a pure streaming query, and foreachBatch is the documented escape
hatch) and appends its 11-row report, stamped with the batch id, to a
parquet report log. Constraint scope is the BATCH: PK uniqueness here
means unique within the increment — cross-batch duplicate detection
is the incremental/stateful dedup family's job
(streaming/dedup_stream.py), not the validator's.

100 TB/day shape: the per-batch cost is the batch-tier plan (one scan
of the increment, map-side partials, 11 rows out); the report log
grows by 11 rows per batch regardless of batch size, and the gate
adds no state store, no watermark, and no shuffle beyond the 1-row
aggregate exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.validation import validate_events
from ..tables import load_events_stream


def write_batch_report(
    batch_df: DataFrame, batch_id: int, customer: DataFrame, report_dir: str
) -> None:
    """Validate one micro-batch and write its 11-row report
    IDEMPOTENTLY: the log is partitioned by batch_id and each write
    dynamically overwrites only its own batch_id partition, so a
    failed-and-retried micro-batch (foreachBatch is at-least-once for
    non-idempotent sinks) replaces its rows instead of duplicating
    them (ADVICE r4)."""
    report = validate_events(batch_df, customer).select(
        F.lit(batch_id).cast("long").alias("batch_id"), "*"
    )
    (
        report.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(report_dir)
    )


def streaming_validate_events(
    spark: SparkSession,
    src_glob: str,
    customer: DataFrame,
    report_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Start an availableNow stream that writes one 11-row constraint
    report per micro-batch to ``report_dir`` (columns: check,
    violations, ok, partitioned by batch_id). Returns the
    StreamingQuery."""
    opts = (
        {"maxFilesPerTrigger": str(max_files_per_trigger)}
        if max_files_per_trigger
        else None
    )
    ev = load_events_stream(spark, src_glob, options=opts)

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        write_batch_report(batch_df, batch_id, customer, report_dir)

    return (
        ev.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
