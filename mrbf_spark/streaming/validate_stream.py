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


def streaming_validate_events(
    spark: SparkSession,
    src_glob: str,
    customer: DataFrame,
    report_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Start an availableNow stream that appends one 11-row constraint
    report per micro-batch to ``report_dir`` (columns: batch_id,
    check, violations, ok). Returns the StreamingQuery."""
    opts = (
        {"maxFilesPerTrigger": str(max_files_per_trigger)}
        if max_files_per_trigger
        else None
    )
    ev = load_events_stream(spark, src_glob, options=opts)

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        report = validate_events(batch_df, customer).select(
            F.lit(batch_id).cast("long").alias("batch_id"), "*"
        )
        report.write.mode("append").parquet(report_dir)

    return (
        ev.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
