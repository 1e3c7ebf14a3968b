"""Streaming exact dedup — the streaming twin of the batch
`dedup_exact` family (north-star: a training-data ingest stream must
drop replayed/duplicated records online).

`dropDuplicatesWithinWatermark` keeps one row per key and expires the
dedup state once the watermark passes the key's event time — bounded
state at any input volume, unlike `dropDuplicates` on a stream (whose
state grows forever). At 100 TB/day the state is O(keys within the
watermark horizon), tunable entirely by the watermark delay.

The reference has no streaming (SURVEY.md §2.8); this extends its
exact-membership semantics (the Bloom tester's "have I seen this
element" question, answered exactly over a bounded horizon).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from ..tables import load_events_stream


def streaming_dedup_events(
    spark: SparkSession,
    src_dir: str,
    query_name: str = "dedup_out",
    watermark: str = "10 minutes",
):
    """readStream over an events-parquet directory → watermark →
    dropDuplicatesWithinWatermark on event_id → memory sink (append).
    Returns the started StreamingQuery; callers processAllAvailable()
    then read `SELECT * FROM {query_name}`."""
    ev = load_events_stream(spark, src_dir)
    deduped = ev.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return (
        deduped.select("event_id", "ts", "user_id", "event_type", "value")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
