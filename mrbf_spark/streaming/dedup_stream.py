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


def streaming_incremental_dedup(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "inc_dedup_out",
):
    """Streaming twin of the batch `dedup_incremental` entry: the
    increment arrives as a document STREAM and is classified per-row
    against the static history index by a stream-static left join —
    completely STATELESS (no watermark, no state store), so it scales
    to any ingest volume; the index side is the persisted fingerprint
    store (built here from the deterministic 70% split, like the batch
    entry).

    Statuses: 'dup_of_history' (fingerprint already indexed) or
    'candidate_new' — the union of the batch entry's 'new' and
    'dup_in_batch', since within-batch survivor election needs
    cross-row state; chain `dropDuplicatesWithinWatermark` on the
    fingerprint (see streaming_dedup_events) when the feed carries an
    event time, or run the batch entry over each micro-batch's sink.

    Returns the started StreamingQuery (memory sink, append)."""
    from ..functions.dedup import _INC_SPLIT
    from ..functions.text import fingerprint_col

    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    # FileStreamSource globs rather than listing a single file — the
    # [t] wrapper makes the literal path a pattern (same trick as
    # streaming/stateful.py).
    inc = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(f"{sf_dir}/documents.parque[t]")
        .filter(F.pmod(F.col("doc_id"), F.lit(10)) >= _INC_SPLIT)
        .select("doc_id", fingerprint_col(F.col("text")).alias("fingerprint"))
    )
    index = (
        spark.read.parquet(path)
        .filter(F.pmod(F.col("doc_id"), F.lit(10)) < _INC_SPLIT)
        .select(fingerprint_col(F.col("text")).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("hist_id"))
    )
    out = inc.join(index, "fingerprint", "left").select(
        "doc_id",
        F.when(F.col("hist_id").isNotNull(), F.lit("dup_of_history"))
        .otherwise(F.lit("candidate_new"))
        .alias("status"),
        F.col("hist_id"),
    )
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
