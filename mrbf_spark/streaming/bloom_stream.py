"""Streaming Bloom probe: a static per-key filter table joined into a
Structured Streaming pipeline — the streaming half of the semi-join
pruning story (e.g. drop already-seen document ids from an ingest
stream before the expensive exact dedup).

Static-stream joins are Catalyst-native: the static side is planned
once (broadcast here) and every micro-batch probes against it with the
same codegen'd bit-test expression the batch probe uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..bloom.core import hash_indexes_col, _PROBE_EXPR
from ..tables import load_events_stream


def streaming_bloom_probe(
    spark: SparkSession,
    sf_dir: str,
    filters: DataFrame,
    k: int,
    *,
    key_col: str = "event_type",
    value_col: str = "user_id",
    query_name: str = "bloom_stream",
):
    """readStream(events) → broadcast-join the static filter table →
    per-key hit/miss counts → memory sink. Returns the started query.
    """
    raw = load_events_stream(spark, f"{sf_dir}/events.parque[t]")
    probe = raw.withColumn("__key", F.col(key_col).cast("string")).withColumn(
        "__value", F.col(value_col).cast("string")
    )
    joined = probe.join(
        F.broadcast(filters.select(F.col("key").alias("__key"), "m", "words")), "__key"
    )
    probed = (
        joined.withColumn("__indexes", hash_indexes_col(F.col("__value"), F.col("m"), k))
        .withColumn("bloom_hit", F.expr(_PROBE_EXPR).cast("int"))
    )
    counts = probed.groupBy(F.col("__key").alias("key")).agg(
        F.sum("bloom_hit").cast("long").alias("hits"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
