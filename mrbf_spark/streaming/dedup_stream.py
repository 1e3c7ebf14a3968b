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


# history/stream split for the semantic twin: vec_id mod 10 < 7 is
# history (same convention as _INC_SPLIT for documents)
_SEM_SPLIT = 7


def streaming_semdedup(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "semdedup_stream_out",
    tau: float | None = None,
):
    """Streaming twin of the batch SemDeDup entry: arriving embedding
    vectors are classified against the HISTORY's kept representatives
    — completely STATELESS (no watermark, no state store).

    History = the 70% vec_id split, run through batch
    semdedup_verdicts once; its keep=true rows (one representative
    per semantic duplicate group, per cell) are the static side,
    materialized via an eager localCheckpoint so micro-batches reuse
    the computed table instead of replaying the whole batch pipeline.

    Per micro-batch, each arriving vector is cell-assigned map-only
    against the broadcast history centroid matrix, then classified by
    TWO stream-static joins on (cell, cosine ≥ τ) — a LEFT SEMI for
    'dup_of_history' and a LEFT ANTI for 'candidate_new' (semi/anti
    give one output row per arriving vector with no streaming
    aggregation, so no state; the cosine predicate rides the cell
    equi-join as its residual condition). Within-batch survivor
    election needs cross-row state — same caveat and composition as
    streaming_incremental_dedup.

    At 100 TB/day: the static side is ≤ |history reps| rows keyed by
    cell; each micro-batch pays one broadcast/shuffle equi-join on
    cell bounded by cell occupancy, and the stream never accumulates
    state. Returns the started StreamingQuery (memory sink, append)."""
    from ..functions.similarity import (
        SEMDEDUP_TAU,
        _decimal_dot,
        _flat_centroids,
        kmeans_assign_col,
        semdedup_verdicts,
        with_matrix,
    )
    from ..registry import release_scoped_caches

    tau = SEMDEDUP_TAU if tau is None else tau
    path = f"{sf_dir}/embeddings.parquet"
    emb = spark.read.parquet(path)
    hist = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) < _SEM_SPLIT)
    cent = _flat_centroids(hist)
    verdicts = semdedup_verdicts(hist, tau=tau, centroids=cent)
    reps = (
        verdicts.filter(F.col("keep"))
        .select("vec_id", "cell")
        .join(hist.select("vec_id", "embedding"), "vec_id")
        .select(
            F.col("cell").alias("r_cell"),
            F.col("vec_id").alias("r_id"),
            F.col("embedding").alias("r_emb"),
            _decimal_dot(F.col("embedding"), F.col("embedding")).alias("r_nrm"),
        )
        .localCheckpoint(eager=True)
    )
    release_scoped_caches()  # semdedup's internal cache, no longer needed

    schema = emb.schema
    inc = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(f"{sf_dir}/embeddings.parque[t]")
        .filter(F.pmod(F.col("vec_id"), F.lit(10)) >= _SEM_SPLIT)
    )
    # constant-key equi join attaches the one-row centroid matrix to
    # the stream (broadcast); a bare crossJoin is not a supported
    # stream-static shape
    mat = with_matrix(spark.range(1).select(F.lit(1).alias("__one")), spark, cent)
    assigned = (
        inc.withColumn("__one", F.lit(1))
        .join(F.broadcast(mat), "__one")
        .select(
            "vec_id",
            "embedding",
            kmeans_assign_col(F.col("embedding"), F.col("mat")).alias("cell"),
            _decimal_dot(F.col("embedding"), F.col("embedding")).alias("nrm"),
        )
    )
    cosine = _decimal_dot(F.col("embedding"), F.col("r_emb")) / (
        F.sqrt(F.col("nrm")) * F.sqrt(F.col("r_nrm"))
    )
    cond = (F.col("cell") == F.col("r_cell")) & (cosine >= F.lit(tau))
    dup = assigned.join(reps, cond, "left_semi").select(
        "vec_id", "cell", F.lit("dup_of_history").alias("status")
    )
    new = assigned.join(reps, cond, "left_anti").select(
        "vec_id", "cell", F.lit("candidate_new").alias("status")
    )
    return (
        dup.unionByName(new)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
