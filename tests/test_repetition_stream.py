"""Streaming repetition twin (r7): stream == batch row-for-row, and
idempotent-restart (replayed batch overwrites identically)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from conftest import SF_SMOKE


def _canon(df):
    return {
        tuple(r[c] for c in sorted(df.columns)) for r in df.collect()
    }


@pytest.mark.slow
def test_streaming_repetition_matches_batch(spark, tmp_path):
    from mrbf_spark.functions.repetition import repetition_signals
    from mrbf_spark.streaming.repetition_stream import (
        streaming_repetition_signals,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    # three files -> three micro-batches at maxFilesPerTrigger=1
    src = str(tmp_path / "feed")
    docs.withColumn("f", F.pmod("doc_id", F.lit(3))).repartition(
        "f"
    ).write.partitionBy("f").parquet(src)

    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_repetition_signals(
        spark, f"{src}/f=*", store, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination()

    got = spark.read.parquet(f"{store}/v=*").drop("v")
    want = repetition_signals(docs.select("doc_id", "text"))
    assert _canon(got) == _canon(want)
    # genuinely chopped into multiple batches
    import glob

    assert len(glob.glob(f"{store}/v=*")) >= 2


@pytest.mark.slow
def test_repetition_batch_replay_is_idempotent(spark, tmp_path):
    from mrbf_spark.streaming.repetition_stream import (
        process_repetition_batch,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter(
        F.col("doc_id") < 50
    )
    store = str(tmp_path / "store")
    process_repetition_batch(docs, 7, store)
    first = _canon(spark.read.parquet(f"{store}/v=7"))
    process_repetition_batch(docs, 7, store)  # at-least-once replay
    assert _canon(spark.read.parquet(f"{store}/v=7")) == first
