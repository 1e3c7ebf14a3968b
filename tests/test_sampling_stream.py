"""Streaming temperature mixture == batch (r7, VERDICT r6 #8): the
stream-static replication against a frozen snapshot census must emit
exactly the batch temperature_replicate multiset — the fractional
copy is content-addressed, so equality is structural."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from conftest import SF_SMOKE


def _multiset(rows):
    return Counter((r["doc_id"], r["lang"], r["n_chars"]) for r in rows)


def test_streaming_temperature_mixture_matches_batch(spark):
    from mrbf_spark.functions.sampling import temperature_replicate
    from mrbf_spark.streaming.sampling_stream import (
        streaming_temperature_mixture,
    )

    q = streaming_temperature_mixture(spark, SF_SMOKE, query_name="temp_mix_t")
    try:
        q.processAllAvailable()
        got = _multiset(spark.sql("SELECT * FROM temp_mix_t").collect())
    finally:
        q.stop()
    batch = _multiset(
        temperature_replicate(
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
                "doc_id", "lang", "n_chars"
            )
        ).collect()
    )
    assert got == batch
    # sanity: the rule actually replicates (scarce strata gain copies)
    assert sum(got.values()) > len(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    )


def test_streaming_mixture_rates_freeze_is_batching_invariant(spark):
    """The same frozen rates frame replayed over the stream gives each
    doc a copy count independent of arrival batching: spot-check that
    per-doc counts match the batch rule doc-for-doc (not just in
    aggregate)."""
    from mrbf_spark.functions.sampling import temperature_replicate
    from mrbf_spark.streaming.sampling_stream import (
        streaming_temperature_mixture,
    )

    q = streaming_temperature_mixture(spark, SF_SMOKE, query_name="temp_mix_t2")
    try:
        q.processAllAvailable()
        got = Counter(
            r["doc_id"] for r in spark.sql("SELECT * FROM temp_mix_t2").collect()
        )
    finally:
        q.stop()
    batch = Counter(
        r["doc_id"]
        for r in temperature_replicate(
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
                "doc_id", "lang", "n_chars"
            )
        ).collect()
    )
    assert got == batch
    assert max(batch.values()) >= 2  # some stratum is actually upsampled
