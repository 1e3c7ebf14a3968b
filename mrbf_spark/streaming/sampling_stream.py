"""Streaming temperature mixture — the streaming twin of the batch
`temperature_replicate` / `sampling_suite` part=temp family (r7,
VERDICT r6 next-round #8).

Deployment shape: mixture RATES are a training-run config — computed
once from a static census snapshot when the data build is planned —
while documents keep arriving. So the twin freezes the per-stratum
(base, frac) rates from the static corpus and replicates the STREAM
against them with a stream-static broadcast join + a map-only
Generate (explode of a per-row sequence): completely STATELESS — no
watermark, no state store — which is what lets it run at any ingest
volume. The fractional copy is content-addressed (md5 of doc_id, the
same rule as batch), so a document receives the same copy count
whether it arrives in a batch build, one micro-batch, or split across
restarts — stream==batch equality is structural, not sampled
(test-pinned in tests/test_sampling_stream.py).

What a streaming twin deliberately does NOT do: re-derive the rates
per micro-batch. Rates from a micro-batch's own census would make the
mixture depend on arrival batching (non-deterministic, and a
single-stratum micro-batch would see rate 1 everywhere); rates over
the accumulated stream would need a stateful two-pass that
re-replicates history on every update. Freezing a snapshot census is
the honest online semantics — refresh it by restarting the query with
a new rates frame (the same refresh cadence any mixture config has).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.sampling import (
    replicate_by_weight,
    temperature_copies_col,
    temperature_rates,
)


def streaming_temperature_mixture(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "temp_mix_out",
    rates: DataFrame | None = None,
):
    """readStream over the documents parquet → broadcast-join the
    frozen rates → content-addressed replication → memory sink
    (append). Returns the started StreamingQuery; callers
    processAllAvailable() then read `SELECT * FROM {query_name}`.

    `rates` defaults to temperature_rates() over the static corpus at
    `sf_dir` (the snapshot-census deployment shape above)."""
    path = f"{sf_dir}/documents.parquet"
    static = spark.read.parquet(path).select("doc_id", "lang", "n_chars")
    if rates is None:
        rates = temperature_rates(static)
    # FileStreamSource globs rather than listing a single file — the
    # [t] wrapper makes the literal path a pattern (same trick as
    # streaming/dedup_stream.py).
    docs = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .format("parquet")
        .load(f"{sf_dir}/documents.parque[t]")
        .select(*(f.name for f in static.schema.fields))
    )
    keyed = docs.join(F.broadcast(rates), "lang")
    mixed = replicate_by_weight(keyed, temperature_copies_col()).drop(
        "__base", "__tfrac"
    )
    return (
        mixed.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
