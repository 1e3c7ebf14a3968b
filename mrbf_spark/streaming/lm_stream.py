"""Streaming twin of the frozen-model LM scorer (functions/lm.py):
documents ARRIVE as a stream and are scored per micro-batch against a
model trained once on a static reference corpus — the online face of
the CCNet deployment (lm-train offline, score the crawl as it lands).

Shape: foreachBatch running the batch-tier score_with_model — the
per-doc score needs a (doc × bigram) re-aggregation after the model
join, which a pure streaming plan would make a stateful aggregation;
foreachBatch is the documented escape hatch (same reasoning as
validate_stream.py) and keeps the semantics EXACTLY the batch tier's:
scores are per-doc independent, so stream output == batch output
whatever the batching. The sink is idempotent (partition-by-batch_id
dynamic overwrite — a retried at-least-once batch replaces its rows,
the ADVICE r4 lesson).

100 TB/day shape: per-batch cost is the batch scorer's plan over the
increment only; the frozen model is an eager localCheckpoint so
micro-batches reuse the materialized table instead of replaying
training; no state store, no watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.lm import score_with_model


def streaming_lm_score(
    spark: SparkSession,
    src_glob: str,
    model: DataFrame,
    vocab_size: int,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Start an availableNow stream scoring arriving documents under
    the frozen (model, vocab_size); per-batch scores land in
    ``out_dir`` partitioned by batch_id. Returns the StreamingQuery."""
    # materialize the frozen artifact once — every micro-batch joins
    # the same computed table
    model = model.localCheckpoint(eager=True)
    schema = spark.read.parquet(src_glob).schema
    docs = (
        spark.readStream.schema(schema)
        .format("parquet")
        .options(maxFilesPerTrigger=str(max_files_per_trigger))
        .load(src_glob)
        .select("doc_id", "text")
    )

    def score(batch_df: DataFrame, batch_id: int) -> None:
        out = score_with_model(batch_df, model, vocab_size).select(
            F.lit(batch_id).cast("long").alias("batch_id"), "*"
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return (
        docs.writeStream.foreachBatch(score)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
