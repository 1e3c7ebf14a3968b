"""Streaming quality classification — the streaming twin of the batch
qlr scorer (functions/quality_classifier.py, r8).

Deployment shape: the model is TRAINED offline on a reference corpus
(weights are a training-run config, exactly like the temperature
twin's frozen rates); documents keep arriving and each is scored the
moment it lands. The twin is completely STATELESS: features come from
`row_text_embedding_col` — the map-only per-row form of the hashed
bigram embedding (no explode, no groupBy) — and the margin/hard-
sigmoid/pred are integer expressions over broadcast weight literals.
No watermark, no state store, so it runs at any ingest volume.

Because both the per-row embedding (bit-equal to the batch embedding,
test-pinned in the r7 embedding tests) and the scorer are exact
integer functions of the row, stream == batch is STRUCTURAL: a
document receives the identical (logit_fx, prob, pred) whether it is
scored in the batch build, one micro-batch, or across restarts.
"""

from __future__ import annotations

from pyspark.sql import functions as F, SparkSession

from ..functions.quality_classifier import S
from ..functions.text_embedding import TE_DIM, row_text_embedding_col


def streaming_qlr_score(
    spark: SparkSession,
    sf_dir: str,
    w: list[int],
    query_name: str = "qlr_out",
    dim: int = TE_DIM,
):
    """readStream over the documents parquet → per-row hashed features
    → integer margin against the frozen weights → memory sink
    (append). Returns the started StreamingQuery; callers
    processAllAvailable() then read `SELECT * FROM {query_name}`."""
    path = f"{sf_dir}/documents.parquet"
    docs = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .format("parquet")
        .load(f"{sf_dir}/documents.parque[t]")
        .select("doc_id", "text")
    )
    emb = row_text_embedding_col(F.col("text"), dim)
    m = F.lit(int(w[0])).cast("long")  # bias (x_0 = 1)
    for j, wj in enumerate(w[1:], start=1):
        if wj:
            m = m + F.lit(int(wj)).cast("long") * F.element_at(
                emb, j
            ).cast("long")
    u = F.least(F.greatest(m + F.lit(2 * S), F.lit(0).cast("long")), F.lit(4 * S))
    scored = docs.select(
        "doc_id",
        m.alias("logit_fx"),
        (u.cast("double") / F.lit(float(4 * S))).alias("prob"),
        (u >= F.lit(2 * S)).cast("int").alias("pred"),
    )
    return (
        scored.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
