"""Streaming semantic decontamination — the streaming twin of the
batch `decontaminate` part=semantic channel (r7).

Deployment shape: the EVAL set is a fixed benchmark snapshot while
training documents keep arriving; every arriving doc must be scored
against the nearest eval doc online (gate contaminated docs before
they reach the training sink). The twin is completely STATELESS:

  * the doc embedding is computed INSIDE the row
    (`row_text_embedding_col` — the map-only fold twin of the batch
    text_hash_embeddings, bit-equal by test), so the stream needs no
    explode/groupBy and therefore no state store or watermark;
  * the eval embeddings are baked in as LITERAL expressions (the
    batch channel broadcasts the same benchmark-sized table; the
    literal form binds tighter — fine for benchmark suites of
    hundreds of docs, which is the operating point of the exact
    channel too. An eval suite too large to literal-encode is exactly
    the case the batch `semantic_decontaminate_pruned` IVF routing
    exists for — run IT per micro-batch via foreachBatch instead);
  * per-row: fixed-point cosine against every eval vector, max, and
    the min-eval_id tie-break via struct ordering (max over
    (cosine, -eval_id)) — the same deterministic argmax the batch
    channel computes with its partial-agg max + min two-step.

stream == batch row-for-row is therefore structural, and test-pinned
(tests/test_decontam_stream.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.decontam import EVAL_MOD, SEM_TAU
from ..functions.similarity import _decimal_dot
from ..functions.text_embedding import row_text_embedding_col, text_hash_embeddings


def semantic_decontam_cols(eval_rows) -> list:
    """The per-row classification columns (closest_eval_id,
    max_eval_cosine, flagged-expression builder) over a collected
    eval-embedding list [(eval_id, embedding), ...]. Shared between
    the streaming twin and any map-only batch use."""
    emb = F.col("__emb")
    c_nrm = _decimal_dot(emb, emb)
    scored = []
    for eval_id, e_emb in eval_rows:
        elit = F.array(*[F.lit(float(v)) for v in e_emb])
        e_nrm = _decimal_dot(elit, elit)
        cos = _decimal_dot(emb, elit) / (F.sqrt(c_nrm) * F.sqrt(e_nrm))
        scored.append(
            F.struct(
                cos.alias("cosine"),
                F.lit(-int(eval_id)).cast("long").alias("neg_id"),
            )
        )
    # struct ordering: max cosine first, then max(-eval_id) = MIN
    # eval_id — the batch channel's exact tie-break
    best = F.array_max(F.array(*scored))
    return [
        (-best["neg_id"]).alias("closest_eval_id"),
        best["cosine"].alias("max_eval_cosine"),
    ]


def streaming_semantic_decontam(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "sem_decontam_out",
    tau: float = SEM_TAU,
):
    """readStream over the documents parquet (corpus split) → per-row
    embedding fold → literal-eval cosine argmax → memory sink
    (append). Returns the started StreamingQuery; callers
    processAllAvailable() then read `SELECT * FROM {query_name}`."""
    path = f"{sf_dir}/documents.parquet"
    static = spark.read.parquet(path)
    eval_rows = [
        (r["vec_id"], r["embedding"])
        for r in text_hash_embeddings(
            static.filter(F.col("doc_id") % EVAL_MOD == 0).select(
                "doc_id", "text"
            )
        ).collect()
    ]
    docs = (
        spark.readStream.schema(static.schema)
        .format("parquet")
        .load(f"{sf_dir}/documents.parque[t]")
        .filter(F.col("doc_id") % EVAL_MOD != 0)
        .select("doc_id", "text")
    )
    cid, cmax = semantic_decontam_cols(eval_rows)
    out = docs.withColumn("__emb", row_text_embedding_col(F.col("text"))).select(
        "doc_id",
        cid,
        cmax,
    )
    out = out.withColumn(
        "flagged", (F.col("max_eval_cosine") >= tau).cast("int")
    )
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
