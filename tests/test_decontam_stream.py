"""Streaming semantic decontamination == batch (r7): the stateless
per-row twin must reproduce the batch `decontaminate` part=semantic
report row-for-row, and the per-row embedding fold must be bit-equal
to the batch grouped embedding."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from conftest import SF_SMOKE


@pytest.mark.slow
def test_row_embedding_fold_equals_batch_embedding(spark):
    from mrbf_spark.functions.text_embedding import (
        row_text_embedding_col,
        text_hash_embeddings,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    batch = {
        r["vec_id"]: r["embedding"] for r in text_hash_embeddings(docs).collect()
    }
    row = {
        r["doc_id"]: r["e"]
        for r in docs.select(
            "doc_id", row_text_embedding_col(F.col("text")).alias("e")
        ).collect()
    }
    assert set(row) == set(batch)
    for k in batch:
        assert row[k] == batch[k], k  # integer-valued doubles: exact


@pytest.mark.slow
def test_streaming_semantic_decontam_matches_batch(spark):
    from mrbf_spark.functions.decontam import EVAL_MOD, semantic_decontaminate
    from mrbf_spark.streaming.decontam_stream import (
        streaming_semantic_decontam,
    )

    q = streaming_semantic_decontam(spark, SF_SMOKE, query_name="sem_dc_t")
    try:
        q.processAllAvailable()
        got = {
            r["doc_id"]: (
                r["closest_eval_id"],
                float(r["max_eval_cosine"]),
                r["flagged"],
            )
            for r in spark.sql("SELECT * FROM sem_dc_t").collect()
        }
    finally:
        q.stop()
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    batch = {
        r["doc_id"]: (
            r["closest_eval_id"],
            float(r["max_eval_cosine"]),
            r["flagged"],
        )
        for r in semantic_decontaminate(
            d.filter(F.col("doc_id") % EVAL_MOD != 0),
            d.filter(F.col("doc_id") % EVAL_MOD == 0),
        ).collect()
    }
    assert got == batch
    assert len(got) > 0
