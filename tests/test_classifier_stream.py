"""Streaming qlr scorer (r8): stream == batch exactly — the per-row
embedding and the integer scorer are pure functions of the row, so
equality is structural, checked here value-for-value."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from conftest import SF_SMOKE


@pytest.mark.slow
def test_streaming_qlr_matches_batch(spark):
    from mrbf_spark.functions.quality_classifier import (
        QLR_TRAIN_MOD,
        qlr_score,
        qlr_train,
    )
    from mrbf_spark.registry import release_scoped_caches
    from mrbf_spark.streaming.classifier_stream import streaming_qlr_score

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    w = qlr_train(
        docs.filter(F.col("doc_id") % QLR_TRAIN_MOD == 0),
        (F.col("lang") == "en"),
    )
    batch = {
        r["doc_id"]: (r["logit_fx"], r["prob"], r["pred"])
        for r in qlr_score(docs, w).collect()
    }
    release_scoped_caches()

    q = streaming_qlr_score(spark, SF_SMOKE, w, query_name="qlr_t")
    try:
        q.processAllAvailable()
        got = {
            r["doc_id"]: (r["logit_fx"], r["prob"], r["pred"])
            for r in spark.sql("SELECT * FROM qlr_t").collect()
        }
    finally:
        q.stop()
    assert got == batch and len(got) == docs.count()
