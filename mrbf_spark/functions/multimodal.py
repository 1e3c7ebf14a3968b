"""Multimodal-column plumbing (north-star extension): treat media as
opaque `binary` payloads with typed metadata, decode/feature-extract
via Arrow-batched mapInPandas.

The container has no image/audio libraries, so the actual decode is
STUBBED (clearly marked NotImplementedError behind an import-try); the
Spark-side plumbing — binary columns, schema, batch shapes,
partitioning — is real and tested. The deterministic fake featureizer
(byte histogram stats) stands in for the decoder so the pipeline shape
is exercised end-to-end.

TESTDATA has no binary table, so payloads are derived on the fly from
documents.text (utf-8 bytes) — which also makes the metadata query
fully oracle-checkable against DuckDB's blob functions.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

FEATURE_DIM = 8


def decode_image(payload: bytes):
    """Real decoder — requires an imaging library not present in this
    environment. The engine's contract: plug a decoder in here; the
    surrounding Spark plumbing is agnostic to it."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires an imaging library (e.g. Pillow) that is "
            "not baked into this environment; use the deterministic "
            "byte-feature path (fake_features) for plumbing tests"
        ) from exc
    raise NotImplementedError("decoder wiring is environment-specific")


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: binary payload → fixed-size feature vector.
    Deterministic fake 'decode': quantile sketch of the byte values —
    the exact batch shape a real decoder (image → pixels → embedding)
    would use."""
    qs = np.linspace(0.0, 1.0, FEATURE_DIM)
    for pdf in batches:
        feats = []
        for payload in pdf["payload"]:
            arr = np.frombuffer(payload, dtype=np.uint8)
            feats.append(
                np.quantile(arr, qs).astype(np.float32) if arr.size else np.zeros(FEATURE_DIM, np.float32)
            )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "feature": [f.tolist() for f in feats],
            }
        )


def binary_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as an opaque binary column + typed metadata —
    the multimodal table shape (payload, mime, meta)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.struct(
            F.col("lang").alias("lang"), F.col("source").alias("source")
        ).alias("meta"),
    )


# --- metadata over binary columns: fully oracle-checked (byte length +
# content digest both computable on blobs in DuckDB).
@register(
    "multimodal_meta",
    """
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
           SHA256(text) AS digest
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = binary_payloads(spark, sf_dir)
    return p.select(
        "doc_id",
        F.octet_length(F.col("payload")).cast("long").alias("n_bytes"),
        F.lower(F.sha2(F.col("payload"), 256)).alias("digest"),
    )


# --- feature extraction through the Arrow batch path (rows-only:
# the fake decoder is engine-internal; its determinism and shape are
# pinned by tests).
@register("multimodal_features")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = binary_payloads(spark, sf_dir)
    return p.select("doc_id", "payload").mapInPandas(
        _feature_batches, schema=f"doc_id long, n_bytes long, feature array<float>"
    )


FRAME_BYTES = 64
FRAME_STRIDE = 2  # keep every 2nd frame
MAX_FRAMES = 4


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: payload → strided fixed-size frame sample —
    the video-frame-sampling batch shape (decode → pick every k-th
    frame → per-frame bytes + digest). Frame extraction is pure byte
    slicing (deterministic); a real codec would replace the slicing,
    not the plumbing."""
    import hashlib

    for pdf in batches:
        out_doc, out_idx, out_bytes, out_digest = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = max(len(payload) // FRAME_BYTES, 0)
            for k, frame_idx in enumerate(range(0, n_frames, FRAME_STRIDE)):
                if k >= MAX_FRAMES:
                    break
                frame = payload[frame_idx * FRAME_BYTES : (frame_idx + 1) * FRAME_BYTES]
                out_doc.append(doc_id)
                out_idx.append(frame_idx)
                out_bytes.append(len(frame))
                out_digest.append(hashlib.sha256(frame).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "frame_idx": pd.Series(out_idx, dtype="int32"),
                "n_bytes": pd.Series(out_bytes, dtype="int64"),
                "digest": pd.Series(out_digest, dtype="object"),
            }
        )


# --- strided frame sampling through the Arrow batch path (rows-only:
# byte-slicing "frames"; determinism + shape pinned in tests).
@register("multimodal_frame_sample")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = binary_payloads(spark, sf_dir)
    return p.select("doc_id", "payload").mapInPandas(
        _frame_batches, schema="doc_id long, frame_idx int, n_bytes long, digest string"
    )


# --- per-source corpus stats over the multimodal table (bytes are
# metadata aggregation — the group-by a media pipeline runs first).
@register(
    "multimodal_stats",
    """
    SELECT meta_source AS source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT SHA256(text)) AS distinct_payloads
    FROM (SELECT source AS meta_source, text FROM documents)
    GROUP BY 1
    """,
)
def multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = binary_payloads(spark, sf_dir)
    return p.groupBy(F.col("meta.source").alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.octet_length("payload").cast("long")).alias("total_bytes"),
        F.countDistinct(F.lower(F.sha2(F.col("payload"), 256))).alias("distinct_payloads"),
    )
