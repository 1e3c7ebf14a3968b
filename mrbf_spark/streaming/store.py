"""Versioned last-writer-wins store shared by the streaming
maintainers (sketch_stream.py, merge_stream.py): state lives in
``<store>/v=<batch_id>/`` parquet directories; a batch writes ONLY its
own version, and readers pick the newest COMPLETE (_SUCCESS) version.

Replay discipline: foreachBatch is at-least-once, so a batch may
re-run after its own version was already committed (driver died
between the store write and the checkpoint commit). Readers used by a
MERGE step must therefore exclude versions >= the current batch id —
otherwise a non-idempotent merge (count-min counter addition) folds
the replayed increment in twice. Idempotent merges (KMV
union-distinct, pk upsert) converge either way, but all maintainers
use the same exclusion so the retry behavior is uniform.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_latest_version(
    spark: SparkSession,
    store_dir: str,
    schema: str,
    before_batch: int | None = None,
) -> DataFrame | None:
    """Newest complete store version (optionally strictly below
    ``before_batch`` — the replay exclusion), or None if none exists."""
    try:
        versions = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(store_dir)
            if d.startswith("v=")
        )
    except FileNotFoundError:
        return None
    for v in reversed(versions):
        if before_batch is not None and v >= before_batch:
            continue
        path = os.path.join(store_dir, f"v={v}")
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            return spark.read.schema(schema).parquet(path)
    return None
