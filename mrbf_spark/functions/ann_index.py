"""Persisted IVF index over an embeddings corpus: build once, probe
many times.

The catalog's ANN entries (`functions/similarity.py`) rebuild cell
assignments inside each query — right for a self-contained benchmark,
wrong for production, where a 100 TB corpus is indexed once and then
probed by many small query batches. This module persists the index:

    path/corpus/     parquet PARTITIONED BY cell — vec_id, embedding,
                     nrm (the fixed-point self-dot, precomputed so
                     probes never re-derive it)
    path/centroids/  parquet — cid, centroid (array<double>; doubles
                     round-trip parquet bit-exactly)

Probing computes each query's top-`nprobe` cells against the loaded
centroid matrix (driver-side, k×dim scalars), then reads the corpus
with `cell IN (probed)` — a STATICALLY PARTITION-PRUNED scan
(plan-tested): a probe touches ~nprobe/k of the index bytes and the
corpus is never rescanned or reassigned. Candidate scoring is the
same broadcast equi-join + exact decimal re-rank as the in-memory
IVF-flat path, and with flat centroids the results are identical to
`ann_ivf_flat_topk` (test-pinned).

Cell assignment, probe ranking, and re-rank all use the fixed-point
dot machinery, so an index built by any engine that replays the
definition is byte-compatible.

No reference counterpart (the reference has no vector search); this
is the deployment shape of the similarity family.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

from .similarity import (
    IVF_ITERS,
    N_CENTROIDS,
    NPROBE,
    TOPK,
    _decimal_dot,
    _fixed_dot_long,
    _flat_centroids,
    kmeans_assign,
    kmeans_fit,
    with_matrix,
)


def write_ann_index(
    emb: DataFrame,
    path: str,
    k: int = N_CENTROIDS,
    use_kmeans: bool = False,
    iters: int = IVF_ITERS,
) -> np.ndarray:
    """Build and persist the index; returns the centroid matrix.
    use_kmeans=True refines centroids with the distributed full-corpus
    Lloyd loop (better cell balance); False keeps the deterministic
    flat quantizer (replayable from the corpus alone)."""
    spark = emb.sparkSession
    cent = (
        kmeans_fit(emb, k=k, iters=iters) if use_kmeans else _flat_centroids(emb, k)
    )
    assigned = kmeans_assign(emb.select("vec_id", "embedding"), cent).withColumn(
        "nrm", _decimal_dot(F.col("embedding"), F.col("embedding"))
    )
    (
        assigned.write.partitionBy("cell")
        .mode("overwrite")
        .parquet(f"{path}/corpus")
    )
    cent_df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(cent)],
        "cid int, centroid array<double>",
    )
    cent_df.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    return cent


def read_ann_centroids(spark: SparkSession, path: str) -> np.ndarray:
    rows = spark.read.parquet(f"{path}/centroids").orderBy("cid").collect()
    return np.array([r["centroid"] for r in rows], dtype=np.float64)


def ann_index_probe(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    nprobe: int = NPROBE,
    topk: int = TOPK,
    exclude_self: bool = True,
) -> DataFrame:
    """(query_id, vec_id, cosine, rnk) for each query against the
    persisted index. `queries` carries (query_id, embedding); it is
    assumed small (the ANN contract) — its probe cells are collected
    driver-side (≤ queries×nprobe ints) so the corpus scan prunes
    partitions STATICALLY, and the query side broadcasts into the
    candidate join."""
    cent = read_ann_centroids(spark, path)
    qmat = with_matrix(queries, spark, cent)
    fdots = lambda: F.transform(  # noqa: E731 — tiny local expr factory
        F.col("mat"), lambda c: _fixed_dot_long(F.col("embedding"), c)
    )
    ranked = F.sort_array(
        F.transform(fdots(), lambda d, i: F.struct((-d).alias("nd"), i.alias("i")))
    )
    probe_cells = F.transform(
        F.slice(ranked, 1, nprobe), lambda s: s["i"].cast("int")
    )
    q = qmat.select(
        F.col("query_id"),
        F.col("embedding").alias("q_emb"),
        F.explode(probe_cells).alias("cell"),
        _decimal_dot(F.col("embedding"), F.col("embedding")).alias("q_nrm"),
    )
    cells = sorted({r["cell"] for r in q.select("cell").distinct().collect()})
    corpus = spark.read.parquet(f"{path}/corpus").filter(F.col("cell").isin(cells))
    cands = corpus.join(F.broadcast(q), "cell")
    if exclude_self:
        cands = cands.filter(F.col("vec_id") != F.col("query_id"))
    cosine = _decimal_dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt(F.col("q_nrm")) * F.sqrt(F.col("nrm"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        cands.select("query_id", "vec_id", cosine.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
    )
