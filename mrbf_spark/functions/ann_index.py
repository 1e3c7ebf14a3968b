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
    K_CODES,
    M_SUB,
    N_CENTROIDS,
    NPROBE,
    PQ_CAND,
    TOPK,
    _decimal_dot,
    _fixed_dot_long,
    _flat_centroids,
    _pq_cnorm_fixed,
    _sub_slice,
    kmeans_assign,
    kmeans_fit,
    pq_codes_col,
    pq_fit_codebooks,
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


# ------------------------------------------------- persisted PQ index
#
# The PQ twin of the IVF index above — the memory-bound deployment
# shape (Jégou et al. 2011):
#
#     path/codes/     parquet — vec_id, codes array<int> (M_SUB small
#                     ints per vector: the ONLY table the ranking scan
#                     touches; ~32× smaller than the vectors here)
#     path/vectors/   parquet — vec_id, embedding, nrm (read back only
#                     for the ≤ queries×cand ADC survivors, via a
#                     statically pushed-down vec_id IN filter)
#     path/codebook/  parquet — j, c (array<double>)
#
# Probe = per-query LUT (computed in the same fixed-point expression
# language as the encode, broadcast with the query row) → exact-integer
# ADC over the codes scan → top-`cand` per query → exact decimal
# re-rank over the pushed-down vectors read. With the default Forgy
# codebook the probe result is IDENTICAL to the in-memory pq_topk
# (test-pinned); use_kmeans=True persists the refined codebooks.


def write_pq_index(
    emb: DataFrame,
    path: str,
    use_kmeans: bool = False,
    iters: int = IVF_ITERS,
) -> np.ndarray:
    """Encode the corpus once and persist codes + vectors + codebook;
    returns the codebook matrix (K_CODES×dim; subspace s = columns
    s·sub_dim..(s+1)·sub_dim)."""
    spark = emb.sparkSession
    cb = (
        pq_fit_codebooks(emb, iters=iters)
        if use_kmeans
        else _flat_centroids(emb, K_CODES)
    )
    sub_dim = cb.shape[1] // M_SUB
    cn = _pq_cnorm_fixed(cb, sub_dim)
    cnorm = F.array(*[F.array(*[F.lit(v).cast("long") for v in row]) for row in cn])
    codes = with_matrix(emb, spark, cb).select(
        "vec_id",
        pq_codes_col(F.col("embedding"), F.col("mat"), cnorm, sub_dim).alias("codes"),
    )
    codes.write.mode("overwrite").parquet(f"{path}/codes")
    emb.select(
        "vec_id",
        "embedding",
        _decimal_dot(F.col("embedding"), F.col("embedding")).alias("nrm"),
    ).write.mode("overwrite").parquet(f"{path}/vectors")
    spark.createDataFrame(
        [(int(j), [float(x) for x in row]) for j, row in enumerate(cb)],
        "j int, c array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebook")
    return cb


def read_pq_codebook(spark: SparkSession, path: str) -> np.ndarray:
    rows = spark.read.parquet(f"{path}/codebook").orderBy("j").collect()
    return np.array([r["c"] for r in rows], dtype=np.float64)


def pq_index_probe(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    topk: int = TOPK,
    cand: int = PQ_CAND,
    exclude_self: bool = True,
) -> DataFrame:
    """(query_id, vec_id, cosine, rnk) for each query against the
    persisted PQ index. `queries` carries (query_id, embedding) and is
    assumed small (the ANN contract): its LUTs broadcast into the ADC
    scan of the codes table, and the surviving candidate ids are
    collected driver-side (≤ queries×cand ints) so the vectors read
    prunes with a static vec_id IN pushdown — full vectors are never
    scanned."""
    from pyspark.sql import Window as W

    cb = read_pq_codebook(spark, path)
    sub_dim = cb.shape[1] // M_SUB
    qmat = with_matrix(queries, spark, cb)
    lut = F.transform(
        F.sequence(F.lit(0), F.lit(M_SUB - 1)),
        lambda s: F.transform(
            F.col("mat"),
            lambda c: _fixed_dot_long(
                _sub_slice(F.col("embedding"), s, sub_dim),
                _sub_slice(c, s, sub_dim),
            ),
        ),
    )
    q = qmat.select(
        F.col("query_id"),
        F.col("embedding").alias("q_emb"),
        _decimal_dot(F.col("embedding"), F.col("embedding")).alias("q_nrm"),
        lut.alias("lut"),
    )
    codes = spark.read.parquet(f"{path}/codes")
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(M_SUB - 1)),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("lut"), s + 1),
            (F.element_at(F.col("codes"), (s + 1).cast("int")) + 1).cast("int"),
        ),
    )
    wc = W.partitionBy("query_id").orderBy(F.col("adc").desc(), "vec_id")
    cands = codes.crossJoin(F.broadcast(q))
    if exclude_self:
        cands = cands.filter(F.col("vec_id") != F.col("query_id"))
    cands = (
        cands.select("query_id", "vec_id", "q_emb", "q_nrm", adc.alias("adc"))
        .withColumn("crnk", F.row_number().over(wc))
        .filter(F.col("crnk") <= cand)
        .select("query_id", "vec_id", "q_emb", "q_nrm")
    )
    # ONE execution of the ADC job (ADVICE r6 #4): collect the full
    # candidate rows (bounded at queries×cand — the same driver budget
    # the id-list collect already paid) and rebuild the broadcast side
    # from the collected rows, so the expensive codes scan doesn't run
    # a second, uncached time when cands joins the vectors read. The
    # vec_id IN pushdown below still comes from the same collect.
    cand_rows = cands.collect()
    ids = sorted({r["vec_id"] for r in cand_rows})
    cands_local = spark.createDataFrame(cand_rows, cands.schema)
    vectors = spark.read.parquet(f"{path}/vectors").filter(F.col("vec_id").isin(ids))
    rer = vectors.join(F.broadcast(cands_local), "vec_id")
    cosine = _decimal_dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt(F.col("q_nrm")) * F.sqrt(F.col("nrm"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        rer.select("query_id", "vec_id", cosine.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
    )
