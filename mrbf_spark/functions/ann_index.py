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
    # generation-0 quality baseline for the append-time drift report
    q0, n0 = _ivf_quality(
        spark.read.parquet(f"{path}/corpus").select("vec_id", "embedding", "cell"),
        spark,
        cent,
    )
    spark.createDataFrame(
        [(0, n0, q0)], "generation int, n long, mean_q double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
    return cent


def read_ann_centroids(spark: SparkSession, path: str) -> np.ndarray:
    rows = spark.read.parquet(f"{path}/centroids").orderBy("cid").collect()
    return np.array([r["centroid"] for r in rows], dtype=np.float64)


# ---------------------------------------------- incremental append (r8)
#
# Production corpora grow; a full re-encode per append defeats the
# build-once shape (VERDICT r7 next-round #5). `ann_index_append` /
# `pq_index_append` encode ONLY the increment against the FROZEN
# centroids/codebooks — the standard IVF/PQ production shape — and
# append the new rows to the same partitioned layout, so append cost
# is ∝ |increment| and probes see old + new rows through the identical
# scan. The quantizer is NOT refit: result quality depends on the
# increment resembling the build distribution, so each append returns
# a DRIFT report — the mean assignment quality of the appended rows
# (IVF: cosine to the assigned centroid; PQ: cosine to the code
# reconstruction) vs the build-time baseline persisted in
# `path/stats`. A mean-quality DROP beyond REBUILD_DRIFT_DROP says
# the frozen quantizer no longer fits the data — rebuild. The
# criterion is an ABSOLUTE drop on the bounded cosine scale, not a
# ratio: with a weak quantizer the baseline mean sits near 0, where a
# ratio amplifies sampling noise (and flips sign below 0).
#
# Caller contract: vec_ids in the increment must be new (appending an
# existing id creates a duplicate row, as in any append-only store).

REBUILD_DRIFT_DROP = 0.15


def _ivf_quality(assigned: DataFrame, spark: SparkSession, cent: np.ndarray):
    """(mean cosine-to-assigned-centroid, n) over an assigned frame."""
    wm = with_matrix(assigned, spark, cent)
    cvec = F.element_at(F.col("mat"), F.col("cell") + 1)
    q = _decimal_dot(F.col("embedding"), cvec) / (
        F.sqrt(_decimal_dot(F.col("embedding"), F.col("embedding")))
        * F.sqrt(_decimal_dot(cvec, cvec))
    )
    row = wm.agg(F.avg(q).alias("q"), F.count(F.lit(1)).alias("n")).collect()[0]
    return float(row["q"]), int(row["n"])


def _pq_quality(coded: DataFrame, spark: SparkSession, cb: np.ndarray):
    """(mean cosine-to-code-reconstruction, n) over (embedding, codes)
    rows. recon·v = Σ_s dot(v_s, codeword_s) and |recon|² =
    Σ_s |codeword_s|² — both from machinery the encode already has, so
    the metric costs one pass over the increment."""
    sub_dim = cb.shape[1] // M_SUB
    cn = _pq_cnorm_fixed(cb, sub_dim)
    cnorm = F.array(*[F.array(*[F.lit(v).cast("long") for v in row]) for row in cn])
    wm = with_matrix(coded, spark, cb)

    def code_at(s):
        return (F.element_at(F.col("codes"), (s + 1).cast("int")) + 1).cast("int")

    rdot = F.aggregate(
        F.sequence(F.lit(0), F.lit(M_SUB - 1)),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + _fixed_dot_long(
            _sub_slice(F.col("embedding"), s, sub_dim),
            _sub_slice(F.element_at(F.col("mat"), code_at(s)), s, sub_dim),
        ),
    ).cast("double") / F.lit(1e9)
    # cnorm layout is [code j][subspace s] (_pq_cnorm_fixed)
    rnrm = F.aggregate(
        F.sequence(F.lit(0), F.lit(M_SUB - 1)),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.element_at(F.element_at(cnorm, code_at(s)), (s + 1).cast("int")),
    ).cast("double") / F.lit(1e9)
    q = rdot / (
        F.sqrt(_decimal_dot(F.col("embedding"), F.col("embedding"))) * F.sqrt(rnrm)
    )
    row = wm.agg(F.avg(q).alias("q"), F.count(F.lit(1)).alias("n")).collect()[0]
    return float(row["q"]), int(row["n"])


def _write_stats(spark: SparkSession, path: str, gen: int, n: int, q: float):
    spark.createDataFrame(
        [(gen, n, q)], "generation int, n long, mean_q double"
    ).coalesce(1).write.mode("append").parquet(f"{path}/stats")


def _build_baseline(spark: SparkSession, path: str) -> tuple[int, float]:
    """(n, mean_q) of generation 0 (the build). Only the two LEGACY
    shapes get the rebuild advice — `stats` absent (pre-r8 index) or
    present without a generation-0 row; transient IO / permission /
    corruption errors propagate untouched so a healthy index is never
    misdiagnosed as 'rebuild it' (ADVICE r8)."""
    from pyspark.errors import AnalysisException

    legacy = ValueError(
        f"{path}/stats missing or has no generation-0 row — the index "
        "predates incremental append; rebuild it with write_ann_index/"
        "write_pq_index to record the build baseline"
    )
    try:
        rows = (
            spark.read.parquet(f"{path}/stats")
            .filter(F.col("generation") == 0)
            .collect()
        )
    except AnalysisException as e:
        # AnalysisException == the path does not resolve to a readable
        # parquet table (PATH_NOT_FOUND / UNABLE_TO_INFER_SCHEMA) —
        # the legacy-index signature. Executor-side IO failures raise
        # Py4J/SparkException instead and propagate.
        raise legacy from e
    if not rows:
        raise legacy
    row = rows[0]
    return int(row["n"]), float(row["mean_q"])


def _next_generation(spark: SparkSession, path: str) -> int:
    return (
        int(
            spark.read.parquet(f"{path}/stats")
            .agg(F.max("generation").alias("g"))
            .collect()[0]["g"]
        )
        + 1
    )


def _drift_report(kind, path, spark, n_new, q_new) -> dict:
    n0, q0 = _build_baseline(spark, path)
    drop = q0 - q_new
    rep = {
        "index": kind,
        "n_appended": n_new,
        "n_build": n0,
        "mean_q_build": q0,
        "mean_q_appended": q_new,
        "mean_q_drop": drop,
        "rebuild_recommended": bool(drop > REBUILD_DRIFT_DROP),
    }
    _write_stats(spark, path, _next_generation(spark, path), n_new, q_new)
    return rep


def ann_index_append(spark: SparkSession, path: str, new_emb: DataFrame) -> dict:
    """Append `new_emb` (vec_id, embedding) to a persisted IVF index:
    one assignment pass against the FROZEN centroids, rows appended to
    the same cell-partitioned layout. Returns the drift report (module
    comment). With the flat quantizer, append+probe is bit-identical
    to rebuild+probe as long as the build saw the k lowest vec_ids
    (the centroids are a pure function of those rows) — test-pinned."""
    cent = read_ann_centroids(spark, path)
    assigned = kmeans_assign(new_emb.select("vec_id", "embedding"), cent).withColumn(
        "nrm", _decimal_dot(F.col("embedding"), F.col("embedding"))
    )
    q_new, n_new = _ivf_quality(assigned, spark, cent)
    assigned.write.partitionBy("cell").mode("append").parquet(f"{path}/corpus")
    return _drift_report("ivf", path, spark, n_new, q_new)


def pq_index_append(spark: SparkSession, path: str, new_emb: DataFrame) -> dict:
    """Append `new_emb` to a persisted PQ index: encode the increment
    against the FROZEN codebooks, append codes + vectors. Returns the
    drift report (reconstruction-cosine quality)."""
    cb = read_pq_codebook(spark, path)
    sub_dim = cb.shape[1] // M_SUB
    cn = _pq_cnorm_fixed(cb, sub_dim)
    cnorm = F.array(*[F.array(*[F.lit(v).cast("long") for v in row]) for row in cn])
    coded = with_matrix(new_emb, spark, cb).select(
        "vec_id",
        "embedding",
        pq_codes_col(F.col("embedding"), F.col("mat"), cnorm, sub_dim).alias("codes"),
    )
    q_new, n_new = _pq_quality(coded, spark, cb)
    coded.select("vec_id", "codes").write.mode("append").parquet(f"{path}/codes")
    new_emb.select(
        "vec_id",
        "embedding",
        _decimal_dot(F.col("embedding"), F.col("embedding")).alias("nrm"),
    ).write.mode("append").parquet(f"{path}/vectors")
    return _drift_report("pq", path, spark, n_new, q_new)


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
    # generation-0 quality baseline for the append-time drift report
    coded = spark.read.parquet(f"{path}/codes").join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    q0, n0 = _pq_quality(coded, spark, cb)
    spark.createDataFrame(
        [(0, n0, q0)], "generation int, n long, mean_q double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
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
