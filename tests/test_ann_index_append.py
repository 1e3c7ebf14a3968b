"""Incremental ANN index maintenance (r8, VERDICT r7 next-round #5):
append+probe must equal rebuild+probe bit-exactly (the flat quantizer
is a pure function of the k lowest vec_ids, which the base build
contains), and the drift report must flag an increment the frozen
quantizer no longer fits."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from conftest import SF_SMOKE


def _frames(df):
    return sorted(
        (r["query_id"], r["vec_id"], r["cosine"], r["rnk"]) for r in df.collect()
    )


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


@pytest.mark.slow
def test_ivf_append_probe_equals_rebuild_probe(spark, tmp_path):
    from mrbf_spark.functions.ann_index import (
        ann_index_append,
        ann_index_probe,
        write_ann_index,
    )

    emb = _emb(spark)
    base = emb.filter(F.col("vec_id") < 350)
    inc = emb.filter(F.col("vec_id") >= 350)
    queries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    grown = str(tmp_path / "grown")
    write_ann_index(base, grown)
    rep = ann_index_append(spark, grown, inc)
    assert rep["n_appended"] == inc.count()
    assert rep["index"] == "ivf" and rep["n_build"] == base.count()

    rebuilt = str(tmp_path / "rebuilt")
    write_ann_index(emb, rebuilt)
    assert _frames(ann_index_probe(spark, grown, queries)) == _frames(
        ann_index_probe(spark, rebuilt, queries)
    )
    # an on-distribution increment shows no drift
    assert not rep["rebuild_recommended"]


@pytest.mark.slow
def test_pq_append_probe_equals_rebuild_probe(spark, tmp_path):
    from mrbf_spark.functions.ann_index import (
        pq_index_append,
        pq_index_probe,
        write_pq_index,
    )

    emb = _emb(spark)
    base = emb.filter(F.col("vec_id") < 350)
    inc = emb.filter(F.col("vec_id") >= 350)
    queries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    grown = str(tmp_path / "grown")
    write_pq_index(base, grown)
    rep = pq_index_append(spark, grown, inc)
    assert rep["n_appended"] == inc.count()

    rebuilt = str(tmp_path / "rebuilt")
    write_pq_index(emb, rebuilt)
    assert _frames(pq_index_probe(spark, grown, queries)) == _frames(
        pq_index_probe(spark, rebuilt, queries)
    )
    assert not rep["rebuild_recommended"]


def test_drift_flags_offdistribution_increment(spark, tmp_path):
    """An increment ORTHOGONAL to the centroid span (cosine ≈ 0 to
    every centroid — data the frozen quantizer cannot represent at
    all) must push mean_q to ~0 and trip rebuild_recommended.
    (A sign-flip is NOT off-distribution here: among 16 spread
    centroids a flipped vector still finds a positively-aligned one.)"""
    import numpy as np

    from mrbf_spark.functions.ann_index import (
        ann_index_append,
        read_ann_centroids,
        write_ann_index,
    )

    emb = _emb(spark)
    base = emb.filter(F.col("vec_id") < 350)
    idx = str(tmp_path / "idx")
    write_ann_index(base, idx)

    cent = read_ann_centroids(spark, idx)
    q, _ = np.linalg.qr(cent.T)  # orthonormal basis of the centroid span
    rng = np.random.RandomState(7)
    v = rng.randn(cent.shape[1])
    v -= q @ (q.T @ v)
    v /= np.linalg.norm(v)
    inc = spark.createDataFrame(
        [(100_000 + i, [float(x) for x in v]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    rep = ann_index_append(spark, idx, inc)
    assert abs(rep["mean_q_appended"]) < 0.01  # ⊥ every centroid
    assert rep["mean_q_drop"] > 0.15
    assert rep["rebuild_recommended"]


def test_ann_append_cli(spark, tmp_path, capsys):
    from mrbf_spark.__main__ import main
    from mrbf_spark.functions.ann_index import write_ann_index

    emb = _emb(spark)
    idx = str(tmp_path / "idx")
    write_ann_index(emb.filter(F.col("vec_id") < 350), idx)
    inc = str(tmp_path / "inc")
    emb.filter(F.col("vec_id") >= 350).write.parquet(inc)
    assert main(["ann-append", "--index", idx, "--input", inc]) == 0
    out = capsys.readouterr().out
    assert "ann-append[ivf]: +150 vectors (build 350)" in out
    assert "WARNING" not in out


def test_append_updates_stats_generations(spark, tmp_path):
    from mrbf_spark.functions.ann_index import ann_index_append, write_ann_index

    emb = _emb(spark)
    idx = str(tmp_path / "idx")
    write_ann_index(emb.filter(F.col("vec_id") < 300), idx)
    ann_index_append(
        spark, idx, emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    )
    ann_index_append(spark, idx, emb.filter(F.col("vec_id") >= 400))
    gens = sorted(
        r["generation"] for r in spark.read.parquet(f"{idx}/stats").collect()
    )
    assert gens == [0, 1, 2]


def test_build_baseline_legacy_vs_real_errors(spark, tmp_path):
    """ADVICE r8: only the legacy-index shapes (stats dir missing, or
    present without a generation-0 row) get the rebuild advice; a
    stats table that exists with generation 0 resolves normally even
    when later generations are present."""
    import pytest

    from mrbf_spark.functions.ann_index import _build_baseline, _write_stats

    # stats dir missing entirely → legacy advice
    with pytest.raises(ValueError, match="predates incremental append"):
        _build_baseline(spark, str(tmp_path / "nonexistent"))

    # stats present but WITHOUT generation 0 → the same legacy advice
    # (an IndexError previously leaked through the bare collect()[0])
    p1 = str(tmp_path / "no_gen0")
    _write_stats(spark, p1, 3, 10, 0.5)
    with pytest.raises(ValueError, match="predates incremental append"):
        _build_baseline(spark, p1)

    # healthy stats → resolves
    p2 = str(tmp_path / "ok")
    _write_stats(spark, p2, 0, 42, 0.75)
    _write_stats(spark, p2, 1, 50, 0.70)
    assert _build_baseline(spark, p2) == (42, 0.75)
