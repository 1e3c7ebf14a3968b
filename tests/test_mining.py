"""Contrastive triplet mining (r7): numpy fixed-point ground truth
for the exact method, structural ivf==exact at full probe, one-sided
narrow probing, and a planted hand-checkable case."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from conftest import SF_SMOKE

TAU_POS = 0.35
NEG_LO, NEG_HI, K_NEG = 0.15, 0.35, 3


def _fixdot(a: np.ndarray, b: np.ndarray) -> float:
    return float(
        np.sum(np.trunc(a * b * 1e9).astype(np.int64), dtype=np.int64) / 1e9
    )


def _cos(a, b):
    return _fixdot(a, b) / (np.sqrt(_fixdot(a, a)) * np.sqrt(_fixdot(b, b)))


def _replay(rows):
    """Sequential replay of the mining semantics over collected
    (vec_id, embedding(float64), label) rows."""
    ids = [r[0] for r in rows]
    emb = {r[0]: r[1] for r in rows}
    lab = {r[0]: r[2] for r in rows}
    directed = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if lab[a] != lab[b]:
                continue
            c = _cos(emb[a], emb[b])
            if c >= TAU_POS:
                directed += [(a, b, c), (b, a, c)]
    negs = {}
    for a in {d[0] for d in directed}:
        band = [
            (v, _cos(emb[a], emb[v]))
            for v in ids
            if v != a
        ]
        band = [
            (v, c) for v, c in band if NEG_LO <= c < NEG_HI
        ]
        band.sort(key=lambda t: (-t[1], t[0]))
        negs[a] = [
            (v, c, rk + 1) for rk, (v, c) in enumerate(band[:K_NEG])
        ]
    out = set()
    for a, p, pc in directed:
        for v, nc, rk in negs[a]:
            out.add((a, p, v, round(pc, 9), round(nc, 9), rk))
    return out


def _table_rows(spark):
    return [
        (r["vec_id"], np.array(r["embedding"], dtype=np.float64), r["label"])
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    ]


def _collect(df):
    return {
        (
            r["anchor_id"],
            r["positive_id"],
            r["negative_id"],
            round(r["pos_cosine"], 9),
            round(r["neg_cosine"], 9),
            r["neg_rank"],
        )
        for r in df.collect()
    }


def test_exact_triplets_match_numpy_replay(spark):
    from mrbf_spark.functions.mining import contrastive_triplets
    from mrbf_spark.registry import release_scoped_caches

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = _collect(
        contrastive_triplets(
            emb, tau_pos=TAU_POS, neg_lo=NEG_LO, neg_hi=NEG_HI, k_neg=K_NEG
        )
    )
    release_scoped_caches()
    want = _replay(_table_rows(spark))
    assert got == want
    assert len(got) > 0  # the planted dup structure guarantees work


def test_mine_triplets_cli(spark, tmp_path, capsys):
    from mrbf_spark.__main__ import main

    out = str(tmp_path / "triplets")
    assert (
        main(
            [
                "mine-triplets",
                "--input", f"{SF_SMOKE}/embeddings.parquet",
                "--out", out,
                "--method", "ivf",
            ]
        )
        == 0
    )
    assert "mine-triplets[ivf]:" in capsys.readouterr().out
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert set(got.columns) == {
        "anchor_id", "positive_id", "negative_id",
        "pos_cosine", "neg_cosine", "neg_rank",
    }


def test_anchor_cap_semantics(spark):
    from mrbf_spark.functions.mining import contrastive_triplets
    from mrbf_spark.registry import release_scoped_caches

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    kw = dict(tau_pos=TAU_POS, neg_lo=NEG_LO, neg_hi=NEG_HI, k_neg=K_NEG)
    full = _collect(contrastive_triplets(emb, **kw))
    release_scoped_caches()
    # a cap >= the anchor count is a no-op
    wide = _collect(contrastive_triplets(emb, anchor_cap=10_000, **kw))
    release_scoped_caches()
    assert wide == full
    # a small cap keeps exactly the smallest anchor ids' triplets
    anchors = sorted({t[0] for t in full})
    cap = max(2, len(anchors) // 3)
    kept = set(anchors[:cap])
    capped = _collect(contrastive_triplets(emb, anchor_cap=cap, **kw))
    release_scoped_caches()
    assert capped == {t for t in full if t[0] in kept}


def test_ivf_full_probe_equals_exact(spark):
    from mrbf_spark.functions.mining import contrastive_triplets
    from mrbf_spark.registry import release_scoped_caches

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    kw = dict(tau_pos=TAU_POS, neg_lo=NEG_LO, neg_hi=NEG_HI, k_neg=K_NEG)
    exact = _collect(contrastive_triplets(emb, method="exact", **kw))
    release_scoped_caches()
    full = _collect(
        contrastive_triplets(emb, method="ivf", n_cells=8, n_probe=8, **kw)
    )
    release_scoped_caches()
    assert full == exact  # cells partition the corpus; all probed


def test_ivf_narrow_probe_is_one_sided(spark):
    from mrbf_spark.functions.mining import contrastive_triplets
    from mrbf_spark.registry import release_scoped_caches

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    kw = dict(tau_pos=TAU_POS, neg_lo=NEG_LO, neg_hi=NEG_HI, k_neg=K_NEG)
    exact = _collect(contrastive_triplets(emb, method="exact", **kw))
    release_scoped_caches()
    narrow = _collect(
        contrastive_triplets(emb, method="ivf", n_cells=16, n_probe=4, **kw)
    )
    release_scoped_caches()
    # anchors and positives identical (they come from the same pair
    # engine); every narrow-probe negative is a TRUE band member with
    # the exact cosine (scores never approximate — only the candidate
    # set does, and rank k can only be assigned to a real candidate)
    assert {(a, p) for a, p, *_ in narrow} == {(a, p) for a, p, *_ in exact}
    exact_by_pair = {}
    for a, p, v, pc, nc, rk in exact:
        exact_by_pair.setdefault((a, v), nc)
    for a, p, v, pc, nc, rk in narrow:
        assert (a, v) in exact_by_pair or NEG_LO <= nc < NEG_HI
        if (a, v) in exact_by_pair:
            assert nc == exact_by_pair[(a, v)]


def test_auto_routing_both_regimes(spark, caplog):
    """method="auto" (the r8 default) routes on |anchors|x|corpus|:
    under the dot budget it IS the exact path (identical triplets),
    over it it IS the ivf path — both decisions logged."""
    import logging

    from mrbf_spark.functions.mining import contrastive_triplets
    from mrbf_spark.registry import release_scoped_caches

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    kw = dict(tau_pos=TAU_POS, neg_lo=NEG_LO, neg_hi=NEG_HI, k_neg=K_NEG)
    exact = _collect(contrastive_triplets(emb, method="exact", **kw))
    release_scoped_caches()

    with caplog.at_level(logging.INFO, logger="mrbf_spark.functions.mining"):
        small = _collect(contrastive_triplets(emb, method="auto", **kw))
        release_scoped_caches()
    assert small == exact
    assert any("-> exact" in r.message for r in caplog.records)

    caplog.clear()
    # a 1-dot budget forces the scale regime on the same data: auto
    # must route to ivf (the one-sided candidate set — subset pairs,
    # exact scores; the full one-sidedness contract is pinned by
    # test_ivf_narrow_probe_is_one_sided)
    with caplog.at_level(logging.INFO, logger="mrbf_spark.functions.mining"):
        routed = _collect(
            contrastive_triplets(
                emb, method="auto", auto_dots=1,
                n_cells=8, n_probe=8, **kw,
            )
        )
        release_scoped_caches()
    assert any("-> ivf" in r.message for r in caplog.records)
    assert routed == exact  # full probe: cells partition the corpus


def test_planted_triplets_hand_checked(spark):
    from mrbf_spark.functions.mining import contrastive_triplets
    from mrbf_spark.registry import release_scoped_caches

    # 4 unit vectors in one label: a≈b (positive pair), c in the
    # negative band of both, d orthogonal (below the band)
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.98, 0.199, 0.0, 0.0], 0),   # cos(0,1) ≈ 0.98
        (2, [0.25, 0.968, 0.0, 0.0], 0),   # cos(0,2) ≈ 0.25 (band)
        (3, [0.0, 0.0, 1.0, 0.0], 0),      # cos(0,3) = 0
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id long, embedding array<float>, label int",
    )
    got = _collect(
        contrastive_triplets(
            emb, tau_pos=0.8, neg_lo=0.15, neg_hi=0.8, k_neg=2
        )
    )
    release_scoped_caches()
    assert {(a, p, v) for a, p, v, *_ in got} == {(0, 1, 2), (1, 0, 2)}
    for a, p, v, pc, nc, rk in got:
        assert pc > 0.9 and 0.15 <= nc < 0.8 and rk == 1
