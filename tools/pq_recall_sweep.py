"""PQ recall-vs-cost sweep (r7, VERDICT r6 next-round #7).

Measures what PQ_CAND (ADC candidates per query fed to the exact
re-rank) and K_CODES (codebook entries per subspace) buy, for both the
deterministic Forgy codebook (the SQL-replayable branch the driver
hash-matches) and the k-means-refined one (pq_fit_codebooks, the
quality path) — mean recall@TOPK vs the exact brute-force top-k, plus
the probe's wall time.

Usage: python tools/pq_recall_sweep.py [sf_dir ...]
Prints one markdown table per sf_dir (pasteable into SCALING.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

CANDS = (8, 16, 32, 64, 128)
# k=64 is omitted: the expression-based encode evaluates its per-
# subspace score array twice (array_position + array_max), and the
# resulting plan is compile-bound well before it is execute-bound —
# measured: the k=64 pq_fit_codebooks iteration did not finish in
# minutes at sf0.001 while k=32 takes ~2 s. k ∈ {16, 32} (nbits 4/5)
# is the documented operating envelope; classic 8-bit PQ (k=256)
# would want a literal-LUT mapInPandas encode instead, noted in
# SCALING.md as the known limit.
KS = (16, 32)


def main() -> None:
    from mrbf_spark.catalog import queries
    from mrbf_spark.functions.similarity import (
        _flat_centroids,
        pq_fit_codebooks,
        pq_topk,
    )
    from mrbf_spark.registry import release_scoped_caches
    from mrbf_spark.session import get_spark
    from mrbf_spark.tables import load_table

    spark = get_spark("pq-sweep")
    for sf_dir in SF_DIRS:
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        exact = {}
        for r in queries()["ann_bruteforce_topk"](spark, sf_dir).collect():
            exact.setdefault(r["query_id"], set()).add(r["vec_id"])
        release_scoped_caches()
        print(f"\n### PQ recall/cost sweep — {sf_dir} ({n} vectors)\n")
        print("| codebook | k_codes | cand | mean recall@5 | probe sec |")
        print("|---|---|---|---|---|")
        for style in ("forgy", "kmeans"):
            for k in KS:
                cb = (
                    _flat_centroids(emb, k)
                    if style == "forgy"
                    else pq_fit_codebooks(emb, k)
                )
                for cand in CANDS:
                    t0 = time.time()
                    got = {}
                    for r in pq_topk(emb, cb, cand=cand).collect():
                        got.setdefault(r["query_id"], set()).add(r["vec_id"])
                    dt = time.time() - t0
                    release_scoped_caches()
                    rec = sum(
                        len(exact[q] & got.get(q, set())) / len(exact[q])
                        for q in exact
                    ) / len(exact)
                    print(
                        f"| {style} | {k} | {cand} | {rec:.3f} | {dt:.2f} |",
                        flush=True,
                    )


if __name__ == "__main__":
    main()
