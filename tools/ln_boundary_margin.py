"""Quantify the <1-ulp libm ln() truncation-boundary risk (the watch
item carried since r5; lm.py:21, dsir.py:26).

The fixed-point LM terms are trunc(1e9·ln(p)) where p = n/d for
integer (n, d) pairs drawn from corpus counts. A cross-engine flip
needs libm-A and libm-B to land on opposite sides of an INTEGER
boundary of 1e9·ln(n/d) — possible only when the correctly-rounded
value sits within ~1 ulp of that integer. This tool enumerates every
distinct (n, d) pair the LM actually produces at a given sf and
reports the minimum distance to the nearest integer in ulps: a
minimum of k ulps means a k-ulp libm disagreement is needed to flip
any row — measured margin instead of a standing vigil.

Usage: python tools/ln_boundary_margin.py [sf_dir ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = sys.argv[1:] or ["/root/testdata/sf0.1"]
SCALE = 1_000_000_000.0


def main() -> None:
    from pyspark.sql import functions as F

    from mrbf_spark.functions.lm import _doc_bigrams
    from mrbf_spark.registry import release_scoped_caches
    from mrbf_spark.session import get_spark
    from mrbf_spark.tables import load_table

    spark = get_spark("ln-margin")
    for sf_dir in SF_DIRS:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        bg = _doc_bigrams(docs)
        model = bg.groupBy("prev", "cur").agg(F.sum("cnt").alias("c_bg"))
        ctx = model.groupBy("prev").agg(F.sum("c_bg").alias("c_prev"))
        vocab = (
            docs.select(
                F.explode_outer(F.split(F.lower(F.col("text")), " ")).alias("t")
            )
            .agg(F.countDistinct("t").alias("v"))
            .collect()[0]["v"]
        )
        pairs = (
            model.join(ctx, "prev")
            .select(
                (F.col("c_bg") + 1).alias("n"),
                (F.col("c_prev") + F.lit(vocab)).alias("d"),
            )
            .distinct()
            .collect()
        )
        release_scoped_caches()
        worst = None
        for r in pairs:
            x = math.log(r["n"] / r["d"]) * SCALE
            if x == 0.0:
                continue
            dist = abs(x - round(x))
            ulp = math.ulp(x)
            margin = dist / ulp
            if worst is None or margin < worst[0]:
                worst = (margin, r["n"], r["d"], x)
        m, n, d, x = worst
        print(
            f"{sf_dir}: {len(pairs)} distinct (n,d) pairs; min boundary"
            f" margin = {m:.1f} ulps at ln({n}/{d})*1e9 = {x!r}"
        )


if __name__ == "__main__":
    main()
