"""Time catalog queries into the noop sink: 1 warm-up + N samples.

Usage: python tools/time_query.py <name> [name ...] [--sf=DIR] [--n=3]

Quick optimization-loop probe (bench.py stays the recorded artifact).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.1"
    n = 3
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])

    from mrbf_spark.session import get_spark
    from mrbf_spark import catalog
    from mrbf_spark.registry import release_scoped_caches

    spark = get_spark("time-query")
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()
    qs = dict(catalog.queries())
    import bench

    for n_, fn_ in bench.legacy_builders().items():
        # retired legacy names carry fn=None in bench's map (ADVICE
        # r9): skip them so a stale name fails the qs[name] lookup
        # with a KeyError instead of a TypeError on None
        if fn_ is not None:
            qs.setdefault(n_, fn_)
    for name in names:
        fn = qs[name]
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        release_scoped_caches()
        print(f"{name} warmup {time.time() - t0:.2f}s", flush=True)
        samples = []
        for _ in range(n):
            t0 = time.time()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            release_scoped_caches()
            samples.append(time.time() - t0)
        mid = sorted(samples)[len(samples) // 2]
        print(
            f"{name} median {mid:.2f}s samples "
            + " ".join(f"{s:.2f}" for s in samples),
            flush=True,
        )


if __name__ == "__main__":
    main()
