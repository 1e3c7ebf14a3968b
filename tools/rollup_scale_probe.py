"""One-off scale probe for incremental rollup maintenance (r9):
at a large sf, time (a) the full recompute, (b) a refresh from an
insert-only delta (clean keys — the rescan's dirty set is empty, so
the refresh is strictly delta-proportional), and (c) a refresh from
an update-heavy delta (every touched key dirty — pays the min/max
rescan of the new snapshot, the cost a key-partitioned layout would
prune). Prints one JSON line; numbers go into SCALING.md.

Usage: python tools/rollup_scale_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".testdata", "sf1")


def main() -> None:
    from pyspark.sql import functions as F

    from mrbf_spark.functions.rollup import (
        rollup_apply,
        rollup_base,
        rollup_delta,
    )
    from mrbf_spark.session import get_spark
    from mrbf_spark.tables import load_table

    spark = get_spark("rollup-scale-probe")
    # high-cardinality key so clean/dirty sets are meaningful
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id",
        F.pmod(F.col("event_id"), F.lit(49999)).cast("string").alias("k"),
        F.floor(F.col("value").cast("double") * 1e6).cast("long").alias("v"),
    )
    n = ev.count()
    cut = int(n * 0.99)
    old = ev.filter(F.col("event_id") < cut)
    # (b) insert-only increment: the last 1% of pks
    new_ins = ev
    # (c) update-heavy: same pks, 1% of OLD rows bumped (no inserts)
    new_upd = old.withColumn(
        "v",
        F.when(F.pmod(F.col("event_id"), F.lit(100)) == 3, F.col("v") * 2)
        .otherwise(F.col("v")),
    )

    base = rollup_base(old, ["k"], "v").localCheckpoint()
    d_ins = rollup_delta(old, new_ins, "event_id", ["k"], "v").localCheckpoint()
    d_upd = rollup_delta(old, new_upd, "event_id", ["k"], "v").localCheckpoint()
    n_dirty_ins = d_ins.filter(F.col("dirty") == 1).count()
    n_dirty_upd = d_upd.filter(F.col("dirty") == 1).count()

    def t(mk) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    # (d) partition-pruned rescan: lay the new snapshot out by a
    # key-derived bucket and refresh from a SMALL dirty set — the
    # rescan's file set must shrink to the touched partitions (the
    # inputFiles counts are the hard evidence; at this sf every
    # timing is overhead-dominated).
    pexpr = F.pmod(F.crc32(F.col("k")), F.lit(256)).cast("int")
    pdir = os.path.join(REPO, ".tmp", "rollup_probe_part")
    new_small = old.withColumn(
        "v",
        F.when(F.pmod(F.col("event_id"), F.lit(100003)) == 3, F.col("v") * 2)
        .otherwise(F.col("v")),
    )
    new_small.withColumn("kb", pexpr).write.mode("overwrite").partitionBy(
        "kb"
    ).parquet(pdir)
    newp = spark.read.parquet(pdir)
    d_small = rollup_delta(
        old, new_small, "event_id", ["k"], "v"
    ).localCheckpoint()
    dirty_vals = [
        r["p"]
        for r in d_small.filter(F.col("dirty") == 1)
        .select(pexpr.alias("p"))
        .distinct()
        .collect()
    ]
    out = {
        "sf_dir": SF_DIR,
        "rows": n,
        "n_groups": base.count(),
        "recompute_s": t(lambda: rollup_base(new_ins, ["k"], "v")),
        "apply_insert_only_s": t(
            lambda: rollup_apply(base, d_ins, new_ins, ["k"], "v")
        ),
        "apply_update_heavy_s": t(
            lambda: rollup_apply(base, d_upd, new_upd, ["k"], "v")
        ),
        "dirty_keys_insert_only": n_dirty_ins,
        "dirty_keys_update_heavy": n_dirty_upd,
        "pruned_dirty_keys": d_small.filter(F.col("dirty") == 1).count(),
        "pruned_partitions": len(dirty_vals),
        # runtime-true file sets (inputFiles() ignores filters):
        # distinct input_file_name() executes WITH partition pruning
        "files_full_table": newp.select(F.input_file_name())
        .distinct()
        .count(),
        "files_pruned_rescan": newp.filter(F.col("kb").isin(dirty_vals))
        .select(F.input_file_name())
        .distinct()
        .count(),
        "apply_pruned_s": t(
            lambda: rollup_apply(
                base, d_small, newp, ["k"], "v",
                rescan_partition=("kb", pexpr),
            )
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
