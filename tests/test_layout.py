"""Z-order layout + compaction (functions/layout.py): the pruning
claim is PROVEN from the written files' parquet row-group statistics,
not argued."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mrbf_spark.functions.layout import (
    _morton_interleave,
    compact_to_target,
    write_zordered,
    zorder_key,
)

N_FILES = 64


def _grid_df(spark, n=100_000):
    # deterministic 2-d points in [0, 1000)^2 with INDEPENDENT dims
    # (two linear maps of id mod m are a 1-d curve, not a plane —
    # x must not determine y or every layout prunes y equally well)
    return spark.range(n).select(
        (F.col("id") % 1000).alias("x"),
        F.pmod(F.hash("id"), F.lit(1000)).alias("y"),
        F.col("id").alias("payload"),
    )


def _groups_intersecting(path, xlo, xhi, ylo, yhi):
    """(#row groups whose [min,max] intersects the box, total)."""
    hit = total = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        pf = pq.ParquetFile(f)
        names = pf.schema_arrow.names
        xi, yi = names.index("x"), names.index("y")
        for g in range(pf.metadata.num_row_groups):
            rg = pf.metadata.row_group(g)
            sx, sy = rg.column(xi).statistics, rg.column(yi).statistics
            total += 1
            if (
                sx.min < xhi and sx.max >= xlo
                and sy.min < yhi and sy.max >= ylo
            ):
                hit += 1
    return hit, total


def test_morton_interleave_known_bits(spark):
    got = spark.range(1).select(
        _morton_interleave(F.lit(3).cast("long"), F.lit(1).cast("long"), 2).alias("k")
    ).collect()[0]["k"]
    # a=0b11 -> bits at positions 1,3; b=0b01 -> bit at position 0
    assert got == 0b1011


def test_zorder_key_is_total_and_deterministic(spark):
    df = zorder_key(_grid_df(spark, 1000), "x", "y")
    assert df.count() == 1000
    a = sorted(r["__zkey"] for r in df.collect())
    b = sorted(r["__zkey"] for r in zorder_key(_grid_df(spark, 1000).repartition(7), "x", "y").collect())
    assert a == b


def test_zorder_prunes_2d_boxes_where_linear_sort_cannot(spark, tmp_path):
    df = _grid_df(spark)
    p_unsorted = str(tmp_path / "unsorted")
    p_xsorted = str(tmp_path / "xsorted")
    p_zorder = str(tmp_path / "zorder")
    df.repartition(N_FILES).write.mode("overwrite").parquet(p_unsorted)
    (
        df.repartitionByRange(N_FILES, "x").sortWithinPartitions("x")
        .write.mode("overwrite").parquet(p_xsorted)
    )
    write_zordered(df, p_zorder, "x", "y", n_files=N_FILES)

    # all three layouts hold identical data
    assert (
        spark.read.parquet(p_zorder).agg(F.sum("payload")).collect()
        == df.agg(F.sum("payload")).collect()
    )

    box = (100, 200, 100, 200)  # 10% × 10% box
    z_hit, z_tot = _groups_intersecting(p_zorder, *box)
    x_hit, x_tot = _groups_intersecting(p_xsorted, *box)
    u_hit, u_tot = _groups_intersecting(p_unsorted, *box)
    # unsorted layout: every group spans ~everything — no pruning
    assert u_hit == u_tot
    # x-sorted prunes the x slab but every surviving group spans all y;
    # z-order prunes BOTH dims, so it must skip strictly more groups
    assert z_hit < x_hit, (z_hit, x_hit)

    yband = (0, 1000, 100, 200)  # y-only predicate: x-sort is blind
    zy_hit, _ = _groups_intersecting(p_zorder, *yband)
    xy_hit, _ = _groups_intersecting(p_xsorted, *yband)
    assert xy_hit == x_tot  # x-sorted reads everything
    assert zy_hit < x_tot // 2, zy_hit  # z-order skips most groups


def test_compact_to_target_merges_small_files(spark, tmp_path):
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 17).alias("k")
    ).repartition(32)
    out = str(tmp_path / "compact")
    n = compact_to_target(df, out, target_bytes=1 << 30)
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert n == 1 and len(files) == 1
    assert spark.read.parquet(out).count() == 10_000


def test_compact_to_target_splits_oversized_single_partition(spark, tmp_path):
    """The estimator can also SPLIT: a 1-partition source with a tiny
    target must fan out to multiple files (coalesce alone cannot grow
    the partition count)."""
    df = spark.range(50_000).select(
        F.col("id"), F.concat(F.lit("x" * 200), F.col("id").cast("string")).alias("pad")
    ).coalesce(1)
    out = str(tmp_path / "split")
    n = compact_to_target(df, out, target_bytes=64 * 1024)
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert n > 1 and len(files) == n
    assert spark.read.parquet(out).count() == 50_000
