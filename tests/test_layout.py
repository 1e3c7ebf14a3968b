"""Z-order layout + compaction (functions/layout.py): the pruning
claim is PROVEN from the written files' parquet row-group statistics,
not argued."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mrbf_spark.functions.layout import (
    _HILBERT_NXT,
    _HILBERT_OUT,
    _morton_interleave,
    compact_to_target,
    hilbert_key,
    write_hilbert,
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


@pytest.mark.slow
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


def _xy2d(bits: int, x: int, y: int) -> int:
    """Independent reference: the classic Wikipedia xy2d rotation
    loop, implemented directly (no state machine) — pins the derived
    _HILBERT_OUT/_HILBERT_NXT tables to the textbook curve."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def _hilbert_via_tables(bits: int, x: int, y: int) -> int:
    """Python replay of the Spark fold (state machine over base-4
    Morton digits, MSB first)."""
    st, d = 0, 0
    for i in range(bits - 1, -1, -1):
        q = 2 * ((x >> i) & 1) + ((y >> i) & 1)
        d = (d << 2) | _HILBERT_OUT[st * 4 + q]
        st = _HILBERT_NXT[st * 4 + q]
    return d


def test_hilbert_tables_match_textbook_xy2d_exhaustively():
    bits = 6  # 4096 points — every (state, quadrant) path exercised
    for x in range(1 << bits):
        for y in range(1 << bits):
            assert _hilbert_via_tables(bits, x, y) == _xy2d(bits, x, y), (x, y)


def test_hilbert_index_is_a_bijection():
    bits = 5
    n = 1 << bits
    seen = {_xy2d(bits, x, y) for x in range(n) for y in range(n)}
    assert seen == set(range(n * n))


def test_hilbert_key_spark_matches_reference(spark):
    """Spark's F.aggregate fold == the Python xy2d reference on an
    exhaustive 16×16 grid (min=0/max=15 makes the min-max scaling the
    identity, so raw coordinates hit the machine unchanged)."""
    bits = 4
    n = 1 << bits
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = {
        (r["x"], r["y"]): r["__hkey"]
        for r in hilbert_key(df, "x", "y", bits=bits).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _xy2d(bits, x, y), (x, y)


def test_hilbert_adjacent_cells_are_unit_steps():
    """The defining Hilbert property (and why its locality beats
    Morton): consecutive curve positions are always Manhattan
    distance 1 apart. Morton violates this at every 2^k boundary."""
    bits = 5
    n = 1 << bits
    pos = {_xy2d(bits, x, y): (x, y) for x in range(n) for y in range(n)}
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_zorder_key_three_columns(spark):
    """k=3 Morton: total, deterministic, partition-invariant, and the
    bit budget auto-narrows (3 × 16 > 63 ⇒ bits drops to 63//3=21,
    capped at 16 → fine; explicit bits=21 would still fit)."""
    df = spark.range(2000).select(
        (F.col("id") % 10).alias("x"),
        (F.col("id") % 7).alias("y"),
        (F.col("id") % 13).alias("z"),
    )
    a = sorted(r["__zkey"] for r in zorder_key(df, "x", "y", "z").collect())
    b = sorted(
        r["__zkey"]
        for r in zorder_key(df.repartition(5), "x", "y", "z").collect()
    )
    assert a == b and len(a) == 2000


@pytest.mark.slow
def test_hilbert_prunes_at_least_as_well_as_morton(spark, tmp_path):
    """Hilbert's tighter locality: on the same box predicates, the
    hilbert layout must beat unsorted everywhere and be within a
    whisker of (usually better than) morton on row-group pruning."""
    df = _grid_df(spark)
    p_morton = str(tmp_path / "morton")
    p_hilbert = str(tmp_path / "hilbert")
    write_zordered(df, p_morton, "x", "y", n_files=N_FILES)
    write_hilbert(df, p_hilbert, "x", "y", n_files=N_FILES)

    assert (
        spark.read.parquet(p_hilbert).agg(F.sum("payload")).collect()
        == df.agg(F.sum("payload")).collect()
    )

    boxes = [(100, 200, 100, 200), (0, 1000, 100, 200), (700, 800, 0, 1000)]
    m_hits = h_hits = 0
    for box in boxes:
        mh, mt = _groups_intersecting(p_morton, *box)
        hh, ht = _groups_intersecting(p_hilbert, *box)
        assert ht == mt
        assert hh < ht, (box, hh, ht)  # always prunes something
        m_hits += mh
        h_hits += hh
    # aggregate over the box suite: hilbert ≤ morton × small slack
    # (row-group boundaries add noise on any single box)
    assert h_hits <= m_hits * 1.25, (h_hits, m_hits)


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
