"""Data-layout optimization: Z-order clustering and size-targeted
compaction.

At 100 TB the scan is the query cost, and the scan's cost is decided
at WRITE time: parquet keeps per-row-group min/max statistics per
column, and a reader's predicate skips any row group whose [min, max]
doesn't intersect it. A table range-sorted on ONE column prunes
perfectly on that column and not at all on any other; Z-ORDER
(Morton-order) interleaves the bits of k columns so that sorting by
the interleaved key gives EVERY participating column locality —
each row group covers a small hyper-rectangle of the key space, so a
box predicate on any subset of the columns skips most groups. This is
Delta Lake's `OPTIMIZE ... ZORDER BY` / the classic UB-tree layout,
re-done as plain DataFrame ops over plain parquet.

Plan shape: one pass to compute per-column min/max (an agg of 2k
scalars), one range-repartition + in-partition sort by the Morton key
(the same 3-phase global-sort shape as global_shuffle_shard — no
single-task stage), one write. The key is pure JVM bit arithmetic
(shiftleft/shiftright/bitwise-or folds — no UDF).

Verification (tests/test_layout.py): pyarrow reads back the written
files' row-group statistics and PROVES the pruning claim — for a 2-d
box predicate, the fraction of row groups whose min/max intersect the
box is measured for (a) unsorted, (b) single-column-sorted, (c)
z-ordered layouts; z-order must beat both on the off-sort-column
dimension and be within a factor on the sort column itself.

No reference counterpart (the reference writes unordered HDFS text);
this is the layout layer a 100 TB deployment of it would need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ZORDER_BITS = 16  # per-column resolution: 2 cols × 16 bits = 32-bit key


def _scale_to_bits(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Min-max scale a numeric column to an integer in [0, 2^bits):
    floor((v - min) * (2^bits - 1) / (max - min)), constant-column
    safe. Fixed-point via double is fine here — the key orders the
    layout, it carries no query semantics."""
    span = (cmax - cmin).cast("double")
    scaled = F.when(
        span == 0, F.lit(0)
    ).otherwise(
        F.floor(
            (col.cast("double") - cmin.cast("double"))
            * F.lit(float((1 << bits) - 1))
            / span
        )
    )
    return scaled.cast("long")


def _morton_interleave(a: Column, b: Column, bits: int) -> Column:
    """Bit-interleave two `bits`-wide integers: a's bit i lands at
    2i+1, b's at 2i. A static fold of shiftleft/bitwise-OR — whole
    expression stays in codegen."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        key = (
            key
            .bitwiseOR(F.shiftleft(abit, 2 * i + 1))
            .bitwiseOR(F.shiftleft(bbit, 2 * i))
        )
    return key


def zorder_key(df: DataFrame, c1: str, c2: str, bits: int = ZORDER_BITS) -> DataFrame:
    """Append `__zkey`: the Morton interleave of the two columns'
    min-max-scaled values. The min/max pass is one 4-scalar aggregate
    (driver-bounded); the scalars enter the plan as literals so the
    key projection is map-only."""
    row = df.agg(
        F.min(c1).alias("min1"), F.max(c1).alias("max1"),
        F.min(c2).alias("min2"), F.max(c2).alias("max2"),
    ).collect()[0]
    a = _scale_to_bits(F.col(c1), F.lit(row["min1"]), F.lit(row["max1"]), bits)
    b = _scale_to_bits(F.col(c2), F.lit(row["min2"]), F.lit(row["max2"]), bits)
    return df.withColumn("__zkey", _morton_interleave(a, b, bits))


def write_zordered(
    df: DataFrame, path: str, c1: str, c2: str, n_files: int = 8,
    bits: int = ZORDER_BITS,
) -> None:
    """Write `df` as parquet clustered by the 2-d Z-order of (c1, c2):
    range-repartition on the Morton key (distributed sampling picks
    the bounds — no global sort bottleneck), sort within partitions,
    drop the key, write. Each output file then covers a compact
    hyper-rectangle of (c1, c2) space — that's the whole point."""
    keyed = zorder_key(df, c1, c2, bits)
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_to_target(
    df: DataFrame, path: str, target_bytes: int = 128 * 1024 * 1024,
    sample_rows: int = 10_000,
) -> int:
    """Small-file compaction: estimate the DataFrame's serialized
    parquet size from a bounded row sample's average encoded width ×
    exact row count, coalesce to ceil(size/target) files, write.
    Returns the chosen file count.

    The estimator is intentionally cheap-and-bounded (one count + one
    limited sample collect) — at 100 TB you'd read the source files'
    actual sizes from the catalog instead; the coalesce(n) (a NARROW
    dependency — no shuffle) is the part under test."""
    n = df.count()
    if n == 0:
        df.coalesce(1).write.mode("overwrite").parquet(path)
        return 1
    sample = df.limit(sample_rows)
    # Arrow-encode the sample to approximate parquet width (both are
    # columnar+compressed within ~2×; good enough to pick a file count)
    pdf = sample.toPandas()
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pandas(pdf), buf)
    per_row = max(1, buf.getbuffer().nbytes // max(1, len(pdf)))
    n_files = max(1, -(-(n * per_row) // target_bytes))
    # coalesce is the no-shuffle path for MERGING (the compaction
    # case); it cannot INCREASE partition count, so splitting
    # too-large files needs a real repartition (round-robin shuffle).
    cur = df.rdd.getNumPartitions()
    shaped = df.coalesce(n_files) if n_files <= cur else df.repartition(n_files)
    shaped.write.mode("overwrite").parquet(path)
    return n_files
