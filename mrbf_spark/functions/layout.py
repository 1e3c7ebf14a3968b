"""Data-layout optimization: Z-order / Hilbert clustering and
size-targeted compaction.

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

Two curves:

- Morton (any k ≥ 2 columns): static interleave fold —
  k·bits ≤ 63 bits of key, pure shiftleft/OR codegen.
- Hilbert (2 columns): strictly better locality than Morton (every
  curve step is a unit step, so a row group's key interval maps to a
  tighter hull). Computed from the Morton key by a 4-state base-4
  state machine folded with `F.aggregate` over the digit sequence —
  a runtime fold, so the expression tree stays LINEAR in `bits`
  (a naive unroll of the classic xy2d rotation loop doubles the tree
  per level). The state tables are derived at import time from the
  textbook rotation rules and pinned against an independent xy2d
  implementation in tests (exhaustively at small bit widths).

Plan shape (both curves): one pass to compute per-column min/max (an
agg of 2k scalars), one range-repartition + in-partition sort by the
curve key (the same 3-phase global-sort shape as global_shuffle_shard
— no single-task stage), one write. The key is pure JVM arithmetic
(bit folds / higher-order aggregate — no UDF).

Verification (tests/test_layout.py): pyarrow reads back the written
files' row-group statistics and PROVES the pruning claim — for a box
predicate, the fraction of row groups whose min/max intersect the box
is measured for unsorted, single-column-sorted, z-ordered, and
hilbert layouts; the curve layouts must beat both baselines on the
off-sort-column dimension.

No reference counterpart (the reference writes unordered HDFS text);
this is the layout layer a 100 TB deployment of it would need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ZORDER_BITS = 16  # per-column resolution at k=2: 2 × 16 bits = 32-bit key


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


def _morton_interleave_k(cols: list[Column], bits: int) -> Column:
    """Bit-interleave k `bits`-wide integers: column j's bit i lands
    at position i·k + (k−1−j), so column 0 owns the most significant
    bit of each k-bit group. A static fold of shiftleft/bitwise-OR —
    the whole expression stays in codegen (k·bits OR terms)."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols × {bits} bits exceeds a 63-bit key")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        for i in range(bits):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * k + (k - 1 - j)))
    return key


def _morton_interleave(a: Column, b: Column, bits: int) -> Column:
    """2-column special case: a's bit i lands at 2i+1, b's at 2i."""
    return _morton_interleave_k([a, b], bits)


def _default_bits(k: int) -> int:
    return min(ZORDER_BITS, 63 // k)


def _scaled_cols(df: DataFrame, cols: tuple[str, ...], bits: int) -> list[Column]:
    """Min-max scale every column in ONE 2k-scalar aggregate
    (driver-bounded); the scalars enter the plan as literals so the
    key projection is map-only."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    row = df.agg(*aggs).collect()[0]
    return [
        _scale_to_bits(
            F.col(c), F.lit(row[f"min_{c}"]), F.lit(row[f"max_{c}"]), bits
        )
        for c in cols
    ]


def zorder_key(df: DataFrame, *cols: str, bits: int | None = None) -> DataFrame:
    """Append `__zkey`: the Morton interleave of k ≥ 2 columns'
    min-max-scaled values. Default resolution is 16 bits/column,
    narrowed automatically so the key fits 63 bits at higher k."""
    if len(cols) < 2:
        raise ValueError("zorder_key needs at least two columns")
    bits = _default_bits(len(cols)) if bits is None else bits
    return df.withColumn(
        "__zkey", _morton_interleave_k(_scaled_cols(df, cols, bits), bits)
    )


def write_zordered(
    df: DataFrame, path: str, *cols: str, n_files: int = 8,
    bits: int | None = None,
) -> None:
    """Write `df` as parquet clustered by the k-d Z-order of `cols`:
    range-repartition on the Morton key (distributed sampling picks
    the bounds — no global sort bottleneck), sort within partitions,
    drop the key, write. Each output file then covers a compact
    hyper-rectangle of the column space — that's the whole point."""
    keyed = zorder_key(df, *cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


# ------------------------------------------------------ Hilbert curve

def _derive_hilbert_tables() -> tuple[list[int], list[int]]:
    """Derive the 2-d Hilbert base-4 state machine from the textbook
    xy2d rotation rules (Wikipedia "Hilbert curve", the s-loop with
    rx/ry reflect-and-swap).

    A state is the net axis transform the rotations have accumulated,
    acting bitwise on all remaining levels: t = (swap, ix, iy) maps
    raw bits (x, y) → ((y if swap else x) ⊕ ix, (x if swap else y)
    ⊕ iy). Per level: apply t to the raw bit pair, emit the curve
    digit (3·rx) ⊕ ry, then fold the level's reflect/swap into t.
    Exactly 4 states are reachable from the identity; returns flat
    OUT/NXT tables indexed by state·4 + q, q = 2·x_bit + y_bit."""

    def apply(t, xb, yb):
        s, ix, iy = t
        return ((yb if s else xb) ^ ix, (xb if s else yb) ^ iy)

    def compose(u, t):  # u applied after t, both bitwise transforms
        s1, i1x, i1y = t
        s2, i2x, i2y = u
        return (
            s1 ^ s2,
            (i1y if s2 else i1x) ^ i2x,
            (i1x if s2 else i1y) ^ i2y,
        )

    ident = (False, 0, 0)
    order = [ident]
    index = {ident: 0}
    out: list[int] = []
    nxt: list[int] = []
    i = 0
    while i < len(order):
        t = order[i]
        for q in range(4):
            rx, ry = apply(t, q >> 1, q & 1)
            out.append((3 * rx) ^ ry)
            if ry == 0:
                flip = (False, 1, 1) if rx == 1 else ident
                step = compose((True, 0, 0), flip)  # reflect, then swap
            else:
                step = ident
            t2 = compose(step, t)
            if t2 not in index:
                index[t2] = len(order)
                order.append(t2)
            nxt.append(index[t2])
        i += 1
    assert len(order) == 4, order  # the 2-d curve uses exactly 4 states
    return out, nxt


_HILBERT_OUT, _HILBERT_NXT = _derive_hilbert_tables()


def hilbert_from_morton(mkey: Column, bits: int) -> Column:
    """Map a 2-d Morton key (x bit at 2i+1, y at 2i — zorder_key's
    layout) to the Hilbert index by running the 4-state machine over
    its base-4 digits, MSB first. `F.aggregate` over the level
    sequence keeps this a RUNTIME fold — one pass, linear expression
    size — where unrolling the xy2d rotation loop into when-chains
    would double the expression tree per level."""
    out_arr = F.array(*[F.lit(v) for v in _HILBERT_OUT])
    nxt_arr = F.array(*[F.lit(v) for v in _HILBERT_NXT])
    levels = F.sequence(F.lit(bits - 1), F.lit(0), F.lit(-1))

    def step(acc, i):
        # the PySpark shiftright wrapper requires a literal int shift;
        # the SQL function itself takes expressions — call it directly
        q = (
            F.call_function("shiftright", mkey, (i * 2).cast("int"))
            .bitwiseAND(F.lit(3))
            .cast("int")
        )
        idx = (acc["st"] * 4 + q + 1).cast("int")
        return F.struct(
            F.element_at(nxt_arr, idx).alias("st"),
            F.shiftleft(acc["d"], 2)
            .bitwiseOR(F.element_at(out_arr, idx).cast("long"))
            .alias("d"),
        )

    zero = F.struct(
        F.lit(0).cast("int").alias("st"), F.lit(0).cast("long").alias("d")
    )
    return F.aggregate(levels, zero, step, lambda acc: acc["d"])


def hilbert_key(
    df: DataFrame, c1: str, c2: str, bits: int = ZORDER_BITS
) -> DataFrame:
    """Append `__hkey`: the Hilbert index of the two columns'
    min-max-scaled values. Same min/max pass and map-only projection
    as zorder_key; the curve just orders the cells better."""
    a, b = _scaled_cols(df, (c1, c2), bits)
    return df.withColumn(
        "__hkey", hilbert_from_morton(_morton_interleave_k([a, b], bits), bits)
    )


def write_hilbert(
    df: DataFrame, path: str, c1: str, c2: str, n_files: int = 8,
    bits: int = ZORDER_BITS,
) -> None:
    """Write `df` as parquet clustered by the 2-d Hilbert order of
    (c1, c2) — same 3-phase shape as write_zordered."""
    keyed = hilbert_key(df, c1, c2, bits)
    (
        keyed.repartitionByRange(n_files, "__hkey")
        .sortWithinPartitions("__hkey")
        .drop("__hkey")
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
