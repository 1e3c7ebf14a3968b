"""Integer-exact fixed-point log2 — the libm-free logarithm kernel
shared by the LM scorer (lm.py), DSIR (dsir.py) and BM25 (retrieval.py).

Why: those operators fixed-point their per-term logs —
trunc(1e9·ln p) — so per-doc sums are exact integers. That made the
SUM order-independent, but the TERM itself still came from each
engine's libm ln(), and the rich-vocab sf1 re-measure (r8, SCALING.md)
collapsed the truncation-boundary margin to 3 ulps: one corpus away
from Spark's ln and DuckDB's ln disagreeing by 1 ulp exactly on a
boundary and flipping a BIGINT term. This module removes libm from the
comparison path entirely (VERDICT r8 next-round #1, the
quality_classifier.py all-integer pattern applied to the log itself).

The pinned algorithm L2Q(n) for integer n ≥ 1 (FBITS=24, W=30):

  1. b = bit_length(n) − 1                      (integer part of log2)
  2. x = n << (W−b) if b ≤ W else n >> (b−W)    (mantissa in [2^W, 2^(W+1)))
  3. 24×: x = (x·x) >> W;                       (digit-by-digit log2:
           if x ≥ 2^(W+1): x >>= 1, emit 1       squaring doubles the
           else emit 0                           exponent, so the
                                                 overflow bit IS the
                                                 next fraction bit)
  4. L2Q(n) = (b << FBITS) | fraction_bits

Every step is int64-exact (x < 2^31 so x² < 2^62; results < 2^30 for
n < 2^63): multiply, shift, compare — no rounding ambiguity exists, so
ANY faithful implementation produces the identical integer. The three
implementations here (Python ints, unrolled Spark column expressions,
a DuckDB WITH RECURSIVE block) are therefore bit-identical by
construction, not by matched libm behavior — property-tested against
each other in tests/test_intlog.py.

L2Q(n)/2^24 approximates log2(n) to < 2^-24·c (c ≈ 1.5 from the
truncation drift — measured max 6e-8 over 5k random 62-bit values);
callers convert to nats via the pinned LN2 double literal using only
IEEE-exact ops (double ×, ÷ are correctly rounded by the standard, so
they are deterministic across engines — only transcendentals are not).

100 TB shape: L2Q is ~100 integer ops per ROW with no shuffle, join,
or driver traffic — it rides whatever relation already holds the
counts (the bigram model table, the 256-row DSIR bucket table, the
|query|-row BM25 df table) inside one whole-stage-codegen projection
chain (Spark ≥3.3's CollapseProject keeps the per-iteration
projections separate instead of inlining x into x·x exponentially —
plan-size pinned in tests/test_intlog.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FBITS = 24  # fraction bits of the fixed-point log2
W = 30  # working mantissa bits (x < 2^31 keeps x*x inside int64)
L2_SCALE = 1 << FBITS
_LIM = 1 << (W + 1)
# the IEEE double nearest ln(2) — both engines parse the literal to the
# same bits; used only in final nats conversions via exact IEEE ops
LN2 = 0.6931471805599453


def l2q_int(n: int) -> int:
    """Exact Python twin of the pinned algorithm (drives plan-time
    constants — e.g. L2Q(vocab), L2Q(2N+2) — and the property tests)."""
    if n < 1:
        raise ValueError(f"l2q_int requires n >= 1, got {n}")
    b = n.bit_length() - 1
    x = (n << (W - b)) if b <= W else (n >> (b - W))
    f = 0
    for _ in range(FBITS):
        x = (x * x) >> W
        if x >= _LIM:
            x >>= 1
            f = (f << 1) | 1
        else:
            f <<= 1
    return (b << FBITS) + f


def with_l2q(df: DataFrame, src: str, out: str) -> DataFrame:
    """df + column `out` = L2Q(src) (src must be a positive integral
    column; callers guarantee ≥ 1 — counts+1 always are). Pure unrolled
    column expressions: no UDF, no shuffle, no driver traffic.

    DRIVER-TIME SHAPE (r9): the original form chained ~75 withColumn
    calls, and EVERY DataFrame method eagerly re-analyzes the whole
    accumulated plan — on a deep input tree (the LM model sits on a
    tokenize→explode→2×groupBy lineage) that made *constructing* the
    DataFrame cost ~15-18 s of driver time before a single row moved
    (measured, lm_score/dsir_select at sf0.1). Now the chain rides six
    chunked selectExpr calls whose in-chunk steps reference each other
    through LATERAL column aliases (~6 analyses instead of ~75; a
    single 80-level chain is out — the analyzer resolves one lateral
    nesting level per Resolution iteration and trips its 100-iteration
    cap, unraisable on the driver's VANILLA session). Callers keep the
    other factor small by feeding SHALLOW inputs: truncate lineage
    (localCheckpoint) at the multi-consumer frame the L2Q table
    derives from. The analyzer still materializes each step as its
    own nested Project, so CollapseProject cannot inline x into x·x
    exponentially — the same linear-plan guarantee the withColumn
    chain had (pinned in tests/test_intlog.py); the physical plan is
    the identical projection pipeline, same codegen."""
    # Guard the selectExpr contract (ADVICE r9): `src` is interpolated
    # raw into SQL and `out` is appended to df.columns, so both must be
    # fresh plain identifiers — a non-identifier src would fail to
    # parse, and a pre-existing `out` would silently duplicate instead
    # of replacing (the old withColumn semantics).
    ident = __import__("re").compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
    if not ident.match(src) or not ident.match(out):
        raise ValueError(
            f"with_l2q needs plain identifiers, got src={src!r} out={out!r}"
        )
    if out in df.columns:
        raise ValueError(f"with_l2q: output column {out!r} already exists")
    p = f"__l2q_{out}"
    steps = [f"cast({src} as bigint) AS {p}v"]
    # bit_length via smear + bit_count: 6 OR-shift steps saturate every
    # bit below the MSB, then popcount == bit_length
    steps.append(f"{p}v | shiftright({p}v, 1) AS {p}s1")
    prev = f"{p}s1"
    for i, sh in enumerate((2, 4, 8, 16, 32), start=2):
        steps.append(f"{prev} | shiftright({prev}, {sh}) AS {p}s{i}")
        prev = f"{p}s{i}"
    steps.append(f"cast(bit_count({prev}) - 1 as bigint) AS {p}b")
    steps.append(
        f"CASE WHEN {p}b <= {W}"
        f" THEN shiftleft({p}v, cast({W} - {p}b as int))"
        f" ELSE shiftright({p}v, cast({p}b - {W} as int)) END AS {p}x0"
    )
    fprev = None
    for i in range(1, FBITS + 1):
        steps.append(f"shiftright({p}x{i - 1} * {p}x{i - 1}, {W}) AS {p}y{i}")
        steps.append(
            f"CASE WHEN {p}y{i} >= {_LIM} THEN shiftright({p}y{i}, 1)"
            f" ELSE {p}y{i} END AS {p}x{i}"
        )
        base = f"{fprev} * 2 + " if fprev else ""
        steps.append(
            f"{base}CASE WHEN {p}y{i} >= {_LIM} THEN 1 ELSE 0 END AS {p}f{i}"
        )
        fprev = f"{p}f{i}"
    steps.append(f"shiftleft({p}b, {FBITS}) + cast({fprev} as bigint) AS {out}")
    d = df
    chunk = 16
    for i in range(0, len(steps), chunk):
        d = d.selectExpr("*", *steps[i : i + chunk])
    return d.select(*df.columns, out)


def l2q_sql_ctes(vals_select: str, prefix: str = "l2") -> str:
    """DuckDB twin as a comma-joined CTE block (splice into a
    WITH RECURSIVE list). `vals_select` must select one integral column
    aliased `v` (≥ 1, ideally DISTINCT — the recursion materializes
    FBITS+1 generations of it). Exposes `{prefix}(v, l2q)`; join the
    consumer's count expressions to v."""
    return f"""
    {prefix}_vals AS ({vals_select}),
    {prefix}_norm AS (
      SELECT v, CAST(bit_count(s5) - 1 AS BIGINT) AS b,
             CASE WHEN bit_count(s5) - 1 <= {W}
                  THEN v << ({W} - (bit_count(s5) - 1))
                  ELSE v >> ((bit_count(s5) - 1) - {W}) END AS x
      FROM (SELECT v, s4 | (s4 >> 32) AS s5 FROM (
            SELECT v, s3 | (s3 >> 16) AS s4 FROM (
            SELECT v, s2 | (s2 >> 8) AS s3 FROM (
            SELECT v, s1 | (s1 >> 4) AS s2 FROM (
            SELECT v, s0 | (s0 >> 2) AS s1 FROM (
            SELECT CAST(v AS BIGINT) AS v, CAST(v AS BIGINT)
                   | (CAST(v AS BIGINT) >> 1) AS s0
            FROM {prefix}_vals))))))),
    {prefix}_it AS (
      SELECT v, b, x, CAST(0 AS BIGINT) AS f, 0 AS i FROM {prefix}_norm
      UNION ALL
      SELECT v, b, CASE WHEN y >= {_LIM} THEN y >> 1 ELSE y END,
             f * 2 + CASE WHEN y >= {_LIM} THEN 1 ELSE 0 END, i + 1
      FROM (SELECT v, b, (x * x) >> {W} AS y, f, i
            FROM {prefix}_it WHERE i < {FBITS})),
    {prefix} AS (SELECT v, (b << {FBITS}) + f AS l2q
                 FROM {prefix}_it WHERE i = {FBITS})"""
