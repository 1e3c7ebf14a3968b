"""The libm-free fixed-point log2 kernel (functions/intlog.py): the
three implementations — exact Python ints, unrolled Spark column
expressions, DuckDB WITH RECURSIVE — must agree bit-for-bit on every
input (that cross-implementation identity is the whole point: it is
what removes the libm ln() truncation-boundary risk from the LM/DSIR/
BM25 comparison paths, VERDICT r8 next-round #1), and the Spark plan
must stay linear in FBITS (no exponential projection inlining)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mrbf_spark.functions.intlog import (
    FBITS,
    L2_SCALE,
    LN2,
    l2q_int,
    l2q_sql_ctes,
    with_l2q,
)

EDGES = [
    1, 2, 3, 4, 5, 7, 8, 9,
    (1 << 30) - 1, 1 << 30, (1 << 30) + 1,
    (1 << 31) - 1, 1 << 31, (1 << 31) + 1,
    (1 << 62) - 1, 1 << 62, (1 << 62) + 1, (1 << 63) - 1,
]


def _duck_l2q(vals: list[int]) -> dict[int, int]:
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE raw AS SELECT * FROM (SELECT unnest(?) AS v)", [vals]
    )
    sql = f"""
    WITH RECURSIVE
    {l2q_sql_ctes("SELECT DISTINCT v FROM raw")}
    SELECT v, l2q FROM l2
    """
    return dict(con.execute(sql).fetchall())


def test_l2q_python_vs_duckdb_edges_and_random():
    import random

    rng = random.Random(20260816)
    vals = EDGES + [rng.randrange(1, (1 << 63) - 1) for _ in range(4000)]
    got = _duck_l2q(vals)
    for v in vals:
        assert got[v] == l2q_int(v), f"duckdb != python at {v}"


def test_l2q_spark_vs_python_edges_and_random(spark):
    import random

    rng = random.Random(7)
    vals = EDGES + [rng.randrange(1, (1 << 63) - 1) for _ in range(2000)]
    df = spark.createDataFrame([(v,) for v in set(vals)], "v bigint")
    rows = {r["v"]: r["l2q"] for r in with_l2q(df, "v", "l2q").collect()}
    for v in vals:
        assert rows[v] == l2q_int(v), f"spark != python at {v}"


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=(1 << 63) - 1))
def test_l2q_accuracy_property(n):
    """L2Q(n)/2^24 approximates log2(n) to < 2e-7 absolute and is
    monotone at the probe points that matter (exactness at powers of
    two is checked separately)."""
    import math

    approx = l2q_int(n) / L2_SCALE
    assert abs(approx - math.log2(n)) < 2e-7


def test_l2q_exact_at_powers_of_two():
    for b in range(63):
        assert l2q_int(1 << b) == b << FBITS


def test_l2q_monotone_nondecreasing():
    prev = -1
    for n in range(1, 5000):
        cur = l2q_int(n)
        assert cur >= prev
        prev = cur


def test_ln2_literal_is_nearest_double():
    import math

    assert LN2 == math.log(2.0)  # CPython's log(2) is correctly rounded


def test_spark_plan_stays_linear(spark):
    """CollapseProject must NOT inline the squaring chain (x used
    twice per step would double the expression tree per iteration —
    2^24 blowup). Pin: the optimized plan stays small."""
    df = spark.range(10).selectExpr("id + 1 AS v")
    plan = (
        with_l2q(df, "v", "l2q")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert len(plan) < 200_000, f"plan exploded: {len(plan)} chars"


def test_no_libm_on_comparison_paths():
    """The r8 watch item, closed structurally: no ln()/F.log/LN( may
    appear in the LM / DSIR / BM25 engine code or oracle SQL."""
    import re

    from mrbf_spark.functions import dsir, lm, retrieval
    from mrbf_spark.registry import ORACLES

    for sql_name in ("lm_suite", "bm25_topk"):
        sql = ORACLES[sql_name]
        assert not re.search(r"\bln\s*\(", sql, re.IGNORECASE), sql_name
        assert not re.search(r"\blog\s*\(", sql, re.IGNORECASE), sql_name
    import inspect

    for mod in (lm, dsir, retrieval):
        src = inspect.getsource(mod)
        assert "F.log(" not in src and "F.ln(" not in src, mod.__name__
