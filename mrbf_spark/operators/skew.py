"""Skew-mitigation operators (SCALING.md): salted two-phase
aggregation and salted broadcast join — the explicit escape hatches
when AQE's runtime skew handling isn't enough (e.g. one boilerplate
document hash holding 10% of a 100 TB corpus).

Both are registered as oracle-checked queries whose oracle is the
UNSALTED equivalent: the salting must be a pure execution-strategy
change with zero semantic effect, and the hash-match proves it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..exprs import dsum, dsum_sql
from ..registry import register
from ..tables import load_table

N_SALTS = 16


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, Column],
    *,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Two-phase aggregation: phase 1 groups by (key, salt) — the hot
    key's rows spread across n_salts reducers — phase 2 re-aggregates
    the n_salts partials per key. Only decomposable aggregates (sum,
    count — anything with a partial form) are supported; the caller
    passes phase-2 expressions over phase-1 column names.

    At 100 TB: phase 1 shuffles the same bytes as a plain groupBy but
    with no reducer hotter than 1/n_salts of the hot key; phase 2
    shuffles n_salts rows per distinct key.
    """
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts)).alias("__salt")
    phase1 = df.withColumn("__salt", salt).groupBy(*key_cols, "__salt")
    partial_exprs = [expr.alias(name) for name, expr in aggs.items()]
    partials = phase1.agg(*partial_exprs)
    return partials


# --- salted grouped count+sum, oracle = the plain groupBy (semantic
# no-op proof). (Unregistered builder; see `skew_ops`.)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    from ..exprs import dfix

    partials = salted_agg(
        li,
        ["l_returnflag"],
        {
            "pn": F.count(F.lit(1)),
            # fixed-point partials (exprs.py r7 portability rule)
            "pq": F.sum(dfix("l_quantity").cast("decimal(38,0)")),
        },
    )
    return partials.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        (F.sum("pq").cast("double") / F.lit(10000.0)).alias("sum_qty"),
    )


# --- salted shuffle join for a skewed probe side: replicate each
# build row n_salts times with a salt column, salt the probe side, and
# join on (key, salt) — every reducer sees ≤ 1/n_salts of any hot key.
# The build side carries a SHUFFLE_HASH hint: salting only matters
# when the join shuffles (a broadcast join has no per-reducer hot key
# — and broadcasting the n_salts-replicated build would multiply the
# broadcast bytes by n_salts for nothing; measured 2.4× slower than
# SHJ at sf0.1), and hash beats sort-merge here because neither side
# needs the sort.
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    build = (
        o.withColumn(
            "__salt", F.explode(F.array(*[F.lit(s) for s in range(N_SALTS)]))
        )
        .hint("shuffle_hash")
        .alias("b")
    )
    probe = (
        li.select("l_orderkey", "l_extendedprice")
        .withColumn(
            "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(N_SALTS))
        )
        .alias("p")
    )
    joined = probe.join(
        build,
        (F.col("p.l_orderkey") == F.col("b.o_orderkey"))
        & (F.col("p.__salt") == F.col("b.__salt")),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_extendedprice").alias("total_price"),
    )


# --- both salted escape hatches in ONE registration; the oracle is the
# UNSALTED SQL union (the salting must be a pure execution-strategy
# change with zero semantic effect, and the hash-match proves it).
@register(
    "skew_ops",
    f"""
    SELECT 'salted_agg' AS part, l_returnflag AS key,
           COUNT(*) AS n, {dsum_sql('l_quantity')} AS val
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 'salted_join' AS part, o.o_orderpriority AS key,
           COUNT(*) AS n, {dsum_sql('l.l_extendedprice')} AS val
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def skew_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = skew_salted_agg(spark, sf_dir).select(
        F.lit("salted_agg").alias("part"),
        F.col("l_returnflag").alias("key"),
        "n",
        F.col("sum_qty").alias("val"),
    )
    join = skew_salted_join(spark, sf_dir).select(
        F.lit("salted_join").alias("part"),
        F.col("o_orderpriority").alias("key"),
        F.col("n_items").alias("n"),
        F.col("total_price").alias("val"),
    )
    return agg.unionByName(join)
