"""Derived TPC-H attributes the slimmed TESTDATA schema omits —
partsupp, l_commitdate/l_receiptdate/l_shipmode/l_shipinstruct,
p_container, c_phone, s_comment — as DETERMINISTIC integer formulas
over the columns that DO exist (r9, VERDICT r8 next-round #6).

Why derivation instead of files: the driver's parquet dirs are
read-only and fixed at the 10 observed tables, and its DuckDB oracle
pre-registers exactly those views — so the only way the nine adapted
TPC-H shapes can become EXACT TPC-H query forms with a green oracle
is for the missing attributes to be pure functions of existing
columns, computed identically by Spark expressions and by the oracle
SQL (the same reasoning as the intlog kernel: a shared deterministic
definition, not shared data). Every formula is integer arithmetic on
keys (+ one int/100.0 division for ps_supplycost — a correctly-
rounded IEEE op, identical on both engines).

The partsupp shape follows dbgen's: each part gets PS_PER_PART=4
suppliers at suppkey = ((p + i·(S/4 + (p−1)/S)) mod S) + 1 — spread
across the supplier range with a part-dependent stride, giving the
same FK density TPC-H has (4·|part| rows, every supplier referenced).
tools/gen_testdata.py materializes the identical relation as
partsupp.parquet for local datasets (pinned equal to this derivation
in tests/test_tpch_ext.py); the registered queries always DERIVE so
they run unchanged on the driver's dirs.

100 TB shape: partsupp is a projection+explode of `part` (no shuffle,
4× rows); the ext columns are per-row expressions fused into the
scans that already read the base tables. Nothing here adds a join or
a driver collect beyond the |supplier| COUNT scalar (one number, the
lm-vocab pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..tables import load_table

PS_PER_PART = 4

# TPC-H value domains for the derived categorical columns
MODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]
INSTRUCT = ["DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN"]
CONT1 = ["SM", "LG", "MED", "JUMBO", "WRAP"]
CONT2 = ["CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM"]


def _array_pick(options: list[str], idx_expr: str) -> F.Column:
    """options[(idx_expr) + 1] as a Spark column (idx_expr 0-based)."""
    return F.element_at(
        F.array(*[F.lit(o) for o in options]),
        (F.expr(idx_expr) + F.lit(1)).cast("int"),
    )


def _sql_pick(options: list[str], idx_expr: str) -> str:
    lits = ", ".join("'" + o + "'" for o in options)
    return f"([{lits}])[CAST(({idx_expr}) + 1 AS INT)]"


def partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost) — the
    derived part↔supplier relation, 4 rows per part."""
    s_count = load_table(spark, sf_dir, "supplier").count()
    base = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_partkey").alias("ps_partkey"))
        .select(
            "ps_partkey",
            F.explode(
                F.array(*[F.lit(i).cast("long") for i in range(PS_PER_PART)])
            ).alias("i"),
        )
        .select(
            "ps_partkey",
            F.expr(
                f"((ps_partkey + i * ({s_count // PS_PER_PART}"
                f" + (ps_partkey - 1) DIV {s_count})) % {s_count}) + 1"
            ).alias("ps_suppkey"),
        )
        .select(
            "ps_partkey",
            "ps_suppkey",
            F.expr("(ps_partkey * 7 + ps_suppkey * 13) % 9999 + 1").alias(
                "ps_availqty"
            ),
        )
        .distinct()
    )
    return base.select(
        "ps_partkey",
        "ps_suppkey",
        "ps_availqty",
        F.expr(
            "CAST((ps_partkey * 31 + ps_suppkey * 17) % 100000 AS DOUBLE)"
            " / 100.0 + 1.0"
        ).alias("ps_supplycost"),
    )


# The DuckDB twin CTE (named `partsupp`): S comes from the same
# COUNT(*) the Spark side collects — identical integers either way.
PARTSUPP_SQL = f"""
    partsupp AS (
      SELECT DISTINCT ps_partkey, ps_suppkey,
             (ps_partkey * 7 + ps_suppkey * 13) % 9999 + 1 AS ps_availqty,
             CAST((ps_partkey * 31 + ps_suppkey * 17) % 100000 AS DOUBLE)
               / 100.0 + 1.0 AS ps_supplycost
      FROM (
        SELECT p_partkey AS ps_partkey,
               ((p_partkey + t.i * ((SELECT COUNT(*) FROM supplier) // {PS_PER_PART}
                  + (p_partkey - 1) // (SELECT COUNT(*) FROM supplier)))
                 % (SELECT COUNT(*) FROM supplier)) + 1 AS ps_suppkey
        FROM part CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS i) t))"""


def lineitem_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem + derived l_commitdate, l_receiptdate, l_shipmode,
    l_shipinstruct. Commit lands in shipdate ± 30 days (so
    commit<receipt, ship<commit and receipt>commit all cut real
    subsets); receipt is ship + 1..30 days."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn(
            "l_commitdate",
            F.expr(
                "timestampadd(DAY, CAST((l_orderkey * 31 + l_linenumber * 7)"
                " % 61 - 30 AS INT), l_shipdate)"
            ),
        )
        .withColumn(
            "l_receiptdate",
            F.expr(
                "timestampadd(DAY, CAST((l_orderkey * 17 + l_linenumber * 11)"
                " % 30 + 1 AS INT), l_shipdate)"
            ),
        )
        .withColumn(
            "l_shipmode",
            _array_pick(MODES, "(l_orderkey * 7 + l_linenumber) % 7"),
        )
        .withColumn(
            "l_shipinstruct",
            _array_pick(INSTRUCT, "(l_orderkey * 5 + l_linenumber * 3) % 4"),
        )
    )


LINEITEM_EXT_SQL = f"""
    lineitem_ext AS (
      SELECT *,
             l_shipdate + INTERVAL ((l_orderkey * 31 + l_linenumber * 7)
               % 61 - 30) DAY AS l_commitdate,
             l_shipdate + INTERVAL ((l_orderkey * 17 + l_linenumber * 11)
               % 30 + 1) DAY AS l_receiptdate,
             {_sql_pick(MODES, "(l_orderkey * 7 + l_linenumber) % 7")}
               AS l_shipmode,
             {_sql_pick(INSTRUCT, "(l_orderkey * 5 + l_linenumber * 3) % 4")}
               AS l_shipinstruct
      FROM lineitem)"""


def part_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part + derived p_container (the TPC-H SM/LG/MED/JUMBO/WRAP ×
    CASE/BOX/… grid, keyed on p_partkey)."""
    return load_table(spark, sf_dir, "part").withColumn(
        "p_container",
        F.concat(
            _array_pick(CONT1, "(p_partkey * 3) % 5"),
            F.lit(" "),
            _array_pick(CONT2, "(p_partkey * 11) % 8"),
        ),
    )


PART_EXT_SQL = f"""
    part_ext AS (
      SELECT *,
             {_sql_pick(CONT1, "(p_partkey * 3) % 5")} || ' ' ||
             {_sql_pick(CONT2, "(p_partkey * 11) % 8")} AS p_container
      FROM part)"""


def customer_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer + derived c_phone ('CC-NNN' with the TPC-H country
    code CC = 10 + c_nationkey — always two digits, so
    substring(c_phone, 1, 2) is the Q22 cntrycode)."""
    return load_table(spark, sf_dir, "customer").withColumn(
        "c_phone",
        F.concat(
            (F.lit(10) + F.col("c_nationkey")).cast("string"),
            F.lit("-"),
            F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
        ),
    )


CUSTOMER_EXT_SQL = """
    customer_ext AS (
      SELECT *,
             CAST(10 + c_nationkey AS VARCHAR) || '-' ||
             LPAD(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') AS c_phone
      FROM customer)"""


def supplier_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier + derived s_comment (every 10th supplier carries the
    Q16 'Customer Complaints' marker)."""
    return load_table(spark, sf_dir, "supplier").withColumn(
        "s_comment",
        F.when(
            F.col("s_suppkey") % 10 == 3,
            F.lit("slow Customer service with Complaints pending"),
        ).otherwise(F.lit("dependable deliveries on schedule")),
    )


SUPPLIER_EXT_SQL = """
    supplier_ext AS (
      SELECT *,
             CASE WHEN s_suppkey % 10 = 3
                  THEN 'slow Customer service with Complaints pending'
                  ELSE 'dependable deliveries on schedule' END AS s_comment
      FROM supplier)"""
