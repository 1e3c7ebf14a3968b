"""Builder-level DuckDB parity for the r4 extensions that live outside
the driver's 50-entry catalog window (sequence packing, PII
redaction): same check the driver's oracle gate would run — row count,
column names, and exact values, order-insensitive."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyspark.sql.functions as F

from mrbf_spark.registry import BUILDER_SQL, ORACLES

from conftest import SF_ORACLE


def _oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con.sql(sql).df()


def _assert_parity(spark_df, oracle_pdf):
    got = spark_df.toPandas()
    assert sorted(got.columns) == sorted(oracle_pdf.columns)
    assert len(got) == len(oracle_pdf)
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = oracle_pdf[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        assert (av == bv).all(), f"col {c}: first mismatch at {list(av != bv).index(True)}"


def test_sequence_packing_matches_duckdb(spark):
    from mrbf_spark.functions.packing import sequence_packing

    _assert_parity(
        sequence_packing(spark, SF_ORACLE),
        _oracle(BUILDER_SQL["sequence_packing"], SF_ORACLE),
    )


def test_sequence_packing_distributed_prefix_sum_is_partition_invariant(spark):
    """The 3-phase prefix sum must produce the same layout no matter
    how the input arrives partitioned (1 vs many)."""
    from mrbf_spark.functions.packing import packed_layout
    from mrbf_spark.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    one = {
        r["doc_id"]: (r["start_tok"], r["bin_id"], r["bin_offset"])
        for r in packed_layout(docs.coalesce(1)).collect()
    }
    many = {
        r["doc_id"]: (r["start_tok"], r["bin_id"], r["bin_offset"])
        for r in packed_layout(docs.repartition(37)).collect()
    }
    assert one == many


def test_sequence_packing_no_global_single_task_window(spark):
    """The plan must NOT contain an un-partitioned ordered Window —
    the single-task scale-killer this operator exists to avoid. Spark
    marks that shape with a SinglePartition exchange below the Window."""
    from mrbf_spark.functions.packing import sequence_packing

    plan = (
        sequence_packing(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, "global window snuck in"


def test_pii_redaction_matches_duckdb(spark):
    # builder since r6 (columns ride the quality_signals entry) — the
    # oracle SQL lives in BUILDER_SQL for composition
    from mrbf_spark.functions.text import pii_redaction
    from mrbf_spark.registry import BUILDER_SQL

    _assert_parity(
        pii_redaction(spark, SF_ORACLE),
        _oracle(BUILDER_SQL["pii_redaction"], SF_ORACLE),
    )


def test_pii_redaction_semantics(spark):
    from mrbf_spark.functions.text import redact_pii_cols

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@example.co or ping 10.0.255.7 now"),
            (2, "call +1 (415) 555-0199 today"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    red, counts = redact_pii_cols(F.col("text"))
    rows = {r["doc_id"]: r for r in df.select("doc_id", *counts, red.alias("t")).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["n_ipv4"] == 1
    assert rows[1]["t"] == "mail me at <EMAIL> or ping <IPV4> now"
    assert rows[2]["n_phone"] == 1 and "<PHONE>" in rows[2]["t"]
    assert rows[3]["t"] == "nothing sensitive here"
    assert rows[3]["n_email"] == rows[3]["n_ipv4"] == rows[3]["n_phone"] == 0
