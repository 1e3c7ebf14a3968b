"""DSIR importance-resampling selection (functions/dsir.py): DuckDB
builder parity (the driver's oracle-gate check), the comparative
semantics the operator exists for, and fixed-point determinism."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from mrbf_spark.functions.dsir import (
    DSIR_KEEP_DEN,
    DSIR_KEEP_NUM,
    dsir_select,
    dsir_selection,
)
from mrbf_spark.registry import BUILDER_SQL

from conftest import SF_ORACLE


def test_dsir_matches_duckdb(spark):
    got = dsir_selection(spark, SF_ORACLE).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_ORACLE}/documents.parquet'"
    )
    exp = con.sql(BUILDER_SQL["dsir_selection"]).df()
    assert sorted(got.columns) == sorted(exp.columns)
    assert len(got) == len(exp)
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), f"col {c} mismatch"


def test_dsir_prefers_target_like_raw_docs(spark):
    """The operator's purpose: among raw docs, one written in the
    target split's vocabulary must outrank one written in vocabulary
    the target never uses (and that dominates the raw model, making
    it maximally raw-typical)."""
    rows = [(i, "alpha beta gamma delta epsilon zeta", "t") for i in range(30)]
    rows += [(100 + i, "qq0 ww0 qq1 ww1 qq2 ww2", "r") for i in range(30)]
    rows.append((900001, "alpha beta gamma delta", "r"))  # target-like raw
    docs = spark.createDataFrame(rows, "doc_id long, text string, grp string")
    out = {
        r["doc_id"]: r
        for r in dsir_select(docs, F.col("grp") == "t").collect()
    }
    assert 900001 in out and len(out) == 31  # raw side only
    target_like = out[900001]
    assert target_like["rank"] == 1 and target_like["selected"] == 1
    assert all(
        target_like["avg_log_ratio"] > r["avg_log_ratio"]
        for d, r in out.items()
        if d != 900001
    )


def test_dsir_selected_is_top_rank_prefix(spark):
    out = dsir_selection(spark, SF_ORACLE).toPandas()
    n = len(out)
    k = (n * DSIR_KEEP_NUM + DSIR_KEEP_DEN - 1) // DSIR_KEEP_DEN
    assert int(out["selected"].sum()) == k
    assert set(out.loc[out["selected"] == 1, "rank"]) == set(range(1, k + 1))
    # rank is a permutation ordered by (weight_q desc, doc_id)
    srt = out.sort_values(["rank"]).reset_index(drop=True)
    assert list(srt["rank"]) == list(range(1, n + 1))
    w = list(zip(-srt["weight_q"], srt["doc_id"]))
    assert w == sorted(w)


def test_dsir_partition_invariant(spark):
    """Integer fixed-point weights ⇒ identical output however the
    corpus arrives partitioned."""
    from mrbf_spark.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    tgt = F.col("lang") == "en"
    one = {
        r["doc_id"]: (r["weight_q"], r["rank"], r["selected"])
        for r in dsir_select(docs.coalesce(1), tgt).collect()
    }
    many = {
        r["doc_id"]: (r["weight_q"], r["rank"], r["selected"])
        for r in dsir_select(docs.repartition(17), tgt).collect()
    }
    assert one == many
