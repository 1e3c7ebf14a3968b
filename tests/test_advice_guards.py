"""Named regression guards for the ADVICE r5/r6 fixes (VERDICT r5
next-round #7): each test pins one specific fix so it cannot silently
regress — the pk-only snapshot_diff digest guard, the complex-type
profiler presence-only skip, and the DSIR NULL-target-predicate
coalesce (ADVICE r6 #2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_snapshot_diff_pk_only_table(spark):
    """ADVICE r5: a pk-only table has nothing to digest (xxhash64 with
    zero args is an AnalysisException) — snapshot_diff must classify
    purely on pk presence via the constant-digest branch."""
    from mrbf_spark.functions.diffing import snapshot_diff

    old = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    new = spark.createDataFrame([(2,), (3,), (4,)], "pk long")
    got = {r["pk"]: r["status"] for r in snapshot_diff(old, new, "pk").collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "unchanged", 4: "added"}


def test_merge_upsert_pk_only_table(spark):
    """Same zero-column shape through merge_upsert: matched rows are
    unchanged (no columns can differ), one-sided rows insert/delete."""
    from mrbf_spark.functions.diffing import merge_upsert

    old = spark.createDataFrame([(1,), (2,)], "pk long")
    new = spark.createDataFrame([(2,), (3,)], "pk long")
    got = {
        r["pk"]: r["__action"]
        for r in merge_upsert(old, new, "pk", delete_missing=True).collect()
    }
    assert got == {1: "delete", 2: "unchanged", 3: "insert"}


def test_profile_table_complex_types_presence_only(spark):
    """ADVICE r5: array/map/struct/binary columns must profile
    presence only (n, nulls) with NULL distinct/min/max/len — and the
    whole profile must not raise (count_distinct fails on maps,
    LENGTH on arrays)."""
    from mrbf_spark.functions.validation import profile_table

    df = spark.createDataFrame(
        [
            (1, [1, 2], {"k": 1}, (1, "a"), bytearray(b"xy")),
            (2, None, None, None, None),
        ],
        "id long, arr array<int>, m map<string,int>, "
        "st struct<a:int,b:string>, bin binary",
    )
    prof = {r["column"]: r.asDict() for r in profile_table(df).collect()}
    for c in ("arr", "m", "st", "bin"):
        row = prof[c]
        assert row["dtype"] == "other"
        assert row["n"] == 2 and row["nulls"] == 1
        assert row["n_distinct"] is None
        assert row["min_q"] is None and row["max_q"] is None
        assert row["avg_len_q"] is None
    # the scalar column still gets the full metric set alongside
    assert prof["id"]["n_distinct"] == 2 and prof["id"]["min_q"] == 1


def test_dsir_null_target_predicate_counts_as_raw(spark):
    """ADVICE r6: a NULL target predicate (lang IS NULL under
    `lang = 'en'`) coalesces to FALSE — the doc is scored and ranked
    on the raw side instead of silently vanishing from the output."""
    from mrbf_spark.functions.dsir import dsir_select

    docs = spark.createDataFrame(
        [
            (1, "en", "the quick brown fox jumps over the dog"),
            (2, "de", "der schnelle braune fuchs springt"),
            (3, None, "a document with no language tag at all"),
            (4, "de", "noch ein deutsches dokument hier"),
        ],
        "doc_id long, lang string, text string",
    )
    out = dsir_select(docs, F.col("lang") == "en")
    ids = {r["doc_id"] for r in out.collect()}
    # target doc 1 is excluded (it IS the target); NULL-lang doc 3
    # must be present among the raw docs
    assert ids == {2, 3, 4}


def test_keep_id_pref_struct_min_no_packing_limit(spark):
    """ADVICE r6 #1: the source-priority keeper must survive doc_ids
    past the old 1e12 packed-BIGINT bound — the struct-ordered MIN has
    no packing contract. A corpus with a 1e13 doc_id in the preferred
    source must elect IT, not a corrupted decode."""
    from mrbf_spark.functions.dedup import dedup_exact_report

    big = 10**13 + 7
    docs = spark.createDataFrame(
        [
            (1, "srcX", "same text"),
            (big, "src7", "same text"),  # preferred source, huge id
            (2, "src3", "same text"),
        ],
        "doc_id long, source string, text string",
    )
    row = dedup_exact_report(docs).collect()[0]
    assert row["keep_id"] == 1  # plain min unchanged
    assert row["keep_id_pref"] == big  # rank-0 source wins despite id
    assert row["n_copies"] == 3


def test_keep_id_pref_oracle_contract_holds_on_testdata(spark):
    """The DuckDB twin still uses the packed-BIGINT MIN (valid while
    doc_id < 1e12) — assert the testdata actually honors that contract
    so the oracle comparison itself is sound."""
    from conftest import SF_ORACLE
    from mrbf_spark.tables import load_table

    mx = (
        load_table(spark, SF_ORACLE, "documents")
        .agg(F.max("doc_id").alias("m"))
        .collect()[0]["m"]
    )
    assert mx < 10**12, "testdata violates the oracle's packing bound"


def test_source_priority_is_parameterizable(spark):
    """ADVICE r6 #2: the priority ranking is a parameter — a custom
    ordering must elect a different keeper than the test default."""
    from mrbf_spark.functions.dedup import dedup_exact_report

    docs = spark.createDataFrame(
        [
            (10, "crawl", "dup text"),
            (20, "curated", "dup text"),
            (30, "books", "dup text"),
        ],
        "doc_id long, source string, text string",
    )
    default = dedup_exact_report(docs).collect()[0]
    assert default["keep_id_pref"] == 10  # no listed source → min id
    custom = dedup_exact_report(docs, priority_sources=("books", "curated"))
    assert custom.collect()[0]["keep_id_pref"] == 30  # books outranks all


def test_dsir_null_predicate_duckdb_parity(spark):
    """The oracle twin applies the same COALESCE(..., FALSE) — the two
    engines agree row-for-row on a corpus with NULL langs."""
    import duckdb

    from mrbf_spark.functions.dsir import dsir_duckdb_sql, dsir_select

    rows = [
        (1, "en", "the quick brown fox jumps over the dog"),
        (2, "de", "der schnelle braune fuchs springt"),
        (3, None, "a document with no language tag at all"),
        (4, "de", "noch ein deutsches dokument hier"),
        (5, None, "another untagged document body text"),
        (6, "en", "the slow red fox sleeps under the dog"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: (r["n_feats"], r["weight_q"], r["rank"], r["selected"])
        for r in dsir_select(docs, F.col("lang") == "en").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, lang VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?)", rows)
    exp = {
        r[0]: (r[1], r[2], r[4], r[5])
        for r in con.sql(dsir_duckdb_sql(src="d")).fetchall()
    }
    assert got == exp
