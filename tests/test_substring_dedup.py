"""Exact-substring span dedup: DuckDB builder parity plus
hand-checkable planted-span ground truth."""

from __future__ import annotations

import duckdb

from mrbf_spark.functions.substring_dedup import (
    SUBSTR_K,
    substring_dedup_spans,
    substring_dup_spans,
)
from mrbf_spark.registry import ORACLES

from conftest import SF_ORACLE


def test_substring_spans_match_duckdb(spark):
    got = substring_dedup_spans(spark, SF_ORACLE).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_ORACLE}/documents.parquet'"
    )
    exp = con.sql(ORACLES["substring_dedup_spans"]).df()
    assert sorted(got.columns) == sorted(exp.columns)
    assert len(got) == len(exp) > 0  # the testdata's planted dups must register
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), f"col {c} mismatch"


def _doc(tokens):
    return " ".join(tokens)


def test_planted_shared_span_exact_extent(spark):
    """Two docs share exactly one 20-token passage inside otherwise
    unique text: every window fully inside the passage (20-K+1 of
    them) is flagged in both docs, they merge into ONE span of exactly
    20 tokens."""
    shared = [f"s{i}" for i in range(20)]
    a = [f"a{i}" for i in range(30)] + shared + [f"A{i}" for i in range(30)]
    b = [f"b{i}" for i in range(25)] + shared + [f"B{i}" for i in range(35)]
    docs = spark.createDataFrame(
        [(1, _doc(a)), (2, _doc(b))], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in substring_dup_spans(docs).collect()}
    n_wins = 20 - SUBSTR_K + 1
    for d in (1, 2):
        assert rows[d]["n_dup_windows"] == n_wins
        assert rows[d]["n_spans"] == 1
        assert rows[d]["dup_tokens"] == 20


def test_disjoint_shared_spans_stay_separate(spark):
    """Two shared passages separated by > K unique tokens must emit
    TWO spans, not one merged blob."""
    s1 = [f"x{i}" for i in range(SUBSTR_K)]
    s2 = [f"y{i}" for i in range(SUBSTR_K)]
    gap_a = [f"ga{i}" for i in range(SUBSTR_K + 5)]
    gap_b = [f"gb{i}" for i in range(SUBSTR_K + 5)]
    a = s1 + gap_a + s2
    b = s1 + gap_b + s2
    docs = spark.createDataFrame(
        [(1, _doc(a)), (2, _doc(b))], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in substring_dup_spans(docs).collect()}
    for d in (1, 2):
        assert rows[d]["n_spans"] == 2
        assert rows[d]["dup_tokens"] == 2 * SUBSTR_K


def test_unique_corpus_emits_nothing(spark):
    docs = spark.createDataFrame(
        [(i, _doc([f"t{i}_{j}" for j in range(40)])) for i in range(5)],
        "doc_id long, text string",
    )
    assert substring_dup_spans(docs).count() == 0


def test_short_docs_never_pair(spark):
    """Docs shorter than K emit no windows — two identical 5-token
    docs must NOT register (a naive short-window fallback would pair
    them on a sub-K match)."""
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e")], "doc_id long, text string"
    )
    assert substring_dup_spans(docs).count() == 0
