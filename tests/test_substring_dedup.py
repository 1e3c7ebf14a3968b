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
    a = got[cols].sort_values(["part", "doc_id"]).reset_index(drop=True)
    b = exp[cols].sort_values(["part", "doc_id"]).reset_index(drop=True)
    for c in cols:
        ok = (a[c].to_numpy() == b[c].to_numpy()) | (
            a[c].isna().to_numpy() & b[c].isna().to_numpy()
        )
        assert ok.all(), f"col {c} mismatch"


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


# ----------------------------------------------------- span REMOVAL


def test_remove_dup_spans_planted(spark):
    """Two docs share a K-token passage: the lower doc_id keeps it,
    the higher one has exactly those tokens cut; a unique doc is
    untouched."""
    from mrbf_spark.functions.substring_dedup import SUBSTR_K, remove_dup_spans

    shared = " ".join(f"s{i}" for i in range(SUBSTR_K))
    rows = [
        (1, f"aaa bbb {shared} ccc ddd"),
        (2, f"xxx yyy {shared} zzz www"),
        (3, "uuu vvv " + " ".join(f"u{i}" for i in range(SUBSTR_K))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_dup_spans(docs).collect()}
    assert out[1]["text"] == rows[0][1]  # keeper intact
    assert out[1]["n_removed"] == 0
    assert out[2]["text"] == "xxx yyy zzz www"
    assert out[2]["n_removed"] == SUBSTR_K
    assert out[3]["text"] == rows[2][1]
    assert out[3]["n_removed"] == 0


def test_remove_dup_spans_matches_duckdb(spark):
    import duckdb

    from mrbf_spark.functions.substring_dedup import (
        remove_dup_spans,
        remove_dup_spans_sql,
    )
    from mrbf_spark.tables import load_table

    got = remove_dup_spans(load_table(spark, SF_ORACLE, "documents")).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_ORACLE}/documents.parquet'"
    )
    exp = con.sql(remove_dup_spans_sql()).df()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns) and len(got) == len(exp)
    a = got[cols].sort_values("doc_id").reset_index(drop=True)
    b = exp[cols].sort_values("doc_id").reset_index(drop=True)
    for c in cols:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), f"col {c} mismatch"


def test_remove_dup_spans_partition_invariant(spark):
    from mrbf_spark.functions.substring_dedup import remove_dup_spans
    from mrbf_spark.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents").limit(200)
    one = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in remove_dup_spans(docs.coalesce(1)).collect()
    }
    many = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in remove_dup_spans(docs.repartition(17)).collect()
    }
    assert one == many


def test_remove_dup_spans_idempotent_on_cleaned_corpus(spark):
    """Running the cut twice changes nothing more: after removal no
    cross-doc duplicated K-window survives outside its keeper, so the
    second pass removes 0 tokens. (The cut can in principle create a
    NEW adjacency — tokens around a cut joining into a fresh window —
    shared with a keeper by coincidence; on real corpora this is the
    vanishing case, and the testdata certifies it by measuring 0.)"""
    from pyspark.sql import functions as F

    from mrbf_spark.functions.substring_dedup import remove_dup_spans
    from mrbf_spark.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents").limit(200)
    once = remove_dup_spans(docs).select("doc_id", "text")
    twice = remove_dup_spans(once)
    assert twice.agg(F.sum("n_removed")).collect()[0][0] == 0
