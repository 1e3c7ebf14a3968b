"""Incremental curation (r8): a NEW shard judged against an immutable
curated HISTORY. Pins the planted drop cases (exact-vs-history,
near-vs-history, near-within-shard keeper), the empty-history
equivalence with the batch chain, and the CLI."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _base_text(i):
    return f"alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo{i}"


def test_planted_increment_cases(spark):
    from mrbf_spark.functions.curate import curate_increment
    from mrbf_spark.registry import release_scoped_caches

    history = _docs(
        spark,
        [
            (1, _base_text(1), "en"),
            (2, "november oscar papa quebec romeo sierra tango uniform victor whiskey", "en"),
        ],
    )
    new = _docs(
        spark,
        [
            # verbatim dup of history doc 1 → exact_dedup drop
            (100, _base_text(1), "en"),
            # near-dup of history doc 2 (one word changed) → near drop
            (101, "november oscar papa quebec romeo sierra tango uniform victor xray", "en"),
            # near-dup PAIR within the shard: 102 < 103 → 102 kept, 103 dropped
            (102, "one two three four five six seven eight nine ten eleven", "en"),
            (103, "one two three four five six seven eight nine ten twelve", "en"),
            # clean doc → survives
            (104, "zulu yankee whiskey victor uniform tango sierra unique words here", "en"),
            # wrong lang → quality gate drop
            (105, "uno dos tres cuatro cinco seis siete ocho nueve diez", "es"),
        ],
    )
    survivors, census = curate_increment(new, history)
    got = sorted(r["doc_id"] for r in survivors.select("doc_id").collect())
    release_scoped_caches()
    assert got == [102, 104], got
    stages = dict(census)
    assert stages["input"] == 6
    assert stages["exact_dedup"] == 5      # 100 dropped
    assert stages["quality_gate"] == 4     # 105 dropped
    assert stages["neardup_jaccard"] == 2  # 101, 103 dropped


def test_empty_history_equals_batch_chain(spark):
    """With no history and the batch chain's optional stages off, the
    incremental survivors equal curate_corpus's (same exact → quality
    → pairwise-near-dup semantics)."""
    from mrbf_spark.functions.curate import curate_corpus, curate_increment
    from mrbf_spark.registry import release_scoped_caches

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter(
        F.col("doc_id") < 250
    )
    empty = docs.filter(F.lit(False))
    inc_ids = sorted(
        r["doc_id"]
        for r in curate_increment(docs, empty)[0].select("doc_id").collect()
    )
    release_scoped_caches()
    batch_ids = sorted(
        r["doc_id"]
        for r in curate_corpus(docs, semantic=False)[0]
        .select("doc_id")
        .collect()
    )
    release_scoped_caches()
    assert inc_ids == batch_ids and len(inc_ids) > 0


def test_curate_inc_cli(spark, tmp_path, capsys):
    from mrbf_spark.__main__ import main

    hist = str(tmp_path / "hist")
    new = str(tmp_path / "new")
    out = str(tmp_path / "out")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    docs.filter(F.col("doc_id") < 300).write.parquet(hist)
    docs.filter(F.col("doc_id") >= 300).write.parquet(new)
    assert (
        main(
            [
                "curate-inc",
                "--input", new,
                "--history", hist,
                "--out", out,
            ]
        )
        == 0
    )
    text = capsys.readouterr().out
    assert "curate-inc: input\t200" in text
    assert "curate-inc: neardup_jaccard" in text
    assert spark.read.parquet(out).count() > 0
