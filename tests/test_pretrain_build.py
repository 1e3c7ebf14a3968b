"""pretrain-build CLI (r7): the end-to-end training-data composition
(curate -> [temperature mixture] -> BPE -> contiguous pack -> shards)
— artifact presence, token conservation across the whole chain, and
the indexed temperature re-keying invariants."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from conftest import SF_SMOKE


def _n_docs(spark, path):
    return spark.read.parquet(path).count()


@pytest.mark.slow
def test_pretrain_build_end_to_end(spark, tmp_path, capsys):
    from mrbf_spark.__main__ import main

    src = f"{SF_SMOKE}/documents.parquet"
    # a 120-doc slice keeps the BPE train loop fast
    docs = str(tmp_path / "docs")
    spark.read.parquet(src).filter(F.col("doc_id") < 120).write.parquet(docs)
    out = str(tmp_path / "build")
    assert (
        main(
            [
                "pretrain-build",
                "--input", docs,
                "--out", out,
                "--bpe-merges", "20",
                "--seq-len", "64",
                "--shards", "4",
            ]
        )
        == 0
    )
    text = capsys.readouterr().out
    assert "pretrain-build: done" in text

    # every artifact written
    n_curated = _n_docs(spark, f"{out}/curated")
    assert 0 < n_curated
    merges = spark.read.parquet(f"{out}/bpe_merges")
    assert merges.count() == 20
    enc = spark.read.parquet(f"{out}/encoded")
    assert enc.count() == n_curated

    # token conservation: stream = sum(n_tokens) + one EOS per doc,
    # reassembled into ceil(stream/64) rows; all but the last are full
    seqs = spark.read.parquet(f"{out}/sequences")
    stream = enc.agg(F.sum("n_tokens")).collect()[0][0] + n_curated
    n_seq = seqs.count()
    assert n_seq == (stream + 63) // 64
    sizes = {
        r["seq_id"]: r["seq_tokens"]
        for r in seqs.select("seq_id", "seq_tokens").collect()
    }
    last = max(sizes)
    assert all(n == 64 for sid, n in sizes.items() if sid != last)
    assert sum(sizes.values()) == stream

    # shards partition the sequences
    sh = spark.read.parquet(f"{out}/shards")
    assert sh.count() == n_seq
    assert sh.select("shard").distinct().count() <= 4

    # resume (--from-stage pack): curate/bpe are NOT recomputed — the
    # command reads their durable artifacts and re-runs pack onward,
    # producing the identical sequence set
    assert (
        main(
            [
                "pretrain-build",
                "--input", docs,
                "--out", out,
                "--seq-len", "64",
                "--shards", "4",
                "--from-stage", "pack",
            ]
        )
        == 0
    )
    text2 = capsys.readouterr().out
    assert "pretrain-build: curate\tskipped (resume)" in text2
    assert "pretrain-build: encoded\tskipped (resume)" in text2
    seqs2 = spark.read.parquet(f"{out}/sequences")
    assert seqs2.count() == n_seq
    assert (
        spark.read.parquet(f"{out}/shards").count() == n_seq
    )


def test_temperature_replicate_indexed_unique_ids(spark):
    from mrbf_spark.functions.sampling import (
        temperature_replicate,
        temperature_replicate_indexed,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    mixed = temperature_replicate_indexed(docs, "source")
    n = mixed.count()
    # same multiset size as the un-indexed form
    assert n == temperature_replicate(docs, "source").count()
    # ids are unique and decode back to the original doc
    assert mixed.select("doc_id").distinct().count() == n
    back = mixed.withColumn("orig", (F.col("doc_id") / 64).cast("long"))
    orig_texts = {
        r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()
    }
    for r in back.select("orig", "text").limit(50).collect():
        assert orig_texts[r["orig"]] == r["text"]


def test_temperature_replicate_indexed_pos_col_collision(spark):
    """An input frame that already carries `pos`/`col` columns must
    survive the indexed replication unchanged (the posexplode outputs
    use __-sentinel names, not the defaults — ADVICE r7)."""
    from mrbf_spark.functions.sampling import temperature_replicate_indexed

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .withColumn("pos", F.col("doc_id") * 7)
        .withColumn("col", F.lit("user-data"))
    )
    mixed = temperature_replicate_indexed(docs, "source")
    assert "pos" in mixed.columns and "col" in mixed.columns
    row = mixed.orderBy("doc_id").select("doc_id", "pos", "col").first()
    # the user's pos column still decodes as orig_doc_id * 7
    assert row["pos"] == (row["doc_id"] // 64) * 7
    assert row["col"] == "user-data"
