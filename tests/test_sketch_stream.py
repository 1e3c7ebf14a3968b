"""Streaming KMV sketch maintenance (streaming/sketch_stream.py):
stream == batch as exact values, and batch cost independent of
history (the store never exceeds groups×k rows)."""

import os
import shutil

from pyspark.sql import functions as F

from mrbf_spark.functions.sketches import KMV_K, kmv_sketch
from mrbf_spark.streaming.sketch_stream import (
    read_sketch_store,
    streaming_kmv_distinct,
)
from mrbf_spark.tables import load_table

from conftest import SF_SMOKE


def test_streaming_kmv_store_equals_batch_sketch(spark, tmp_path):
    """Drain the events table file-by-file through the sketch
    maintainer; the final store must equal the batch KMV sketch of the
    WHOLE table as exact (grp, rnk, h) values — the merge is lossless
    by construction, so this is equality, not approximation."""
    ev = load_table(spark, SF_SMOKE, "events")
    staged = str(tmp_path / "staged")
    ev.repartition(3).write.parquet(staged)
    parts = sorted(p for p in os.listdir(staged) if p.endswith(".parquet"))
    assert len(parts) == 3
    src = str(tmp_path / "src")
    os.makedirs(src)
    for p in parts:
        shutil.copy(os.path.join(staged, p), os.path.join(src, p))

    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_kmv_distinct(spark, src, store, ckpt, max_files_per_trigger=1)
    q.awaitTermination()

    got = {
        (r["grp"], r["rnk"]): r["h"]
        for r in read_sketch_store(spark, store).collect()
    }
    want = {
        (r["grp"], r["rnk"]): r["h"]
        for r in kmv_sketch(
            spark.read.parquet(staged), "event_type", "user_id"
        ).collect()
    }
    assert got == want and got
    # store is bounded: ≤ k rows per group whatever the history
    per_grp = (
        read_sketch_store(spark, store)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert all(r["n"] <= KMV_K for r in per_grp)


def test_streaming_kmv_restart_is_idempotent(spark, tmp_path):
    """Re-running the drained stream on the same checkpoint (no new
    files) must leave the store unchanged — and a REPLAYED batch id
    overwrites its own store version rather than corrupting it."""
    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    ev.repartition(2).write.parquet(src)
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")

    q = streaming_kmv_distinct(spark, src, store, ckpt)
    q.awaitTermination()
    before = {
        (r["grp"], r["rnk"]): r["h"]
        for r in read_sketch_store(spark, store).collect()
    }
    q2 = streaming_kmv_distinct(spark, src, store, ckpt)  # idle restart
    q2.awaitTermination()
    after = {
        (r["grp"], r["rnk"]): r["h"]
        for r in read_sketch_store(spark, store).collect()
    }
    assert before == after


def test_streaming_cms_store_equals_batch_grid(spark, tmp_path):
    """Drain events through the CMS maintainer; the final grid must
    equal the batch grid of the whole table cell-for-cell (counter
    addition is lossless), and every probe keeps the CMS
    never-underestimates invariant."""
    from mrbf_spark.functions.sketches import cms_counters, cms_probe
    from mrbf_spark.streaming.sketch_stream import (
        read_cms_store,
        streaming_cms_frequencies,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    ev.repartition(3).write.parquet(src)
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")

    q = streaming_cms_frequencies(spark, src, store, ckpt, max_files_per_trigger=1)
    q.awaitTermination()

    got = {
        (r["i"], r["bucket"]): r["cnt"]
        for r in read_cms_store(spark, store).collect()
    }
    want = {
        (r["i"], r["bucket"]): r["cnt"]
        for r in cms_counters(spark.read.parquet(src), "user_id").collect()
    }
    assert got == want and got

    truth = (
        ev.groupBy(F.col("user_id").cast("string").alias("item"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    est = cms_probe(read_cms_store(spark, store), truth.select("item"))
    joined = truth.join(est, "item")
    assert joined.filter(F.col("cms_n") < F.col("n")).count() == 0


def test_cms_batch_replay_does_not_double_count(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a batch whose store
    version already committed must converge, not double-count — the
    predecessor read excludes the batch's own version. (Counter
    addition is not idempotent; this is the CMS-specific hazard the
    versioned store's before_batch exclusion exists for.)"""
    from mrbf_spark.functions.sketches import cms_counters
    from mrbf_spark.streaming.sketch_stream import (
        merge_cms_batch_into_store,
        read_cms_store,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    b0 = ev.filter(F.col("event_id") < 500)
    b1 = ev.filter(F.col("event_id") >= 500)
    store = str(tmp_path / "store")

    merge_cms_batch_into_store(b0, 0, store)
    merge_cms_batch_into_store(b1, 1, store)
    merge_cms_batch_into_store(b1, 1, store)  # replay of batch 1

    got = {
        (r["i"], r["bucket"]): r["cnt"]
        for r in read_cms_store(spark, store).collect()
    }
    want = {
        (r["i"], r["bucket"]): r["cnt"]
        for r in cms_counters(ev, "user_id").collect()
    }
    assert got == want


def test_streaming_quantile_store_equals_batch_sample(spark, tmp_path):
    """The maintained bottom-k value sample equals the batch sample of
    the whole table as exact (grp, h, value, rnk) tuples, and the
    derived running median matches the batch path."""
    from mrbf_spark.functions.sketches import bottomk_sample, sample_median
    from mrbf_spark.streaming.sketch_stream import (
        read_qsk_store,
        streaming_bottomk_quantile,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    ev.repartition(3).write.parquet(src)
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")

    q = streaming_bottomk_quantile(spark, src, store, ckpt, max_files_per_trigger=1)
    q.awaitTermination()

    got = {
        (r["grp"], r["rnk"], r["h"]): r["value"]
        for r in read_qsk_store(spark, store).collect()
    }
    want = {
        (r["grp"], r["rnk"], r["h"]): r["value"]
        for r in bottomk_sample(
            spark.read.parquet(src), "event_type", "value", F.col("event_id")
        ).collect()
    }
    assert got == want and got
    med_s = {r["grp"]: r["est"] for r in sample_median(read_qsk_store(spark, store)).collect()}
    med_b = {
        r["grp"]: r["est"]
        for r in sample_median(
            bottomk_sample(ev, "event_type", "value", F.col("event_id"))
        ).collect()
    }
    assert med_s == med_b and len(med_s) == 5


def test_read_latest_version_skips_incomplete_and_excludes_current(spark, tmp_path):
    """The versioned-store reader: picks the newest _SUCCESS-complete
    version, skips torn writes (no _SUCCESS), honors the before_batch
    replay exclusion, and returns None when nothing qualifies."""
    import os

    from mrbf_spark.streaming.store import read_latest_version

    store = str(tmp_path / "store")
    schema = "grp string, h long, rnk int"
    assert read_latest_version(spark, store, schema) is None  # no dir

    df1 = spark.createDataFrame([("a", 1, 1)], schema)
    df2 = spark.createDataFrame([("b", 2, 1)], schema)
    df1.write.parquet(os.path.join(store, "v=0"))
    df2.write.parquet(os.path.join(store, "v=3"))
    # torn write: newest version without _SUCCESS must be skipped
    df2.write.parquet(os.path.join(store, "v=7"))
    os.remove(os.path.join(store, "v=7", "_SUCCESS"))

    got = read_latest_version(spark, store, schema).collect()
    assert [(r["grp"], r["h"]) for r in got] == [("b", 2)]  # v=3, not torn v=7
    # replay exclusion: a batch re-running as id 3 must see v=0
    prev = read_latest_version(spark, store, schema, before_batch=3).collect()
    assert [(r["grp"], r["h"]) for r in prev] == [("a", 1)]
    assert read_latest_version(spark, store, schema, before_batch=0) is None


def test_release_scoped_caches_drains_the_registry(spark):
    """registry.release_scoped_caches: every scoped_cache'd frame is
    unpersisted and the list drains (the non-catalog-path hygiene the
    stress/bench loops rely on)."""
    from mrbf_spark import registry

    df = registry.scoped_cache(spark.range(100))
    df.count()
    assert df.storageLevel.useMemory
    assert len(registry._SCOPED_CACHES) >= 1
    registry.release_scoped_caches()
    assert registry._SCOPED_CACHES == []
    assert not df.storageLevel.useMemory
