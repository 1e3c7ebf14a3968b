"""Streaming MERGE INTO maintenance (streaming/merge_stream.py):
the maintained target equals the batch upsert of all increments, and
replay converges (last-writer-wins versions)."""

import os
import shutil

from pyspark.sql import functions as F

from mrbf_spark.streaming.merge_stream import read_target, streaming_merge_events
from mrbf_spark.tables import load_table

from conftest import SF_SMOKE


def _schema_of(df):
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)


def test_streaming_merge_equals_batch_final_state(spark, tmp_path):
    """Drain three increment files (overlapping pks, later files carry
    bumped values); the maintained target must hold every pk exactly
    once with the LAST increment's values winning."""
    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    os.makedirs(src)
    staged = str(tmp_path / "staged")
    # three overlapping increments: [0,600), [400,900) bumped, [800,1200) bumped twice
    parts = [
        ev.filter(F.col("event_id") < 600),
        ev.filter((F.col("event_id") >= 400) & (F.col("event_id") < 900)).withColumn(
            "value", F.col("value") + 100.0
        ),
        ev.filter((F.col("event_id") >= 800) & (F.col("event_id") < 1200)).withColumn(
            "value", F.col("value") + 200.0
        ),
    ]
    for i, p in enumerate(parts):
        d = os.path.join(staged, str(i))
        p.coalesce(1).write.parquet(d)
        f = next(x for x in os.listdir(d) if x.endswith(".parquet"))
        # file-source processes in modification-time order; name them so
        # listing order matches too
        shutil.copy(os.path.join(d, f), os.path.join(src, f"inc{i}.parquet"))

    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    q = streaming_merge_events(spark, src, store, ckpt, max_files_per_trigger=1)
    q.awaitTermination()

    got = read_target(spark, store, _schema_of(ev))
    rows = {r["event_id"]: r["value"] for r in got.collect()}
    base = {r["event_id"]: r["value"] for r in ev.collect()}
    n_total = len([k for k in base if k < 1200])
    assert len(rows) == n_total  # every pk exactly once
    for k, v in rows.items():
        if k < 400:
            assert v == base[k]
        elif k < 800:
            assert v == base[k] + 100.0  # second increment won
        else:
            assert v == base[k] + 200.0  # third touches [800,1200) and wins


def test_streaming_merge_idle_restart_is_noop(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").limit(300)
    src = str(tmp_path / "src")
    ev.coalesce(2).write.parquet(src)
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    schema = _schema_of(ev)

    q = streaming_merge_events(spark, src, store, ckpt)
    q.awaitTermination()
    before = {r["event_id"]: r["value"] for r in read_target(spark, store, schema).collect()}
    q2 = streaming_merge_events(spark, src, store, ckpt)
    q2.awaitTermination()
    after = {r["event_id"]: r["value"] for r in read_target(spark, store, schema).collect()}
    assert before == after and len(before) == 300


def test_streaming_partitioned_merge_live_dir_equals_batch(spark, tmp_path):
    """The live-directory CDC apply: after draining overlapping
    increments, the bucketed target holds every pk exactly once with
    the last increment winning — and a full restart on the same
    checkpoint (no new files) leaves it unchanged."""
    from mrbf_spark.streaming.merge_stream import (
        streaming_merge_events_partitioned,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    os.makedirs(src)
    staged = str(tmp_path / "staged")
    parts = [
        ev.filter(F.col("event_id") < 600),
        ev.filter((F.col("event_id") >= 400) & (F.col("event_id") < 900)).withColumn(
            "value", F.col("value") + 100.0
        ),
    ]
    for i, p in enumerate(parts):
        d = os.path.join(staged, str(i))
        p.coalesce(1).write.parquet(d)
        f = next(x for x in os.listdir(d) if x.endswith(".parquet"))
        shutil.copy(os.path.join(d, f), os.path.join(src, f"inc{i}.parquet"))

    tdir, ckpt = str(tmp_path / "target"), str(tmp_path / "ckpt")
    q = streaming_merge_events_partitioned(spark, src, tdir, ckpt, n_buckets=8)
    q.awaitTermination()

    rows = {
        r["event_id"]: r["value"]
        for r in spark.read.parquet(tdir).select("event_id", "value").collect()
    }
    base = {r["event_id"]: r["value"] for r in ev.filter(F.col("event_id") < 900).collect()}
    assert len(rows) == len(base)
    for k, v in rows.items():
        assert v == (base[k] + 100.0 if k >= 400 else base[k]), k

    q2 = streaming_merge_events_partitioned(spark, src, tdir, ckpt, n_buckets=8)
    q2.awaitTermination()
    rows2 = {
        r["event_id"]: r["value"]
        for r in spark.read.parquet(tdir).select("event_id", "value").collect()
    }
    assert rows2 == rows
