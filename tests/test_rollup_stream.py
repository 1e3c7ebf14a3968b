"""Streaming rollup maintenance (streaming/rollup_stream.py): after
draining overlapping CDC increments, the maintained rollup must equal
a direct recompute over the maintained target — and a restart on the
same checkpoint with no new files changes nothing."""

import os
import shutil

from pyspark.sql import functions as F

from mrbf_spark.functions.rollup import rollup_base
from mrbf_spark.streaming.rollup_stream import (
    rollup_schema,
    streaming_rollup_events,
)
from mrbf_spark.streaming.store import read_latest_version
from mrbf_spark.tables import load_table

from conftest import SF_SMOKE


def _stage_increments(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    os.makedirs(src)
    staged = str(tmp_path / "staged")
    parts = [
        ev.filter(F.col("event_id") < 600),
        ev.filter(
            (F.col("event_id") >= 400) & (F.col("event_id") < 900)
        ).withColumn("value", F.col("value") + 100.0),
        ev.filter(
            (F.col("event_id") >= 800) & (F.col("event_id") < 1200)
        ).withColumn("value", F.col("value") + 200.0),
    ]
    for i, p in enumerate(parts):
        d = os.path.join(staged, str(i))
        p.coalesce(1).write.parquet(d)
        f = next(x for x in os.listdir(d) if x.endswith(".parquet"))
        shutil.copy(os.path.join(d, f), os.path.join(src, f"inc{i}.parquet"))
    return src


def _sorted_rows(df):
    return sorted(
        df.collect(), key=lambda r: tuple((x is None, x) for x in r)
    )


def test_streaming_rollup_equals_recompute_of_target(spark, tmp_path):
    src = _stage_increments(spark, tmp_path)
    tstore = str(tmp_path / "target")
    rstore = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_rollup_events(
        spark, src, tstore, rstore, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination()

    versions = sorted(os.listdir(rstore))
    assert len([d for d in versions if d.startswith("v=")]) == 3

    ks = "event_type string"
    roll = read_latest_version(spark, rstore, rollup_schema(ks))
    target = read_latest_version(
        spark, tstore,
        "event_id int, ts timestamp, user_id int, event_type string, "
        "value float, props string, v bigint",
    )
    got = _sorted_rows(roll)
    want = _sorted_rows(rollup_base(target, ["event_type"], "v"))
    assert got == want
    # the maintained rollup reflects the bumped values: total count
    # equals the distinct pks across all increments
    assert sum(r["cnt"] for r in got) == target.count()


def test_streaming_rollup_idle_restart_is_noop(spark, tmp_path):
    src = _stage_increments(spark, tmp_path)
    tstore = str(tmp_path / "target")
    rstore = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    ks = "event_type string"

    q = streaming_rollup_events(spark, src, tstore, rstore, ckpt)
    q.awaitTermination()
    before = _sorted_rows(read_latest_version(spark, rstore, rollup_schema(ks)))
    q2 = streaming_rollup_events(spark, src, tstore, rstore, ckpt)
    q2.awaitTermination()
    after = _sorted_rows(read_latest_version(spark, rstore, rollup_schema(ks)))
    assert before == after
