"""Incremental rollup maintenance (functions/rollup.py): the
maintained rollup must equal a direct recompute over the new
snapshot — pinned on the suite's deterministic event snapshots and on
planted frames that force each maintenance path (dirty-key extremum
rescan, clean-key monotone tighten, key-changing update, NULL value
and NULL key groups, empty delta)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from conftest import SF_SMOKE

from mrbf_spark.functions.rollup import (
    rollup_base,
    rollup_delta,
    rollup_maintain,
)


def _sorted_rows(df):
    return sorted(
        df.collect(), key=lambda r: tuple((x is None, x) for x in r)
    )


def _assert_matches_recompute(old, new, pk, keys, v, **kw):
    maintained = rollup_maintain(old, new, pk, keys, v, **kw)
    recomputed = rollup_base(new, keys, v)
    assert maintained.columns == recomputed.columns
    assert _sorted_rows(maintained) == _sorted_rows(recomputed)


def test_maintain_equals_recompute_on_event_snapshots(spark):
    from mrbf_spark.functions.diffing import BUMP_NEW, DROP_NEW, DROP_OLD
    from mrbf_spark.tables import load_table

    base = load_table(spark, SF_SMOKE, "events")
    vm = F.floor(F.col("value").cast("double") * F.lit(1000000.0)).cast(
        "long"
    )
    bucket = F.pmod(F.col("user_id"), F.lit(7)).cast("string")
    old = base.filter(
        F.pmod(F.col("event_id"), F.lit(DROP_OLD[0])) != DROP_OLD[1]
    ).select("event_id", "event_type", bucket.alias("bucket"), vm.alias("v"))
    new = (
        base.filter(
            F.pmod(F.col("event_id"), F.lit(DROP_NEW[0])) != DROP_NEW[1]
        )
        .withColumn(
            "value",
            F.when(
                F.pmod(F.col("event_id"), F.lit(BUMP_NEW[0])) == BUMP_NEW[1],
                F.col("value") * 2,
            ).otherwise(F.col("value")),
        )
        .select(
            "event_id", "event_type", bucket.alias("bucket"), vm.alias("v")
        )
    )
    _assert_matches_recompute(old, new, "event_id", ["event_type", "bucket"], "v")


def _frames(spark):
    old = spark.createDataFrame(
        [
            Row(pk=1, k="a", v=1),
            Row(pk=2, k="a", v=5),
            Row(pk=3, k="b", v=10),
            Row(pk=6, k=None, v=4),
        ],
        "pk int, k string, v long",
    )
    new = spark.createDataFrame(
        [
            Row(pk=2, k="a", v=5),  # unchanged
            Row(pk=3, k="b", v=7),  # changed (b dirty)
            Row(pk=4, k="a", v=9),  # insert into a
            Row(pk=5, k="c", v=None),  # insert: NULL value group
            Row(pk=6, k=None, v=4),  # unchanged NULL-key group
        ],
        "pk int, k string, v long",
    )
    return old, new  # pk=1 deleted: 'a' loses its min -> a dirty


@pytest.mark.parametrize("broadcast_dirty", [True, False])
def test_planted_paths(spark, broadcast_dirty):
    old, new = _frames(spark)
    _assert_matches_recompute(
        old, new, "pk", ["k"], "v", broadcast_dirty=broadcast_dirty
    )
    got = {
        r["k"]: (r["cnt"], r["cntv"], r["vsum"], r["vmin"], r["vmax"])
        for r in rollup_maintain(
            old, new, "pk", ["k"], "v", broadcast_dirty=broadcast_dirty
        ).collect()
    }
    assert got == {
        "a": (2, 2, 14, 5, 9),  # min rescanned after the delete of v=1
        "b": (1, 1, 7, 7, 7),  # changed row rescanned
        "c": (1, 0, None, None, None),  # all-NULL value group
        None: (1, 1, 4, 4, 4),  # NULL key survives null-safe joins
    }


def test_dirty_bits(spark):
    old, new = _frames(spark)
    d = {
        r["k"]: (r["d_cnt"], r["dirty"])
        for r in rollup_delta(old, new, "pk", ["k"], "v").collect()
    }
    # 'a': -1 (delete) +1 (insert) = 0 net but dirty; 'b': net 0 via
    # change; 'c': clean insert; NULL key: no contribution at all.
    assert d == {"a": (0, 1), "b": (0, 1), "c": (1, 0)}


def test_key_changing_update(spark):
    old = spark.createDataFrame(
        [Row(pk=1, k="a", v=3), Row(pk=2, k="a", v=8)],
        "pk int, k string, v long",
    )
    new = spark.createDataFrame(
        [Row(pk=1, k="b", v=3), Row(pk=2, k="a", v=8)],
        "pk int, k string, v long",
    )
    _assert_matches_recompute(old, new, "pk", ["k"], "v")
    got = {
        r["k"]: (r["cnt"], r["vmin"])
        for r in rollup_maintain(old, new, "pk", ["k"], "v").collect()
    }
    assert got == {"a": (1, 8), "b": (1, 3)}


def test_empty_delta_is_base(spark):
    old, _ = _frames(spark)
    assert rollup_delta(old, old, "pk", ["k"], "v").count() == 0
    _assert_matches_recompute(old, old, "pk", ["k"], "v")


def test_group_emptied_is_dropped(spark):
    old = spark.createDataFrame(
        [Row(pk=1, k="gone", v=2), Row(pk=2, k="stay", v=5)],
        "pk int, k string, v long",
    )
    new = spark.createDataFrame(
        [Row(pk=2, k="stay", v=5)], "pk int, k string, v long"
    )
    out = rollup_maintain(old, new, "pk", ["k"], "v").collect()
    assert [r["k"] for r in out] == ["stay"]


def test_rescan_partition_prunes_and_matches(spark, tmp_path):
    """With a key-derived partition column on the new snapshot, the
    dirty rescan statically prunes to the touched partitions (visible
    as a PartitionFilters IN-list in the physical plan) and the
    maintained rollup still equals the recompute."""
    from pyspark.sql import functions as F

    from mrbf_spark.functions.rollup import rollup_maintain
    from mrbf_spark.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id",
        F.pmod(F.col("event_id"), F.lit(97)).cast("string").alias("k"),
        F.floor(F.col("value").cast("double") * 1e6).cast("long").alias("v"),
    )
    pexpr = F.pmod(F.crc32(F.col("k")), F.lit(8)).cast("int")
    old = ev.filter(F.col("event_id") < 900)
    # deletes (id in [850,900) gone) + updates (id%10==0 bumped):
    # only SOME keys go dirty, so pruning has partitions to skip
    new_df = ev.filter(F.col("event_id") < 850).withColumn(
        "v",
        F.when(F.pmod(F.col("event_id"), F.lit(10)) == 0, F.col("v") * 2)
        .otherwise(F.col("v")),
    )
    p = str(tmp_path / "newpart")
    new_df.withColumn("kb", pexpr).write.partitionBy("kb").parquet(p)
    new = spark.read.parquet(p)

    maintained = rollup_maintain(
        old, new, "event_id", ["k"], "v",
        rescan_partition=("kb", pexpr),
    )
    import re

    plan = maintained._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*kb[^\]]*IN", plan), plan[:2000]
    got = _sorted_rows(maintained)
    want = _sorted_rows(rollup_base(new.drop("kb"), ["k"], "v"))
    assert got == want


@pytest.mark.slow
def test_precomputed_base_is_equivalent(spark):
    old, new = _frames(spark)
    base = rollup_base(old, ["k"], "v")
    a = _sorted_rows(rollup_maintain(old, new, "pk", ["k"], "v", base=base))
    b = _sorted_rows(rollup_maintain(old, new, "pk", ["k"], "v"))
    assert a == b


@pytest.mark.slow
def test_rollup_maintain_random_snapshots(spark):
    """Property check: random snapshot pairs (nullable keys AND
    values, overlapping/disjoint pks, empty sides) — maintained ==
    recompute. Examples are batched (one Spark round per example is
    too slow to run hypothesis's full budget; see the bloom property
    tests' pattern)."""
    from hypothesis import strategies as st

    snap = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.sampled_from(["a", "b", "c", None]),
            st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
        ),
        min_size=0,
        max_size=50,
        unique_by=lambda t: t[0],  # pk unique within a snapshot
    )
    for _ in range(3):
        old_rows, new_rows = st.tuples(snap, snap).example()
        old = spark.createDataFrame(old_rows, "pk int, k string, v long")
        new = spark.createDataFrame(new_rows, "pk int, k string, v long")
        _assert_matches_recompute(old, new, "pk", ["k"], "v")


def test_apply_with_external_delta(spark):
    """rollup_apply is the CDC face: a delta frame built by hand (as a
    change stream would supply it) refreshes the base identically to
    the snapshot-diff path."""
    from mrbf_spark.functions.rollup import rollup_apply

    old, new = _frames(spark)
    base = rollup_base(old, ["k"], "v")
    delta = rollup_delta(old, new, "pk", ["k"], "v")
    a = _sorted_rows(rollup_apply(base, delta, new, ["k"], "v"))
    b = _sorted_rows(rollup_base(new, ["k"], "v"))
    assert a == b


def test_cli_build_then_maintain(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from mrbf_spark.__main__ import main
    from mrbf_spark.functions.diffing import BUMP_NEW, DROP_NEW, DROP_OLD

    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").withColumn(
        "v", F.floor(F.col("value").cast("double") * 1e6).cast("long")
    )
    old_p, new_p = str(tmp_path / "old"), str(tmp_path / "new")
    base_p, out_p = str(tmp_path / "base"), str(tmp_path / "out")
    events.filter(
        F.pmod(F.col("event_id"), F.lit(DROP_OLD[0])) != DROP_OLD[1]
    ).write.parquet(old_p)
    events.filter(
        F.pmod(F.col("event_id"), F.lit(DROP_NEW[0])) != DROP_NEW[1]
    ).withColumn(
        "v",
        F.when(
            F.pmod(F.col("event_id"), F.lit(BUMP_NEW[0])) == BUMP_NEW[1],
            F.col("v") * 2,
        ).otherwise(F.col("v")),
    ).write.parquet(new_p)

    assert main(
        ["rollup-build", "--input", old_p, "--keys", "event_type",
         "--value", "v", "--out", base_p]
    ) == 0
    assert "rollup-build:" in capsys.readouterr().out
    assert main(
        ["rollup-maintain", "--old", old_p, "--new", new_p,
         "--pk", "event_id", "--keys", "event_type", "--value", "v",
         "--base", base_p, "--out", out_p]
    ) == 0
    assert "rollup-maintain:" in capsys.readouterr().out
    got = _sorted_rows(spark.read.parquet(out_p))
    want = _sorted_rows(
        rollup_base(spark.read.parquet(new_p), ["event_type"], "v")
    )
    assert got == want

    # --rescan-partition: same refresh against a partitioned copy of
    # the new snapshot, pruning the dirty rescan; identical output
    newpart_p, out2_p = str(tmp_path / "newpart"), str(tmp_path / "out2")
    spark.read.parquet(new_p).withColumn(
        "kb", F.expr("pmod(crc32(event_type), 4)").cast("int")
    ).write.partitionBy("kb").parquet(newpart_p)
    assert main(
        ["rollup-maintain", "--old", old_p, "--new", newpart_p,
         "--pk", "event_id", "--keys", "event_type", "--value", "v",
         "--rescan-partition", "kb:cast(pmod(crc32(event_type), 4) as int)",
         "--out", out2_p]
    ) == 0
    got2 = _sorted_rows(spark.read.parquet(out2_p).drop("kb"))
    assert got2 == got
