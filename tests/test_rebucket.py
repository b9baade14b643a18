"""Partition-spec evolution (rebucket) + row-granular key history."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from read_comp_data_pipeline_spark.operators.merge import HashMergeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _src(spark, rows):
    return spark.createDataFrame(
        [tuple(r) for r in rows],
        T.StructType(list(SCHEMA.fields) + [T.StructField("op", T.StringType(), False)]),
    )


def _state(df):
    return {(r["repo"], r["path"], r["content"], r["seq"]) for r in df.collect()}


def _build(spark, path, mode):
    t = HashMergeTable.create(spark, path, SCHEMA, n_buckets=2, mode=mode)
    t.merge(_src(spark, [("r", f"k{i}", f"v{i}", i, "I") for i in range(30)]), epoch=0)
    t.merge(
        _src(spark, [("r", "k3", "v3b", 30, "U"), ("r", "k4", None, 31, "D")]),
        epoch=1,
    )
    return t


def test_rebucket_preserves_state_and_continues(spark, tmp_path):
    """cow + mor: rebucket 2→8 keeps the logical state bit-identical, the
    changelog across the rebucket is empty, later merges use the new
    layout, and pre-rebucket time travel still resolves the old mapping."""
    for mode in ("cow", "mor"):
        t = _build(spark, str(tmp_path / f"t_{mode}"), mode)
        before = _state(t.read())
        snap_pre = t._snapshot()

        st = t.rebucket(8)
        assert not st["skipped"] and st["n_buckets"] == 8
        assert t.n_buckets == 8
        assert _state(t.read()) == before
        assert t.changes_between(snap_pre).count() == 0  # logical no-op
        assert _state(t.read(at_snapshot=snap_pre)) == before  # time travel

        # same count → skip; merging after rebucket lands in the new layout
        assert t.rebucket(8)["skipped"]
        t.merge(_src(spark, [("r", "k9", "v9b", 40, "U")]), epoch=2)
        got = {r["path"]: r["content"] for r in t.read().collect()}
        assert got["k9"] == "v9b" and len(got) == 29


def test_rebucket_prunes_with_new_mapping(spark, tmp_path):
    """After rebucket, a single-key MERGE touches exactly one of the NEW
    buckets (the changelog diff proves the new pruning granularity)."""
    t = _build(spark, str(tmp_path / "t_prune"), "cow")
    t.rebucket(16)
    snap_a = t._snapshot()
    t.merge(_src(spark, [("r", "k7", "v7b", 50, "U")]), epoch=2)
    changed = t._changed_buckets(snap_a, t._snapshot())
    assert len(changed) == 1 and 0 <= changed[0] < 16


def test_key_history_across_versions_and_rebucket(spark, tmp_path):
    """key_history returns one row per retained snapshot where the key is
    live, under each snapshot's own bucket mapping (rebucket-safe)."""
    t = _build(spark, str(tmp_path / "t_hist"), "cow")
    t.rebucket(8)
    t.merge(_src(spark, [("r", "k3", "v3c", 60, "U")]), epoch=2)

    hist = t.key_history({"repo": "r", "path": "k3"}).orderBy("_version").collect()
    contents = [r["content"] for r in hist]
    # epoch0: v3, epoch1+rebucket: v3b (2 snapshots), epoch2: v3c
    assert contents == ["v3", "v3b", "v3b", "v3c"]
    assert [r["seq"] for r in hist] == [3, 30, 30, 60]

    # deleted key: present only in the snapshots before its delete
    gone = t.key_history({"repo": "r", "path": "k4"}).collect()
    assert [r["content"] for r in gone] == ["v4"]

    # never-existed key: empty, not an error
    assert t.key_history({"repo": "r", "path": "nope"}).count() == 0
