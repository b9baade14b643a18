"""Resumable changelog export (follow_changes) — the table as a feed.

Contract pinned here: consecutive windows tile the epoch line with no
gap or overlap; applying the windows in order reconstructs the table
exactly; a crash between the window write and the cursor swap retries
into the SAME window (replace, never duplicate); a vacuumed/rolled-back
cursor fails loudly instead of re-bootstrapping (double delivery).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from read_comp_data_pipeline_spark.operators.changefeed import (
    follow_changes,
    read_cursor,
    window_dirs,
)
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


def _replay_windows(spark, out):
    """Consumer-side reconstruction: apply each window in delivery order
    (upsert insert/update_after, remove delete)."""
    state: dict = {}
    for w in window_dirs(out):
        for r in spark.read.parquet(w).collect():
            k = (r["repo"], r["path"])
            if r["_change_type"] in ("insert", "update_after"):
                state[k] = (r["content"], r["seq"])
            elif r["_change_type"] == "delete":
                state.pop(k, None)
            # update_before is informational for consumers needing images
    return state


def test_windows_tile_and_reconstruct_exactly(spark, tmp_path):
    tbl, out = str(tmp_path / "t"), str(tmp_path / "feed")
    t = HashMergeTable.create(spark, tbl, SCHEMA, n_buckets=4)
    t.merge(_src(spark, [("r", "a", "a0", 0, "I"), ("r", "b", "b0", 1, "I")]),
            epoch=0, src_seq_lo=0, src_seq_hi=1)
    r1 = follow_changes(spark, t, out)
    assert not r1["noop"] and (r1["from_epoch"], r1["to_epoch"]) == (-1, 0)
    t.merge(_src(spark, [("r", "a", "a1", 2, "U"), ("r", "c", "c0", 3, "I")]),
            epoch=1, src_seq_lo=2, src_seq_hi=3)
    t.merge(_src(spark, [("r", "b", None, 4, "D")]),
            epoch=2, src_seq_lo=4, src_seq_hi=4)
    r2 = follow_changes(spark, t, out)
    assert (r2["from_epoch"], r2["to_epoch"]) == (0, 2)
    # delivered exactly the net changes of epochs 1-2
    w2 = spark.read.parquet(r2["window"])
    got = {(r["repo"], r["path"], r["_change_type"]) for r in w2.collect()}
    assert got == {
        ("r", "a", "update_before"), ("r", "a", "update_after"),
        ("r", "c", "insert"), ("r", "b", "delete"),
    }
    assert {r["_from_epoch"] for r in w2.collect()} == {0}
    # windows tile: no gap/overlap in directory names
    names = [os.path.basename(w) for w in window_dirs(out)]
    assert names == ["e0000000000-0000000000", "e0000000001-0000000002"]
    # consumer replay of all windows == the table
    state = _replay_windows(spark, out)
    expect = {
        (r["repo"], r["path"]): (r["content"], r["seq"]) for r in t.read().collect()
    }
    assert state == expect


def test_rerun_when_current_is_noop(spark, tmp_path):
    tbl, out = str(tmp_path / "t"), str(tmp_path / "feed")
    t = HashMergeTable.create(spark, tbl, SCHEMA, n_buckets=2)
    t.merge(_src(spark, [("r", "a", "a0", 0, "I")]), epoch=0)
    assert not follow_changes(spark, t, out)["noop"]
    r = follow_changes(spark, t, out)
    assert r["noop"] and r["epoch"] == 0
    assert len(window_dirs(out)) == 1


def test_crash_before_cursor_swap_retries_same_window(spark, tmp_path):
    """Roll the cursor back by hand (≡ crash after the window write,
    before the swap): the retry overwrites the SAME directory and the
    feed delivers each change exactly once."""
    tbl, out = str(tmp_path / "t"), str(tmp_path / "feed")
    t = HashMergeTable.create(spark, tbl, SCHEMA, n_buckets=2)
    t.merge(_src(spark, [("r", "a", "a0", 0, "I")]), epoch=0)
    follow_changes(spark, t, out)
    t.merge(_src(spark, [("r", "a", "a1", 1, "U")]), epoch=1)
    r = follow_changes(spark, t, out)
    cur_before = read_cursor(out)
    # simulate the crash: cursor back to epoch 0, window dir already there
    with open(os.path.join(out, "CURSOR"), "w") as f:
        json.dump({"epoch": 0, "version": 1, "windows": 1}, f)
    r2 = follow_changes(spark, t, out)
    assert r2["window"] == r["window"]
    assert len(window_dirs(out)) == 2  # replaced, not duplicated
    assert read_cursor(out)["epoch"] == cur_before["epoch"]
    state = _replay_windows(spark, out)
    assert state == {("r", "a"): ("a1", 1)}


def test_vacuumed_cursor_fails_loudly(spark, tmp_path):
    tbl, out = str(tmp_path / "t"), str(tmp_path / "feed")
    t = HashMergeTable.create(spark, tbl, SCHEMA, n_buckets=2)
    t.merge(_src(spark, [("r", "a", "a0", 0, "I")]), epoch=0)
    follow_changes(spark, t, out)
    for e in range(1, 5):
        t.merge(_src(spark, [("r", "a", f"a{e}", e, "U")]), epoch=e)
    t.vacuum(keep_snapshots=1)  # the epoch-0 snapshot is gone
    with pytest.raises(ValueError, match="vacuum|expired"):
        follow_changes(spark, t, out)


def test_feed_spans_schema_evolution(spark, tmp_path):
    """Windows written after an evolution carry the evolved schema; the
    replay still reconstructs the table (consumers read by name)."""
    tbl, out = str(tmp_path / "t"), str(tmp_path / "feed")
    t = HashMergeTable.create(spark, tbl, SCHEMA, n_buckets=2)
    t.merge(_src(spark, [("r", "a", "a0", 0, "I")]), epoch=0)
    follow_changes(spark, t, out)
    wide = T.StructType(list(SCHEMA.fields) + [T.StructField("stars", T.LongType(), True)])
    t.evolve_schema(wide)
    t.merge(
        spark.createDataFrame(
            [("r", "b", "b0", 1, 5, "I")],
            T.StructType(list(wide.fields) + [T.StructField("op", T.StringType(), False)]),
        ),
        epoch=1,
    )
    r = follow_changes(spark, t, out)
    w = spark.read.parquet(r["window"])
    assert "stars" in w.columns
    assert {(x["repo"], x["path"], x["stars"]) for x in w.collect()} == {("r", "b", 5)}


def test_follow_cli(spark, tmp_path):
    from read_comp_data_pipeline_spark.__main__ import main

    tbl, out = str(tmp_path / "t"), str(tmp_path / "feed")
    t = HashMergeTable.create(spark, tbl, SCHEMA, n_buckets=2)
    t.merge(_src(spark, [("r", "a", "a0", 0, "I")]), epoch=0)
    assert main(["follow", "--table", tbl, "--out", out]) == 0
    assert read_cursor(out)["epoch"] == 0


def _digest(t):
    return sorted(
        (r["repo"], r["path"], r["content"], r["seq"]) for r in
        t.read().select("repo", "path", "content", "seq").collect()
    )


def test_replicate_feed_reconstructs_source(spark, tmp_path):
    """The full replication loop — follow (CDC-out) feeding replicate
    (CDC-in): the replica converges to the source exactly, resumes from
    its own epoch watermark, and a re-run is a no-op."""
    from read_comp_data_pipeline_spark.operators.changefeed import replicate_feed

    tbl, out, rep = str(tmp_path / "t"), str(tmp_path / "feed"), str(tmp_path / "rep")
    t = HashMergeTable.create(spark, tbl, SCHEMA, n_buckets=4)
    t.merge(_src(spark, [("r", "a", "a0", 0, "I"), ("r", "b", "b0", 1, "I"),
                         ("s", "c", "c0", 2, "I")]), epoch=0)
    follow_changes(spark, t, out)
    r1 = replicate_feed(spark, out, rep, n_buckets=2)
    assert r1["windows_applied"] == 1 and r1["target_epoch"] == 0
    t.merge(_src(spark, [("r", "a", "a1", 3, "U"), ("r", "b", None, 4, "D"),
                         ("s", "d", "d0", 5, "I")]), epoch=1)
    follow_changes(spark, t, out)
    r2 = replicate_feed(spark, out, rep, n_buckets=2)
    assert r2["windows_applied"] == 1 and r2["windows_skipped"] == 1
    replica = HashMergeTable(spark, rep)
    assert _digest(replica) == _digest(t)
    # idempotent re-run: everything already applied
    r3 = replicate_feed(spark, out, rep)
    assert r3["windows_applied"] == 0 and r3["windows_skipped"] == 2
    assert _digest(HashMergeTable(spark, rep)) == _digest(t)


def test_replicate_feed_across_evolution(spark, tmp_path):
    from read_comp_data_pipeline_spark.operators.changefeed import replicate_feed

    tbl, out, rep = str(tmp_path / "t"), str(tmp_path / "feed"), str(tmp_path / "rep")
    t = HashMergeTable.create(spark, tbl, SCHEMA, n_buckets=2)
    t.merge(_src(spark, [("r", "a", "a0", 0, "I")]), epoch=0)
    follow_changes(spark, t, out)
    wide = T.StructType(list(SCHEMA.fields) + [T.StructField("stars", T.LongType(), True)])
    t.evolve_schema(wide)
    t.merge(
        spark.createDataFrame(
            [("r", "b", "b0", 1, 7, "I")],
            T.StructType(list(wide.fields) + [T.StructField("op", T.StringType(), False)]),
        ),
        epoch=1,
    )
    follow_changes(spark, t, out)
    replicate_feed(spark, out, rep, n_buckets=2)
    replica = HashMergeTable(spark, rep)
    assert "stars" in [f.name for f in replica.schema.fields]
    got = {(r["repo"], r["path"], r["stars"]) for r in replica.read().collect()}
    assert got == {("r", "a", None), ("r", "b", 7)}


def test_replicate_cli(spark, tmp_path):
    from read_comp_data_pipeline_spark.__main__ import main

    tbl, out, rep = str(tmp_path / "t"), str(tmp_path / "feed"), str(tmp_path / "rep")
    t = HashMergeTable.create(spark, tbl, SCHEMA, n_buckets=2)
    t.merge(_src(spark, [("r", "a", "a0", 0, "I")]), epoch=0)
    assert main(["follow", "--table", tbl, "--out", out]) == 0
    assert main(["replicate", "--feed", out, "--table", rep, "--buckets", "2"]) == 0
    assert HashMergeTable(spark, rep).read().count() == 1


def test_empty_change_window_flows_through(spark, tmp_path):
    """An epoch that commits but nets no changes (delete of an absent key)
    still produces a window — empty but schema-carrying — and the replica
    advances its watermark through it."""
    from read_comp_data_pipeline_spark.operators.changefeed import replicate_feed

    tbl, out, rep = str(tmp_path / "t"), str(tmp_path / "feed"), str(tmp_path / "rep")
    t = HashMergeTable.create(spark, tbl, SCHEMA, n_buckets=2)
    t.merge(_src(spark, [("r", "a", "a0", 0, "I")]), epoch=0)
    follow_changes(spark, t, out)
    t.merge(_src(spark, [("r", "zzz", None, 1, "D")]), epoch=1)
    r = follow_changes(spark, t, out)
    assert not r["noop"] and r["changes"] == 0
    res = replicate_feed(spark, out, rep, n_buckets=2)
    assert res["windows_applied"] == 2
    replica = HashMergeTable(spark, rep)
    assert replica.last_epoch == 1 and replica.read().count() == 1


def test_crash_then_more_commits_supersedes_orphan_window(spark, tmp_path):
    """Crash between window write and cursor swap, then NEW source commits
    before the retry: the crashed attempt's window (same lo, smaller hi)
    must be superseded, not left to overlap — an insert-then-delete inside
    the orphan's range would otherwise resurrect in the replica."""
    from read_comp_data_pipeline_spark.operators.changefeed import replicate_feed

    tbl, out, rep = str(tmp_path / "t"), str(tmp_path / "feed"), str(tmp_path / "rep")
    t = HashMergeTable.create(spark, tbl, SCHEMA, n_buckets=2)
    t.merge(_src(spark, [("r", "a", "a0", 0, "I")]), epoch=0)
    follow_changes(spark, t, out)
    # epoch 1 inserts x; the follow crashes AFTER the window write (cursor
    # still at 0); epoch 2 then deletes x before the retry
    t.merge(_src(spark, [("r", "x", "x0", 1, "I")]), epoch=1)
    r_crashed = follow_changes(spark, t, out)
    with open(os.path.join(out, "CURSOR"), "w") as f:
        json.dump({"epoch": 0, "version": 1, "windows": 1}, f)
    t.merge(_src(spark, [("r", "x", None, 2, "D")]), epoch=2)
    r_retry = follow_changes(spark, t, out)
    assert r_retry["to_epoch"] == 2
    assert not os.path.exists(r_crashed["window"])  # orphan superseded
    names = [os.path.basename(w) for w in window_dirs(out)]
    assert names == ["e0000000000-0000000000", "e0000000001-0000000002"]
    replicate_feed(spark, out, rep, n_buckets=2)
    got = {(r["repo"], r["path"]) for r in
           HashMergeTable(spark, rep).read().collect()}
    assert got == {("r", "a")}  # x never resurrects


def test_rollback_below_cursor_fails_loudly(spark, tmp_path):
    """Both rollback shapes must refuse, not silently mis-deliver: the
    source sitting BELOW the cursor, and the source rolled back then
    REPLAYED past the cursor (same epoch, new timeline)."""
    tbl, out = str(tmp_path / "t"), str(tmp_path / "feed")
    t = HashMergeTable.create(spark, tbl, SCHEMA, n_buckets=2)
    for e in range(3):
        t.merge(_src(spark, [("r", "a", f"a{e}", e, "U" if e else "I")]), epoch=e)
    follow_changes(spark, t, out)  # cursor at epoch 2
    t.rollback(epoch=0)
    with pytest.raises(ValueError, match="rolled back"):
        follow_changes(spark, t, out)  # source now below the cursor
    # replay PAST the cursor on the new timeline: epoch matches, timeline not
    for e in range(1, 4):
        t.merge(_src(spark, [("r", "a", f"b{e}", 10 + e, "U")]), epoch=e)
    assert t.last_epoch == 3  # past the cursor's epoch 2
    with pytest.raises(ValueError, match="rolled back below the cursor"):
        follow_changes(spark, t, out)
