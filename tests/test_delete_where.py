"""Row-level DELETE FROM … WHERE — a maintenance commit that never
consumes a WAL epoch number, plus its interplay with the WAL epoch
stream, time travel, and the follow feed (the deletion rides out in the
NEXT epoch's window, via the feed's exact-version diff base)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from read_comp_data_pipeline_spark.operators.changefeed import (
    follow_changes,
    replicate_feed,
)
from read_comp_data_pipeline_spark.operators.merge import HashMergeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("flag", T.BooleanType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _src(spark, rows):
    return spark.createDataFrame(
        [tuple(r) for r in rows],
        T.StructType(list(SCHEMA.fields) + [T.StructField("op", T.StringType(), False)]),
    )


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_delete_where_semantics(spark, tmp_path, mode):
    t = HashMergeTable.create(spark, str(tmp_path / mode), SCHEMA,
                              n_buckets=4, mode=mode)
    t.merge(_src(spark, [
        ("r", "a", "a0", True, 0, "I"),
        ("r", "b", "b0", False, 1, "I"),
        ("r", "c", "c0", None, 2, "I"),   # NULL predicate: kept
        ("s", "d", "d0", True, 3, "I"),
    ]), epoch=0)
    pre = t._snapshot()
    out = t.delete_where("flag")
    assert out["deleted"] == 2 and out["epoch"] == 0  # epoch NOT consumed
    got = {(r["repo"], r["path"]) for r in t.read().collect()}
    assert got == {("r", "b"), ("r", "c")}
    # time travel before the delete still shows the rows
    assert t.read(at_snapshot=pre).count() == 4
    # idempotent at the predicate level: nothing left to delete
    assert t.delete_where("flag")["deleted"] == 0
    # content_rev advanced exactly once
    assert int(t._snapshot().get("content_rev", 0)) == 1


def test_delete_never_blocks_the_wal_epoch_stream(spark, tmp_path):
    """The WAL's next epoch still applies after a delete — the failure a
    delete-as-epoch design would cause (merge skipping the WAL slice)."""
    t = HashMergeTable.create(spark, str(tmp_path / "t"), SCHEMA, n_buckets=2)
    t.merge(_src(spark, [("r", "a", "a0", True, 0, "I")]), epoch=0)
    t.delete_where("flag")
    st = t.merge(_src(spark, [("r", "z", "z0", False, 1, "I")]), epoch=1)
    assert not st.get("skipped") and t.last_epoch == 1
    assert {r["path"] for r in t.read().collect()} == {"z"}


def test_mor_delta_cannot_resurrect_deleted_row(spark, tmp_path):
    """Un-compacted MOR deltas fold before the bucket rewrite — otherwise
    an older delta row would reappear at read time."""
    t = HashMergeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                              n_buckets=2, mode="mor")
    t.merge(_src(spark, [("r", "a", "a0", True, 0, "I")]), epoch=0)
    t.merge(_src(spark, [("r", "a", "a1", True, 1, "U")]), epoch=1)  # delta
    assert t._snapshot().get("deltas")
    assert t.delete_where("flag")["deleted"] == 1
    assert t.read().count() == 0
    assert not t._snapshot().get("deltas")


def test_follow_delivers_delete_with_next_epoch(spark, tmp_path):
    """The feed diffs from the cursor's EXACT version, so a same-epoch
    delete rides out in the next epoch's window and the replica converges;
    a delete alone (no new epoch) is a documented no-op until then."""
    tbl, out, rep = str(tmp_path / "t"), str(tmp_path / "feed"), str(tmp_path / "rep")
    t = HashMergeTable.create(spark, tbl, SCHEMA, n_buckets=2)
    t.merge(_src(spark, [("r", "a", "a0", True, 0, "I"),
                         ("r", "b", "b0", False, 1, "I")]), epoch=0)
    follow_changes(spark, t, out)
    t.delete_where("flag")  # epoch still 0
    assert follow_changes(spark, t, out)["noop"]  # delivered with the NEXT epoch
    t.merge(_src(spark, [("r", "c", "c0", False, 2, "I")]), epoch=1)
    r = follow_changes(spark, t, out)
    w = spark.read.parquet(r["window"])
    got = {(x["path"], x["_change_type"]) for x in w.collect()}
    assert got == {("a", "delete"), ("c", "insert")}
    replicate_feed(spark, out, rep, n_buckets=2)
    rep_rows = {x["path"] for x in HashMergeTable(spark, rep).read().collect()}
    assert rep_rows == {"b", "c"}


def test_follow_raises_when_delete_preimage_is_vacuumed(spark, tmp_path):
    """If the cursor's exact snapshot is vacuumed AND a delete landed in
    between, the epoch-level fallback would skip the deletion — the feed
    must refuse instead (content_rev mismatch)."""
    tbl, out = str(tmp_path / "t"), str(tmp_path / "feed")
    t = HashMergeTable.create(spark, tbl, SCHEMA, n_buckets=2)
    t.merge(_src(spark, [("r", "a", "a0", True, 0, "I"),
                         ("r", "b", "b0", False, 1, "I")]), epoch=0)
    follow_changes(spark, t, out)
    t.delete_where("flag")
    t.merge(_src(spark, [("r", "c", "c0", False, 2, "I")]), epoch=1)
    # keep 2: the POST-delete epoch-0 snapshot survives, the cursor's
    # pre-delete one does not — the epoch-level fallback finds a same-epoch
    # snapshot whose content differs, which only content_rev can detect
    t.vacuum(keep_snapshots=2)
    with pytest.raises(ValueError, match="vacuumed past a row-level delete"):
        follow_changes(spark, t, out)


def test_content_preserving_maintenance_fallback_still_works(spark, tmp_path):
    """Vacuuming the cursor's exact version is fine when only
    content-preserving maintenance happened (content_rev unchanged)."""
    tbl, out = str(tmp_path / "t"), str(tmp_path / "feed")
    t = HashMergeTable.create(spark, tbl, SCHEMA, n_buckets=2, mode="mor")
    t.merge(_src(spark, [("r", "a", "a0", True, 0, "I")]), epoch=0)
    follow_changes(spark, t, out)
    t.compact_table()  # same epoch, version+1, content identical
    t.merge(_src(spark, [("r", "b", "b0", False, 1, "I")]), epoch=1)
    # keep 2: the cursor's exact version is vacuumed, but the same-epoch
    # compaction snapshot survives — content_rev/timeline match, so the
    # fallback is safe and the feed continues
    t.vacuum(keep_snapshots=2)
    r = follow_changes(spark, t, out)
    got = {(x["path"], x["_change_type"])
           for x in spark.read.parquet(r["window"]).collect()}
    assert got == {("b", "insert")}


def test_delete_cli(spark, tmp_path):
    from read_comp_data_pipeline_spark.__main__ import main

    tbl = str(tmp_path / "t")
    t = HashMergeTable.create(spark, tbl, SCHEMA, n_buckets=2)
    t.merge(_src(spark, [("r", "a", "a0", True, 0, "I"),
                         ("r", "b", "b0", False, 1, "I")]), epoch=0)
    assert main(["delete", "--table", tbl, "--where", "flag"]) == 0
    assert {r["path"] for r in t.read().collect()} == {"b"}
