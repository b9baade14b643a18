"""Snapshot rollback — recover-and-replay (Iceberg rollback_to_snapshot
analogue). The bad-epoch recovery story the exactly-once contract enables:
roll back past a poisoned commit, fix the WAL, re-ingest; epoch-keyed
idempotence replays everything above the rolled-back watermark and the
table converges to the state a clean one-shot run would have produced.

Reference analogue: the crawler's restart-from-seen-set loop
(/root/reference/search_scrape.py:330) re-visits pages after a crash and
converges; rollback is the table-side generalization (rewind + replay)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from read_comp_data_pipeline_spark.operators.merge import HashMergeTable
from read_comp_data_pipeline_spark.schemas import WAL_SCHEMA
from read_comp_data_pipeline_spark.streaming.ingest import run_ingest


def _ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


def _wal(spark, path, n_epochs=4, per_epoch=3):
    rows = [
        (i, i // per_epoch, _ts(i), "U" if i % 3 else "I",
         "r", f"k{i % 5}", f"c{i}", "py", f"v{i}")
        for i in range(n_epochs * per_epoch)
    ]
    nullable = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in WAL_SCHEMA.fields]
    )
    spark.createDataFrame(rows, nullable).write.partitionBy("epoch").parquet(path)


def _state(table, at=None):
    return sorted(map(tuple, table.read(at_snapshot=at).collect()))


@pytest.fixture(params=["cow", "mor"])
def setup(spark, tmp_path, request):
    wal = str(tmp_path / "wal")
    tbl = str(tmp_path / "t")
    _wal(spark, wal)
    run_ingest(spark, wal, tbl, n_buckets=2, mode=request.param)
    return wal, HashMergeTable(spark, tbl)


def test_rollback_restores_earlier_state(setup):
    _, t = setup
    want = _state(t, at=t.snapshot_at_epoch(1))
    res = t.rollback(epoch=1)
    assert res["noop"] is False and res["epoch"] == 1
    assert t.last_epoch == 1
    assert _state(t) == want
    # the rollback is itself a new committed version, not a pointer rewind
    assert t._snapshot()["version"] == res["version"] > res["rollback_of"]


def test_rollback_then_replay_converges(setup, spark):
    wal, t = setup
    final = _state(t)
    seq_hi = t.last_seq_hi
    t.rollback(epoch=1)
    assert t.last_seq_hi < seq_hi  # idempotency watermark rewound too
    st = run_ingest(spark, wal, t.path, n_buckets=2)
    assert st.epochs_applied == 2  # exactly the rolled-back epochs replay
    assert _state(t) == final
    assert t.last_seq_hi == seq_hi
    # lineage converges with the data: one manifest row set per epoch
    rows = t.manifest().groupBy("epoch", "partition").count().collect()
    assert all(r["count"] == 1 for r in rows)
    assert {r["epoch"] for r in rows} == {0, 1, 2, 3}


def test_rollback_retires_superseded_snapshots(setup):
    _, t = setup
    target_v = t.snapshot_at_epoch(1)["version"]
    res = t.rollback(epoch=1)
    versions = [s["version"] for s in t.snapshots()]
    # nothing between the target and the new commit survives: a replay
    # overwrites the abandoned timeline's epoch dirs, so keeping those
    # snapshots would leave time travel pointing at mutating data
    assert res["snapshots_retired"] > 0
    assert [v for v in versions if target_v < v < res["version"]] == []
    # target-era time travel still works
    assert _state(t, at=t.snapshot_at_epoch(0))
    # vacuum after rollback keeps everything the new current references
    t.vacuum(keep_snapshots=1)
    assert _state(t)


def test_rollback_refuses_to_retire_tagged_snapshot(setup):
    _, t = setup
    t.set_tag("release")  # pins the CURRENT (latest) snapshot
    with pytest.raises(ValueError, match="release"):
        t.rollback(epoch=1)
    t.drop_tag("release")
    assert t.rollback(epoch=1)["epoch"] == 1


def test_rollback_selector_validation_and_noop(setup):
    _, t = setup
    with pytest.raises(ValueError, match="exactly one"):
        t.rollback()
    with pytest.raises(ValueError, match="exactly one"):
        t.rollback(epoch=1, version=0)
    with pytest.raises(ValueError, match="no retained snapshot"):
        t.rollback(version=10_000)
    cur = t._snapshot()["version"]
    assert t.rollback(version=cur) == {
        "noop": True, "version": cur, "epoch": t.last_epoch,
    }
    # tag + version selectors resolve like the epoch one
    mid = t.snapshot_at_epoch(2)
    t.set_tag("mid", version=mid["version"])
    want = _state(t, at=mid)
    t.rollback(tag="mid")
    assert _state(t) == want


def test_rollback_after_sidecar_compaction(setup, spark):
    """Lineage rows above the target epoch disappear even when they were
    already folded into consolidated segments, and replay re-records them
    exactly once (the watermark interplay the rewrite exists for)."""
    wal, t = setup
    t.compact_sidecars()
    t.rollback(epoch=1)
    assert {r["epoch"] for r in t.manifest().select("epoch").collect()} == {0, 1}
    run_ingest(spark, wal, t.path, n_buckets=2)
    rows = t.manifest().groupBy("epoch", "partition").count().collect()
    assert all(r["count"] == 1 for r in rows)
    assert {r["epoch"] for r in rows} == {0, 1, 2, 3}
    # and the folded-away segments are swept, not leaked
    t.compact_sidecars()
    assert {r["epoch"] for r in t.manifest().select("epoch").collect()} == {0, 1, 2, 3}


def test_rollback_divergent_replay_wins(setup, spark, tmp_path):
    """The actual recovery scenario: the tail of the WAL was poisoned —
    roll back, replay a FIXED tail, and the table reflects only the fix."""
    wal, t = setup
    t.rollback(epoch=1)
    fixed = str(tmp_path / "wal_fixed")
    # fixed tail: same epochs 2-3, different content
    rows = [
        (i, i // 3, _ts(i), "U", "r", f"k{i % 5}", f"FIX{i}", "py", f"fixed{i}")
        for i in range(6, 12)
    ]
    nullable = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in WAL_SCHEMA.fields]
    )
    spark.createDataFrame(rows, nullable).write.partitionBy("epoch").parquet(fixed)
    run_ingest(spark, fixed, t.path, n_buckets=2)
    contents = {r["content"] for r in t.read().select("content").collect()}
    assert any(c.startswith("fixed") for c in contents)
    # keys last touched by the poisoned tail now carry the fixed values
    assert t.last_epoch == 3
