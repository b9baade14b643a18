"""Snapshot tags — named time travel pins that survive vacuum (the
Iceberg-tags analogue): the reproducibility handle for "which exact table
state built corpus train-v3"."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from read_comp_data_pipeline_spark.operators.merge import HashMergeTable
from read_comp_data_pipeline_spark.schemas import TARGET_SCHEMA, WAL_SCHEMA
from read_comp_data_pipeline_spark.streaming.ingest import run_ingest


def _ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


def _wal(spark, path, n_epochs=4):
    rows = [
        (i, i // 2, _ts(i), "U" if i % 2 else "I", "r", f"k{i % 5}", "c", "py", f"v{i}")
        for i in range(n_epochs * 2)
    ]
    nullable = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in WAL_SCHEMA.fields]
    )
    spark.createDataFrame(rows, nullable).write.partitionBy("epoch").parquet(path)


@pytest.fixture()
def table(spark, tmp_path):
    _wal(spark, str(tmp_path / "wal"))
    run_ingest(spark, str(tmp_path / "wal"), str(tmp_path / "t"), n_buckets=2)
    return HashMergeTable(spark, str(tmp_path / "t"))


def test_tag_resolves_same_rows_as_time_travel(table, spark, tmp_path):
    mid = table.snapshot_at_epoch(1)
    table.set_tag("train-v3", version=mid["version"])
    by_tag = table.snapshot_by_tag("train-v3")
    assert by_tag["version"] == mid["version"]
    a = sorted(map(tuple, table.read(at_snapshot=by_tag).collect()))
    b = sorted(map(tuple, table.read(at_snapshot=mid).collect()))
    assert a == b and a


def test_tagged_snapshot_and_data_survive_vacuum(table):
    mid = table.snapshot_at_epoch(1)
    table.set_tag("pinned", version=mid["version"])
    res = table.vacuum(keep_snapshots=1)
    assert res["removed_snapshots"] > 0  # untagged history expired
    # the pinned state still fully reads (data dirs retained)
    again = table.read(at_snapshot=table.snapshot_by_tag("pinned")).collect()
    assert again
    # current state untouched
    assert table.read().count() > 0


def test_drop_tag_releases_snapshot_to_vacuum(table):
    mid = table.snapshot_at_epoch(1)
    table.set_tag("tmp", version=mid["version"])
    table.vacuum(keep_snapshots=1)
    table.drop_tag("tmp")
    table.vacuum(keep_snapshots=1)
    with pytest.raises(KeyError):
        table.snapshot_by_tag("tmp")
    with pytest.raises(ValueError, match="no retained snapshot"):
        table.snapshot_at_epoch(0)  # history truly gone now


def test_tag_current_by_default_and_validation(table):
    table.set_tag("head")
    assert table.tags()["head"] == table._snapshot()["version"]
    with pytest.raises(ValueError, match="no retained snapshot with version"):
        table.set_tag("bogus", version=10_000)
    with pytest.raises(KeyError):
        table.drop_tag("never-set")


def test_export_cli_tagged_snapshot_reproducible(spark, tmp_path):
    """export --tag writes the PINNED state even after later epochs and
    vacuum — the reproducible 'which exact state built train-v3' path."""
    from read_comp_data_pipeline_spark.__main__ import main

    schema = T.StructType([
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
    ])

    def src(rows):
        return spark.createDataFrame(
            rows,
            T.StructType(list(schema.fields) + [T.StructField("op", T.StringType(), False)]),
        )

    tbl = str(tmp_path / "t2")
    t = HashMergeTable.create(spark, tbl, schema, n_buckets=2)
    t.merge(src([("r", "a", "a0", 0, "I"), ("r", "b", "b0", 1, "I")]), epoch=0)
    t.set_tag("train-v3")
    for e in range(1, 4):
        t.merge(src([("r", "a", f"a{e}", e, "U")]), epoch=e)
    t.vacuum(keep_snapshots=1)
    out = str(tmp_path / "corpus")
    assert main(["export", "--table", tbl, "--tag", "train-v3", "--out", out]) == 0
    got = {(r["repo"], r["path"], r["content"])
           for r in spark.read.parquet(out).collect()}
    assert got == {("r", "a", "a0"), ("r", "b", "b0")}
    # current-state export sees the latest epoch
    out2 = str(tmp_path / "cur")
    assert main(["export", "--table", tbl, "--out", out2]) == 0
    got2 = {(r["repo"], r["path"], r["content"])
            for r in spark.read.parquet(out2).collect()}
    assert got2 == {("r", "a", "a3"), ("r", "b", "b0")}
