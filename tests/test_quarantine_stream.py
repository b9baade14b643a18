"""Quarantine (dead-letter) handling + Structured Streaming ingest variant."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from read_comp_data_pipeline_spark.operators.merge import HashMergeTable
from read_comp_data_pipeline_spark.schemas import WAL_SCHEMA
from read_comp_data_pipeline_spark.sources.wal import (
    expected_final_state,
    generate_change_events,
    write_wal,
)
from read_comp_data_pipeline_spark.streaming.ingest import (
    read_quarantine,
    run_ingest,
)
from read_comp_data_pipeline_spark.streaming.stream import stream_ingest


def _ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


def test_quarantine_bad_rows(spark, tmp_path):
    rows = [
        # good lifecycle for k1
        (0, 0, _ts(0), "I", "r1", "k1", "c0", "py", "hello one"),
        (1, 0, _ts(1), "U", "r1", "k1", "c1", "py", "hello two"),
        # invalid op
        (2, 0, _ts(2), "X", "r1", "k2", "c2", "py", "bad op row"),
        # upsert with null content
        (3, 0, _ts(3), "U", "r1", "k1", "c3", "py", None),
        # good insert for k3
        (4, 1, _ts(4), "I", "r1", "k3", "c4", "py", "three"),
        # null key
        (5, 1, _ts(5), "I", None, "k4", "c5", "py", "no repo"),
    ]
    wal_path = str(tmp_path / "wal")
    from pyspark.sql import types as T

    nullable = T.StructType([T.StructField(f.name, f.dataType, True) for f in WAL_SCHEMA.fields])
    spark.createDataFrame(rows, nullable).write.partitionBy("epoch").parquet(wal_path)

    tbl_path = str(tmp_path / "t")
    run_ingest(spark, wal_path, tbl_path, n_buckets=2, quarantine=True)
    final = HashMergeTable(spark, tbl_path).read()

    got = {(r["repo"], r["path"]): r["content"] for r in final.collect()}
    # bad rows never applied: k1 keeps seq=1 content, k2/k4 absent
    assert got == {("r1", "k1"): "hello two", ("r1", "k3"): "three"}

    q = read_quarantine(spark, tbl_path)
    qrows = {(r["seq"], r["error"]) for r in q.collect()}
    assert qrows == {
        (2, "invalid op"),
        (3, "null content for upsert"),
        (5, "null key"),
    }


def test_stream_ingest_matches_batch(spark, tmp_path):
    wal_path = str(tmp_path / "wal")
    write_wal(
        generate_change_events(spark, 1500, n_keys=150, epoch_size=500), wal_path
    )
    batch_tbl = str(tmp_path / "batch")
    run_ingest(spark, wal_path, batch_tbl, n_buckets=4, mode="mor")

    stream_tbl = str(tmp_path / "stream")
    stream_ingest(
        spark, wal_path, stream_tbl, checkpoint_path=str(tmp_path / "ckpt"),
        n_buckets=4, mode="mor", max_files_per_trigger=4,
    )
    a = HashMergeTable(spark, batch_tbl).read()
    b = HashMergeTable(spark, stream_tbl).read()
    wal = spark.read.parquet(wal_path)
    expected = expected_final_state(wal)

    def dig(df):
        return (
            df.select(F.xxhash64("repo", "path", "content_sha"
                                 if "content_sha" in df.columns else "content").alias("h"))
            .agg(F.sum(F.col("h").cast("decimal(38,0)")).alias("d"),
                 F.count("*").alias("n"))
            .first()
        )

    assert a.count() == b.count() == expected.count()
    assert dig(a) == dig(b)
    # resume: rerunning the stream with the same checkpoint is a no-op
    v_before = HashMergeTable(spark, stream_tbl)._snapshot()["version"]
    stream_ingest(
        spark, wal_path, stream_tbl, checkpoint_path=str(tmp_path / "ckpt"),
        n_buckets=4, mode="mor",
    )
    assert HashMergeTable(spark, stream_tbl)._snapshot()["version"] == v_before
