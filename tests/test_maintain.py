"""Policy-driven maintenance (`maintain`): each move runs only when its
metadata signal crosses its threshold, decisions never scan data rows,
and a second pass right after finds nothing due (idempotence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from read_comp_data_pipeline_spark.operators.merge import HashMergeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _src(spark, n, lo=0):
    return spark.range(lo, lo + n).select(
        F.lit("r").alias("repo"),
        F.concat(F.lit("p"), (F.col("id") % 50).cast("string")).alias("path"),
        F.col("id").alias("v"),
        F.col("id").alias("seq"),
        F.lit("U").alias("op"),
    )


def test_maintain_triggers_each_move_at_its_threshold(spark, tmp_path):
    t = HashMergeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                              n_buckets=2, mode="mor")
    for e in range(6):
        t.merge(_src(spark, 50, lo=e * 50), epoch=e)

    # below every threshold: nothing runs, levels are reported
    r = t.maintain(max_delta_epochs=8, max_loose_sidecars=64, keep_snapshots=25)
    assert r["compact"] == {"due": False, "delta_epochs": 6, "threshold": 8}
    assert r["sidecars"]["due"] is False and r["sidecars"]["loose_files"] > 0
    assert r["vacuum"]["due"] is False

    # tighten the thresholds: all three run
    r = t.maintain(max_delta_epochs=3, max_loose_sidecars=2, keep_snapshots=2)
    assert "due" not in r["compact"] and not r["compact"]["skipped"]
    assert "due" not in r["sidecars"]
    assert "due" not in r["vacuum"]
    assert t.read().count() == 50  # 6 epochs of upserts over 50 keys
    assert len(t._snapshot().get("deltas") or []) == 0

    # idempotent: immediately after, nothing is due at the same thresholds
    r2 = t.maintain(max_delta_epochs=3, max_loose_sidecars=2, keep_snapshots=2)
    assert r2["compact"]["due"] is False and r2["compact"]["delta_epochs"] == 0
    assert r2["sidecars"]["due"] is False
    assert r2["vacuum"]["due"] is False


def test_maintain_cow_never_compacts(spark, tmp_path):
    t = HashMergeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                              n_buckets=2, mode="cow")
    for e in range(3):
        t.merge(_src(spark, 30, lo=e * 30), epoch=e)
    r = t.maintain(max_delta_epochs=0)
    assert r["compact"]["due"] is False and r["compact"]["delta_epochs"] == 0


def test_maintain_cli(spark, tmp_path):
    from read_comp_data_pipeline_spark.__main__ import main

    t = HashMergeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                              n_buckets=2, mode="mor")
    t.merge(_src(spark, 40), epoch=0)
    assert main(["maintain", "--table", t.path, "--max-delta-epochs", "0",
                 "--keep-snapshots", "1"]) == 0
    assert len(t._snapshot().get("deltas") or []) == 0
