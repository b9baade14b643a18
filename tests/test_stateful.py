"""Custom stateful streaming operators: first-seen (applyInPandasWithState)
and watermarked windowed counts, verified against batch equivalents."""

from __future__ import annotations

from pyspark.sql import functions as F

from read_comp_data_pipeline_spark.schemas import WAL_SCHEMA
from read_comp_data_pipeline_spark.sources.wal import generate_change_events, write_wal
from read_comp_data_pipeline_spark.streaming.stateful import (
    first_seen_keys,
    windowed_event_counts,
)


def _wal_stream(spark, wal_path, files_per_trigger=3):
    return (
        spark.readStream.schema(WAL_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(wal_path)
    )


def test_first_seen_keys_emits_each_key_once(spark, tmp_path):
    wal_path = str(tmp_path / "wal")
    write_wal(generate_change_events(spark, 1200, n_keys=120, epoch_size=400), wal_path)

    out = first_seen_keys(_wal_stream(spark, wal_path))
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM first_seen_t")

    wal = spark.read.parquet(wal_path)
    expected = wal.groupBy("repo", "path").agg(F.min("seq").alias("first_seq"))
    assert got.count() == expected.count()  # exactly once per key
    assert got.select("repo", "path").distinct().count() == got.count()
    # first_seq matches the batch min *within the micro-batch where the key
    # first appeared* — with file-ordered micro-batches over an
    # epoch-partitioned WAL, that is the global min
    j = got.join(expected.withColumnRenamed("first_seq", "exp"), on=["repo", "path"])
    assert j.where(F.col("first_seq") != F.col("exp")).count() == 0


def test_windowed_counts_match_batch(spark, tmp_path):
    wal_path = str(tmp_path / "wal")
    write_wal(generate_change_events(spark, 2000, n_keys=200, epoch_size=1000), wal_path)

    stream = _wal_stream(spark, wal_path, files_per_trigger=10)
    q = (
        windowed_event_counts(stream, window="5 minutes", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("win_counts_t")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM win_counts_t")

    wal = spark.read.parquet(wal_path)
    exp = (
        wal.groupBy(F.window("ts", "5 minutes").alias("w"), "op")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "op", "n_events")
    )
    j = got.join(
        exp.withColumnRenamed("n_events", "exp_n"), on=["window_start", "op"], how="full_outer"
    )
    assert j.where(
        F.col("n_events").isNull()
        | F.col("exp_n").isNull()
        | (F.col("n_events") != F.col("exp_n"))
    ).count() == 0
