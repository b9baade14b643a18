"""Structured Streaming ingest variant.

The batch epoch loop (``ingest.py``) is the deterministic, replayable
form; this module runs the same transform through Spark Structured
Streaming — ``readStream`` over the WAL directory → ``foreachBatch`` →
the same compaction/extraction/MERGE — with ``Trigger.AvailableNow`` for
bounded runs. Exactly-once is double-layered: the streaming checkpoint
prevents re-reading files, and the table's idempotent (partition, epoch)
manifest makes a replayed batch a no-op anyway (so losing the checkpoint
directory is harmless — the reference's crash-loses-an-hour failure mode,
``search_scrape.py:316-321``, cannot recur).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from read_comp_data_pipeline_spark.operators.compact import compact_latest
from read_comp_data_pipeline_spark.operators.merge import HashMergeTable
from read_comp_data_pipeline_spark.schemas import TARGET_SCHEMA, WAL_SCHEMA
from read_comp_data_pipeline_spark.streaming.evolve import ensure_evolved
from read_comp_data_pipeline_spark.streaming.ingest import prepare_target_rows


def stream_ingest(
    spark: SparkSession,
    wal_path: str,
    table_path: str,
    checkpoint_path: str,
    n_buckets: int = 16,
    mode: str = "mor",
    max_files_per_trigger: int | None = None,
) -> None:
    """Run the WAL through Structured Streaming until no data remains
    (AvailableNow), applying each micro-batch as one MERGE epoch."""
    if not HashMergeTable.exists(table_path):
        HashMergeTable.create(spark, table_path, TARGET_SCHEMA, n_buckets=n_buckets, mode=mode)
    table = HashMergeTable(spark, table_path)

    reader = spark.readStream.schema(WAL_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(wal_path)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # batch_id is the streaming epoch: monotonically increasing and
        # replayed with identical contents after a crash → maps directly
        # onto the manifest's idempotency key.
        ensure_evolved(table, batch_df.schema)
        src = prepare_target_rows(compact_latest(batch_df))
        table.merge(src, int(batch_id))

    (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", os.path.join(checkpoint_path, "cp"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
