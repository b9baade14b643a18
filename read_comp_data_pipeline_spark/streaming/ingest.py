"""The ingest loop: WAL epoch slices → compact → extract → evolve → MERGE.

This is the engine's replacement for the reference's main crawl loop
(``/root/reference/search_scrape.py:932-1366``): pop-one-URL becomes a
bounded epoch read, the seen-set check becomes the MERGE key match, the
per-page extraction becomes a vectorized UDF over the whole batch, and the
hourly checkpoint (``:316-321``) becomes an atomic per-epoch snapshot
commit — so kill-and-resume replays converge to the identical final table
(north_rule; tests/test_ingest.py).

Deliberate dataflow shape (SURVEY §4): compaction runs BEFORE the
extraction UDF — Catalyst cannot push a filter through an opaque UDF, so
the engine discards superseded events first and parses only the ≤1
surviving row per key.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from read_comp_data_pipeline_spark.functions.extract import (
    content_sha_expr,
    scan_sections_udf,
    title_expr,
)
from read_comp_data_pipeline_spark.operators.compact import compact_latest
from read_comp_data_pipeline_spark.operators.merge import HashMergeTable
from read_comp_data_pipeline_spark.schemas import TARGET_SCHEMA
from read_comp_data_pipeline_spark.sources import wal as wal_src
from read_comp_data_pipeline_spark.streaming.evolve import ensure_evolved


def prepare_target_rows(slice_df: DataFrame) -> DataFrame:
    """Transform a compacted WAL slice into target-table rows.

    Extraction fields (title/heading/text) mirror the reference's output
    contract: ``heading`` keeps the ``" - "``-joined breadcrumb encoding the
    downstream consumer splits on (``query_gpt.py:52,:59``; SURVEY §3 EP3).
    Deletes pass through untouched (op column drives the MERGE arm).
    """
    is_del = F.col("op") == "D"
    df = slice_df.withColumn(
        "title", F.when(is_del, F.lit(None)).otherwise(title_expr(F.col("content"), F.col("path")))
    )
    first = F.element_at(scan_sections_udf(F.col("title"), F.col("content")), 1)
    df = (
        df.withColumn("_s1", F.when(~is_del, first))
        .withColumn("heading", F.col("_s1.heading"))
        .withColumn("text", F.col("_s1.text"))
        .drop("_s1")
        .withColumn("content_sha", F.when(is_del, F.lit(None)).otherwise(content_sha_expr(F.col("content"))))
    )
    return df


@dataclass
class IngestStats:
    epochs_applied: int = 0
    epochs_skipped: int = 0
    events_applied: int = 0
    secs: float = 0.0
    per_epoch: list[dict] = field(default_factory=list)

    @property
    def events_per_sec(self) -> float:
        return self.events_applied / self.secs if self.secs > 0 else 0.0


def run_ingest(
    spark: SparkSession,
    wal_path: str,
    table_path: str,
    n_buckets: int = 16,
    max_epoch: int | None = None,
    fail_after_epoch: int | None = None,
    extract: bool = True,
    mode: str = "cow",
    compact_every: int = 10,
) -> IngestStats:
    """Tail the WAL from the last committed epoch to ``max_epoch``.

    Resumable and idempotent: the table's snapshot records the last
    committed epoch; already-committed epochs are skipped (exactly-once).
    ``fail_after_epoch`` injects a crash for the kill-and-resume tests.

    ``mode='mor'`` appends per-epoch deltas (write-optimized hot path) and
    folds them into the base every ``compact_every`` epochs.
    """
    if not HashMergeTable.exists(table_path):
        HashMergeTable.create(spark, table_path, TARGET_SCHEMA, n_buckets=n_buckets, mode=mode)
    table = HashMergeTable(spark, table_path)

    hi_epoch = wal_src.max_epoch(spark, wal_path) if max_epoch is None else max_epoch
    stats = IngestStats()
    t0 = time.monotonic()

    for epoch in range(table.last_epoch + 1, hi_epoch + 1):
        slice_df = wal_src.read_epoch(spark, wal_path, epoch)

        # transactional schema evolution BEFORE the wave that needs it
        ensure_evolved(table, slice_df.schema)

        compacted = compact_latest(slice_df)  # ≤1 row per key, skew-immune
        src = prepare_target_rows(compacted) if extract else compacted

        # cheap metadata pass over the pruned slice (key columns only, no
        # UDF lineage): seq range, event count, affected-bucket hint — lets
        # the MERGE itself run as a single Spark action.
        from read_comp_data_pipeline_spark.operators.merge import bucket_expr

        rng = slice_df.agg(
            F.min("seq").alias("lo"), F.max("seq").alias("hi"), F.count("*").alias("cnt")
        ).first()
        affected = None
        if mode == "cow":
            affected = [
                int(r["_b"])
                for r in slice_df.select(
                    bucket_expr(table.n_buckets).alias("_b")
                ).distinct().collect()
            ]
        res = table.merge(
            src, epoch,
            src_seq_lo=None if rng["lo"] is None else int(rng["lo"]),
            src_seq_hi=None if rng["hi"] is None else int(rng["hi"]),
            affected_buckets=affected,
            src_rows=int(rng["cnt"]),
        )
        if res.get("skipped"):
            stats.epochs_skipped += 1
        else:
            stats.epochs_applied += 1
            stats.events_applied += res["rows_applied"]
            stats.per_epoch.append(res)
            if mode == "mor" and compact_every and (epoch + 1) % compact_every == 0:
                table.compact_table()
        if fail_after_epoch is not None and epoch >= fail_after_epoch:
            raise RuntimeError(f"injected failure after epoch {epoch}")

    stats.secs = time.monotonic() - t0
    return stats
