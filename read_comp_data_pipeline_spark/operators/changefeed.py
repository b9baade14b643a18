"""Resumable changelog export — the table as an incremental SOURCE.

``follow_changes`` turns a :class:`HashMergeTable` into a composable feed
for downstream pipelines (a second ingest, a search indexer, a training-
corpus refresher): each run exports the NET row-level changes since the
last run as one parquet window and advances a cursor, so downstream work
is proportional to what changed, never to table size. Iceberg
incremental-read / Delta CDF-stream analogue, built on the engine's own
``changes_between``.

Exactly-once delivery without a transaction log on the consumer side:

* window directories are DETERMINISTICALLY named by their epoch range
  (``windows/e{lo}-{hi}``) and written with overwrite, so a crash between
  the window write and the cursor swap re-runs into the SAME directory —
  the retry replaces, never duplicates;
* the cursor is a one-file atomic rename (same commit protocol as the
  table's snapshot pointer), recording the (epoch, version) the feed has
  delivered through;
* re-running when current is a no-op (epoch-level skip, like the
  ingest loop).

Loud-over-wrong: if the cursor's snapshot has been vacuumed away or the
source was rolled back below the cursor, the gap is UNRECOVERABLE for a
feed (downstream already consumed the old windows — silently re-
bootstrapping would double-deliver every live row), so the export raises
with instructions instead of guessing. Size vacuum retention to the
follow cadence.

Reference analogue: the crawler's per-page append of newly seen pages to
its output CSV (/root/reference/search_scrape.py:1088-1106) — the "only
what's new" delivery contract, here with deletes and update images.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_CURSOR = "CURSOR"


def read_cursor(out_path: str) -> dict[str, Any] | None:
    p = os.path.join(out_path, _CURSOR)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write_cursor(out_path: str, cursor: dict[str, Any]) -> None:
    tmp = os.path.join(out_path, _CURSOR + ".tmp")
    with open(tmp, "w") as f:
        json.dump(cursor, f)
    os.replace(tmp, os.path.join(out_path, _CURSOR))


def window_dirs(out_path: str) -> list[str]:
    """Exported window directories, delivery order."""
    wdir = os.path.join(out_path, "windows")
    if not os.path.isdir(wdir):
        return []
    return [os.path.join(wdir, n) for n in sorted(os.listdir(wdir))]


def follow_changes(
    spark: SparkSession,
    source,
    out_path: str,
) -> dict[str, Any]:
    """Export the net changes committed since the last run to one new
    parquet window under ``out_path/windows`` and advance the cursor.

    The first run bootstraps: the whole current state is delivered as one
    ``insert`` window (the full scan the incremental path then never
    repeats). Every row carries ``_change_type`` plus the window's
    ``_from_epoch`` / ``_to_epoch`` for consumer bookkeeping. Rows inside
    a window are net-of-window (insert / delete / update before+after
    pairs), and consecutive windows tile the epoch line with no gap or
    overlap — applying them in order reconstructs the table exactly
    (pinned by tests/test_changefeed.py).
    """
    os.makedirs(out_path, exist_ok=True)
    # pin ONE source snapshot for the whole export (watermark + window
    # end + any read) — reading "current" twice would race a concurrent
    # commit and double-deliver its changes next run
    src_snap = source._snapshot()
    to_epoch = int(src_snap["epoch"])
    cursor = read_cursor(out_path)
    from_epoch = int(cursor["epoch"]) if cursor else -1
    if to_epoch <= from_epoch:
        return {"noop": True, "epoch": from_epoch}
    if cursor is not None:
        base = source.snapshot_at_epoch(from_epoch)  # raises if vacuumed
        if int(base.get("epoch", -1)) != from_epoch:
            raise ValueError(
                f"cursor epoch {from_epoch} no longer resolves to a retained "
                f"snapshot (vacuumed, or the source was rolled back below the "
                "cursor). The feed cannot re-bootstrap without double-"
                "delivering — start a NEW feed directory and reset the "
                "consumer, and size vacuum retention to the follow cadence."
            )
        changes = source.changes_between(base, src_snap)
    else:
        changes = source.read(at_snapshot=src_snap).withColumn(
            "_change_type", F.lit("insert")
        )
    win_dir = os.path.join(
        out_path, "windows", f"e{from_epoch + 1:010d}-{to_epoch:010d}"
    )
    (
        changes
        .withColumn("_from_epoch", F.lit(from_epoch).cast("long"))
        .withColumn("_to_epoch", F.lit(to_epoch).cast("long"))
        .write.mode("overwrite").parquet(win_dir)
    )
    n = spark.read.parquet(win_dir).count()
    _write_cursor(out_path, {
        "epoch": to_epoch,
        "version": int(src_snap["version"]),
        "windows": (cursor or {}).get("windows", 0) + 1,
    })
    return {
        "noop": False,
        "from_epoch": from_epoch,
        "to_epoch": to_epoch,
        "changes": int(n),
        "window": win_dir,
    }
