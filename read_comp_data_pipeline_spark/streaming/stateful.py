"""Custom stateful streaming operators.

The engine's core state lives in the MERGE table (which is why
kill-and-resume is trivial — SURVEY §2.9), so the ingest path needs no
in-flight operator state. These operators cover the *streaming-native*
side of the inventory:

* ``first_seen_keys`` — the reference's seen-set
  (``search_scrape.py:336-337``: mark-and-skip on first occurrence) as an
  ``applyInPandasWithState`` operator: emits each key exactly once, on
  first arrival, keeping a per-key counter as state. This is the
  streaming form of WHEN-NOT-MATCHED detection (J1).
* ``windowed_event_counts`` — tumbling event-time windows with a
  watermark for late data (the reference's hourly log rotation W3,
  ``search_scrape.py:309-324``, done with real event-time semantics).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FIRST_SEEN_OUTPUT = T.StructType(
    [
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("first_seq", T.LongType(), True),
    ]
)
_STATE = T.StructType(
    [
        T.StructField("events_seen", T.LongType(), True),
    ]
)


def _first_seen_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n = 0
    first_seq: Any = None
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            m = pdf["seq"].min()
            first_seq = m if first_seq is None else min(first_seq, m)
    if state.exists:
        (seen,) = state.get
        state.update((int(seen) + n,))
        return iter(())
    state.update((n,))
    return iter(
        [pd.DataFrame({"repo": [key[0]], "path": [key[1]], "first_seq": [first_seq]})]
    )


def first_seen_keys(stream: DataFrame) -> DataFrame:
    """Streaming new-key detector: one output row per key, on its first
    event; subsequent events only bump the per-key state counter."""
    return (
        stream.groupBy("repo", "path")
        .applyInPandasWithState(
            _first_seen_fn,
            outputStructType=FIRST_SEEN_OUTPUT,
            stateStructType=_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_event_counts(
    stream: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling event-time window counts per op with a late-data watermark
    (state for windows older than the watermark is dropped)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "op")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n_events",
        )
    )
