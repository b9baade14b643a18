"""Temporal joins — as-of and banded range joins, Spark-first.

Spark has no native AS-OF or range join; the naive formulations are
inequality (theta) joins that Catalyst can only execute as broadcast
nested loops or cartesian products — quadratic at corpus scale. These
operators re-express them as one equi-shuffle each:

* **as-of join** (:func:`asof_join`): union the probe and reference
  streams, one window pass per key ordered by time (``last(...,
  ignorenulls=True)`` over rows up to the current one), keep probe rows.
  ONE shuffle keyed by the join key; per-key state is a sort, never a
  cross product. This is the streams-as-state formulation every
  warehouse as-of (kdb aj, QuestDB/DuckDB ASOF) compiles to when the
  reference side cannot be broadcast.
* **banded range join** (:func:`range_count_join`): quantize time into
  ``width``-sized buckets, explode each probe over its covering buckets
  (2 for a window ≤ width), equi-join on (key, bucket), filter the exact
  inequality, aggregate. Candidate volume is bounded by bucket
  population — the same banding idea the dedup/ANN family uses for
  similarity, applied to time.

Both have exact DuckDB oracles (DuckDB's native ASOF JOIN / a plain
inequality join — affordable at oracle scale, quadratic at engine scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    ref: DataFrame,
    key_col: str,
    time_col: str,
    payload_cols: list[str],
    strict: bool = True,
) -> DataFrame:
    """For every probe row, attach the reference row with the greatest
    ``time_col`` not after (``strict``: strictly before) the probe's.

    Returns the probe columns plus ``<c>_asof`` for each payload column
    (and ``<time_col>_asof``), NULL when no reference precedes.

    Reference ties on (key, time) must be pre-deduplicated by the caller
    (e.g. ``max_by``) — exactly the determinism DuckDB's ASOF JOIN also
    requires to be well-defined.

    Plan shape: one union, one shuffle on ``key_col``, one within-
    partition sort — no inequality join, no cross product. Skew bounds:
    per-key row counts.
    """
    tag = "_is_probe"
    ref_rows = ref.select(
        F.col(key_col),
        F.col(time_col),
        F.lit(0).alias(tag),
        *[F.col(c).alias(f"{c}_asof") for c in payload_cols],
        F.col(time_col).alias(f"{time_col}_asof"),
        *[F.lit(None).alias(f"_p_{c}") for c in probe.columns],
    )
    probe_rows = probe.select(
        F.col(key_col),
        F.col(time_col),
        F.lit(1).alias(tag),
        *[F.lit(None).cast(ref.schema[c].dataType).alias(f"{c}_asof") for c in payload_cols],
        F.lit(None).cast(probe.schema[time_col].dataType).alias(f"{time_col}_asof"),
        *[F.col(c).alias(f"_p_{c}") for c in probe.columns],
    )
    # ordering at equal time decides strictness: the frame ends at the
    # current row, so a same-instant reference is visible to a probe iff
    # refs (tag 0) sort BEFORE probes (tag 1) — tag asc = non-strict;
    # tag desc puts same-instant refs after the probe = strict.
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(time_col).asc(), F.col(tag).desc() if strict else F.col(tag).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attached = [
        F.last(f"{c}_asof", ignorenulls=True).over(w).alias(f"{c}_asof")
        for c in payload_cols
    ] + [F.last(f"{time_col}_asof", ignorenulls=True).over(w).alias(f"{time_col}_asof")]
    out = (
        ref_rows.unionByName(probe_rows)
        .select(key_col, time_col, tag, *[f"_p_{c}" for c in probe.columns], *attached)
        .where(F.col(tag) == 1)
    )
    return out.select(
        *[F.col(f"_p_{c}").alias(c) for c in probe.columns],
        *[F.col(f"{c}_asof") for c in payload_cols],
        F.col(f"{time_col}_asof"),
    )


def range_count_join(
    probe: DataFrame,
    ref: DataFrame,
    key_col: str,
    time_col: str,
    width_secs: int,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """For every probe row, count reference rows of the same key with
    ``probe.time - width <= ref.time < probe.time`` (a trailing window).

    Banded equi-join: both sides quantize time into ``width_secs``
    buckets; each probe looks at its own and the previous bucket (which
    together cover any trailing window of length ≤ width), the join is
    a plain equi-join on (key, bucket), and the exact inequality filters
    the band. No inequality join reaches the planner.
    """
    # cast NTZ → timestamp for unix_micros (session TZ is pinned UTC in
    # session.py, so the instant is unchanged)
    micros = F.unix_micros(F.col(time_col).cast("timestamp"))
    width_us = width_secs * 1_000_000
    r = ref.select(
        F.col(key_col), micros.alias("_rt"), F.floor(micros / width_us).alias("_bk")
    )
    p = probe.select(
        "*",
        micros.alias("_pt"),
        F.explode(
            F.array(F.floor(micros / width_us), F.floor(micros / width_us) - 1)
        ).alias("_bk"),
    )
    in_range = (
        F.col("_rt").isNotNull()
        & (F.col("_rt") >= F.col("_pt") - width_us)
        & (F.col("_rt") < F.col("_pt"))
    )
    # left join keeps zero-match probes; the conditional count collapses
    # the two covering-bucket rows per probe back to one — no join-back,
    # and the aggregate is map-side combinable
    return (
        p.join(r, on=[key_col, "_bk"], how="left")
        .groupBy(*probe.columns)
        .agg(F.sum(F.when(in_range, 1).otherwise(0)).cast("long").alias(count_alias))
    )
