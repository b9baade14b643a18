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


def _ref_struct_type(ref: DataFrame, time_col: str, payload_cols: list[str]):
    from pyspark.sql import types as T

    return T.StructType(
        [T.StructField("t", ref.schema[time_col].dataType)]
        + [T.StructField(c, ref.schema[c].dataType) for c in payload_cols]
    )


def asof_join(
    probe: DataFrame,
    ref: DataFrame,
    key_col: str,
    time_col: str,
    payload_cols: list[str],
    strict: bool = True,
    slice_secs: int | None = None,
) -> DataFrame:
    """For every probe row, attach the reference row with the greatest
    ``time_col`` not after (``strict``: strictly before) the probe's.

    Returns the probe columns plus ``<c>_asof`` for each payload column
    (and ``<time_col>_asof``), NULL when no reference precedes.

    Reference ties on (key, time) must be pre-deduplicated by the caller
    (e.g. ``max_by``) — exactly the determinism DuckDB's ASOF JOIN also
    requires to be well-defined.

    The matched reference row travels as ONE struct ``(t, *payloads)``
    through a single ``last(..., ignorenulls=True)`` window pass, so a
    NULL payload value inside the matched row stays NULL — an older row's
    non-null value is never spliced in (ASOF semantics even with NULLable
    reference payloads).

    Plan shape: one union, one shuffle on ``key_col``, one within-
    partition sort — no inequality join, no cross product. Per-key row
    count bounds the sort; for hot keys (one key holding ~10^8 rows) pass
    ``slice_secs`` to re-key on (key, time-slice) with carry-in — the
    per-task bound becomes rows-per-(key, slice) at the cost of one extra
    small shuffle over the per-slice summary (one row per key×slice).
    """
    if slice_secs is not None:
        return _asof_join_sliced(probe, ref, key_col, time_col, payload_cols, strict, slice_secs)
    tag = "_is_probe"
    s_type = _ref_struct_type(ref, time_col, payload_cols)
    ref_struct = F.struct(
        F.col(time_col).alias("t"), *[F.col(c).alias(c) for c in payload_cols]
    )
    ref_rows = ref.select(
        F.col(key_col),
        F.col(time_col),
        F.lit(0).alias(tag),
        ref_struct.alias("_ref"),
        *[F.lit(None).alias(f"_p_{c}") for c in probe.columns],
    )
    probe_rows = probe.select(
        F.col(key_col),
        F.col(time_col),
        F.lit(1).alias(tag),
        F.lit(None).cast(s_type).alias("_ref"),
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
    out = (
        ref_rows.unionByName(probe_rows)
        .select(
            tag,
            *[f"_p_{c}" for c in probe.columns],
            F.last("_ref", ignorenulls=True).over(w).alias("_ref"),
        )
        .where(F.col(tag) == 1)
    )
    return out.select(
        *[F.col(f"_p_{c}").alias(c) for c in probe.columns],
        *[F.col(f"_ref.{c}").alias(f"{c}_asof") for c in payload_cols],
        F.col("_ref.t").alias(f"{time_col}_asof"),
    )


def _asof_join_sliced(
    probe: DataFrame,
    ref: DataFrame,
    key_col: str,
    time_col: str,
    payload_cols: list[str],
    strict: bool,
    slice_secs: int,
) -> DataFrame:
    """Skew-bounded as-of: re-key the window on (key, time-slice).

    A hot key no longer serializes into one task: each (key, slice)
    partition sorts only its own rows plus ONE carry-in row — the newest
    reference from all strictly-earlier slices, computed on a per-slice
    summary relation (|keys| × |slices| rows, tiny next to the data) via
    its own window. Carry-in refs are strictly earlier than every in-slice
    probe time, so they are visible under both strictness modes; the
    in-slice ordering rule is unchanged.

    Degenerate case: all rows of a key at the SAME instant land in one
    slice regardless of ``slice_secs`` — slicing bounds time skew, not
    same-instant skew (which no order-based formulation can split).
    """
    slice_us = slice_secs * 1_000_000
    micros = F.unix_micros(F.col(time_col).cast("timestamp"))
    bucket = F.floor(micros / slice_us)
    s_type = _ref_struct_type(ref, time_col, payload_cols)
    ref_struct = F.struct(
        F.col(time_col).alias("t"), *[F.col(c).alias(c) for c in payload_cols]
    )

    # per-(key, slice) newest ref — the carry summary (one row per cell)
    ref_b = ref.select(
        F.col(key_col), bucket.alias("_bk"), micros.alias("_us"), ref_struct.alias("_ref")
    )
    cell_last = ref_b.groupBy(key_col, "_bk").agg(F.max_by("_ref", "_us").alias("_ref"))
    probe_cells = probe.select(F.col(key_col), bucket.alias("_bk")).distinct()
    all_cells = cell_last.select(key_col, "_bk").unionByName(probe_cells).distinct()
    wc = (
        Window.partitionBy(key_col)
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        all_cells.join(cell_last, on=[key_col, "_bk"], how="left")
        .select(
            key_col, "_bk", F.last("_ref", ignorenulls=True).over(wc).alias("_carry")
        )
        .where(F.col("_carry").isNotNull())
    )

    # main pass: refs + probes + carry seeds, windowed per (key, slice).
    # _ord sorts carry rows (-2) first; at equal time refs sort before
    # probes iff non-strict (same rule as the unsliced path).
    ref_rows = ref.select(
        F.col(key_col), bucket.alias("_bk"), micros.alias("_us"),
        F.lit(1 if strict else 0).alias("_ord"),
        F.lit(0).alias("_is_probe"),
        ref_struct.alias("_ref"),
        *[F.lit(None).alias(f"_p_{c}") for c in probe.columns],
    )
    probe_rows = probe.select(
        F.col(key_col), bucket.alias("_bk"), micros.alias("_us"),
        F.lit(0 if strict else 1).alias("_ord"),
        F.lit(1).alias("_is_probe"),
        F.lit(None).cast(s_type).alias("_ref"),
        *[F.col(c).alias(f"_p_{c}") for c in probe.columns],
    )
    carry_rows = carry.select(
        F.col(key_col), F.col("_bk"), (F.col("_bk") * slice_us).alias("_us"),
        F.lit(-2).alias("_ord"),
        F.lit(0).alias("_is_probe"),
        F.col("_carry").alias("_ref"),
        *[F.lit(None).alias(f"_p_{c}") for c in probe.columns],
    )
    w = (
        Window.partitionBy(key_col, "_bk")
        .orderBy(F.col("_us").asc(), F.col("_ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        ref_rows.unionByName(probe_rows).unionByName(carry_rows)
        .select(
            "_is_probe",
            *[f"_p_{c}" for c in probe.columns],
            F.last("_ref", ignorenulls=True).over(w).alias("_ref"),
        )
        .where(F.col("_is_probe") == 1)
    )
    return out.select(
        *[F.col(f"_p_{c}").alias(c) for c in probe.columns],
        *[F.col(f"_ref.{c}").alias(f"{c}_asof") for c in payload_cols],
        F.col("_ref.t").alias(f"{time_col}_asof"),
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
    # per-probe-ROW tag: fully-duplicate probe rows must each produce their
    # own output row (grouping on probe columns alone would collapse them
    # into one row carrying the summed count). The tag is DETERMINISTIC —
    # row_number over the duplicate group — not monotonically_increasing_id,
    # whose values depend on partition layout and can be reassigned when a
    # stage retry / speculative task recomputes the scan (ADVICE r4). The
    # identical rows within a group are interchangeable, so which copy gets
    # which number is irrelevant; the SET of tags is stable. Costs one
    # keyed shuffle on the probe columns, which the groupBy below needed
    # anyway (same key prefix).
    dup_w = Window.partitionBy(*probe.columns).orderBy(F.lit(1))
    p = probe.withColumn("_pid", F.row_number().over(dup_w)).select(
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
        .groupBy("_pid", *probe.columns)
        .agg(F.sum(F.when(in_range, 1).otherwise(0)).cast("long").alias(count_alias))
        .drop("_pid")
    )
