"""Per-key last-writer-wins compaction (SURVEY.md §2.4 A5) + skew helpers.

The reference enforces "exactly one state per key" with a seen-set that
keeps the *first* occurrence (``/root/reference/search_scrape.py:336-337,
:1054-1064``); CDC inverts it to *latest*-writer-wins per key. Same
invariant, opposite order.

Scale note (why max_by, not a window): ``row_number() over (partition by
key order by seq desc)`` shuffles **every event** of a hot key to one task
— a Zipf-skewed WAL makes that task the straggler. A hash aggregate with
``max_by(struct, seq)`` gets map-side partial aggregation from Catalyst:
each map task pre-combines its events to ≤1 row per key before the
shuffle, so a key with 10^7 updates contributes at most #map-partitions
rows to the exchange. That *is* the salting — done by the engine for free.
Verify in the plan: HashAggregate(partial) → Exchange → HashAggregate(final).

An explicit two-phase salted variant is provided for operators that lack
partial aggregation (and to satisfy the north_rule's explicit-salting
requirement end-to-end); both produce identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from read_comp_data_pipeline_spark.schemas import KEY_COLS


def compact_latest(
    df: DataFrame,
    key_cols: list[str] | None = None,
    order_col: str = "seq",
    strategy: str = "broadcast_semi",
) -> DataFrame:
    """Keep the single latest row per key (max ``order_col``).

    ``strategy``:

    * ``"broadcast_semi"`` (default — the hot-path shape): aggregate only
      ``(key, max(order))`` — a hash aggregate over pruned columns, tiny
      and map-side combinable — then broadcast it and semi-join the full
      rows on (key, order). **The payload (multi-KB content strings) never
      shuffles and never sorts**; the only exchange carries key+seq pairs.
      Valid while an epoch's distinct-key set fits a broadcast (engine
      epochs are sized for this; at 10^7+ keys/epoch use ``"agg"``).
    * ``"broadcast_hash_semi"``: like broadcast_semi but the broadcast
      carries ONE long per key — ``xxhash64(key..., max seq)`` — instead
      of the key strings: ~6× smaller broadcast and a long-keyed hash
      relation the driver builds several times faster (the broadcast build
      is the dominant SERIAL cost per epoch once epochs reach 10^7
      events). 64-bit collisions (P ≈ n²/2⁻⁶⁵) can only *keep* a
      superseded row, never drop a live one — harmless in MOR where the
      read path re-reconciles per key by max seq (the stale row loses),
      so the MOR hot path uses this; COW sticks to the exact variant.
    * ``"agg"``: single ``max_by(struct(payload), order)`` aggregate.
      Shuffles full rows once; Catalyst compiles struct-buffer max_by to a
      SortAggregate (two full-data sorts) — correct and broadcast-free,
      but strictly heavier; the fallback when keys don't fit a broadcast.

    Requires ``order_col`` values unique per key (WAL seq is globally
    unique). Output columns match the input.
    """
    key_cols = key_cols or KEY_COLS
    if strategy == "broadcast_semi":
        latest = df.groupBy(*key_cols).agg(F.max(order_col).alias(order_col))
        return df.join(F.broadcast(latest), on=[*key_cols, order_col], how="left_semi")
    if strategy == "broadcast_hash_semi":
        latest = (
            df.groupBy(*key_cols)
            .agg(F.max(order_col).alias(order_col))
            .select(F.xxhash64(*key_cols, order_col).alias("_h"))
        )
        return (
            df.withColumn("_h", F.xxhash64(*key_cols, order_col))
            .join(F.broadcast(latest), on="_h", how="left_semi")
            .drop("_h")
        )
    payload = [c for c in df.columns if c not in key_cols]
    packed = F.struct(*[F.col(c) for c in payload])
    out = df.groupBy(*key_cols).agg(F.max_by(packed, F.col(order_col)).alias("_p"))
    return out.select(*key_cols, *[F.col(f"_p.{c}").alias(c) for c in payload])


def compact_latest_salted(
    df: DataFrame,
    key_cols: list[str] | None = None,
    order_col: str = "seq",
    n_salts: int = 16,
) -> DataFrame:
    """Explicit two-phase salted last-writer-wins.

    Phase 1 groups by (key, salt) — a hot key fans out across ``n_salts``
    reducers; phase 2 reduces the ≤``n_salts`` survivors per key. Use when
    the per-group reduction is not map-side combinable (custom UDAFs);
    for plain ``max_by`` prefer :func:`compact_latest`.
    """
    key_cols = key_cols or KEY_COLS
    payload = [c for c in df.columns if c not in key_cols]
    packed = F.struct(*[F.col(c) for c in payload])
    salt = F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_salts)).alias("_salt")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.max_by(packed, F.col(order_col)).alias("_p"))
    )
    phase2 = phase1.groupBy(*key_cols).agg(
        F.max_by(F.col("_p"), F.col(f"_p.{order_col}")).alias("_p")
    )
    return phase2.select(*key_cols, *[F.col(f"_p.{c}").alias(c) for c in payload])


def salted_repartition(df: DataFrame, key_cols: list[str], n_salts: int = 8) -> DataFrame:
    """Repartition by (key, salt) to spread a hot key across tasks before a
    per-row-expensive stage (e.g. the extraction UDF). The salt never enters
    any join/ON condition — partition pruning keys stay intact
    (SURVEY.md §4 caveat).
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    return (
        df.withColumn("_salt", salt)
        .repartition(*[F.col(c) for c in key_cols], F.col("_salt"))
        .drop("_salt")
    )
