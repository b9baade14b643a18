"""Partial-column (sparse) CDC updates — column-level conflict resolution.

Real CDC feeds routinely ship updates that carry ONLY the changed columns
(Debezium without ``REPLICA IDENTITY FULL``, Maxwell ``--output_nulls=false``,
vendor "patch" events). The reference's crawler has the same shape in
miniature: a revisited page may refresh only its metadata dict while the
body text is unchanged (``/root/reference/beautifulsoup_tutorial/
scrape.py:113-121`` re-extracts five fields independently). The full-row
MERGE (operators/merge.py) cannot apply such events — a NULL column would
clobber the target's value.

Semantics (per key, ``NULL`` in a tracked column = "not provided"):

* the final value of column ``c`` is the value carried by the LATEST event
  that provided ``c`` — independent of what other columns that event set;
* a delete (``op='D'``) wipes every column value older than the delete and
  removes the row if nothing follows it;
* the table stores one shadow ``_s_<c>`` (the seq that set ``c``) next to
  every tracked column, so applying epochs is COMMUTATIVE for updates:
  per column the winner is ``argmax`` by seq across {target, source}, and
  ``argmax`` is order-insensitive. The pytest battery replays random
  epoch permutations and asserts bit-identical final states.
* deletes keep the engine-wide monotone-delivery contract (merge.py module
  docstring): an event OLDER than an applied delete must not first arrive
  AFTER it. Lifting that would need retained tombstones — same trade as
  the full-row path, documented not silently assumed.

Limitation (inherent to null-means-absent encoding): an update cannot SET
a tracked column to NULL — only a delete clears values. Feeds that need
explicit NULL writes must carry a sentinel or a provided-mask column; the
fold accepts a custom ``provided`` predicate per column for that case.

Scale shape (the 100 TB contract):

* the default fold (``strategy="hash_fetch"``) aggregates ONLY long
  columns — a true HashAggregate with map-side partials (the plan shows
  ``partial_max*`` before the exchange), so a key with 10^7 sparse
  updates contributes ≤ #map-tasks rows to the shuffle (same
  skew-immunity argument as compact_latest) — then semi-joins each
  winning value back from the slice. The multi-KB payload columns are
  never sorted and never ride a driver broadcast
  (``test_hash_fetch_fold_never_sorts_the_payload`` pins the plan);
* the apply never shuffles or sorts the TARGET: untouched rows stream
  through a broadcast anti-join keyed on the folded KEY SET only,
  touched rows through a shuffled epoch×epoch column-merge join — the
  per-column argmax happens on the epoch-sized matched set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from read_comp_data_pipeline_spark.schemas import KEY_COLS


def shadow_col(c: str) -> str:
    """Name of the shadow seq column tracking when ``c`` was last set."""
    return f"_s_{c}"


def partial_schema(
    value_fields: list[T.StructField],
    key_cols: list[str] | None = None,
    order_col: str = "seq",
) -> T.StructType:
    """Target-table schema for a partial-update table: keys + each tracked
    column followed by its shadow seq + the row-level order column."""
    key_cols = key_cols or KEY_COLS
    fields = [T.StructField(k, T.StringType(), False) for k in key_cols]
    for f in value_fields:
        fields.append(T.StructField(f.name, f.dataType, True))
        fields.append(T.StructField(shadow_col(f.name), T.LongType(), True))
    fields.append(T.StructField(order_col, T.LongType(), True))
    return T.StructType(fields)


def fold_partial_updates(
    df: DataFrame,
    value_cols: list[str],
    key_cols: list[str] | None = None,
    order_col: str = "seq",
    op_col: str = "op",
    strategy: str = "hash_fetch",
) -> DataFrame:
    """Fold an epoch of sparse events to ≤1 row per key.

    Output: ``key_cols`` + per tracked column ``c``: ``c`` (latest provided
    value that post-dates the epoch's last delete, else NULL) and
    ``_s_<c>`` (its seq) + ``_del_seq`` (latest delete seq, NULL if none)
    + ``order_col`` (max seq) + ``op_col`` ('D' iff the epoch's last event
    for the key is a delete).

    ``strategy`` (both value-identical; parity-tested):

    * ``"hash_fetch"`` (default — the scale path): aggregate ONLY longs
      (per-column latest-provided seq, delete seq, max seq) — a true
      HashAggregate with map-side partials — then fetch each column's
      winning value by streaming the slice through a per-column semi
      probe on (key, seq) and assemble with SHUFFLE_HASH-hinted key
      joins. The multi-KB payload never sorts and never rides a
      driver broadcast; the slice is scanned 1 + |value_cols| times (all
      parallel scans). Same discipline as compact_latest's
      broadcast_semi: hash-aggregate the tiny columns, semi-join the
      payload back.
    * ``"sort_agg"``: ONE aggregate of ``max``/``max_by`` columns —
      fewer scans and joins, but string-valued ``max_by`` buffers make
      Catalyst pick SortAggregate, so every map task sorts the full
      payload (measured on the 8M-event scaling protocol: the payload
      sorts made local[32] slower than local[8] — allocation-rate-bound
      on one heap). Kept for narrow/small slices and as the parity
      cross-check. Still map-side partial-aggregated, so skew immunity
      holds in both strategies.

    Both Spark ``max_by`` and DuckDB ``arg_max`` skip NULL ordering keys
    (verified), which is what makes "provided" = non-NULL work.
    """
    key_cols = key_cols or KEY_COLS
    seq = F.col(order_col)
    not_del = F.col(op_col) != "D"
    if strategy == "hash_fetch":
        # 1) longs-only aggregate: HashAggregate, map-side combinable
        aggs: list[Column] = [
            F.max(seq).alias(order_col),
            F.max(F.when(~not_del, seq)).alias("_del_seq"),
        ]
        for c in value_cols:
            provided = F.col(c).isNotNull() & not_del
            aggs.append(F.max(F.when(provided, seq)).alias(shadow_col(c)))
        seqs = df.groupBy(*key_cols).agg(*aggs)
        # last event is a delete iff the latest delete IS the latest event
        out_cols: list[Column] = [*(F.col(k) for k in key_cols), F.col(order_col)]
        out_cols.append(
            F.when(F.col("_del_seq") == F.col(order_col), F.lit("D"))
            .otherwise(F.lit("U")).alias(op_col)
        )
        out_cols.append(F.col("_del_seq"))
        for c in value_cols:
            live = F.col(shadow_col(c)) > F.coalesce(F.col("_del_seq"), F.lit(-1))
            out_cols.append(F.when(live, F.col(shadow_col(c))).alias(shadow_col(c)))
        out = seqs.select(*out_cols)
        # 2) per column: stream the slice through a semi probe on
        #    (key, winning seq) — ≤1 surviving EVENT per key, payload
        #    untouched by any sort or broadcast. An at-least-once feed can
        #    redeliver the winning event inside the slice (same key+seq,
        #    same payload — seq is the WAL's total order, so (key, seq)
        #    determines the event); the semi join keeps every copy, so a
        #    distinct() collapses them back to the ≤1-row/key contract.
        #    distinct has NO aggregate buffers — group-by-all compiles to
        #    HashAggregate even with string columns (plan-tested: still no
        #    Sort anywhere).
        for c in value_cols:
            probe = out.where(F.col(shadow_col(c)).isNotNull()).select(
                *key_cols, F.col(shadow_col(c)).alias(order_col)
            )
            w_c = (
                df.where(F.col(c).isNotNull() & not_del)
                .join(probe.hint("SHUFFLE_HASH"), on=[*key_cols, order_col], how="left_semi")
                .select(*key_cols, F.col(c))
                .distinct()
            )
            # 3) assemble on the key: compact ≤1-row/key relations,
            #    SHUFFLE_HASH so the planner never sorts them into an SMJ
            out = out.join(w_c.hint("SHUFFLE_HASH"), on=key_cols, how="left")
        ordered = [*key_cols, order_col, op_col, "_del_seq"]
        for c in value_cols:
            ordered.extend([c, shadow_col(c)])
        return out.select(*ordered)

    aggs = [
        F.max(seq).alias(order_col),
        F.max_by(F.col(op_col), seq).alias(op_col),
        F.max(F.when(~not_del, seq)).alias("_del_seq"),
    ]
    for c in value_cols:
        provided = F.col(c).isNotNull() & not_del
        aggs.append(F.max_by(F.col(c), F.when(provided, seq)).alias(f"_v_{c}"))
        aggs.append(F.max(F.when(provided, seq)).alias(shadow_col(c)))
    agg = df.groupBy(*key_cols).agg(*aggs)
    # mask values the epoch's own last delete outdates (set@5, del@10 → NULL)
    out_cols = [*key_cols, order_col, op_col, "_del_seq"]
    masked: list[Column] = [F.col(c) for c in out_cols]
    for c in value_cols:
        live = F.col(shadow_col(c)) > F.coalesce(F.col("_del_seq"), F.lit(-1))
        masked.append(F.when(live, F.col(f"_v_{c}")).alias(c))
        masked.append(F.when(live, F.col(shadow_col(c))).alias(shadow_col(c)))
    return agg.select(*masked)


def apply_partial(
    target: DataFrame,
    folded: DataFrame,
    value_cols: list[str],
    key_cols: list[str] | None = None,
    order_col: str = "seq",
    op_col: str = "op",
    folded_broadcastable: bool = True,
) -> DataFrame:
    """New target state after applying one folded epoch (fold_partial_updates
    output) to a partial-update table (partial_schema layout).

    Per column the winner is argmax by shadow seq across target/source —
    commutative across epochs; a source ``_del_seq`` newer than a target
    column's shadow seq wipes it; the row is removed iff the epoch ends in
    a delete newer than everything the target has. Replays are no-ops
    (equal seqs → target wins).

    The target side never shuffles: untouched rows leave via a broadcast
    left-anti, touched rows via a broadcast inner join (≤ |folded| rows);
    the column merge runs on that epoch-sized set.
    """
    key_cols = key_cols or KEY_COLS
    hint = F.broadcast if folded_broadcastable else (lambda d: d)
    fkeys = folded.select(*key_cols)
    kept = target.join(hint(fkeys), on=key_cols, how="left_anti")
    tmatch = target.join(hint(fkeys), on=key_cols, how="inner")

    f = folded.select(
        *key_cols,
        F.col(order_col).alias("_f_seq"),
        F.col(op_col).alias("_f_op"),
        "_del_seq",
        *[F.col(c).alias(f"_f_{c}") for c in value_cols],
        *[F.col(shadow_col(c)).alias(f"_fs_{c}") for c in value_cols],
    )
    # folded keys ⊇ matched target keys, so a left join sees every source
    # row. Both sides are epoch-sized (tmatch ≤ |folded| rows) — this join
    # is deliberately NOT broadcast: the only driver-built broadcast is
    # the key-only fkeys relation (the same discipline as the full-row
    # COW probe, which ships (key, seq) and never full rows). Broadcasting
    # tmatch would serialize a full-width epoch image through the driver
    # once per epoch — measured on the 8M-event scaling protocol, that
    # serial build made local[32] slower than local[8]. A shuffled
    # epoch × epoch join scales with cores instead; SHUFFLE_HASH (the
    # fold's own hint discipline) keeps the planner from sorting both
    # ≤1-row/key sides into a sort-merge join.
    j = f.join(tmatch.hint("SHUFFLE_HASH"), on=key_cols, how="left")

    t_seq = F.coalesce(F.col(order_col), F.lit(-1))
    row_deleted = (F.col("_f_op") == "D") & (F.col("_f_seq") > t_seq)
    merged_cols: list[Column] = [F.col(k) for k in key_cols]
    for c in value_cols:
        ts, fs = F.coalesce(F.col(shadow_col(c)), F.lit(-1)), F.coalesce(
            F.col(f"_fs_{c}"), F.lit(-1)
        )
        # source delete newer than the target's write of c wipes it (a
        # replayed delete re-wipes an already-wiped column: no-op)
        del_wipes = F.col("_del_seq").isNotNull() & (F.col("_del_seq") > ts)
        m_t_v = F.when(~del_wipes, F.col(c))
        m_t_s = F.when(~del_wipes, F.col(shadow_col(c)))
        src_wins = fs > F.coalesce(m_t_s, F.lit(-1))
        merged_cols.append(F.when(src_wins, F.col(f"_f_{c}")).otherwise(m_t_v).alias(c))
        merged_cols.append(
            F.when(src_wins, F.col(f"_fs_{c}")).otherwise(m_t_s).alias(shadow_col(c))
        )
    merged_cols.append(F.greatest(F.col("_f_seq"), t_seq).alias(order_col))
    merged = j.where(~row_deleted).select(*merged_cols)
    return kept.unionByName(merged)
