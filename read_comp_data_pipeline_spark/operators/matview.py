"""Incremental materialized-view maintenance from the CDC changelog.

The canonical changelog consumer: a derived aggregate (per-repo row/token
counts, per-language corpus stats, ...) is kept current by applying each
epoch window's change feed (`HashMergeTable.changes_between`) instead of
rescanning the table. Insert/update_after rows contribute +1, delete/
update_before rows −1 — the standard signed-delta formulation for
abelian-group aggregates (SUM / COUNT), the same algebra Flink retract
streams and Materialize/DBSP use for incremental view maintenance.

Scale shape: the delta aggregation is change-feed-sized and map-side
combinable; folding it into the view is ONE key-partitioned full-outer
join against a view whose cardinality is the GROUP count, not the table
row count. A 10^10-row table with 10^5 repos maintains a 10^5-row view
with work ∝ |changes| per epoch.

Reference analogue: the crawler keeps `pages_processed`-style running
counters updated per page rather than recounting its output directory
(/root/reference/search_scrape.py:1088-1106).

Only additive aggregates belong here: SUM and COUNT invert exactly under
retraction (longs/decimals — float sums would drift under −/+
cancellation; cast to decimal first). MIN/MAX do not invert — deleting
the current max needs a rescan of the group — so they are deliberately
not offered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ADD_TYPES = ("insert", "update_after")


def changes_to_agg_delta(
    changes: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, str] | None = None,
    count_alias: str = "n_rows",
    change_type_col: str = "_change_type",
) -> DataFrame:
    """Signed per-group delta of a change feed: one map-side-combinable
    aggregation over the (epoch-sized) changelog. ``sum_cols`` maps source
    column → output alias."""
    sum_cols = sum_cols or {}
    sign = F.when(F.col(change_type_col).isin(*_ADD_TYPES), F.lit(1)).otherwise(
        F.lit(-1)
    )
    aggs = [F.sum(sign).cast("long").alias(count_alias)]
    for src, alias in sum_cols.items():
        aggs.append(F.sum(sign * F.coalesce(F.col(src), F.lit(0))).alias(alias))
    return changes.groupBy(*group_cols).agg(*aggs)


def apply_changes_to_agg(
    state: DataFrame | None,
    changes: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, str] | None = None,
    count_alias: str = "n_rows",
    change_type_col: str = "_change_type",
) -> DataFrame:
    """Fold a change feed into an aggregate view.

    ``state`` is the view before the window (``None`` bootstraps from an
    empty view); the result equals a from-scratch aggregation of the table
    AFTER the window — exactly (longs/decimals), proven in
    tests/test_matview.py by comparing against the direct groupBy of the
    post-window snapshot. Groups whose row count reaches zero drop out of
    the view (retraction semantics).
    """
    sum_cols = sum_cols or {}
    delta = changes_to_agg_delta(
        changes, group_cols, sum_cols, count_alias, change_type_col
    )
    if state is None:
        return delta.where(F.col(count_alias) > 0)
    val_cols = [count_alias, *sum_cols.values()]
    d = delta.select(
        *group_cols, *[F.col(c).alias(f"_d_{c}") for c in val_cols]
    )
    merged = state.join(d, on=group_cols, how="full_outer")
    out = merged.select(
        *group_cols,
        *[
            (
                F.coalesce(F.col(c), F.lit(0)) + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
            ).alias(c)
            for c in val_cols
        ],
    )
    return out.where(F.col(count_alias) > 0)
