"""Incremental materialized-view maintenance (operators/matview.py).

The invariant under test: for ANY window over the table's history,
    view(state@A) ⊕ changelog(A→B) == direct aggregation of state@B
exactly (long arithmetic), including group disappearance and chaining
across multiple windows.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from read_comp_data_pipeline_spark.operators.matview import (
    apply_changes_to_agg,
    changes_to_agg_delta,
)
from read_comp_data_pipeline_spark.operators.merge import HashMergeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("n_tokens", T.LongType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _src(spark, rows):
    return spark.createDataFrame(
        [tuple(r) for r in rows],
        T.StructType(list(SCHEMA.fields) + [T.StructField("op", T.StringType(), False)]),
    )


def _agg(df):
    return df.groupBy("repo").agg(
        F.count("*").alias("n_rows"), F.sum("n_tokens").alias("sum_tokens")
    )


def _rows(df):
    return {(r["repo"], r["n_rows"], r["sum_tokens"]) for r in df.collect()}


def _build(spark, path):
    """3 epochs of churn across 3 repos; repo r3 is fully deleted by the end."""
    t = HashMergeTable.create(spark, path, SCHEMA, n_buckets=4)
    t.merge(
        _src(
            spark,
            [
                ("r1", "a", "x", 10, 0, "I"),
                ("r1", "b", "y", 20, 1, "I"),
                ("r2", "a", "z", 5, 2, "I"),
                ("r3", "a", "w", 7, 3, "I"),
            ],
        ),
        epoch=0,
    )
    t.merge(
        _src(
            spark,
            [
                ("r1", "a", "x2", 100, 4, "U"),   # update changes the sum
                ("r2", "b", "q", 50, 5, "I"),      # new row in existing group
                ("r3", "a", None, 6, 6, "D"),      # group disappears
            ],
        ),
        epoch=1,
    )
    t.merge(
        _src(
            spark,
            [
                ("r1", "b", None, 0, 7, "D"),
                ("r4", "a", "new", 3, 8, "I"),     # brand-new group
            ],
        ),
        epoch=2,
    )
    return t


def test_view_after_fold_equals_direct_agg(spark, tmp_path):
    t = _build(spark, str(tmp_path / "t1"))
    snap_a = t.snapshot_at_epoch(0)
    state_a = _agg(t.read(at_snapshot=snap_a))
    got = apply_changes_to_agg(
        state_a, t.changes_between(snap_a), ["repo"], {"n_tokens": "sum_tokens"}
    )
    expect = _agg(t.read())
    assert _rows(got) == _rows(expect)
    # group r3 disappeared; r4 appeared
    repos = {r[0] for r in _rows(got)}
    assert "r3" not in repos and "r4" in repos


def test_chained_windows_equal_one_window(spark, tmp_path):
    t = _build(spark, str(tmp_path / "t2"))
    s0, s1 = t.snapshot_at_epoch(0), t.snapshot_at_epoch(1)
    state = _agg(t.read(at_snapshot=s0))
    state = apply_changes_to_agg(
        state, t.changes_between(s0, s1), ["repo"], {"n_tokens": "sum_tokens"}
    )
    state = apply_changes_to_agg(
        state, t.changes_between(s1), ["repo"], {"n_tokens": "sum_tokens"}
    )
    assert _rows(state) == _rows(_agg(t.read()))


def test_bootstrap_from_none_state(spark, tmp_path):
    """state=None + the full from-empty changelog == direct aggregation."""
    t = _build(spark, str(tmp_path / "t3"))
    empty = t.snapshot_at_epoch(-1)
    got = apply_changes_to_agg(
        None, t.changes_between(empty), ["repo"], {"n_tokens": "sum_tokens"}
    )
    assert _rows(got) == _rows(_agg(t.read()))


def test_delta_is_map_side_combinable(spark, tmp_path):
    """The changelog delta must compile to a partial+final hash aggregate
    (no window, no sort) — the shape that stays changelog-sized at scale."""
    t = _build(spark, str(tmp_path / "t4"))
    delta = changes_to_agg_delta(
        t.changes_between(t.snapshot_at_epoch(0)), ["repo"], {"n_tokens": "sum_tokens"}
    )
    plan = delta._jdf.queryExecution().executedPlan().toString()
    # partial+final hash aggregate (map-side combine), no Window anywhere;
    # the only Sort allowed is the upstream changelog full-outer SMJ's own
    assert "partial_sum" in plan and "HashAggregate" in plan
    assert "Window" not in plan
