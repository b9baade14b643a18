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


def test_sync_agg_view_lifecycle(spark, tmp_path):
    """Derived-table sync: bootstrap → incremental catch-up → no-op re-sync
    → vacuum-expired watermark fallback. The view always equals the direct
    aggregation of the source's current state."""
    from read_comp_data_pipeline_spark.operators.matview import sync_agg_view

    path = str(tmp_path / "src")
    vpath = str(tmp_path / "view")
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
    kw = dict(
        group_cols=["repo"], sum_cols={"n_tokens": "sum_tokens"}
    )
    view = sync_agg_view(spark, t, vpath, **kw)
    assert view.last_epoch == 0
    assert _rows(view.read().drop("seq")) == _rows(_agg(t.read()))

    # two more source epochs; ONE sync catches up across both
    t.merge(
        _src(
            spark,
            [
                ("r1", "a", "x2", 100, 4, "U"),
                ("r3", "a", None, 6, 5, "D"),   # r3 disappears
                ("r4", "a", "new", 3, 6, "I"),  # r4 appears
            ],
        ),
        epoch=1,
    )
    t.merge(_src(spark, [("r2", "b", "q", 50, 7, "I")]), epoch=2)
    view = sync_agg_view(spark, t, vpath, **kw)
    assert view.last_epoch == 2
    got = _rows(view.read().drop("seq"))
    assert got == _rows(_agg(t.read()))
    assert "r3" not in {r[0] for r in got}

    # idempotent: re-sync with nothing new commits nothing
    v_before = view._snapshot()["version"]
    sync_agg_view(spark, t, vpath, **kw)
    assert HashMergeTable(spark, vpath)._snapshot()["version"] == v_before

    # watermark expiry: new source epoch, then vacuum evicts the old
    # snapshots → the sync falls back to a full recompute, still exact
    t.merge(_src(spark, [("r4", "b", "m", 9, 8, "I")]), epoch=3)
    t.vacuum(keep_snapshots=1)
    view = sync_agg_view(spark, t, vpath, **kw)
    assert view.last_epoch == 3
    assert _rows(view.read().drop("seq")) == _rows(_agg(t.read()))


def test_sync_agg_view_only_touched_groups_rewritten(spark, tmp_path):
    """Incremental sync merges only the changelog-touched groups: the
    view's untouched buckets keep their data dirs across the sync (no
    rewrite) — the |changes|-proportional claim, observable on disk."""
    from read_comp_data_pipeline_spark.operators.matview import sync_agg_view

    path, vpath = str(tmp_path / "src2"), str(tmp_path / "view2")
    t = HashMergeTable.create(spark, path, SCHEMA, n_buckets=4)
    seed = [(f"repo{i}", "a", "x", i, i, "I") for i in range(16)]
    t.merge(_src(spark, seed), epoch=0)
    kw = dict(group_cols=["repo"], sum_cols={"n_tokens": "sum_tokens"})
    sync_agg_view(spark, t, vpath, n_buckets=8, **kw)
    dirs_before = dict(HashMergeTable(spark, vpath)._snapshot()["buckets"])

    t.merge(_src(spark, [("repo3", "a", "x2", 99, 100, "U")]), epoch=1)
    view = sync_agg_view(spark, t, vpath, n_buckets=8, **kw)
    dirs_after = dict(view._snapshot()["buckets"])
    changed = [b for b in dirs_after if dirs_after[b] != dirs_before.get(b)]
    assert len(changed) == 1  # only repo3's bucket was rewritten
    assert _rows(view.read().drop("seq")) == _rows(_agg(t.read()))


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


_NULLABLE = T.StructType(
    [T.StructField(f.name, f.dataType, True) for f in SCHEMA.fields]
    + [T.StructField("op", T.StringType(), True)]
)


def _src_nullable(spark, rows):
    return spark.createDataFrame([tuple(r) for r in rows], _NULLABLE)


def test_null_group_key_folds_as_one_group(spark, tmp_path):
    """groupBy treats NULL as one group; the fold's full-outer join must
    too (eqNullSafe) — a plain equi-join would split the touched NULL
    group into two rows / spuriously delete it."""
    t = HashMergeTable.create(
        spark, str(tmp_path / "t"),
        T.StructType([T.StructField(f.name, f.dataType, True) for f in SCHEMA.fields]),
        n_buckets=2,
    )
    t.merge(
        _src_nullable(spark, [(None, "a", "x", 10, 0, "I"), ("r1", "b", "y", 5, 1, "I")]),
        epoch=0, src_seq_lo=0, src_seq_hi=1,
    )
    snap0 = t._snapshot()
    t.merge(
        _src_nullable(spark, [(None, "c", "z", 7, 2, "I")]),
        epoch=1, src_seq_lo=2, src_seq_hi=2,
    )
    state0 = _agg(t.read(at_snapshot=snap0))
    folded = apply_changes_to_agg(
        state0, t.changes_between(snap0), ["repo"], {"n_tokens": "sum_tokens"}
    )
    direct = _agg(t.read())
    assert _rows(folded) == _rows(direct)
    null_rows = [r for r in folded.collect() if r["repo"] is None]
    assert len(null_rows) == 1 and null_rows[0]["n_rows"] == 2


def test_sync_falls_back_when_watermark_snapshot_is_not_exact(spark, tmp_path):
    """A retained TAGGED snapshot OLDER than the view's watermark must not
    be used as the fold base (it would double-apply every change the view
    already reflects) — the sync detects the epoch mismatch and recomputes."""
    from read_comp_data_pipeline_spark.operators.matview import sync_agg_view

    t = _build(spark, str(tmp_path / "t"))
    # tag the EPOCH-0 snapshot so vacuum retains it, then let vacuum
    # expire the later intermediates
    t.set_tag("old", version=t.snapshot_at_epoch(0)["version"])
    view = sync_agg_view(
        spark, t, str(tmp_path / "v"), ["repo"], {"n_tokens": "sum_tokens"}
    )
    t.merge(
        _src(spark, [("r1", "zz", "q", 100, 90, "I")]),
        epoch=t.last_epoch + 1, src_seq_lo=90, src_seq_hi=90,
    )
    t.vacuum(keep_snapshots=1)  # view's watermark snapshot expires; tag stays
    # snapshot_at_epoch(view.last_epoch) now resolves the TAGGED epoch-0
    # snapshot — folding from it would double-apply epochs 1..watermark
    view = sync_agg_view(
        spark, t, str(tmp_path / "v"), ["repo"], {"n_tokens": "sum_tokens"}
    )
    assert _rows(view.read().select("repo", "n_rows", "sum_tokens")) == _rows(
        _agg(t.read())
    )


def test_sync_rejects_null_group_keys_loudly(spark, tmp_path):
    import pytest

    from read_comp_data_pipeline_spark.operators.matview import sync_agg_view

    t = HashMergeTable.create(
        spark, str(tmp_path / "t"),
        T.StructType([T.StructField(f.name, f.dataType, True) for f in SCHEMA.fields]),
        n_buckets=2,
    )
    t.merge(
        _src_nullable(spark, [(None, "a", "x", 10, 0, "I")]),
        epoch=0, src_seq_lo=0, src_seq_hi=0,
    )
    with pytest.raises(ValueError, match="NULL group key"):
        sync_agg_view(spark, t, str(tmp_path / "v"), ["repo"], {"n_tokens": "sum_tokens"})


def test_sync_agg_view_sees_delete_where_between_syncs(spark, tmp_path):
    """A row-level delete_where bumps the source VERSION without an epoch,
    so the latest epoch-N snapshot is NOT the fold base the view reflects.
    The sync must detect the version mismatch (sidecar) and fall back to a
    full recompute — epoch equality alone silently kept the deleted rows'
    counts forever (ADVICE r5, medium)."""
    from read_comp_data_pipeline_spark.operators.matview import sync_agg_view

    path = str(tmp_path / "src")
    vpath = str(tmp_path / "view")
    t = HashMergeTable.create(spark, path, SCHEMA, n_buckets=4)
    t.merge(
        _src(
            spark,
            [
                ("r1", "a", "x", 10, 0, "I"),
                ("r1", "b", "y", 20, 1, "I"),
                ("r2", "a", "z", 5, 2, "I"),
            ],
        ),
        epoch=0,
    )
    kw = dict(group_cols=["repo"], sum_cols={"n_tokens": "sum_tokens"})
    view = sync_agg_view(spark, t, vpath, **kw)
    assert _rows(view.read().drop("seq")) == _rows(_agg(t.read()))

    # maintenance delete between syncs: epoch unchanged, version bumped
    t.delete_where("repo = 'r1' AND path = 'a'")
    t.merge(_src(spark, [("r3", "a", "w", 7, 3, "I")]), epoch=1)
    view = sync_agg_view(spark, t, vpath, **kw)
    got = _rows(view.read().drop("seq"))
    assert got == _rows(_agg(t.read())), got
    # r1 lost one row and 10 tokens via the delete
    r1 = [r for r in got if r[0] == "r1"]
    assert r1 and r1[0][1] == 1 and r1[0][2] == 20
