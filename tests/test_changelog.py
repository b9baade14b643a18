"""CDC changelog emission (Iceberg ``table_changes`` / Delta CDF analogue).

``HashMergeTable.changes_between(snap_a, snap_b)`` emits the net row-level
changes between two committed snapshots: inserts, deletes, and update
before/after image pairs. Work must be proportional to the buckets the
intervening epochs TOUCHED (driver-side snapshot diff + bucket-pruned
scans), not to table size.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from read_comp_data_pipeline_spark.operators.merge import (
    HashMergeTable,
    bucket_expr,
)

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _src(spark, rows):
    """rows: (repo, path, content, seq, op)"""
    return spark.createDataFrame(
        [tuple(r) for r in rows],
        T.StructType(list(SCHEMA.fields) + [T.StructField("op", T.StringType(), False)]),
    )


def _changes_set(df):
    return {
        (r["repo"], r["path"], r["_change_type"], r["content"], r["seq"])
        for r in df.collect()
    }


def _two_phase_table(spark, path, mode):
    t = HashMergeTable.create(spark, path, SCHEMA, n_buckets=4, mode=mode)
    t.merge(
        _src(
            spark,
            [
                ("r", "a", "a0", 0, "I"),
                ("r", "b", "b0", 1, "I"),
                ("r", "c", "c0", 2, "I"),
                ("r", "e", "e0", 3, "I"),
            ],
        ),
        epoch=0,
        src_seq_lo=0,
        src_seq_hi=3,
    )
    snap_a = t._snapshot()
    t.merge(
        _src(
            spark,
            [
                ("r", "b", "b1", 4, "U"),  # update
                ("r", "c", None, 5, "D"),  # delete
                ("r", "d", "d0", 6, "I"),  # insert
                ("r", "e", None, 7, "D"),  # delete then ...
            ],
        ),
        epoch=1,
        src_seq_lo=4,
        src_seq_hi=7,
    )
    t.merge(
        _src(spark, [("r", "e", "e1", 8, "I")]),  # ... re-insert across epochs
        epoch=2,
        src_seq_lo=8,
        src_seq_hi=8,
    )
    return t, snap_a


EXPECTED = {
    ("r", "b", "update_before", "b0", 1),
    ("r", "b", "update_after", "b1", 4),
    ("r", "c", "delete", "c0", 2),
    ("r", "d", "insert", "d0", 6),
    # net effect of delete+re-insert within the window is an UPDATE of the
    # live row (net-changes semantics, same as Iceberg's changelog)
    ("r", "e", "update_before", "e0", 3),
    ("r", "e", "update_after", "e1", 8),
}


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_changelog_classification(spark, tmp_path, mode):
    t, snap_a = _two_phase_table(spark, str(tmp_path / f"t_{mode}"), mode)
    got = _changes_set(t.changes_between(snap_a))
    assert got == EXPECTED  # and in particular: untouched key 'a' is absent


def test_changelog_between_identical_snapshots_is_empty(spark, tmp_path):
    t, snap_a = _two_phase_table(spark, str(tmp_path / "t_same"), "cow")
    snap_b = t._snapshot()
    assert t.changes_between(snap_b, snap_b).count() == 0
    assert t.changes_between(snap_a, snap_a).count() == 0


def test_changelog_rejects_swapped_snapshots(spark, tmp_path):
    t, snap_a = _two_phase_table(spark, str(tmp_path / "t_swap"), "cow")
    with pytest.raises(ValueError, match="swap the arguments"):
        t.changes_between(t._snapshot(), snap_a)
    with pytest.raises(ValueError, match=">= 1"):
        t.rebucket(0)


def test_idempotent_rerun_emits_empty_changelog(spark, tmp_path):
    """A re-delivered (already committed) epoch is a no-op merge — the
    changelog across it must be empty (exactly-once, observably)."""
    t, _ = _two_phase_table(spark, str(tmp_path / "t_noop"), "cow")
    snap = t._snapshot()
    t.merge(_src(spark, [("r", "e", "e1", 8, "I")]), epoch=2)  # skipped
    assert t.changes_between(snap).count() == 0


def test_changelog_scans_only_touched_buckets(spark, tmp_path):
    """Phase 2 touches ONE key → the diff must prune to that key's bucket:
    driver-side bucket set is a singleton and every file the plan reads
    lives under a dir for that bucket (work ∝ touched buckets)."""
    path = str(tmp_path / "t_prune")
    t = HashMergeTable.create(spark, path, SCHEMA, n_buckets=4, mode="cow")
    seed = [("r", f"k{i}", f"v{i}", i, "I") for i in range(40)]
    t.merge(_src(spark, seed), epoch=0, src_seq_lo=0, src_seq_hi=39)
    snap_a = t._snapshot()
    t.merge(_src(spark, [("r", "k7", "v7x", 40, "U")]), epoch=1)
    snap_b = t._snapshot()

    hot = spark.createDataFrame([("r", "k7")], "repo string, path string").select(
        bucket_expr(4).alias("b")
    ).first()["b"]
    assert t._changed_buckets(snap_a, snap_b) == [hot]

    ch = t.changes_between(snap_a)
    files = ch.inputFiles()
    assert files, "expected a real pruned scan"
    allowed = []
    for snap in (snap_a, snap_b):
        e = snap["buckets"].get(str(hot))
        if e:
            allowed.append(os.path.join(path, e["dir"]))
    def _local(p):
        return os.path.realpath(p[len("file://"):] if p.startswith("file://") else p)

    assert all(
        any(_local(f).startswith(_local(a)) for a in allowed) for f in files
    ), (files, allowed)
    assert _changes_set(ch) == {
        ("r", "k7", "update_before", "v7", 7),
        ("r", "k7", "update_after", "v7x", 40),
    }


def test_changelog_across_schema_evolution(spark, tmp_path):
    """Snapshot A predates an added column; the diff aligns old rows to the
    current schema (null-filled) so evolution reads as updates only where
    a row actually changed."""
    path = str(tmp_path / "t_evolve")
    t = HashMergeTable.create(spark, path, SCHEMA, n_buckets=2, mode="cow")
    t.merge(
        _src(spark, [("r", "a", "a0", 0, "I"), ("r", "b", "b0", 1, "I")]),
        epoch=0,
    )
    snap_a = t._snapshot()
    wide = T.StructType(list(SCHEMA.fields) + [T.StructField("stars", T.LongType(), True)])
    assert t.evolve_schema(wide)
    src = spark.createDataFrame(
        [("r", "b", "b1", 2, 5, "U")],
        T.StructType(list(wide.fields) + [T.StructField("op", T.StringType(), False)]),
    )
    t.merge(src, epoch=1)
    got = {
        (r["repo"], r["path"], r["_change_type"], r["content"], r["stars"])
        for r in t.changes_between(snap_a).collect()
    }
    assert got == {
        ("r", "b", "update_before", "b0", None),
        ("r", "b", "update_after", "b1", 5),
    }


def test_snapshot_at_epoch_and_cli_changes(spark, tmp_path, capsys):
    """``python -m ... changes --from-epoch N``: epoch→snapshot resolution
    plus the one-JSON-line CLI surface over changes_between."""
    import json

    from read_comp_data_pipeline_spark.__main__ import main

    path = str(tmp_path / "t_cli")
    t, snap_a = _two_phase_table(spark, path, "cow")
    assert t.snapshot_at_epoch(0)["epoch"] == 0
    assert t.snapshot_at_epoch(99)["epoch"] == 2
    # epoch -1 is the initial empty snapshot (a from-epoch -1 feed = full
    # insert scan); anything below predates the table entirely
    assert t.snapshot_at_epoch(-1)["epoch"] == -1
    with pytest.raises(ValueError):
        t.snapshot_at_epoch(-2)

    out = str(tmp_path / "changes_out")
    assert main(["changes", "--table", path, "--from-epoch", "0", "--out", out]) == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["changes"] == {
        "insert": 1, "delete": 1, "update_before": 2, "update_after": 2,
    }
    assert _changes_set(spark.read.parquet(out)) == EXPECTED


def test_changelog_across_mor_compaction(spark, tmp_path):
    """Compaction between the snapshots rewrites base entries (the bucket
    diff flags every bucket — a correct superset) but is logically a
    no-op: the feed across a pure compaction is EMPTY, and a window
    spanning writes + compaction reports exactly the writes' changes."""
    t, snap_a = _two_phase_table(spark, str(tmp_path / "t_comp"), "mor")
    pre_compact = t._snapshot()
    t.compact_table()
    assert t.changes_between(pre_compact).count() == 0
    # writes + compaction in one window == the writes' net changes
    assert _changes_set(t.changes_between(snap_a)) == EXPECTED


def test_changelog_mor_and_cow_agree(spark, tmp_path):
    cow, cow_a = _two_phase_table(spark, str(tmp_path / "p_cow"), "cow")
    mor, mor_a = _two_phase_table(spark, str(tmp_path / "p_mor"), "mor")
    assert _changes_set(cow.changes_between(cow_a)) == _changes_set(
        mor.changes_between(mor_a)
    )
