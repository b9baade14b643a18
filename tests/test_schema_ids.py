"""Field-ID schema evolution (Iceberg's column-tracking model).

Every column carries a stable integer field ID recorded per schema
generation in the snapshot, so:

* RENAME is a metadata-only commit — zero data files rewritten; files
  from every prior generation read through the ID mapping under the new
  name, and time travel / ``changes_between`` across the rename stay
  exact (a pure rename diffs as NO change).
* DROP is metadata-only — readers stop projecting the ID immediately;
  re-adding the same name later allocates a NEW ID, so pre-drop values
  never resurface (Iceberg's drop/re-add correctness rule).
* Legacy snapshots written before this layer synthesize name-stable IDs,
  reproducing the old name-matched alignment bit-for-bit.

Reference analogue: the reference pipeline has no schema registry at all
(dict-shaped rows, /root/reference/search_scrape.py) — this is the part
a lake-table engine must add for 10^10-event replays that span DDL.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from read_comp_data_pipeline_spark.operators.merge import HashMergeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("stars", T.IntegerType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _src(spark, rows, schema=SCHEMA):
    """rows: (*schema columns..., op)"""
    return spark.createDataFrame(
        [tuple(r) for r in rows],
        T.StructType(list(schema.fields) + [T.StructField("op", T.StringType(), False)]),
    )


def _data_files(path):
    out = {}
    for root, _dirs, files in os.walk(os.path.join(path, "data")):
        for f in files:
            p = os.path.join(root, f)
            st = os.stat(p)
            out[p] = (st.st_size, st.st_mtime_ns)
    return out


def _seed(spark, path, mode="cow"):
    t = HashMergeTable.create(spark, path, SCHEMA, n_buckets=4, mode=mode)
    t.merge(
        _src(
            spark,
            [
                ("r", "a", "a0", 10, 0, "I"),
                ("r", "b", "b0", 20, 1, "I"),
                ("s", "c", "c0", 30, 2, "I"),
            ],
        ),
        epoch=0, src_seq_lo=0, src_seq_hi=2,
    )
    return t


def test_rename_is_metadata_only_and_exact(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _seed(spark, path)
    before_files = _data_files(path)
    out = t.rename_column("stars", "stargazers")
    assert out["renamed"] == {"stars": "stargazers"}
    # zero data files rewritten: same paths, sizes, mtimes
    assert _data_files(path) == before_files
    got = {
        (r["repo"], r["path"], r["stargazers"])
        for r in t.read().select("repo", "path", "stargazers").collect()
    }
    assert got == {("r", "a", 10), ("r", "b", 20), ("s", "c", 30)}
    assert "stars" not in [f.name for f in t.schema.fields]


def test_rename_spans_schema_generations_and_mor_deltas(spark, tmp_path):
    """Files written under THREE generations (pre-evolution base, post-
    evolution delta, post-rename delta) all read through the ID map."""
    path = str(tmp_path / "t")
    t = _seed(spark, path, mode="mor")
    # generation 1: widen stars to long
    wide = T.StructType(
        [
            T.StructField(f.name, T.LongType() if f.name == "stars" else f.dataType, f.nullable)
            for f in SCHEMA.fields
        ]
    )
    t.evolve_schema(wide)
    t.merge(
        _src(spark, [("r", "a", "a1", 11, 3, "U")], schema=wide),
        epoch=1, src_seq_lo=3, src_seq_hi=3,
    )
    # generation 2: rename — MOR deltas from both generations must survive
    t.rename_column("stars", "stargazers")
    post = T.StructType(
        [
            T.StructField("stargazers" if f.name == "stars" else f.name, f.dataType, f.nullable)
            for f in wide.fields
        ]
    )
    t.merge(
        _src(spark, [("s", "c", "c1", 31, 4, "U")], schema=post),
        epoch=2, src_seq_lo=4, src_seq_hi=4,
    )
    got = {
        (r["repo"], r["path"], r["content"], r["stargazers"])
        for r in t.read().collect()
    }
    assert got == {("r", "a", "a1", 11), ("r", "b", "b0", 20), ("s", "c", "c1", 31)}
    # compaction folds all three generations without resurrecting old names
    t.compact_table()
    got2 = {
        (r["repo"], r["path"], r["content"], r["stargazers"])
        for r in t.read().collect()
    }
    assert got2 == got


def test_pure_rename_diffs_as_no_change(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _seed(spark, path)
    snap_a = t._snapshot()
    t.rename_column("stars", "stargazers")
    assert t.changes_between(snap_a).count() == 0


def test_changes_between_across_rename_and_update(spark, tmp_path):
    """An update straddling a rename emits exact before/after images under
    the CURRENT (renamed) column names."""
    path = str(tmp_path / "t")
    t = _seed(spark, path)
    snap_a = t._snapshot()
    t.rename_column("stars", "stargazers")
    post = T.StructType(
        [
            T.StructField("stargazers" if f.name == "stars" else f.name, f.dataType, f.nullable)
            for f in SCHEMA.fields
        ]
    )
    t.merge(
        _src(spark, [("r", "a", "a1", 99, 3, "U")], schema=post),
        epoch=1, src_seq_lo=3, src_seq_hi=3,
    )
    ch = t.changes_between(snap_a)
    got = {
        (r["repo"], r["path"], r["_change_type"], r["stargazers"]) for r in ch.collect()
    }
    assert got == {
        ("r", "a", "update_before", 10),
        ("r", "a", "update_after", 99),
    }


def test_drop_then_readd_never_resurfaces_old_values(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _seed(spark, path)
    t.drop_column("stars")
    assert "stars" not in [f.name for f in t.schema.fields]
    # re-add the SAME name: new field ID — pre-drop bytes stay invisible
    readded = T.StructType(list(t.schema.fields) + [T.StructField("stars", T.LongType(), True)])
    t.evolve_schema(readded)
    rows = {(r["repo"], r["path"]): r["stars"] for r in t.read().collect()}
    assert rows == {("r", "a"): None, ("r", "b"): None, ("s", "c"): None}
    t.merge(
        _src(spark, [("r", "a", "a1", 3, 77, "U")], schema=readded),  # (…, seq, stars)
        epoch=1, src_seq_lo=3, src_seq_hi=3,
    )
    rows = {(r["repo"], r["path"]): r["stars"] for r in t.read().collect()}
    assert rows == {("r", "a"): 77, ("r", "b"): None, ("s", "c"): None}


def test_rename_onto_previously_dropped_name(spark, tmp_path):
    """gen0 (content, stars) → drop content → rename stars→content: old
    files' original 'content' bytes must NOT leak into the renamed column
    (the ID map, not the name, decides what is read)."""
    path = str(tmp_path / "t")
    t = _seed(spark, path)
    t.drop_column("content")
    t.rename_column("stars", "content")
    rows = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert rows == {("r", "a"): 10, ("r", "b"): 20, ("s", "c"): 30}


def test_structural_guards(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _seed(spark, path)
    with pytest.raises(ValueError, match="key column"):
        t.drop_column("repo")
    with pytest.raises(ValueError, match="order column"):
        t.drop_column("seq")
    t.set_sort_order(["stars"])
    with pytest.raises(ValueError, match="sort order"):
        t.drop_column("stars")
    t.set_sort_order([])
    t.set_constraint("stars_nonneg", "stars IS NULL OR stars >= 0")
    with pytest.raises(ValueError, match="constraint"):
        t.rename_column("stars", "stargazers")
    with pytest.raises(ValueError, match="constraint"):
        t.drop_column("stars")
    t.drop_constraint("stars_nonneg")
    with pytest.raises(KeyError):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("stars", "content")
    with pytest.raises(ValueError, match="invalid"):
        t.rename_column("stars", "_b")
    # key/order columns CAN be renamed — references follow
    t.rename_column("path", "file_path")
    snap = t._snapshot()
    assert snap["key_cols"] == ["repo", "file_path"]
    assert t.read().where(F.col("file_path") == "a").count() == 1


def test_legacy_snapshot_without_field_ids_reads_identically(spark, tmp_path):
    """Snapshots written before the ID layer synthesize name-stable IDs —
    the exact old name-matched alignment."""
    path = str(tmp_path / "t")
    t = _seed(spark, path)
    expected = {tuple(r) for r in t.read().select(*[f.name for f in SCHEMA.fields]).collect()}
    cur = os.path.join(path, "CURRENT")
    with open(cur) as f:
        name = f.read().strip()
    sf = os.path.join(path, "snapshots", name)
    with open(sf) as f:
        snap = json.load(f)
    snap.pop("field_ids", None)
    snap.pop("next_field_id", None)
    with open(sf, "w") as f:
        json.dump(snap, f)
    t2 = HashMergeTable(spark, path)
    got = {tuple(r) for r in t2.read().select(*[f.name for f in SCHEMA.fields]).collect()}
    assert got == expected
    # and the first ID-allocating commit on a legacy table materializes IDs
    t2.rename_column("stars", "stargazers")
    assert "field_ids" in t2._snapshot()
    assert t2.read().where(F.col("stargazers") == 20).count() == 1


def test_time_travel_before_rename_keeps_old_name(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _seed(spark, path)
    snap_a = t._snapshot()
    t.rename_column("stars", "stargazers")
    old = t.read(at_snapshot=snap_a)
    assert "stars" in old.columns and "stargazers" not in old.columns
    assert old.where(F.col("stars") == 30).count() == 1


def test_alter_cli(spark, tmp_path):
    from read_comp_data_pipeline_spark.__main__ import main

    path = str(tmp_path / "t")
    _seed(spark, path)
    assert main(["alter", "--table", path, "--rename", "stars", "stargazers"]) == 0
    assert main(["alter", "--table", path, "--drop", "content"]) == 0
    t = HashMergeTable(spark, path)
    assert [f.name for f in t.schema.fields] == ["repo", "path", "stargazers", "seq"]
