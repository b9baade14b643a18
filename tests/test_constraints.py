"""Table-declared CHECK expectations (constraints) — Delta-style data
quality gates enforced by the ingest loop through the existing quarantine
machinery (merge.py set_constraint + ingest.py constraints_validator)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from read_comp_data_pipeline_spark.operators.merge import HashMergeTable
from read_comp_data_pipeline_spark.schemas import TARGET_SCHEMA, WAL_SCHEMA
from read_comp_data_pipeline_spark.streaming.ingest import (
    constraints_validator,
    read_quarantine,
    run_ingest,
    validate_slice,
)


def _ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


def _write_wal(spark, rows, path):
    nullable = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in WAL_SCHEMA.fields]
    )
    spark.createDataFrame(rows, nullable).write.partitionBy("epoch").parquet(path)


ROWS = [
    (0, 0, _ts(0), "I", "r1", "k1", "c0", "py", "short"),
    (1, 0, _ts(1), "I", "r1", "k2", "c1", "md", "x" * 50),       # too long
    (2, 0, _ts(2), "I", "r1", "k3", "c2", "rs", "fine text"),    # bad lang
    (3, 1, _ts(3), "U", "r1", "k1", "c3", "py", "updated ok"),
    (4, 1, _ts(4), "D", "r1", "k9", None, None, None),           # delete: NULL lang passes (CHECK NULL semantics)
]

CONSTRAINTS = {
    "content_len": "length(content) <= 40",
    "known_lang": "lang in ('py', 'md')",
}


def test_constraint_violations_quarantined_with_names(spark, tmp_path):
    wal = str(tmp_path / "wal")
    tbl = str(tmp_path / "t")
    _write_wal(spark, ROWS, wal)
    HashMergeTable.create(
        spark, tbl, TARGET_SCHEMA, n_buckets=2, constraints=CONSTRAINTS
    )
    run_ingest(spark, wal, tbl, n_buckets=2, quarantine=True)

    final = {(r["repo"], r["path"]): r["content"]
             for r in HashMergeTable(spark, tbl).read().collect()}
    assert final == {("r1", "k1"): "updated ok"}  # k2/k3 blocked, k9 deleted/no-op

    q = {(r["seq"], r["error"]) for r in read_quarantine(spark, tbl).collect()}
    assert q == {(1, "constraint:content_len"), (2, "constraint:known_lang")}


def test_null_expression_passes_and_structural_errors_win(spark):
    df = spark.createDataFrame(
        [
            (0, 0, _ts(0), "I", "r", "a", None, None, "ok"),   # NULL lang → constraint NULL → passes
            (1, 0, _ts(1), "X", "r", "b", None, "py", "ok"),   # bad op: structural error wins
            (2, 0, _ts(2), "I", "r", "c", None, "rs", "ok"),   # constraint FALSE
        ],
        T.StructType([T.StructField(f.name, f.dataType, True) for f in WAL_SCHEMA.fields]),
    )
    good, bad = validate_slice(df, constraints_validator({"known_lang": "lang in ('py','md')"}))
    errs = {(r["seq"], r["error"]) for r in bad.collect()}
    assert errs == {(1, "invalid op"), (2, "constraint:known_lang")}
    assert {r["seq"] for r in good.collect()} == {0}


def test_constraint_added_mid_stream_applies_to_later_epochs(spark, tmp_path):
    wal1, wal2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    tbl = str(tmp_path / "t")
    _write_wal(spark, [(0, 0, _ts(0), "I", "r", "a", "c", "rs", "hello")], wal1)
    # epochs continue past the first WAL's (epoch 0 is already committed
    # in the table — a reused epoch id would be skipped, not validated)
    rows2 = [
        (1, 1, _ts(1), "I", "r", "b", "c", "rs", "blocked now"),
        (2, 2, _ts(2), "I", "r", "d", "c", "py", "fine"),
    ]
    _write_wal(spark, rows2, wal2)

    run_ingest(spark, wal1, tbl, n_buckets=2, quarantine=True)
    t = HashMergeTable(spark, tbl)
    assert ("r", "a") in {(r["repo"], r["path"]) for r in t.read().collect()}  # rs allowed before

    t.set_constraint("known_lang", "lang in ('py','md')")
    assert t.constraints == {"known_lang": "lang in ('py','md')"}
    run_ingest(spark, wal2, tbl, n_buckets=2, quarantine=True)

    keys = {(r["repo"], r["path"]) for r in t.read().collect()}
    assert keys == {("r", "a"), ("r", "d")}  # pre-existing row not re-validated
    q = {(r["seq"], r["error"]) for r in read_quarantine(spark, tbl).collect()}
    assert (1, "constraint:known_lang") in q

    t.drop_constraint("known_lang")
    assert t.constraints == {}
    with pytest.raises(KeyError):
        t.drop_constraint("known_lang")


def test_set_constraint_rejects_bad_syntax(spark, tmp_path):
    t = HashMergeTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2
    )
    with pytest.raises(Exception):
        t.set_constraint("broken", "length(content <=")
    assert t.constraints == {}


def test_violations_escalate_to_dead_letters(spark, tmp_path):
    """A constraint violation is permanent data: retried each epoch, it
    exhausts attempts and lands in the dead partition like any other
    unfixable row."""
    wal = str(tmp_path / "wal")
    tbl = str(tmp_path / "t")
    rows = [(0, 0, _ts(0), "I", "r", "bad", "c", "rs", "x")] + [
        (i, i, _ts(i), "I", "r", f"k{i}", "c", "py", "ok") for i in range(1, 5)
    ]
    _write_wal(spark, rows, wal)
    HashMergeTable.create(
        spark, tbl, TARGET_SCHEMA, n_buckets=2,
        constraints={"known_lang": "lang in ('py','md')"},
    )
    run_ingest(spark, wal, tbl, n_buckets=2, quarantine=True, max_attempts=3)
    # after 3 failed attempts nothing is pending anymore — the only
    # quarantined row is the permanent dead letter at the attempt cap
    q = read_quarantine(spark, tbl).collect()
    assert [(r["seq"], r["attempts"], r["error"]) for r in q] == [
        (0, 3, "constraint:known_lang")
    ]
