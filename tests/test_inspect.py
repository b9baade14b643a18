"""Metadata inspection tables (Iceberg ``table.files`` / ``.partitions``
/ ``.snapshots`` / ``.schemas`` analogue).

The operational questions at 10^10 rows — is compaction due? which bucket
is skewed? what does time travel retain? which field ID does a column
carry? — must be answerable from snapshot metadata + parquet footers
alone, never by scanning data rows. These tests pin that the numbers the
tables report agree with the table's actual committed state.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from read_comp_data_pipeline_spark.operators.merge import HashMergeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _src(spark, n, lo=0):
    return spark.range(lo, lo + n).select(
        F.lit("r").alias("repo"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("path"),
        F.col("id").alias("v"),
        F.col("id").alias("seq"),
        F.lit("I").alias("op"),
    )


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    """MOR table with a compacted base (epoch 0) plus two delta epochs and
    one schema evolution — every content kind and two schema generations."""
    t = HashMergeTable.create(
        spark, str(tmp_path_factory.mktemp("insp") / "t"), SCHEMA,
        n_buckets=4, mode="mor",
    )
    t.merge(_src(spark, 400), epoch=0)
    t.compact_table()
    t.merge(_src(spark, 100, lo=400), epoch=1)
    evolved = T.StructType(list(SCHEMA.fields) + [T.StructField("w", T.LongType(), True)])
    t.evolve_schema(evolved)
    t.merge(
        _src(spark, 100, lo=500).withColumn("w", F.col("v") * 2),
        epoch=2,
    )
    return t


def test_files_agrees_with_committed_state(spark, table):
    files = table.inspect("files").collect()
    assert all(r["content"] in ("base", "delta") for r in files)
    base = [r for r in files if r["content"] == "base"]
    deltas = [r for r in files if r["content"] == "delta"]
    assert base and deltas
    # row totals reconcile: base holds epoch 0, deltas epochs 1-2
    assert sum(r["rows"] for r in base) == 400
    assert sum(r["rows"] for r in deltas) == 200
    assert {r["epoch"] for r in deltas} == {1, 2}
    assert all(r["epoch"] is None for r in base)
    # the evolved epoch's files carry the new schema generation
    assert {r["schema_id"] for r in files if r["epoch"] == 2} == {1}
    assert all(r["size_bytes"] > 0 and r["row_groups"] >= 1 for r in files)
    # read() sees exactly the union the files table reports
    assert table.read().count() == 600


def test_partitions_aggregates_files(spark, table):
    files = table.inspect("files")
    parts = {r["bucket"]: r for r in table.inspect("partitions").collect()}
    per_bucket = {
        r["bucket"]: (r["n"], r["rows"], r["bytes"])
        for r in files.groupBy("bucket").agg(
            F.count("*").alias("n"), F.sum("rows").alias("rows"),
            F.sum("size_bytes").alias("bytes"),
        ).collect()
    }
    assert set(parts) == set(per_bucket)
    for b, (n, rows, size) in per_bucket.items():
        assert parts[b]["n_files"] == n
        assert parts[b]["rows"] == rows
        assert parts[b]["size_bytes"] == size
        assert parts[b]["n_delta_files"] >= 1  # epochs 1-2 appended everywhere?


def test_snapshots_history(spark, table):
    snaps = table.inspect("snapshots").orderBy("version").collect()
    assert [r["epoch"] for r in snaps][-1] == 2
    assert all(r["mode"] == "mor" for r in snaps)
    # the evolution commit bumped the schema generation without an epoch
    assert snaps[-1]["n_schemas"] == 2 and snaps[-1]["current_schema_id"] == 1
    assert snaps[-1]["n_deltas"] == 2
    versions = [r["version"] for r in snaps]
    assert versions == sorted(versions) and len(set(versions)) == len(versions)


def test_schemas_field_ids(spark, table):
    rows = table.inspect("schemas").collect()
    by_gen = {}
    for r in rows:
        by_gen.setdefault(r["schema_id"], []).append(r)
    assert set(by_gen) == {0, 1}
    # retained fields keep their IDs across the evolution; 'w' got a new one
    id0 = {r["name"]: r["field_id"] for r in by_gen[0]}
    id1 = {r["name"]: r["field_id"] for r in by_gen[1]}
    for name, fid in id0.items():
        assert id1[name] == fid
    assert id1["w"] not in id0.values()
    assert all(r["is_current"] == (r["schema_id"] == 1) for r in rows)


def test_inspect_rejects_unknown_kind(spark, table):
    with pytest.raises(ValueError, match="unknown inspect kind"):
        table.inspect("nope")


def test_inspect_cli(spark, table):
    from read_comp_data_pipeline_spark.__main__ import main

    for what in ("files", "partitions", "snapshots", "schemas"):
        assert main(["inspect", "--table", table.path, "--what", what]) == 0
