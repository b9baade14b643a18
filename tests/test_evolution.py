"""Schema evolution mid-replay (FIXTURES.md §3, SURVEY §5.4):
added columns + int→long widening, applied transactionally BEFORE the
upsert wave that carries them; pre-evolution rows read as null.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from read_comp_data_pipeline_spark.operators.compact import compact_latest
from read_comp_data_pipeline_spark.operators.merge import HashMergeTable
from read_comp_data_pipeline_spark.sources.wal import generate_change_events
from read_comp_data_pipeline_spark.streaming.evolve import evolved_schema
from read_comp_data_pipeline_spark.streaming.ingest import run_ingest

N_EVENTS = 2000
EPOCH_SIZE = 500  # epochs 0..3


@pytest.fixture(scope="module")
def evolved_wal(spark, tmp_path_factory):
    """Epochs 0-1: base schema. Epoch 2: + stars:int. Epoch 3: stars
    widened to long, + heading_count:long."""
    p = str(tmp_path_factory.mktemp("wal") / "evolved")
    df = generate_change_events(spark, N_EVENTS, n_keys=200, epoch_size=EPOCH_SIZE)
    base = df.where(F.col("epoch") < 2)
    base.write.partitionBy("epoch").parquet(p)
    e2 = df.where(F.col("epoch") == 2).withColumn(
        "stars", F.pmod(F.xxhash64("seq"), F.lit(100)).cast("int")
    )
    e2.write.mode("append").partitionBy("epoch").parquet(p)
    e3 = (
        df.where(F.col("epoch") == 3)
        .withColumn("stars", F.pmod(F.xxhash64("seq"), F.lit(1000)).cast("long"))
        .withColumn("heading_count", F.pmod(F.xxhash64("seq", F.lit(1)), F.lit(7)).cast("long"))
    )
    e3.write.mode("append").partitionBy("epoch").parquet(p)
    return p


def _field(schema, name):
    m = {f.name: f for f in schema.fields}
    return m.get(name)


def test_evolution_is_transactional_per_wave(spark, evolved_wal, tmp_path):
    tbl_path = str(tmp_path / "t")
    # replay only through epoch 2: stars present as INT, no heading_count
    run_ingest(spark, evolved_wal, tbl_path, n_buckets=4, max_epoch=2)
    t = HashMergeTable(spark, tbl_path)
    assert _field(t.schema, "stars").dataType == T.IntegerType()
    assert _field(t.schema, "heading_count") is None
    # epoch 3 widens stars to long and adds heading_count BEFORE applying
    run_ingest(spark, evolved_wal, tbl_path, n_buckets=4)
    t = HashMergeTable(spark, tbl_path)
    assert _field(t.schema, "stars").dataType == T.LongType()
    assert _field(t.schema, "heading_count").dataType == T.LongType()


def test_pre_evolution_rows_read_null(spark, evolved_wal, tmp_path):
    tbl_path = str(tmp_path / "t")
    run_ingest(spark, evolved_wal, tbl_path, n_buckets=4)
    final = HashMergeTable(spark, tbl_path).read()

    # independently compute which epoch each surviving key's last event is in
    parts = [
        spark.read.parquet(f"{evolved_wal}/epoch={e}").withColumn("epoch", F.lit(e))
        for e in range(4)
    ]
    aligned = []
    for d in parts:
        if "stars" not in d.columns:
            d = d.withColumn("stars", F.lit(None).cast("long"))
        d = d.withColumn("stars", F.col("stars").cast("long"))
        if "heading_count" not in d.columns:
            d = d.withColumn("heading_count", F.lit(None).cast("long"))
        aligned.append(d.select("seq", "epoch", "op", "repo", "path", "content", "stars", "heading_count"))
    wal = aligned[0]
    for d in aligned[1:]:
        wal = wal.unionByName(d)
    last = compact_latest(wal).where(F.col("op") != "D")

    j = final.select("repo", "path", F.col("stars").alias("got_stars"),
                     F.col("heading_count").alias("got_hc")).join(
        last.select("repo", "path", "epoch", "stars", "heading_count"),
        on=["repo", "path"], how="inner",
    )
    assert j.count() == final.count()
    # pre-evolution keys (last event epoch < 2) must read null stars
    assert j.where((F.col("epoch") < 2) & F.col("got_stars").isNotNull()).count() == 0
    # post-evolution keys carry the evolved values exactly
    assert j.where(
        (F.col("epoch") >= 2) & (
            F.col("got_stars").isNull() | (F.col("got_stars") != F.col("stars"))
        )
    ).count() == 0
    assert j.where(
        (F.col("epoch") == 3) & (
            F.col("got_hc").isNull() | (F.col("got_hc") != F.col("heading_count"))
        )
    ).count() == 0
    # sha-invariant still holds across evolution
    exp_sha = last.select(
        "repo", "path", F.sha2(F.encode("content", "utf-8"), 256).alias("s")
    )
    got_sha = final.select("repo", "path", F.col("content_sha").alias("g"))
    bad = got_sha.join(exp_sha, on=["repo", "path"]).where(F.col("g") != F.col("s")).count()
    assert bad == 0


def test_incompatible_evolution_rejected():
    old = T.StructType([T.StructField("a", T.StringType())])
    new = T.StructType([T.StructField("a", T.LongType())])
    with pytest.raises(ValueError, match="incompatible"):
        evolved_schema(old, new)


def test_evolution_under_mor_mode(spark, evolved_wal, tmp_path):
    """Evolution + merge-on-read: deltas written under different schema
    generations reconcile correctly at read time."""
    cow = str(tmp_path / "cow")
    mor = str(tmp_path / "mor")
    run_ingest(spark, evolved_wal, cow, n_buckets=4, mode="cow")
    run_ingest(spark, evolved_wal, mor, n_buckets=4, mode="mor", compact_every=3)
    a = HashMergeTable(spark, cow).read()
    b = HashMergeTable(spark, mor).read()
    cols = ["repo", "path", "content_sha", "stars", "heading_count"]

    def dig(df):
        return (
            df.select(F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("∅")) for c in cols]).alias("h"))
            .agg(F.sum(F.col("h").cast("decimal(38,0)")).alias("d"), F.count("*").alias("n"))
            .first()
        )

    assert a.count() == b.count()
    assert dig(a) == dig(b)
