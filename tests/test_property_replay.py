"""Property-style spot check (SURVEY §5.5): randomized (seeded) op
sequences per key → replay through the full engine → final state equals a
pure-Python per-key simulator: last non-delete event's content wins,
deleted keys absent. Also exercises the CLI entry point end-to-end."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import types as T

from read_comp_data_pipeline_spark.operators.merge import HashMergeTable
from read_comp_data_pipeline_spark.schemas import WAL_SCHEMA
from read_comp_data_pipeline_spark.streaming.ingest import run_ingest


def _random_wal(seed: int, n_keys: int = 25, n_events: int = 400):
    rng = random.Random(seed)
    keys = [(f"org{i % 3}/r{i % 5}", f"p{i}") for i in range(n_keys)]
    live: set = set()
    rows = []
    for seq in range(n_events):
        repo, path = keys[rng.randrange(n_keys)]
        k = (repo, path)
        if k not in live:
            op = "I"
            live.add(k)
        else:
            op = rng.choices(["U", "D"], weights=[4, 1])[0]
            if op == "D":
                live.discard(k)
        content = None if op == "D" else f"content {repo} {path} v{seq} :: {rng.random():.9f}"
        rows.append(
            (seq, seq // 100, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=seq),
             op, repo, path, None if op == "D" else f"c{seq}", "py", content)
        )
    return rows


def _simulate(rows):
    state: dict = {}
    for seq, _e, _ts, op, repo, path, _c, _l, content in rows:
        if op == "D":
            state.pop((repo, path), None)
        else:
            state[(repo, path)] = content
    return state


def test_random_sequences_converge_to_simulator(spark, tmp_path):
    nullable = T.StructType([T.StructField(f.name, f.dataType, True) for f in WAL_SCHEMA.fields])
    for seed in (7, 99, 1234):
        rows = _random_wal(seed)
        wal_path = str(tmp_path / f"wal{seed}")
        spark.createDataFrame(rows, nullable).write.partitionBy("epoch").parquet(wal_path)
        tbl = str(tmp_path / f"t{seed}")
        run_ingest(spark, wal_path, tbl, n_buckets=4, mode="mor", compact_every=2)
        got = {
            (r["repo"], r["path"]): r["content"]
            for r in HashMergeTable(spark, tbl).read().collect()
        }
        assert got == _simulate(rows), f"seed {seed}"


def test_cli_generate_ingest_show(spark, tmp_path, capsys):
    from read_comp_data_pipeline_spark.__main__ import main

    wal = str(tmp_path / "wal")
    tbl = str(tmp_path / "tbl")
    assert main(["generate", "--out", wal, "--events", "800", "--keys", "80",
                 "--epoch-size", "400"]) == 0
    assert main(["ingest", "--wal", wal, "--table", tbl, "--buckets", "4",
                 "--mode", "mor"]) == 0
    out = capsys.readouterr().out
    assert '"epochs_applied": 2' in out
    assert main(["show", "--table", tbl]) == 0