"""Temporal joins: as-of (strict + non-strict) and banded range join —
planted-row semantics plus the no-theta-join plan contract."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from read_comp_data_pipeline_spark.operators.temporal import asof_join, range_count_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_asof_join_strict_and_nonstrict_semantics(spark):
    probe = _mk(spark, [
        (1, "u", _ts(10)),   # after both refs → latest (t=5) attaches
        (2, "u", _ts(5)),    # EXACTLY at a ref: strict → earlier ref; non-strict → the t=5 ref
        (3, "u", _ts(1)),    # before every ref → NULL
        (4, "v", _ts(50)),   # key with no refs at all → NULL
    ], ["pid", "k", "t"])
    ref = _mk(spark, [
        ("u", _ts(2), 20.0),
        ("u", _ts(5), 50.0),
    ], ["k", "t", "val"])

    strict = {r["pid"]: (r["val_asof"], r["t_asof"]) for r in
              asof_join(probe, ref, "k", "t", ["val"], strict=True).collect()}
    assert strict[1] == (50.0, _ts(5))
    assert strict[2] == (20.0, _ts(2))   # same-instant ref invisible
    assert strict[3] == (None, None)
    assert strict[4] == (None, None)

    loose = {r["pid"]: (r["val_asof"], r["t_asof"]) for r in
             asof_join(probe, ref, "k", "t", ["val"], strict=False).collect()}
    assert loose[1] == (50.0, _ts(5))
    assert loose[2] == (50.0, _ts(5))    # same-instant ref visible
    assert loose[3] == (None, None)


def test_range_count_join_boundaries_and_zero_counts(spark):
    # trailing window [t-10s, t): inclusive lower bound, exclusive upper
    probe = _mk(spark, [
        (1, "u", _ts(20)),
        (2, "w", _ts(20)),   # no refs for w → count 0 (left semantics)
    ], ["pid", "k", "t"])
    ref = _mk(spark, [
        ("u", _ts(10)),      # exactly t-10 → IN (inclusive)
        ("u", _ts(15)),      # inside
        ("u", _ts(20)),      # exactly t → OUT (exclusive)
        ("u", _ts(9)),       # before window → OUT
        ("v", _ts(15)),      # other key → OUT
    ], ["k", "t"])
    out = {r["pid"]: r["n"] for r in
           range_count_join(probe, ref, "k", "t", width_secs=10, count_alias="n").collect()}
    assert out == {1: 2, 2: 0}


def test_temporal_joins_plan_has_no_theta_join(spark, sf_dir):
    """The point of the operators: neither plan may contain a nested-loop
    or cartesian join — the as-of is a union+window, the range join a
    banded equi-join."""
    import contextlib
    import io

    from read_comp_data_pipeline_spark.plans.queries import (
        asof_join_prev_purchase,
        range_join_error_burst,
    )

    for fn in (asof_join_prev_purchase, range_join_error_burst):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, sf_dir).explain()
        plan = buf.getvalue()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_asof_matches_quadratic_reference(spark):
    """Property check: the one-shuffle as-of equals the O(n*m) definition
    on a random-ish planted workload (including duplicate probe times)."""
    import itertools

    probes = [(i, "k%d" % (i % 3), _ts((i * 7) % 50)) for i in range(60)]
    refs = [("k%d" % (j % 3), _ts((j * 11) % 50), float(j)) for j in range(30)]
    # dedupe refs on (key, time): keep max value (mirrors the catalog query)
    best = {}
    for k, t, v in refs:
        if (k, t) not in best or v > best[(k, t)]:
            best[(k, t)] = v
    refs = [(k, t, v) for (k, t), v in best.items()]

    p = _mk(spark, probes, ["pid", "k", "t"])
    r = _mk(spark, refs, ["k", "t", "val"])
    got = {row["pid"]: row["val_asof"] for row in
           asof_join(p, r, "k", "t", ["val"], strict=True).collect()}
    for pid, k, t in probes:
        cands = [(rt, rv) for rk, rt, rv in refs if rk == k and rt < t]
        expect = max(cands)[1] if cands else None
        assert got[pid] == expect, (pid, got[pid], expect)


def test_asof_null_payload_travels_with_its_row(spark):
    """ADVICE r3: a NULL payload in the matched (newest preceding) ref row
    must surface as NULL — an older row's non-null value must NOT be
    spliced in. The matched row travels as one struct."""
    probe = _mk(spark, [(1, "u", _ts(10))], ["pid", "k", "t"])
    ref = _mk(spark, [
        ("u", _ts(2), 20.0, "old"),
        ("u", _ts(5), None, "new"),   # matched row: val is NULL
    ], ["k", "t", "val", "tag"])
    row = asof_join(probe, ref, "k", "t", ["val", "tag"], strict=True).collect()[0]
    assert row["t_asof"] == _ts(5)
    assert row["tag_asof"] == "new"
    assert row["val_asof"] is None   # not 20.0 from the older row


def test_range_count_join_keeps_duplicate_probe_rows(spark):
    """ADVICE r3: two fully-identical probe rows must yield two output
    rows each with the true count, not one row with the doubled sum."""
    probe = _mk(spark, [(1, "u", _ts(20)), (1, "u", _ts(20))], ["pid", "k", "t"])
    ref = _mk(spark, [("u", _ts(15)), ("u", _ts(18))], ["k", "t"])
    out = range_count_join(probe, ref, "k", "t", width_secs=10, count_alias="n").collect()
    assert len(out) == 2
    assert [r["n"] for r in out] == [2, 2]


def test_asof_sliced_matches_unsliced_on_hot_key(spark):
    """Skew bound: the (key, time-slice)+carry-in formulation returns
    exactly the plain per-key result on a planted hot key — including
    probes in ref-free slices (carry across empty slices), strict and
    non-strict, and NULL payloads."""
    import random

    rng = random.Random(7)
    # one hot key with 2000 probes over 1000s + a cold key; refs sparse
    probes = [(i, "hot", _ts(rng.randrange(0, 1000))) for i in range(2000)]
    probes += [(10_000 + i, "cold", _ts(i * 37 % 500)) for i in range(20)]
    refs = {}
    for j in range(150):
        t = rng.randrange(0, 900)
        refs[("hot", t)] = float(j) if j % 5 else None   # some NULL payloads
    for j in range(5):
        refs[("cold", j * 100)] = float(j)
    ref_rows = [(k, _ts(t), v) for (k, t), v in refs.items()]

    p = _mk(spark, probes, ["pid", "k", "t"])
    r = spark.createDataFrame(ref_rows, "k string, t timestamp, val double")
    for strict in (True, False):
        plain = {row["pid"]: (row["val_asof"], row["t_asof"]) for row in
                 asof_join(p, r, "k", "t", ["val"], strict=strict).collect()}
        sliced = {row["pid"]: (row["val_asof"], row["t_asof"]) for row in
                  asof_join(p, r, "k", "t", ["val"], strict=strict, slice_secs=60).collect()}
        assert sliced == plain


def test_asof_sliced_partitions_by_slice(spark):
    """The sliced window must actually partition on (key, slice) — the
    skew bound is the partition key, so assert it in the plan."""
    import contextlib
    import io

    p = _mk(spark, [(1, "u", _ts(10))], ["pid", "k", "t"])
    r = _mk(spark, [("u", _ts(2), 1.0)], ["k", "t", "val"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join(p, r, "k", "t", ["val"], slice_secs=60).explain()
    plan = buf.getvalue()
    assert "_bk" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
