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
