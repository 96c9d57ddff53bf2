"""As-of and range join semantics (operators/asof.py) on hand-built frames
where every expected match is known, plus the directions/options the declared
queries don't exercise (forward, tolerance, tiebreak, left range join)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from s4hanaconnector_spark.operators.asof import asof_join, range_join_binned


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(30), "b"), (2, _ts(5), "c"), (3, _ts(9), "d")],
        "k int, ts timestamp, lp string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(20), 200), (2, _ts(6), 300)],
        "k int, ts timestamp, rv int",
    )
    return left, right


def test_asof_backward_inclusive_ties(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "ts", "ts", {"rv": "rv"})
    got = {r["lp"]: r["rv"] for r in out.collect()}
    # a: right at exactly :10 matches (inclusive); b: latest <= :30 is 200;
    # c: right at :06 is in the future -> null; d: key 3 has no right rows.
    assert got == {"a": 100, "b": 200, "c": None, "d": None}


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "ts", "ts", {"rv": "rv"}, direction="forward")
    got = {r["lp"]: r["rv"] for r in out.collect()}
    assert got == {"a": 100, "b": None, "c": 300, "d": None}


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, ["k"], "ts", "ts", {"rv": "rv"}, tolerance_interval="5 minutes"
    )
    got = {r["lp"]: r["rv"] for r in out.collect()}
    # b's nearest click is 10 minutes stale -> nulled by the tolerance.
    assert got == {"a": 100, "b": None, "c": None, "d": None}


def test_asof_tiebreak_prefers_largest(spark):
    left = spark.createDataFrame([(1, _ts(10), "x")], "k int, ts timestamp, lp string")
    right = spark.createDataFrame(
        [(1, _ts(10), 7, "lo"), (1, _ts(10), 9, "hi")],
        "k int, ts timestamp, seq int, rv string",
    )
    out = asof_join(left, right, ["k"], "ts", "ts", {"rv": "rv"}, right_tiebreak="seq")
    assert out.collect()[0]["rv"] == "hi"


def test_asof_preserves_left_rowcount(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "ts", "ts", {"rv": "rv"})
    assert out.count() == left.count()
    assert set(out.columns) == {"k", "ts", "lp", "rv"}


def test_range_join_inner_and_left(spark):
    points = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(40), "p2"), (2, _ts(10), "p3")],
        "k int, ts timestamp, pid string",
    )
    intervals = spark.createDataFrame(
        [(1, _ts(5), _ts(15), "w1"), (1, _ts(8), _ts(12), "w2"), (2, _ts(20), _ts(30), "w3")],
        "k int, s timestamp, e timestamp, wid string",
    )
    inner = range_join_binned(points, intervals, ["k"], "ts", "s", "e", bin_width="2 minutes")
    pairs = {(r["pid"], r["wid"]) for r in inner.collect()}
    assert pairs == {("p1", "w1"), ("p1", "w2")}

    left = range_join_binned(points, intervals, ["k"], "ts", "s", "e", bin_width="2 minutes", how="left")
    rows = {(r["pid"], r["wid"]) for r in left.collect()}
    assert rows == {("p1", "w1"), ("p1", "w2"), ("p2", None), ("p3", None)}


def test_range_join_no_cartesian_in_plan(spark):
    points = spark.createDataFrame([(1, _ts(10), "p")], "k int, ts timestamp, pid string")
    intervals = spark.createDataFrame(
        [(1, _ts(5), _ts(15), "w")], "k int, s timestamp, e timestamp, wid string"
    )
    plan = (
        range_join_binned(points, intervals, ["k"], "ts", "s", "e", bin_width="5 minutes")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_asof_nearest_picks_closest_and_prefers_backward(spark):
    from s4hanaconnector_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [(1, 100.0), (2, 200.0), (3, 999.0)], "lid long, ts double"
    )
    right = spark.createDataFrame(
        # lid 1: backward at 90 (gap 10) vs forward at 105 (gap 5) -> forward
        # lid 2: backward at 195 (gap 5) vs forward at 205 (gap 5) -> TIE -> backward
        # lid 3: no right rows nearby except far ones -> still nearest of what exists
        [(90.0, 10), (105.0, 11), (195.0, 20), (205.0, 21)],
        "ts double, rid long",
    )
    # single group: add a constant key
    from pyspark.sql import functions as F

    l = left.withColumn("k", F.lit(1))
    r = right.withColumn("k", F.lit(1))
    out = {
        row["lid"]: row
        for row in asof_join_nearest(
            l, r, ["k"], "ts", "ts", {"rid": "nearest_rid"}, right_tiebreak="rid"
        ).collect()
    }
    assert out[1]["nearest_rid"] == 11 and out[1]["__asof_direction"] == "forward"
    assert out[2]["nearest_rid"] == 20 and out[2]["__asof_direction"] == "backward"
    assert out[3]["nearest_rid"] == 21 and out[3]["__asof_direction"] == "backward"
